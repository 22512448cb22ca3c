"""Profiling and MFU instrumentation (SURVEY.md §5 rebuild item — the
reference has none; progress bars were its only introspection).

* ``trace(log_dir)``: context manager around ``jax.profiler`` emitting an
  xplane trace viewable in TensorBoard/XProf.
* ``StepTimer``: wall-clock step timing with true device synchronization
  (scalar fetch — ``block_until_ready`` is an enqueue barrier on the
  tunneled TPU platform).
* ``mfu(...)``: model FLOPs utilization from an XLA cost analysis and the
  per-generation peak TFLOP/s table.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax

PEAK_BF16_TFLOPS = {
    "v5 lite": 197.0,
    "v5e": 197.0,
    "v5p": 459.0,
    "v4": 275.0,
    "v6 lite": 918.0,
}


def device_peak_flops(device=None) -> float:
    device = device or jax.devices()[0]
    kind = getattr(device, "device_kind", "").lower()
    for key, tflops in PEAK_BF16_TFLOPS.items():
        if key in kind:
            return tflops * 1e12
    return 197.0e12


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def compiled_flops(jitted_fn, *args) -> float:
    """XLA's FLOP estimate for one call of a jitted function."""
    compiled = jitted_fn.lower(*args).compile()
    cost = compiled.cost_analysis() or {}
    return float(cost.get("flops", 0.0))


def mfu(step_flops: float, step_time_s: float, device=None) -> float:
    return (step_flops / step_time_s) / device_peak_flops(device) if step_time_s > 0 else 0.0


class StepWindowTrace:
    """Capture a ``jax.profiler`` trace of a window of train steps.

    ``--profile_dir`` wiring for the trainer loops: steps are counted per
    invocation (so a resumed run can be profiled too); tracing starts
    BEFORE step ``start`` dispatches (skipping the compile/warmup steps,
    which would dwarf the steady-state timeline) and stops after ``n``
    steps.  ``close()`` is idempotent and must be called on every trainer
    exit path so an early ``--max_steps`` return still flushes the trace.
    No-op when ``log_dir`` is falsy.
    """

    def __init__(self, log_dir: Optional[str], start: int = 10, n: int = 5):
        self.log_dir = log_dir
        self.start = start
        self.stop_after = start + max(1, n)
        self._active = False

    def step(self, i: int) -> None:
        """Call with the 0-based step counter before dispatching step i."""
        if not self.log_dir:
            return
        if not self._active and i == self.start:
            try:
                jax.profiler.start_trace(self.log_dir)
            except Exception as e:  # pragma: no cover - platform-dependent
                # An experimental/tunneled backend may not support device
                # tracing; a long training run must not die for a trace.
                import logging

                logging.getLogger("flyp_tpu").warning(f"profiler trace unavailable: {e}")
                self.log_dir = None
                return
            self._active = True
        elif self._active and i >= self.stop_after:
            self.close()

    def close(self) -> None:
        if self._active:
            self._active = False
            try:
                # Pin the traced window before stopping: on dispatch-returns-
                # at-enqueue backends (the tunneled TPU) the last traced steps
                # may still be executing.  A jitted scalar fetched to host
                # runs after the in-order compute queue drains, so stop_trace
                # sees every traced step's full device timeline.
                import jax.numpy as jnp

                float(jax.device_get(jax.jit(lambda: jnp.zeros(()))()))
            except Exception:  # pragma: no cover - sync is best-effort
                pass
            try:
                jax.profiler.stop_trace()
            except Exception as e:  # pragma: no cover - platform-dependent
                import logging

                logging.getLogger("flyp_tpu").warning(f"profiler trace flush failed: {e}")


class StepTimer:
    """Synchronized step timing: ``timer.sync(scalar)`` fetches a scalar to
    force completion, then records the interval."""

    def __init__(self):
        self._last = None
        self.times: list = []

    def sync(self, scalar) -> float:
        value = float(jax.device_get(scalar))
        now = time.perf_counter()
        if self._last is not None:
            self.times.append(now - self._last)
        self._last = now
        return value

    @property
    def mean(self) -> Optional[float]:
        return sum(self.times) / len(self.times) if self.times else None
