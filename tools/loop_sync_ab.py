"""Trainer-loop host-sync A/B: per-step loss fetch vs one-step-lagged drain.

The train loop's only per-step host synchronization is converting the loss
to a Python float (the NaN guard + metrics sink need it, mirroring the
torch reference's per-step ``.item()`` at
`/root/reference/src/models/flyp_loss.py:493-513`).  Fetching immediately
after dispatch leaves the device idle from step-end until the host finishes
the round trip and enqueues the next step; holding step i's metrics until
step i+1 has been dispatched overlaps the fetch with device compute.

This measures both loop shapes around the EXACT bench train step,
interleaved in one session (same pairing rationale as bench.py --ab).
The lagged shape is what `training/flyp.py` ships.

Usage: python -m tools.loop_sync_ab [batch] [model]
"""

import sys
import time

import jax

from bench import build_bench_step


def main(batch_size=256, model_name="ViT-B/16", blocks=3, steps=15):
    on_tpu = jax.default_backend() in ("tpu", "axon")
    if not on_tpu:
        batch_size, blocks, steps = min(batch_size, 8), 1, 2

    step_fn, state, images, tokens, _ = build_bench_step(batch_size, model_name, False)
    for _ in range(3):
        state, m = step_fn(state, images, tokens)
    _ = float(jax.device_get(m["loss"]))

    def sync_block(n):
        nonlocal state
        t0 = time.perf_counter()
        for _ in range(n):
            state, m = step_fn(state, images, tokens)
            _ = float(jax.device_get(m["loss"]))  # per-step sync (reference shape)
        return (time.perf_counter() - t0) / n

    def lagged_block(n):
        nonlocal state
        pend = None
        t0 = time.perf_counter()
        for _ in range(n):
            state, m = step_fn(state, images, tokens)
            if pend is not None:
                _ = float(jax.device_get(pend["loss"]))  # lagged drain (shipped shape)
            pend = m
        _ = float(jax.device_get(pend["loss"]))
        return (time.perf_counter() - t0) / n

    for b in range(blocks):
        ts, tl = sync_block(steps), lagged_block(steps)
        print(
            f"block {b}: sync {ts*1e3:7.2f} ms/step ({batch_size/ts:7.1f} img/s)   "
            f"lagged {tl*1e3:7.2f} ms/step ({batch_size/tl:7.1f} img/s)   sync/lagged {ts/tl:6.4f}",
            flush=True,
        )


if __name__ == "__main__":
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    name = sys.argv[2] if len(sys.argv) > 2 else "ViT-B/16"
    main(bs, name)
