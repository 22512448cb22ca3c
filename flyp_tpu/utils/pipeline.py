"""Host-loop pipelining primitives.

Every hot host loop in the framework (train steps, eval batches, feature
extraction) has the same shape: dispatch work to the device, then fetch the
PREVIOUS dispatch's results so the device->host transfer and the host-side
bookkeeping overlap the in-flight device work (docs/BENCHMARKS.md round 4:
a per-step synchronous fetch costs 13-21% on the tunneled chip).  This
module centralizes the lag so its contract — exactly one item in flight,
flush at loop end — lives in one place.
"""

from __future__ import annotations

from typing import Any, Optional


class OneStepLag:
    """Hold one dispatched item; return the previous one on each push.

    >>> lag = OneStepLag()
    >>> for batch in loader:
    ...     handle = dispatch(batch)          # device work starts
    ...     prev = lag.push(handle)
    ...     if prev is not None:
    ...         process(prev)                 # fetch overlaps the new work
    >>> last = lag.flush()
    >>> if last is not None:
    ...     process(last)
    """

    def __init__(self) -> None:
        self._pending: Optional[Any] = None

    def push(self, item: Any) -> Optional[Any]:
        prev, self._pending = self._pending, item
        return prev

    def flush(self) -> Optional[Any]:
        prev, self._pending = self._pending, None
        return prev


def lagged_device_method(obj, device_name: str, sync_name: str):
    """(dispatch, fetch) pair for pipelining a classifier method.

    ``dispatch(images)`` returns an opaque ``(device_array, n_valid)`` handle
    (dispatch-only method when the object has one; a synchronous fallback for
    duck-typed objects, where ``n_valid`` is None).  ``fetch(handle)`` pulls
    the array to host and truncates padding rows.  Keeps the handle contract
    in one place for evaluator.py and features.py."""
    import numpy as np

    dispatch = getattr(obj, device_name, None)
    if dispatch is None:  # duck-typed object (tests, custom wrappers)
        dispatch = lambda images: (getattr(obj, sync_name)(images), None)  # noqa: E731

    def fetch(handle):
        arr = np.asarray(handle[0])
        return arr if handle[1] is None else arr[: handle[1]]

    return dispatch, fetch


def host_cast_images(images, compute_dtype):
    """Cast float image arrays to bfloat16 ON THE HOST when the model
    computes in bf16 — numerically identical (the towers cast inputs to
    ``compute_dtype`` on entry, ``models/clip.py:56``) and halves the
    host->device bytes.  Non-float inputs and fp32-compute models pass
    through untouched."""
    import jax.numpy as jnp
    import numpy as np

    images = np.asarray(images)
    if compute_dtype == jnp.bfloat16 and images.dtype.kind == "f":
        import ml_dtypes

        return images.astype(ml_dtypes.bfloat16)
    return images
