"""Pallas TPU flash-attention kernel (fused QK^T -> softmax -> PV).

Placeholder in this milestone: raises ``NotImplementedError`` so the
dispatcher falls back to the XLA path.  The real kernel lands with the perf
pass (SURVEY.md §7 stage 9).
"""

from __future__ import annotations

import jax


def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array, causal: bool = False) -> jax.Array:
    raise NotImplementedError("pallas flash attention not yet implemented")
