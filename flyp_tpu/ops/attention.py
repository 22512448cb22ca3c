"""Multi-head attention dispatch: Pallas flash kernel on TPU, XLA fallback.

CLIP sequences are short and static (197 vision / 77 text tokens), so
attention is a throughput concern, not a memory one (SURVEY.md §5).  The XLA
path is a straightforward fused softmax-attention that XLA schedules well on
the MXU; the Pallas path (``flyp_tpu.ops.flash_attention``) tiles the fused
kernel explicitly and is used automatically on TPU backends for supported
shapes.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp

# "xla" | "pallas" | "pallas_qkv" | "pallas_block" | "pallas_block_mlp" |
# "auto" (resolves to "pallas_block" on TPU — the measured default; the
# *_block values are consumed by models/layers.py, which fuses the whole
# residual sub-block, so multi_head_attention itself treats them as XLA).
_IMPL_ENV = "FLYP_ATTENTION_IMPL"


@functools.lru_cache()
def _default_impl() -> str:
    choice = os.environ.get(_IMPL_ENV, "auto")
    if choice != "auto":
        return choice
    # Measured on v5e (batch 256 ViT-B/16 train step, docs/BENCHMARKS.md):
    # the whole-sub-block kernel (LN1+QKV+attention+out-proj+residual,
    # 'pallas_block') hits 63.1% MFU vs 58.4% for the fused-QKV kernel and
    # 43.8% for XLA attention.
    try:
        if jax.default_backend() in ("tpu", "axon"):
            return "pallas_block"
    except Exception:  # pragma: no cover
        pass
    return "xla"


def xla_attention(q: jax.Array, k: jax.Array, v: jax.Array, causal: bool) -> jax.Array:
    """Reference attention: fp32 softmax, bf16-friendly matmuls.

    Args are ``[B, L, H, Dh]``; returns the same layout.
    """
    head_dim = q.shape[-1]
    scale = head_dim ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    if causal:
        L = q.shape[1]
        mask = jnp.tril(jnp.ones((L, L), dtype=bool))
        logits = jnp.where(mask[None, None], logits, jnp.float32(-jnp.inf))
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v, preferred_element_type=jnp.float32).astype(q.dtype)


def multi_head_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    causal: bool = False,
    impl: Optional[str] = None,
) -> jax.Array:
    """Self-attention over ``[B, L, H, Dh]`` tensors.

    ``impl``: "pallas" forces the Pallas flash kernel, "xla" the plain path;
    default follows ``FLYP_ATTENTION_IMPL`` or auto-selects by backend.
    """
    impl = impl or _default_impl()
    if impl == "pallas":
        try:
            from flyp_tpu.ops.flash_attention import flash_attention

            # positional: custom_vjp nondiff args must not be keywords
            return flash_attention(q, k, v, causal, False)
        except NotImplementedError:
            pass  # unsupported shape — fall through to XLA
    return xla_attention(q, k, v, causal)
