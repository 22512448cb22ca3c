"""Pallas TPU fused attention for CLIP's short, static sequences.

CLIP attention is 197 (vision) or 77 (text) tokens with head_dim 64 — a
whole head's Q/K/V/S/P fits in VMEM, so unlike long-context flash attention
no online-softmax streaming is needed (SURVEY.md §5: "a perf item, not a
scaling item").  Each grid step computes one (batch, head) attention
entirely on-chip: S = QK^T, masked fp32 softmax, O = PV — the [L, L] score
matrix never touches HBM.  The custom VJP recomputes S/P in the backward
kernel (flash-style rematerialization), so the backward pass also avoids
HBM round-trips for the score tensors.

Layout contract: inputs are [B, L, H, D] (as produced by the fused-QKV
projection); the kernel runs over a [B*H, Lp, D] view with L padded to the
sublane tile and masks padded key columns to -inf.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30

# A whole head must fit in VMEM several times over; CLIP's 197 is far below.
MAX_SEQ_LEN = 1024

# One source of truth for the tile/mask helpers: a tile-size or mask fix in
# fused_qkv_attention must not silently diverge from this variant.
from flyp_tpu.ops.fused_qkv_attention import _mask, _pad_len  # noqa: E402


def _fwd_kernel(L: int, causal: bool, scale: float, q_ref, k_ref, v_ref, o_ref):
    # Each program owns a [G, Lp, D] group of heads; loop the group so the
    # per-head matmuls stay MXU-shaped while grid/DMA overhead amortizes.
    G = q_ref.shape[0]
    for g in range(G):
        q = q_ref[g]
        k = k_ref[g]
        v = v_ref[g]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        p = jax.nn.softmax(_mask(s, L, causal), axis=-1)
        o_ref[g] = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(o_ref.dtype)


def _bwd_kernel(L: int, causal: bool, scale: float, q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref):
    G = q_ref.shape[0]
    for g in range(G):
        q = q_ref[g]
        k = k_ref[g]
        v = v_ref[g]
        do = do_ref[g]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        p = jax.nn.softmax(_mask(s, L, causal), axis=-1)

        p_cast = p.astype(v.dtype)
        dv_ref[g] = jax.lax.dot_general(
            p_cast, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(dv_ref.dtype)

        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        # dS = P * (dP - rowsum(P * dP)); the rowsum equals rowsum(dO * O).
        ds = p * (dp - jnp.sum(p * dp, axis=-1, keepdims=True))
        ds = (ds * scale).astype(q.dtype)

        dq_ref[g] = jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(dq_ref.dtype)
        dk_ref[g] = jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(dk_ref.dtype)


def _group_size(bh: int, Lp: int, D: int, dtype) -> int:
    """Heads per program: amortize grid overhead while keeping the group's
    q/k/v/o + one [Lp, Lp] score block comfortably inside ~16MB VMEM."""
    itemsize = 2 if dtype == jnp.bfloat16 else 4
    per_head = 4 * Lp * D * itemsize + Lp * Lp * 4
    # Mosaic double-buffers every input/output block; leave most of the 16MB
    # VMEM for that pipeline (observed: a 24-head group overflows by ~1MB).
    budget = 2 * 1024 * 1024
    g = max(1, budget // max(per_head, 1))
    g = min(g, 16)
    while g > 1 and bh % g:
        g -= 1
    return g


def _flat_call(kernel, n_out, bh, Lp, D, dtype, *args, interpret=False):
    G = _group_size(bh, Lp, D, dtype)
    spec = pl.BlockSpec((G, Lp, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(bh // G,),
        in_specs=[spec] * len(args),
        out_specs=[spec] * n_out if n_out > 1 else spec,
        out_shape=(
            [jax.ShapeDtypeStruct((bh, Lp, D), dtype)] * n_out
            if n_out > 1
            else jax.ShapeDtypeStruct((bh, Lp, D), dtype)
        ),
        interpret=interpret,
    )(*args)


def _to_flat(x: jax.Array, Lp: int) -> jax.Array:
    """[B, L, H, D] -> [B*H, Lp, D] with zero padding."""
    B, L, H, D = x.shape
    x = jnp.transpose(x, (0, 2, 1, 3)).reshape(B * H, L, D)
    if Lp != L:
        x = jnp.pad(x, ((0, 0), (0, Lp - L), (0, 0)))
    return x


def _from_flat(x: jax.Array, B: int, H: int, L: int) -> jax.Array:
    x = x[:, :L].reshape(B, H, L, -1)
    return jnp.transpose(x, (0, 2, 1, 3))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_attention(q, k, v, causal: bool = False, interpret: bool = False):
    """Fused attention over [B, L, H, D]; returns the same layout."""
    out, _ = _fwd(q, k, v, causal, interpret)
    return out


def _fwd(q, k, v, causal, interpret):
    B, L, H, D = q.shape
    if L > MAX_SEQ_LEN:
        raise NotImplementedError(f"sequence {L} exceeds single-block VMEM budget")
    if k.shape[1] != L:
        # Cross-attention (e.g. the RN attnpool's 1-row query against 50
        # keys): the kernel pads k/v to the QUERY's padded length, so
        # unequal lengths would request a negative pad.  Signal unsupported
        # so multi_head_attention falls through to the XLA path.
        raise NotImplementedError("flash_attention requires equal q/k lengths (self-attention)")
    scale = D ** -0.5
    Lp = _pad_len(L, q.dtype)
    qf, kf, vf = (_to_flat(t, Lp) for t in (q, k, v))
    of = _flat_call(
        functools.partial(_fwd_kernel, L, causal, scale),
        1, B * H, Lp, D, q.dtype, qf, kf, vf, interpret=interpret,
    )
    return _from_flat(of, B, H, L), (q, k, v)


def _bwd(causal, interpret, residuals, g):
    q, k, v = residuals
    B, L, H, D = q.shape
    scale = D ** -0.5
    Lp = _pad_len(L, q.dtype)
    qf, kf, vf, dof = (_to_flat(t, Lp) for t in (q, k, v, g))
    dqf, dkf, dvf = _flat_call(
        functools.partial(_bwd_kernel, L, causal, scale),
        3, B * H, Lp, D, q.dtype, qf, kf, vf, dof, interpret=interpret,
    )
    return tuple(_from_flat(t, B, H, L) for t in (dqf, dkf, dvf))


flash_attention.defvjp(_fwd, _bwd)
