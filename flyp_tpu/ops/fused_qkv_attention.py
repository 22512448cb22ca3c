"""Pallas attention consuming the fused QKV projection directly.

Motivation (measured, docs/BENCHMARKS.md): the flattened per-head kernel
beats XLA on the *inner* attention (11.5 vs 14.4 ms fwd+bwd at ViT-B/16
shapes) yet loses end-to-end, because the custom-vjp boundary forces the
``split -> reshape -> [B*H, L, D] transpose`` chain around it to
materialize in HBM.  This kernel moves the boundary outward: input is the
raw ``[B, L, 3*D]`` fused-projection output, heads are sliced inside the
kernel (64-lane static slices), and the output is the merged ``[B, L, D]``
ready for the out-projection — no head reshapes or splits ever reach HBM,
and the backward emits a single fused ``dqkv``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.custom_partitioning import custom_partitioning
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import NamedSharding, PartitionSpec as P

_NEG_INF = -1e30


def _pad_len(L: int, dtype) -> int:
    tile = 16 if dtype == jnp.bfloat16 else 8
    return ((L + tile - 1) // tile) * tile


def _mask(s: jax.Array, L: int, causal: bool) -> jax.Array:
    Lp = s.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, (Lp, Lp), 1)
    keep = col < L
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (Lp, Lp), 0)
        keep = jnp.logical_and(keep, col <= row)
    return jnp.where(keep, s, _NEG_INF)


def _row_zero(x: jax.Array, L: int) -> jax.Array:
    rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    return jnp.where(rows < L, x, jnp.zeros_like(x))


def _heads(qkv_ref, D: int, head_dim: int, h: int):
    q = qkv_ref[0, :, h * head_dim : (h + 1) * head_dim]
    k = qkv_ref[0, :, D + h * head_dim : D + (h + 1) * head_dim]
    v = qkv_ref[0, :, 2 * D + h * head_dim : 2 * D + (h + 1) * head_dim]
    return q, k, v


def _softmax_p(q, k, L, causal, scale):
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    return jax.nn.softmax(_mask(s, L, causal), axis=-1)


def _fwd_kernel(L: int, H: int, causal: bool, scale: float, qkv_ref, o_ref):
    D = o_ref.shape[-1]
    head_dim = D // H
    for h in range(H):
        q, k, v = _heads(qkv_ref, D, head_dim, h)
        p = _row_zero(_softmax_p(q, k, L, causal, scale), L)
        v = _row_zero(v, L)
        o_ref[0, :, h * head_dim : (h + 1) * head_dim] = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(o_ref.dtype)


def _bwd_kernel(L: int, H: int, causal: bool, scale: float, qkv_ref, do_ref, dqkv_ref):
    D = do_ref.shape[-1]
    head_dim = D // H
    for h in range(H):
        q, k, v = _heads(qkv_ref, D, head_dim, h)
        q = _row_zero(q, L)
        k = _row_zero(k, L)
        v = _row_zero(v, L)
        do = _row_zero(do_ref[0, :, h * head_dim : (h + 1) * head_dim], L)

        p = _row_zero(_softmax_p(q, k, L, causal, scale), L)
        p_cast = p.astype(v.dtype)

        dv = jax.lax.dot_general(
            p_cast, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - jnp.sum(p * dp, axis=-1, keepdims=True))
        ds = (ds * scale).astype(q.dtype)

        dq = jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dk = jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dqkv_ref[0, :, h * head_dim : (h + 1) * head_dim] = dq.astype(dqkv_ref.dtype)
        dqkv_ref[0, :, D + h * head_dim : D + (h + 1) * head_dim] = dk.astype(dqkv_ref.dtype)
        dqkv_ref[0, :, 2 * D + h * head_dim : 2 * D + (h + 1) * head_dim] = dv.astype(dqkv_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def fused_qkv_attention(qkv, heads: int, causal: bool = False, interpret: bool = False):
    """[B, L, 3D] fused projection -> [B, L, D] merged attention output."""
    out, _ = _fwd(qkv, heads, causal, interpret)
    return out


def _fwd_call(qkv, heads, causal, interpret):
    B, L, threeD = qkv.shape
    D = threeD // 3
    head_dim = D // heads
    scale = head_dim ** -0.5
    Lp = _pad_len(L, qkv.dtype)

    spec_in = pl.BlockSpec((1, Lp, threeD), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    spec_out = pl.BlockSpec((1, Lp, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, L, heads, causal, scale),
        grid=(B,),
        in_specs=[spec_in],
        out_specs=spec_out,
        out_shape=jax.ShapeDtypeStruct((B, L, D), qkv.dtype),
        interpret=interpret,
    )(qkv)


def _bwd_call(qkv, g, heads, causal, interpret):
    B, L, threeD = qkv.shape
    D = threeD // 3
    head_dim = D // heads
    scale = head_dim ** -0.5
    Lp = _pad_len(L, qkv.dtype)

    spec_in = pl.BlockSpec((1, Lp, threeD), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    spec_do = pl.BlockSpec((1, Lp, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, L, heads, causal, scale),
        grid=(B,),
        in_specs=[spec_in, spec_do],
        out_specs=spec_in,
        out_shape=jax.ShapeDtypeStruct((B, L, threeD), qkv.dtype),
        interpret=interpret,
    )(qkv, g)


def _batch_sharding(mesh, arg_shapes, nargs):
    """NamedShardings keeping dim-0 (batch) sharding, replicating the rest.

    The kernel slices heads from the full feature axis and needs whole rows,
    so GSPMD must gather any model-axis (feature) or length sharding; the
    batch axis stays sharded and the grid runs over the local batch."""
    spec = arg_shapes[0].sharding.spec
    b = spec[0] if len(spec) else None
    return tuple(NamedSharding(mesh, P(b, None, None)) for _ in range(nargs))


@functools.lru_cache()
def _partitioned(kind: str, heads: int, causal: bool, interpret: bool):
    """GSPMD-partitionable wrapper around the fwd/bwd pallas call.

    Makes the kernel transparent to pjit/TP sharding (VERDICT round-1 item:
    TP runs used to pin attention to XLA because the custom call was opaque
    to the partitioner): batch-dim sharding passes through; length/feature
    shardings are declared need-replication so the partitioner inserts the
    gathers instead of failing."""
    if kind == "fwd":
        impl = lambda qkv: _fwd_call(qkv, heads, causal, interpret)
        rule = "b l x -> b l y"
        nargs = 1
    else:
        impl = lambda qkv, g: _bwd_call(qkv, g, heads, causal, interpret)
        rule = "b l x, b l y -> b l x"
        nargs = 2

    f = custom_partitioning(impl)

    def partition(mesh, arg_shapes, result_shape):
        shardings = _batch_sharding(mesh, arg_shapes, nargs)
        return mesh, impl, shardings[0], shardings

    def infer(mesh, arg_shapes, result_shape):
        return _batch_sharding(mesh, arg_shapes, 1)[0]

    f.def_partition(
        partition,
        infer_sharding_from_operands=infer,
        sharding_rule=rule,
        need_replication_factors=("l", "x", "y"),
    )
    return f


def _fwd(qkv, heads, causal, interpret):
    if jax.device_count() > 1:
        out = _partitioned("fwd", heads, causal, interpret)(qkv)
    else:
        out = _fwd_call(qkv, heads, causal, interpret)
    return out, (qkv,)


def _bwd(heads, causal, interpret, residuals, g):
    (qkv,) = residuals
    if jax.device_count() > 1:
        dqkv = _partitioned("bwd", heads, causal, interpret)(qkv, g)
    else:
        dqkv = _bwd_call(qkv, g, heads, causal, interpret)
    return (dqkv,)


fused_qkv_attention.defvjp(_fwd, _bwd)
