"""Fused pre-LN MLP block forward: LN2 + c_fc + QuickGELU + c_proj +
residual in one Pallas kernel.

Forward-only fusion: the kernel keeps the LayerNorm output and the 4x
hidden activations in VMEM (the XLA path materializes both in HBM between
ops), writing only the block output and the pre-activation ``h_pre``
residual.  The backward is deliberately plain XLA — its dominant costs are
the two weight-grad matmuls, which XLA already runs near the practical
matmul ceiling, and fusing them in-kernel would need ~19 MB of fp32
accumulators (over VMEM).  Lesson applied from the attention-block kernel:
never re-derive a projection in backward; ``h_pre`` is saved, not
recomputed.

Numerics match `flyp_tpu/models/layers.py` MLP + LayerNormFp32 (fp32 LN
island, QuickGELU in the activation dtype; `clip/model.py:155-179`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flyp_tpu.ops.fused_qkv_attention import _pad_len


def _ln(x32, scale, bias):
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + 1e-5)
    xhat = (x32 - mean) * rstd
    return xhat, rstd, xhat * scale + bias


def _quick_gelu(x):
    # fp32 island: Mosaic rejects the f32-scalar * bf16-vector broadcast,
    # and the sigmoid is more accurate in fp32 anyway.
    x32 = x.astype(jnp.float32)
    return (x32 * jax.nn.sigmoid(1.702 * x32)).astype(x.dtype)


def _fwd_kernel(x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref, hpre_ref):
    # Every op is row-wise, so the (G, Lp, D) block flattens to one stack of
    # rows — G items per program share the big matmuls.
    G, Lp, D = x_ref.shape
    Hd = w1_ref.shape[1]
    x = x_ref[:].reshape(G * Lp, D)
    _, _, y32 = _ln(x.astype(jnp.float32), g_ref[0, :], b_ref[0, :])
    y = y32.astype(x.dtype)
    hpre = (
        jax.lax.dot_general(y, w1_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        + b1_ref[0, :]
    ).astype(x.dtype)
    hpre_ref[:] = hpre.reshape(G, Lp, Hd)
    h = _quick_gelu(hpre)
    proj = (
        jax.lax.dot_general(h, w2_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        + b2_ref[0, :]
    )
    out_ref[:] = (x.astype(jnp.float32) + proj).astype(out_ref.dtype).reshape(G, Lp, D)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def mlp_block(x, ln_scale, ln_bias, fc_kernel, fc_bias, proj_kernel, proj_bias, interpret: bool = False):
    """``x + c_proj(quick_gelu(c_fc(LN(x))))`` as one fused forward op."""
    out, _ = _mlp_fwd(x, ln_scale, ln_bias, fc_kernel, fc_bias, proj_kernel, proj_bias, interpret)
    return out


def _fwd_call(x, ln_scale, ln_bias, w1, b1, w2, b2, interpret):
    from flyp_tpu.ops.attention_block import _items_per_program

    B, L, D = x.shape
    Hd = w1.shape[1]
    Lp = _pad_len(L, x.dtype)
    G = _items_per_program(B, L)
    row = lambda b: (b, 0, 0)
    const2 = lambda b: (0, 0)
    out, hpre = pl.pallas_call(
        _fwd_kernel,
        grid=(B // G,),
        in_specs=[
            pl.BlockSpec((G, Lp, D), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, Hd), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hd), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((Hd, D), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), const2, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((G, Lp, D), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((G, Lp, Hd), row, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, L, D), x.dtype),
            jax.ShapeDtypeStruct((B, L, Hd), x.dtype),
        ],
        interpret=interpret,
    )(
        x,
        ln_scale.reshape(1, D).astype(jnp.float32),
        ln_bias.reshape(1, D).astype(jnp.float32),
        w1.astype(x.dtype),
        b1.reshape(1, Hd).astype(jnp.float32),
        w2.astype(x.dtype),
        b2.reshape(1, D).astype(jnp.float32),
    )
    return out, hpre


# Same partitioning treatment as the attention block: batch passthrough,
# everything else replicated.
_FWD_RULE = "b f1 f2, f3, f4, f5 f6, f7, f8 f9, f10 -> b f11 f12, b f13 f14"


def _factors(rule):
    seen = []
    for t in rule.replace(",", " ").replace("->", " ").split():
        if t != "b" and t not in seen:
            seen.append(t)
    return tuple(seen)


# Which operands/results carry the batch on dim 0 (x; out, hpre) — the
# weights/LN params are replicated, like the attention block's tables.
_BATCH_ARGS = (True, False, False, False, False, False, False)
_BATCH_RES = (True, True)


@functools.lru_cache()
def _partitioned(interpret: bool):
    from jax.experimental.custom_partitioning import custom_partitioning

    from flyp_tpu.ops.attention_block import _force_shardings, _spec_dim0

    impl = lambda *a: _fwd_call(*a, interpret)

    def partition(mesh, arg_shapes, result_shape):
        b = _spec_dim0(arg_shapes)
        return (
            mesh,
            impl,
            _force_shardings(mesh, b, result_shape, _BATCH_RES),
            _force_shardings(mesh, b, arg_shapes, _BATCH_ARGS),
        )

    def infer(mesh, arg_shapes, result_shape):
        return _force_shardings(mesh, _spec_dim0(arg_shapes), result_shape, _BATCH_RES)

    f = custom_partitioning(impl)
    f.def_partition(
        partition,
        infer_sharding_from_operands=infer,
        sharding_rule=_FWD_RULE,
        need_replication_factors=_factors(_FWD_RULE),
    )
    return f


def _mlp_fwd(x, ln_scale, ln_bias, w1, b1, w2, b2, interpret):
    if jax.device_count() > 1:
        out, hpre = _partitioned(interpret)(x, ln_scale, ln_bias, w1, b1, w2, b2)
    else:
        out, hpre = _fwd_call(x, ln_scale, ln_bias, w1, b1, w2, b2, interpret)
    return out, (x, ln_scale, ln_bias, w1, w2, hpre)


def _mlp_bwd(interpret, residuals, g):
    x, ln_scale, ln_bias, w1, w2, hpre = residuals

    # Recompute the cheap VPU pieces; all matmuls are fresh XLA dots.
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + 1e-5)
    xhat = (x32 - mean) * rstd
    y = (xhat * ln_scale + ln_bias).astype(x.dtype)

    sig = jax.nn.sigmoid(1.702 * hpre.astype(jnp.float32))
    h = (hpre.astype(jnp.float32) * sig).astype(x.dtype)
    dgelu = (sig * (1.0 + 1.702 * hpre.astype(jnp.float32) * (1.0 - sig))).astype(x.dtype)

    g32 = g.astype(jnp.float32)
    dw2 = jnp.einsum("blh,bld->hd", h.astype(jnp.float32), g32)
    db2 = jnp.sum(g32, axis=(0, 1))
    dh = jnp.einsum("bld,hd->blh", g, w2.astype(g.dtype))
    dhpre = dh * dgelu

    dhpre32 = dhpre.astype(jnp.float32)
    dw1 = jnp.einsum("bld,blh->dh", y.astype(jnp.float32), dhpre32)
    db1 = jnp.sum(dhpre32, axis=(0, 1))
    dY = jnp.einsum("blh,dh->bld", dhpre32, w1.astype(jnp.float32))

    dscale = jnp.sum(dY * xhat, axis=(0, 1))
    dbias = jnp.sum(dY, axis=(0, 1))
    dxhat = dY * ln_scale
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx = (g32 + rstd * (dxhat - m1 - xhat * m2)).astype(x.dtype)

    return (
        dx,
        dscale.astype(ln_scale.dtype),
        dbias.astype(ln_bias.dtype),
        dw1.astype(w1.dtype),
        db1,
        dw2.astype(w2.dtype),
        db2,
    )


mlp_block.defvjp(_mlp_fwd, _mlp_bwd)
