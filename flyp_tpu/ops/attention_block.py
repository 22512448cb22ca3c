"""Fully-fused pre-LN attention block: LN1 + QKV projection + attention +
out-projection + residual in one Pallas kernel.

Round-1 measurement (docs/BENCHMARKS.md): widening the kernel boundary from
per-head attention to the raw fused-QKV projection bought 43.8% -> 58.4%
MFU because the boundary traffic, not the kernel body, dominated.  This
kernel widens the boundary again: the *only* HBM traffic per layer forward
is the residual-stream read, the weights, and two [B, L, D] writes (block
output + the attention output ``o`` saved for the out-projection backward).
The LayerNorm fp32 island (`/root/reference/clip/model.py:155-161`), the
[B, L, 3D] QKV projection, and the per-head attention all stay in VMEM.

Backward splits once: the out-projection grads are two clean XLA matmuls
over the saved ``o``; everything upstream (attention bwd, dqkv, the fused
dW/db/dscale/dbias accumulations across the sequential grid, and the
LayerNorm backward) runs in a second Pallas kernel.  The only recomputes
are cheap by construction: LN from ``x`` (VPU), and the probability
matrix from the saved ``qkv`` + per-(row, head) log-sum-exp stats — one
score matmul and one exp, no softmax max/sum/div passes.

Tensor parallelism (round 3): the QKV weight is ``[3, D, D]`` — the last
axis is head-major output features, so sharding it over the mesh's
``model`` axis IS head-group TP.  The ``custom_partitioning`` rules
detect that sharding and run the SAME kernels per shard with
``H_local = H / n`` heads (every per-head quantity — o, lse, saved qkv,
do, dqkv, dwqkv — shards along its head-major axis with the weights); the
only cross-shard communication is one psum of the partial out-projection
in forward and one psum of the (linear-in-dY) LayerNorm backward outputs.
No weight is ever all-gathered.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flyp_tpu.ops.fused_qkv_attention import _pad_len, _row_zero

_EPS = 1e-5


def _items_per_program(B: int, L: int) -> int:
    """Grid programs per kernel = B / G.  Short sequences (the 77-token text
    tower) leave per-item programs overhead-dominated — batch 4 items per
    program there; vision (197 tokens) stays at 1 (measured twice: text
    G=8 == G=4 and vision G=2 == G=1 within noise — per-program overhead
    is already amortized, so keep the lower-VMEM config)."""
    G = 4 if L <= 96 else 1
    while G > 1 and B % G:
        G //= 2
    return G


def _row_zero_flat(x, L, Lp):
    """Zero padding rows of a [G*Lp, ...] flattened stack (rows r with
    r mod Lp >= L)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0) % Lp
    return jnp.where(rows < L, x, jnp.zeros_like(x))


def _mask_bias(Lp: int, L: int, causal: bool) -> jax.Array:
    """Additive score mask, built once per program and reused across the
    head/item loops: one add per score matrix instead of iota+compare+where
    per head.  -1e30 keeps exp() at exactly 0 after max-subtraction."""
    col = jax.lax.broadcasted_iota(jnp.int32, (Lp, Lp), 1)
    keep = col < L
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (Lp, Lp), 0)
        keep = jnp.logical_and(keep, col <= row)
    return jnp.where(keep, 0.0, _NEG).astype(jnp.float32)


_NEG = -1e30


def _softmax_masked(q_scaled, k, bias):
    """Softmax over pre-scaled query scores (sm_scale folded into q: an
    [L, head_dim] multiply instead of an [L, L] one)."""
    s = jax.lax.dot_general(q_scaled, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    return jax.nn.softmax(s + bias, axis=-1)


def _layer_norm(x32, scale_ref, bias_ref):
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + _EPS)
    xhat = (x32 - mean) * rstd
    y32 = xhat * scale_ref[0, :] + bias_ref[0, :]
    return xhat, rstd, y32


def _project_towers(y, wqkv_ref, bqkv_ref, L, Lp, out_dtype):
    """Per-tower QKV projection: three ``[G*Lp, D] @ [D, Dv]`` matmuls from
    the ``[3, D, Dv]`` weight.  Splitting the fused ``[D, 3Dv]`` matmul into
    three keeps the weight in its tile-perfect storage layout — the old
    ``[D, 3, Dv]`` param put a size-3 next-to-minor dim into the XLA layout
    and every use/grad/Adam-moment re-laid it out with physical copies
    (measured ~12 ms/step on ViT-L bs64 remat, tools/layout_copies.py).
    MXU geometry is unchanged: K=D depth, N=Dv>=384 per product.

    Row-zeroing the padding rows here makes the additive mask NaN-safe
    (block padding reads are undefined; a NaN k row would poison valid
    rows through the softmax row-max)."""
    outs = []
    for t in range(3):
        p = (
            jax.lax.dot_general(y, wqkv_ref[t], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
            + bqkv_ref[t, :]
        ).astype(out_dtype)
        outs.append(_row_zero_flat(p, L, Lp))
    return outs


def _fwd_kernel(L, H, G, causal, scale, partial, x_ref, g_ref, b_ref, wqkv_ref, bqkv_ref, wout_ref, bout_ref, out_ref, o_ref, q_ref, k_ref, v_ref, lse_ref):
    # D = residual-stream width; Dv = per-tower (q/k/v) inner width.  They
    # differ under head-group TP, where this program holds H = H_global/n
    # heads and Dv = D/n columns of each tower.
    D = x_ref.shape[-1]
    Dv = wqkv_ref.shape[-1]
    Lp = x_ref.shape[1]
    head_dim = Dv // H
    xf = x_ref[:].reshape(G * Lp, D)  # G items flattened: big row-wise matmuls
    _, _, y32 = _layer_norm(xf.astype(jnp.float32), g_ref, b_ref)
    y = y32.astype(xf.dtype)
    qf, kf, vf = _project_towers(y, wqkv_ref, bqkv_ref, L, Lp, xf.dtype)
    # Saved for backward: re-deriving qkv there would cost a full extra
    # matmul per layer (measured: it cancels the fusion win entirely).
    # Three SEPARATE [B, L, Dv] arrays: a fused [B, L, 3, Dv] save puts a
    # size-3 next-to-minor dim into the XLA layout, which re-layouts with
    # physical copies at every remat/consumer boundary (measured: -11%
    # end-to-end on ViT-L) — and a [B, L, 3Dv] save cannot express
    # head-group sharding.  Per-tower arrays have standard layouts AND
    # dim-shard over heads.
    q_ref[:] = qf.reshape(G, Lp, Dv)
    k_ref[:] = kf.reshape(G, Lp, Dv)
    v_ref[:] = vf.reshape(G, Lp, Dv)
    # sm_scale folded into q once ([G*Lp, Dv] pass) — no [L, L] scale pass
    # per head.  The saved lse is relative to the SCALED scores; the
    # backward pre-scales q the same way.
    qsf = qf * scale
    # No per-head row-zeroing needed: masked score COLUMNS are exactly 0
    # after softmax, and every padding ROW of o/out is dropped when the
    # block writes back to the unpadded [B, L, D] arrays.
    bias = _mask_bias(Lp, L, causal)
    for g in range(G):
        rows = slice(g * Lp, (g + 1) * Lp)
        qs, k_g, v_g = qsf[rows], kf[rows], vf[rows]
        lse_cols = []
        for h in range(H):
            hs = slice(h * head_dim, (h + 1) * head_dim)
            k = k_g[:, hs]
            v = v_g[:, hs]
            q = qs[:, hs]
            # Late renormalization + saved log-sum-exp: the [L, L] division
            # becomes an [L, head_dim] scale, and the backward reconstructs
            # p with a single exp instead of a full softmax recompute.
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
            s = s + bias
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            l = jnp.sum(e, axis=-1, keepdims=True)
            lse_cols.append(m + jnp.log(l))
            o_ref[g, :, h * head_dim : (h + 1) * head_dim] = (
                jax.lax.dot_general(
                    e.astype(xf.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
                )
                / l
            ).astype(o_ref.dtype)
        lse_ref[g] = jnp.concatenate(lse_cols, axis=1)
    of = o_ref[:].reshape(G * Lp, Dv)
    proj = jax.lax.dot_general(of, wout_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    if partial:
        # Head-sharded TP: this program's projection covers only its head
        # group's rows of Wout.  The residual x and bout are added ONCE,
        # after the cross-shard psum, by the partition lowering.
        out_ref[:] = proj.astype(out_ref.dtype).reshape(G, Lp, D)
    else:
        out_ref[:] = (xf.astype(jnp.float32) + proj + bout_ref[0, :]).astype(out_ref.dtype).reshape(G, Lp, D)


def _bwd_kernel(
    L, H, G, causal, scale, add_g,
    x_ref, gout_ref, q_ref, k_ref, v_ref, lse_ref, g_ref, b_ref, wqkv_ref,
    wout_ref, dx_ref, dwqkv_ref, dbqkv_ref, dg_ref, db_ref, dq_scr, dk_scr, dv_scr,
):
    D = x_ref.shape[-1]
    Dv = q_ref.shape[-1]
    Lp = x_ref.shape[1]
    head_dim = Dv // H
    sm_scale = scale
    b_idx = pl.program_id(0)

    @pl.when(b_idx == 0)
    def _():
        dwqkv_ref[:] = jnp.zeros_like(dwqkv_ref)
        dbqkv_ref[:] = jnp.zeros_like(dbqkv_ref)
        dg_ref[:] = jnp.zeros_like(dg_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    xf = x_ref[:].reshape(G * Lp, D)
    xhat, rstd, y32 = _layer_norm(xf.astype(jnp.float32), g_ref, b_ref)
    y = _row_zero_flat(y32, L, Lp).astype(xf.dtype)

    # do = g @ Wout^T computed IN-KERNEL from the block's incoming
    # gradient (K=D contraction, good MXU depth): the [B, L, Dv] `do`
    # array never round-trips through HBM (measured -4.5 ms/step at
    # ViT-B/16 batch 256; neutral under remat once the saved residuals
    # carry standard layouts — docs/BENCHMARKS.md round 3).  Row-zeroing
    # g up front zeroes every do row.
    goutf = _row_zero_flat(gout_ref[:].reshape(G * Lp, D).astype(xf.dtype), L, Lp)
    dof = jax.lax.dot_general(
        goutf, wout_ref[:], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(xf.dtype)

    # Attention backward (same math as fused_qkv_attention._bwd_kernel),
    # assembling the fused dqkv for all G items in a VMEM scratch.
    # Only `do` needs row-zeroing (done above via g): with do's padding rows
    # at 0, dv/dk lose their garbage contributions through the row
    # contraction, ds's padding rows vanish (dp rows are 0), and p's masked
    # COLUMNS (exact softmax zeros) kill the padding rows of k/v elsewhere.
    bias = _mask_bias(Lp, L, causal)
    for g in range(G):
        # Zero the block-padding rows (undefined reads) once per item —
        # NaN-safety for the additive mask, see the forward kernel.
        q_g = _row_zero(q_ref[g], L)
        k_g = _row_zero(k_ref[g], L)
        v_g = _row_zero(v_ref[g], L)
        lse = _row_zero(lse_ref[g].astype(jnp.float32), L)
        do_f = dof[g * Lp : (g + 1) * Lp]
        # sm_scale folded into q (see forward): scaled scores match the
        # saved lse directly, and no [L, L] scale pass exists in ds either.
        qs = q_g * sm_scale
        row0 = g * Lp
        for h in range(H):
            hs = slice(h * head_dim, (h + 1) * head_dim)
            k = k_g[:, hs]
            v = v_g[:, hs]
            q = qs[:, hs]
            do = do_f[:, hs]

            # p from the forward-saved log-sum-exp: one exp instead of a
            # full softmax recompute (max/sum/div passes gone).
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
            p = jnp.exp(s + bias - lse[:, h : h + 1])
            p_cast = p.astype(xf.dtype)
            dv = jax.lax.dot_general(p_cast, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
            dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
            # NOTE: the flash-attention delta identity (sum_j p_ij dp_ij ==
            # sum_d do_id o_id over the saved forward output) was measured
            # here and LOST ~1 MFU point: the extra [B, L, D] o read per
            # layer (~1.2 GB/step) outweighs the removed [L, L] VPU passes,
            # which overlap MXU work anyway (docs/BENCHMARKS.md).
            ds = (p * (dp - jnp.sum(p * dp, axis=-1, keepdims=True))).astype(xf.dtype)
            # dq w.r.t. the RAW q carries sm_scale on the [L, head_dim]
            # result; dk contracts against the pre-scaled q (same algebra).
            dq = (
                jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
                * sm_scale
            )
            dk = jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
            dq_scr[row0 : row0 + Lp, hs] = dq.astype(dq_scr.dtype)
            dk_scr[row0 : row0 + Lp, hs] = dk.astype(dk_scr.dtype)
            dv_scr[row0 : row0 + Lp, hs] = dv.astype(dv_scr.dtype)

    # Weight/bias grads accumulate across the sequential batch grid, one
    # [D, Dv] product per tower against the [3, D, Dv] storage layout
    # (see _project_towers for why the fused [D, 3Dv] form is gone).
    dY = None
    for t, scr in enumerate((dq_scr, dk_scr, dv_scr)):
        dt = scr[:]
        dwqkv_ref[t] += jax.lax.dot_general(
            y, dt, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dbqkv_ref[0, t * Dv : (t + 1) * Dv] += jnp.sum(dt.astype(jnp.float32), axis=0)
        # Back through the projection: dY = sum_t d_t @ W_t^T.  Under TP dY
        # is PARTIAL (this shard's head-group columns of Wqkv); everything
        # below — dg, db, dxhat, dx — is linear in dY, so the partition
        # lowering simply psums these outputs over the model axis.
        dYt = jax.lax.dot_general(dt, wqkv_ref[t], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        dY = dYt if dY is None else dY + dYt
    dY = _row_zero_flat(dY, L, Lp)
    xhat = _row_zero_flat(xhat, L, Lp)
    dg_ref[0, :] += jnp.sum(dY * xhat, axis=0)
    db_ref[0, :] += jnp.sum(dY, axis=0)

    dxhat = dY * g_ref[0, :]
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx = rstd * (dxhat - m1 - xhat * m2)
    if add_g:
        # Residual path: dx_total = g + dx_ln, folded here so no separate
        # XLA pass re-reads g.  Skipped under TP (add_g=False): each shard's
        # dx is partial over features, and g must be added ONCE after the
        # cross-shard psum.
        dx = dx + goutf.astype(jnp.float32)
    dx_ref[:] = _row_zero_flat(dx, L, Lp).astype(dx_ref.dtype).reshape(G, Lp, D)


def _fwd_infer_kernel(L, H, G, causal, scale, partial, x_ref, g_ref, b_ref, wqkv_ref, bqkv_ref, wout_ref, bout_ref, out_ref, o_scr):
    """Inference forward: same math as _fwd_kernel, but the backward
    residuals (qkv, o) are never written to HBM — o assembles in scratch."""
    D = x_ref.shape[-1]
    Dv = wqkv_ref.shape[-1]
    Lp = x_ref.shape[1]
    head_dim = Dv // H
    xf = x_ref[:].reshape(G * Lp, D)
    _, _, y32 = _layer_norm(xf.astype(jnp.float32), g_ref, b_ref)
    y = y32.astype(xf.dtype)
    qf, kf, vf = _project_towers(y, wqkv_ref, bqkv_ref, L, Lp, xf.dtype)
    qsf = qf * scale
    bias = _mask_bias(Lp, L, causal)
    for g in range(G):
        rows = slice(g * Lp, (g + 1) * Lp)
        qs, k_g, v_g = qsf[rows], kf[rows], vf[rows]
        row0 = g * Lp
        for h in range(H):
            hs = slice(h * head_dim, (h + 1) * head_dim)
            k, v = k_g[:, hs], v_g[:, hs]
            p = _softmax_masked(qs[:, hs], k, bias)
            o_scr[row0 : row0 + Lp, h * head_dim : (h + 1) * head_dim] = jax.lax.dot_general(
                p.astype(xf.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            ).astype(o_scr.dtype)
    proj = jax.lax.dot_general(o_scr[:], wout_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    if partial:
        out_ref[:] = proj.astype(out_ref.dtype).reshape(G, Lp, D)
    else:
        out_ref[:] = (xf.astype(jnp.float32) + proj + bout_ref[0, :]).astype(out_ref.dtype).reshape(G, Lp, D)


def _fwd_infer_call(x, ln_scale, ln_bias, wqkv, bqkv, wout, bout, heads, causal, interpret, partial_out=False):
    B, L, D = x.shape
    Dv = wqkv.shape[-1]
    Lp = _pad_len(L, x.dtype)
    G = _items_per_program(B, L)
    row = lambda b: (b, 0, 0)
    const2 = lambda b: (0, 0)
    const3 = lambda b: (0, 0, 0)
    specs = [
        pl.BlockSpec((G, Lp, D), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, D), const2, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, D), const2, memory_space=pltpu.VMEM),
        pl.BlockSpec((3, D, Dv), const3, memory_space=pltpu.VMEM),
        pl.BlockSpec((3, Dv), const2, memory_space=pltpu.VMEM),
        pl.BlockSpec((Dv, D), const2, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, D), const2, memory_space=pltpu.VMEM),
    ]
    head_dim = Dv // heads
    return pl.pallas_call(
        functools.partial(_fwd_infer_kernel, L, heads, G, causal, head_dim ** -0.5, partial_out),
        grid=(B // G,),
        in_specs=specs,
        out_specs=pl.BlockSpec((G, Lp, D), row, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, L, D), jnp.float32 if partial_out else x.dtype),
        scratch_shapes=[pltpu.VMEM((G * Lp, Dv), x.dtype)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(
        x,
        ln_scale.reshape(1, D).astype(jnp.float32),
        ln_bias.reshape(1, D).astype(jnp.float32),
        wqkv.astype(x.dtype),
        bqkv.astype(jnp.float32),
        wout.astype(x.dtype),
        bout.reshape(1, D).astype(jnp.float32),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def attention_block_inference(x, ln_scale, ln_bias, qkv_kernel, qkv_bias, out_kernel, out_bias,
                              heads: int, causal: bool = False, interpret: bool = False):
    """attention_block without the backward-residual HBM writes (~4x less
    forward output traffic).  Still differentiable: the backward simply
    re-runs the training forward to regenerate (qkv, o) — eval-side grad
    consumers (fisher, CE ablation) stay correct at a small recompute
    cost, while pure inference (the per-epoch eval harness, zero-shot
    head builds) never pays for residuals."""
    out, _ = _infer_fwd(x, ln_scale, ln_bias, qkv_kernel, qkv_bias, out_kernel, out_bias,
                        heads, causal, interpret)
    return out


def _infer_fwd(x, ln_scale, ln_bias, wqkv, bqkv, wout, bout, heads, causal, interpret):
    if jax.device_count() > 1:
        out = _partitioned("fwd_infer", heads, wqkv.shape[-1] // heads, causal, interpret)(
            x, ln_scale, ln_bias, wqkv, bqkv, wout, bout
        )
    else:
        out = _fwd_infer_call(x, ln_scale, ln_bias, wqkv, bqkv, wout, bout, heads, causal, interpret)
    return out, (x, ln_scale, ln_bias, wqkv, bqkv, wout)


def _infer_bwd(heads, causal, interpret, residuals, g):
    x, ln_scale, ln_bias, wqkv, bqkv, wout = residuals
    # Regenerate the residuals with the training forward, then reuse its
    # backward wholesale (dbout = sum g is independent of bout's value).
    bout_zero = jnp.zeros((x.shape[-1],), jnp.float32)
    _, full_residuals = _block_fwd(
        x, ln_scale, ln_bias, wqkv, bqkv, wout, bout_zero, heads, causal, interpret
    )
    return _block_bwd(heads, causal, interpret, full_residuals, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def attention_block(x, ln_scale, ln_bias, qkv_kernel, qkv_bias, out_kernel, out_bias,
                    heads: int, causal: bool = False, interpret: bool = False):
    """``x + out_proj(attention(LN(x) @ Wqkv + bqkv))`` as one fused op.

    ``x`` is ``[B, L, D]``; weights are the CLIP block params (fp32 in the
    tree, cast to the activation dtype for the MXU).  ``qkv_kernel`` is
    ``[3, D, D]`` / ``qkv_bias`` ``[3, D]`` — q|k|v on the leading axis
    (tile-clean last-two dims; a middle size-3 axis forces XLA layout
    copies on every use, grad, and Adam moment), head-major features on
    the last, so the ``model`` mesh axis dim-shards it into head groups
    (see module docstring).

    The backward computes ``do = g @ Wout^T`` (and the residual g-add)
    inside the kernel — measured -4.5 ms/step at ViT-B/16 bs256 and
    neutral under per-block rematerialization (docs/BENCHMARKS.md
    round 3)."""
    out, _ = _block_fwd(x, ln_scale, ln_bias, qkv_kernel, qkv_bias, out_kernel, out_bias,
                        heads, causal, interpret)
    return out


def _fwd_call(x, ln_scale, ln_bias, wqkv, bqkv, wout, bout, heads, causal, interpret, partial_out=False):
    B, L, D = x.shape
    Dv = wqkv.shape[-1]
    Lp = _pad_len(L, x.dtype)
    G = _items_per_program(B, L)
    row = lambda b: (b, 0, 0)
    const2 = lambda b: (0, 0)
    const3 = lambda b: (0, 0, 0)
    specs = [
        pl.BlockSpec((G, Lp, D), row, memory_space=pltpu.VMEM),        # x
        pl.BlockSpec((1, D), const2, memory_space=pltpu.VMEM),         # ln scale
        pl.BlockSpec((1, D), const2, memory_space=pltpu.VMEM),         # ln bias
        pl.BlockSpec((3, D, Dv), const3, memory_space=pltpu.VMEM),     # Wqkv
        pl.BlockSpec((3, Dv), const2, memory_space=pltpu.VMEM),        # bqkv
        pl.BlockSpec((Dv, D), const2, memory_space=pltpu.VMEM),        # Wout
        pl.BlockSpec((1, D), const2, memory_space=pltpu.VMEM),         # bout
    ]
    out_specs = [
        pl.BlockSpec((G, Lp, D), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((G, Lp, Dv), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((G, Lp, Dv), row, memory_space=pltpu.VMEM),   # saved q
        pl.BlockSpec((G, Lp, Dv), row, memory_space=pltpu.VMEM),   # saved k
        pl.BlockSpec((G, Lp, Dv), row, memory_space=pltpu.VMEM),   # saved v
        pl.BlockSpec((G, Lp, heads), row, memory_space=pltpu.VMEM),  # lse stats
    ]
    head_dim = Dv // heads
    out, o, q, k, v, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, L, heads, G, causal, head_dim ** -0.5, partial_out),
        grid=(B // G,),
        in_specs=specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((B, L, D), jnp.float32 if partial_out else x.dtype),
            jax.ShapeDtypeStruct((B, L, Dv), x.dtype),
            jax.ShapeDtypeStruct((B, L, Dv), x.dtype),
            jax.ShapeDtypeStruct((B, L, Dv), x.dtype),
            jax.ShapeDtypeStruct((B, L, Dv), x.dtype),
            jax.ShapeDtypeStruct((B, L, heads), jnp.float32),
        ],
        # ~20-35MB resident with G-batched blocks + fp32 accumulators;
        # the 16MB Mosaic default is a soft limit (measured: 36MB-resident
        # kernels run fine on v5e).
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(
        x,
        ln_scale.reshape(1, D).astype(jnp.float32),
        ln_bias.reshape(1, D).astype(jnp.float32),
        wqkv.astype(x.dtype),
        bqkv.astype(jnp.float32),
        wout.astype(x.dtype),
        bout.reshape(1, D).astype(jnp.float32),
    )
    # Saved q/k/v leave as three separate [B, L, Dv] arrays (standard XLA
    # layouts — a fused [B, L, 3, Dv] save re-layouts with physical copies
    # at remat boundaries); each dim-shards head-major under TP.
    return out, o, q, k, v, lse


def _block_fwd(x, ln_scale, ln_bias, wqkv, bqkv, wout, bout, heads, causal, interpret):
    from jax.ad_checkpoint import checkpoint_name

    if jax.device_count() > 1:
        out, o, q, k, v, lse = _partitioned("fwd", heads, wqkv.shape[-1] // heads, causal, interpret)(
            x, ln_scale, ln_bias, wqkv, bqkv, wout, bout
        )
    else:
        out, o, q, k, v, lse = _fwd_call(x, ln_scale, ln_bias, wqkv, bqkv, wout, bout, heads, causal, interpret)
    # Checkpoint-name tags let a remat policy (layers.Transformer) SAVE the
    # kernel's backward residuals instead of re-running the whole fused
    # forward under rematerialization: with these pinned, the only per-block
    # recompute left is the cheap LN2+fc entry of the MLP.  Identity when no
    # policy is active.
    out = checkpoint_name(out, "attn_block_out")
    o = checkpoint_name(o, "attn_block_o")
    q = checkpoint_name(q, "attn_block_q")
    k = checkpoint_name(k, "attn_block_k")
    v = checkpoint_name(v, "attn_block_v")
    lse = checkpoint_name(lse, "attn_block_lse")
    return out, (x, ln_scale, ln_bias, wqkv, wout, o, q, k, v, lse)


def _bwd_call(x, gout, q, k, v, lse, ln_scale, ln_bias, wqkv, wout, heads, causal, interpret,
              add_g=True):
    B, L, D = x.shape
    Dv = wqkv.shape[-1]
    Lp = _pad_len(L, x.dtype)
    G = _items_per_program(B, L)
    row = lambda b: (b, 0, 0)
    const2 = lambda b: (0, 0)
    const3 = lambda b: (0, 0, 0)
    in_specs = [
        pl.BlockSpec((G, Lp, D), row, memory_space=pltpu.VMEM),        # x
        pl.BlockSpec((G, Lp, D), row, memory_space=pltpu.VMEM),        # g (block output grad)
        pl.BlockSpec((G, Lp, Dv), row, memory_space=pltpu.VMEM),       # q (fwd-saved)
        pl.BlockSpec((G, Lp, Dv), row, memory_space=pltpu.VMEM),       # k (fwd-saved)
        pl.BlockSpec((G, Lp, Dv), row, memory_space=pltpu.VMEM),       # v (fwd-saved)
        pl.BlockSpec((G, Lp, heads), row, memory_space=pltpu.VMEM),    # lse (fwd-saved)
        pl.BlockSpec((1, D), const2, memory_space=pltpu.VMEM),         # ln scale
        pl.BlockSpec((1, D), const2, memory_space=pltpu.VMEM),         # ln bias
        pl.BlockSpec((3, D, Dv), const3, memory_space=pltpu.VMEM),     # Wqkv
        pl.BlockSpec((Dv, D), const2, memory_space=pltpu.VMEM),        # Wout
    ]
    out_specs = [
        pl.BlockSpec((G, Lp, D), row, memory_space=pltpu.VMEM),        # dx
        pl.BlockSpec((3, D, Dv), const3, memory_space=pltpu.VMEM),     # dWqkv
        pl.BlockSpec((1, 3 * Dv), const2, memory_space=pltpu.VMEM),    # dbqkv
        pl.BlockSpec((1, D), const2, memory_space=pltpu.VMEM),         # dscale
        pl.BlockSpec((1, D), const2, memory_space=pltpu.VMEM),         # dbias
    ]
    head_dim = Dv // heads
    args = [
        x,
        gout,
        q,
        k,
        v,
        lse,
        ln_scale.reshape(1, D).astype(jnp.float32),
        ln_bias.reshape(1, D).astype(jnp.float32),
        wqkv.astype(x.dtype),
        wout.astype(x.dtype),
    ]
    dx, dwqkv, dbqkv, dscale, dbias = pl.pallas_call(
        functools.partial(_bwd_kernel, L, heads, G, causal, head_dim ** -0.5, add_g),
        grid=(B // G,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((B, L, D), x.dtype),
            jax.ShapeDtypeStruct((3, D, Dv), jnp.float32),
            jax.ShapeDtypeStruct((1, 3 * Dv), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((G * Lp, Dv), x.dtype),
            pltpu.VMEM((G * Lp, Dv), x.dtype),
            pltpu.VMEM((G * Lp, Dv), x.dtype),
        ],
        # ~20-35MB resident with G-batched blocks + fp32 accumulators;
        # the 16MB Mosaic default is a soft limit (measured: 36MB-resident
        # kernels run fine on v5e).
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    return dx, dwqkv, dbqkv.reshape(3, Dv), dscale, dbias


def _spec_dim(arg_shapes, i, dim):
    spec = arg_shapes[i].sharding.spec
    return spec[dim] if len(spec) > dim else None


def _spec_dim0(arg_shapes):
    return _spec_dim(arg_shapes, 0, 0)


def _axes_tuple(a):
    if a is None:
        return ()
    return a if isinstance(a, tuple) else (a,)


def _axes_size(mesh, a) -> int:
    n = 1
    for ax in _axes_tuple(a):
        n *= mesh.shape[ax]
    return n


def _named(mesh, spec):
    from jax.sharding import NamedSharding

    return NamedSharding(mesh, spec)


def _force_shardings(mesh, b, shapes, batch_flags):
    """Batch-dim sharding where flagged, replication everywhere else (the
    [3, D, D] weight is rank-3 but NOT batch-led, so rank is no signal)."""
    from jax.sharding import PartitionSpec as P

    out = []
    for s, is_batch in zip(shapes, batch_flags):
        rank = len(s.shape)
        spec = P(b, *([None] * (rank - 1))) if is_batch else P(*([None] * rank))
        out.append(_named(mesh, spec))
    return tuple(out)


# Which operands/results carry the batch on dim 0, per kernel kind.
_BATCH_ARGS = {
    "fwd": (True, False, False, False, False, False, False),
    "fwd_infer": (True, False, False, False, False, False, False),
    "bwd": (True, True, True, True, True, True, False, False, False, False),
}
_BATCH_RES = {
    "fwd": (True, True, True, True, True, True),
    "fwd_infer": (True,),
    "bwd": (True, False, False, False, False),
}


# Shardy rules: 'b' ties the rank>=3 batch dims (passthrough), and 'h' —
# shared between the head-major feature axes (Wqkv/bqkv last dim, Wout
# rows, o/do features, saved qkv features) and the lse head axis — carries
# head-group tensor-parallel sharding through the op.  'i' (head_dim, the
# minor sub-factor of every '(h i)' compound) and every f/l/t factor are
# need-replication: GSPMD gathers any length/stream-feature sharding, but
# head shards stay put.
_FWD_RULE = (
    "b l1 f1, f2, f3, t1 f4 (h i), t2 (h i), (h i) f5, f6 "
    "-> b l2 f7, b l3 (h i), b l4 (h i), b l5 (h i), b l6 (h i), b l7 h"
)
_FWD_INFER_RULE = "b l1 f1, f2, f3, t1 f4 (h i), t2 (h i), (h i) f5, f6 -> b l2 f7"
_BWD_RULE = (
    "b l1 f1, b l2 f9, b l3 (h i), b l4 (h i), b l5 (h i), b l6 h, "
    "f2, f3, t2 f4 (h i), (h i) f10 "
    "-> b l7 f5, t3 f6 (h i), t4 (h i), c1 f7, c2 f8"
)


def _factors(rule):
    # Shardy requires special-factor indices sorted by first appearance.
    # 'b' (batch) and 'h' (head groups) are passthrough — everything else
    # needs replication.
    seen = []
    for t in rule.replace(",", " ").replace("->", " ").replace("(", " ").replace(")", " ").split():
        if t not in ("b", "h") and t not in seen:
            seen.append(t)
    return tuple(seen)


@functools.lru_cache()
def _partitioned(kind: str, heads: int, head_dim: int, causal: bool, interpret: bool):
    """GSPMD/Shardy-partitionable wrappers.

    Batch sharding passes through (each data shard runs the kernel on its
    rows).  When the ``[3, D, D]`` QKV weight's last axis is sharded over a
    mesh axis (head-group TP, `parallel/tp.py`), the lowering runs the
    kernels with ``H/n`` local heads per shard — no weight all-gather; the
    forward psums the partial out-projection, the backward psums the
    (linear-in-dY) LayerNorm outputs.  Otherwise params and length/feature
    dims replicate, and the backward's weight/bias grads are psum-reduced
    over the batch axes."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import PartitionSpec as P

    def model_axes(mesh, arg_shapes, wqkv_index):
        m = _spec_dim(arg_shapes, wqkv_index, 2)
        n = _axes_size(mesh, m)
        if n <= 1 or heads % n != 0:
            return None, 1
        return m, n

    if kind in ("fwd", "fwd_infer"):
        call = _fwd_call if kind == "fwd" else _fwd_infer_call
        impl = lambda *a: call(*a, heads, causal, interpret)

        single = kind == "fwd_infer"

        def tp_results(mesh, b, m):
            if single:
                return _named(mesh, P(b, None, None))
            return (
                _named(mesh, P(b, None, None)),        # out (replicated features)
                _named(mesh, P(b, None, m)),           # o (head-major features)
                _named(mesh, P(b, None, m)),           # saved q
                _named(mesh, P(b, None, m)),           # saved k
                _named(mesh, P(b, None, m)),           # saved v
                _named(mesh, P(b, None, m)),           # lse (head axis)
            )

        def partition(mesh, arg_shapes, result_shape):
            b = _spec_dim0(arg_shapes)
            m, n = model_axes(mesh, arg_shapes, wqkv_index=3)
            res = [result_shape] if single else result_shape
            if m is None:
                args_sh = _force_shardings(mesh, b, arg_shapes, _BATCH_ARGS[kind])
                res_sh = _force_shardings(mesh, b, res, _BATCH_RES[kind])
                return mesh, impl, (res_sh[0] if single else res_sh), args_sh

            args_sh = (
                _named(mesh, P(b, None, None)),    # x
                _named(mesh, P(None)),             # ln scale
                _named(mesh, P(None)),             # ln bias
                _named(mesh, P(None, None, m)),    # Wqkv — head groups
                _named(mesh, P(None, m)),          # bqkv
                _named(mesh, P(m, None)),          # Wout — head-group rows
                _named(mesh, P(None)),             # bout
            )
            Hl = heads // n

            def lower(x, ln_s, ln_b, wqkv, bqkv, wout, bout):
                r = call(x, ln_s, ln_b, wqkv, bqkv, wout, bout, Hl, causal, interpret, partial_out=True)
                partial = r if single else r[0]
                proj = jax.lax.psum(partial, _axes_tuple(m))
                out = (x.astype(jnp.float32) + proj + bout).astype(x.dtype)
                return out if single else (out,) + tuple(r[1:])

            return mesh, lower, tp_results(mesh, b, m), args_sh

        def infer(mesh, arg_shapes, result_shape):
            b = _spec_dim0(arg_shapes)
            m, _ = model_axes(mesh, arg_shapes, wqkv_index=3)
            if m is not None:
                return tp_results(mesh, b, m)
            res = [result_shape] if single else result_shape
            sh = _force_shardings(mesh, b, res, _BATCH_RES[kind])
            return sh[0] if single else sh

    else:

        def impl(*a):
            return _bwd_call(*a, heads, causal, interpret)

        def tp_results(mesh, b, m):
            return (
                _named(mesh, P(b, None, None)),     # dx
                _named(mesh, P(None, None, m)),     # dWqkv stays sharded
                _named(mesh, P(None, m)),           # dbqkv
                _named(mesh, P(None, None)),        # dscale
                _named(mesh, P(None, None)),        # dbias
            )

        def partition(mesh, arg_shapes, result_shape):
            b = _spec_dim0(arg_shapes)
            m, n = model_axes(mesh, arg_shapes, wqkv_index=8)
            if m is None:
                args_sh = _force_shardings(mesh, b, arg_shapes, _BATCH_ARGS["bwd"])
                res_sh = _force_shardings(mesh, b, result_shape, _BATCH_RES["bwd"])

                def lower(*args):
                    dx, dwqkv, dbqkv, dscale, dbias = _bwd_call(*args, heads, causal, interpret)
                    if b is not None:
                        dwqkv, dbqkv, dscale, dbias = jax.lax.psum(
                            (dwqkv, dbqkv, dscale, dbias), axis_name=b
                        )
                    return dx, dwqkv, dbqkv, dscale, dbias

                return mesh, lower, res_sh, args_sh

            args_sh = (
                _named(mesh, P(b, None, None)),        # x
                _named(mesh, P(b, None, None)),        # g (full stream width)
                _named(mesh, P(b, None, m)),           # saved q
                _named(mesh, P(b, None, m)),           # saved k
                _named(mesh, P(b, None, m)),           # saved v
                _named(mesh, P(b, None, m)),           # lse
                _named(mesh, P(None)),                 # ln scale
                _named(mesh, P(None)),                 # ln bias
                _named(mesh, P(None, None, m)),        # Wqkv
                _named(mesh, P(m, None)),              # Wout — head-group rows
            )
            Hl = heads // n

            def lower(x, gout, q, k, v, lse, ln_s, ln_b, wqkv, wout):
                # add_g=False: each shard's dx is partial over features (its
                # head group's dY contribution); g is added ONCE after the
                # cross-shard psum.
                dx_ln, dwqkv, dbqkv, dscale, dbias = _bwd_call(
                    x, gout, q, k, v, lse, ln_s, ln_b, wqkv, wout, Hl, causal, interpret, add_g=False
                )
                # dWqkv/dbqkv are complete over this shard's heads; reduce
                # over batch shards only (they STAY model-sharded, like the
                # weights).  The LN outputs are partial over features
                # (linear in the partial dY) — psum over the model axes too.
                if b is not None:
                    dwqkv, dbqkv = jax.lax.psum((dwqkv, dbqkv), axis_name=b)
                ln_axes = _axes_tuple(b) + _axes_tuple(m)
                dscale, dbias = jax.lax.psum((dscale, dbias), axis_name=ln_axes)
                dx_ln = jax.lax.psum(dx_ln, axis_name=_axes_tuple(m))
                dx = (gout.astype(jnp.float32) + dx_ln.astype(jnp.float32)).astype(x.dtype)
                return dx, dwqkv, dbqkv, dscale, dbias

            return mesh, lower, tp_results(mesh, b, m), args_sh

        def infer(mesh, arg_shapes, result_shape):
            b = _spec_dim0(arg_shapes)
            m, _ = model_axes(mesh, arg_shapes, wqkv_index=8)
            if m is not None:
                return tp_results(mesh, b, m)
            return _force_shardings(mesh, b, result_shape, _BATCH_RES["bwd"])

    rule = {"fwd": _FWD_RULE, "fwd_infer": _FWD_INFER_RULE, "bwd": _BWD_RULE}[kind]
    f = custom_partitioning(impl)
    factor_sizes = {"i": head_dim}
    if kind == "fwd_infer":
        # 'h' appears only inside compound factors here, so its size must be
        # given explicitly (elsewhere the lse head axis determines it).
        factor_sizes["h"] = heads
    f.def_partition(
        partition,
        infer_sharding_from_operands=infer,
        sharding_rule=rule,
        need_replication_factors=_factors(rule),
        **factor_sizes,
    )
    return f


def _block_bwd(heads, causal, interpret, residuals, g):
    x, ln_scale, ln_bias, wqkv, wout, o, q, k, v, lse = residuals
    B, L, D = x.shape

    # Out-projection weight/bias grads: plain XLA matmuls over the saved
    # `o` (the per-program K=208 in-kernel dWout contraction was measured
    # SLOWER — MXU depth quantization; docs/BENCHMARKS.md round 2).  Under
    # TP these partition automatically (o/wout are head-sharded; dwout's
    # contraction is over the replicated batch+length dims).  `do` is
    # computed inside the backward kernel (deep K=D contraction) so it
    # never round-trips through HBM, and the kernel folds the residual
    # `g +` into dx.
    g32 = g.astype(jnp.float32)
    dwout = jnp.einsum("bld,ble->de", o.astype(jnp.float32), g32)
    dbout = jnp.sum(g32, axis=(0, 1))

    if jax.device_count() > 1:
        dx, dwqkv, dbqkv, dscale, dbias = _partitioned(
            "bwd", heads, wqkv.shape[-1] // heads, causal, interpret
        )(x, g, q, k, v, lse, ln_scale, ln_bias, wqkv, wout)
    else:
        dx, dwqkv, dbqkv, dscale, dbias = _bwd_call(
            x, g, q, k, v, lse, ln_scale, ln_bias, wqkv, wout, heads, causal, interpret
        )

    return (
        dx,
        dscale.reshape(ln_scale.shape).astype(ln_scale.dtype),
        dbias.reshape(ln_bias.shape).astype(ln_bias.dtype),
        dwqkv.astype(wqkv.dtype),
        dbqkv,  # [3, D] float32, matching the bqkv param
        dwout.astype(wout.dtype),
        dbout,  # [D] float32, matching the bout param
    )


attention_block.defvjp(_block_fwd, _block_bwd)
attention_block_inference.defvjp(_infer_fwd, _infer_bwd)
