"""Measurements for the remaining MFU levers (round-3 items).

Three isolated experiments on the real chip, each synchronized through a
scalar fetch (axon's ``block_until_ready`` returns at enqueue):

1. ``matmul_ceiling``: achievable bf16 TFLOP/s for (a) a deep-K matmul
   chain (the 78%-of-peak "speed of light" reference), (b) the attention
   kernel's per-head score matmul geometry ([Lp, 64] x [64, Lp] batched
   over B*H) and (c) the PV matmul ([Lp, Lp] x [Lp, 64]).  Confirms or
   refutes "K=64 contraction depth is a fundamental 50% MXU cap"
   (docs/BENCHMARKS.md round-2 open question).

2. ``adamw_tail``: the isolated 150M-param AdamW update — fp32 moments
   (current) vs bfloat16 moments with fp32 math — against the
   HBM-bandwidth floor.  Decides whether the ~6.5 ms optimizer tail is
   reducible.

3. ``zeroshot_imagenet``: the per-epoch zero-shot head rebuild at ImageNet
   scale (1000 classes x 80 templates) with the full ViT-B/16 text tower
   (`/root/reference/src/models/zeroshot.py:56-70` is the reference's
   secondary hot loop).

Usage: python -m tools.mfu_levers [matmul|adamw|zeroshot|all]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x) -> float:
    return float(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0]))


def _time(fn, *args, iters=30):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def matmul_ceiling():
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    # (a) deep-K chain at ViT-B MLP shapes — the practical matmul ceiling.
    M, K, N = 50432, 768, 3072
    a = jnp.asarray(rng.standard_normal((M, K)), dt)
    b = jnp.asarray(rng.standard_normal((K, N)), dt)
    c = jnp.asarray(rng.standard_normal((N, K)), dt)

    @jax.jit
    def chain(a, b, c):
        return a @ b @ c

    t = _time(chain, a, b, c)
    fl = 2 * M * K * N * 2
    print(f"deep-K chain [{M}x{K}x{N}]x2:    {t*1e3:7.2f} ms  {fl/t/1e12:6.1f} TFLOP/s")

    # (b) the fused kernel's score-matmul geometry: B*H independent
    # [Lp, 64] x [64, Lp] products (vision tower, batch 256: Lp=208,
    # B*H=3072).  K=64 uses half the 128-deep MXU.
    BH, Lp, hd = 3072, 208, 64
    q = jnp.asarray(rng.standard_normal((BH, Lp, hd)), dt)
    k = jnp.asarray(rng.standard_normal((BH, Lp, hd)), dt)

    @jax.jit
    def scores(q, k):
        return jnp.einsum("bld,bmd->blm", q, k, preferred_element_type=jnp.float32)

    t = _time(scores, q, k)
    fl = 2 * BH * Lp * Lp * hd
    print(f"score mm  [{Lp}x{hd}]x[{hd}x{Lp}] x{BH}: {t*1e3:7.2f} ms  {fl/t/1e12:6.1f} TFLOP/s")

    # (c) the PV matmul: K=Lp (deep), N=64 (narrow output).
    p = jnp.asarray(rng.standard_normal((BH, Lp, Lp)), dt)
    v = jnp.asarray(rng.standard_normal((BH, Lp, hd)), dt)

    @jax.jit
    def pv(p, v):
        return jnp.einsum("blm,bmd->bld", p, v, preferred_element_type=jnp.float32)

    t = _time(pv, p, v)
    fl = 2 * BH * Lp * Lp * hd
    print(f"pv mm     [{Lp}x{Lp}]x[{Lp}x{hd}] x{BH}: {t*1e3:7.2f} ms  {fl/t/1e12:6.1f} TFLOP/s")

    # (d) same score matmul with K=128 (two heads fused): does doubling the
    # contraction depth double throughput?  If yes, K=64 IS the cap.
    q2 = jnp.asarray(rng.standard_normal((BH // 2, Lp, 2 * hd)), dt)
    k2 = jnp.asarray(rng.standard_normal((BH // 2, Lp, 2 * hd)), dt)
    t = _time(jax.jit(lambda q, k: jnp.einsum("bld,bmd->blm", q, k, preferred_element_type=jnp.float32)), q2, k2)
    fl = 2 * (BH // 2) * Lp * Lp * (2 * hd)
    print(f"score mm K=128 (2 heads merged):  {t*1e3:7.2f} ms  {fl/t/1e12:6.1f} TFLOP/s")


def pallas_score_depth():
    """The in-kernel geometry question, isolated in Pallas: per-program
    sum over heads of [Lp, hd] x [hd, Lp] score matmuls, at hd=64 (the real
    kernel's shape — 50% of the 128-deep MXU) vs hd=128 (two heads merged).
    Accumulating into ONE [Lp, Lp] fp32 buffer keeps the output traffic
    identical, so the time difference is pure contraction-depth effect."""
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)
    B, Lp, D = 256, 208, 768
    q = jnp.asarray(rng.standard_normal((B, Lp, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, Lp, D)), jnp.bfloat16)

    def kernel(hd, q_ref, k_ref, o_ref):
        acc = jnp.zeros((Lp, Lp), jnp.float32)
        for h in range(D // hd):
            qh = q_ref[0, :, h * hd : (h + 1) * hd]
            kh = k_ref[0, :, h * hd : (h + 1) * hd]
            acc += jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        o_ref[0] = acc

    for hd in (64, 128, 256):
        fn = pl.pallas_call(
            functools.partial(kernel, hd),
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, Lp, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Lp, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, Lp, Lp), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, Lp, Lp), jnp.float32),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
            interpret=jax.default_backend() not in ("tpu", "axon"),
        )
        jfn = jax.jit(fn)
        t = _time(jfn, q, k)
        fl = 2 * B * Lp * Lp * D  # depth-invariant total
        print(f"pallas score depth hd={hd:3d}: {t*1e3:7.2f} ms  {fl/t/1e12:6.1f} TFLOP/s")


def row_quant():
    """Does the MXU quantize matmul ROW counts to the 16-sublane bf16 tile?

    The fused block kernels pad sequence length to 16 (``_pad_len``), so
    every row-wise matmul (QKV/out-proj/dW/dY/do) runs on G*Lp rows when
    only G*L are useful — 28% padding at ViT-B/32's L=50, 5.6% at
    ViT-B/16's 197.  Mosaic accepts exact-length blocks when the block dim
    equals the array dim, but if the hardware pads rows back to tile
    granularity internally, exact-length buys only HBM traffic, not time.
    This times the QKV projection geometry [R, 768] @ [768, 2304] for
    R in {197 (exact B/16), 200 (exact B/32 G=4), 208, 256 (padded)}:
    if time scales with R, exact-length blocks are a real lever."""
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)
    B, D, N = 256, 768, 2304
    w = jnp.asarray(rng.standard_normal((D, N)), jnp.bfloat16)

    def kernel(x_ref, w_ref, o_ref):
        o_ref[0] = jax.lax.dot_general(
            x_ref[0], w_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(o_ref.dtype)

    for R in (197, 200, 208, 256):
        x = jnp.asarray(rng.standard_normal((B, R, D)), jnp.bfloat16)
        fn = pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, R, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((D, N), lambda b: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, R, N), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, R, N), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
            interpret=jax.default_backend() not in ("tpu", "axon"),
        )
        jfn = jax.jit(fn)
        t = _time(jfn, x, w)
        fl = 2 * B * R * D * N
        print(f"row_quant R={R:3d}: {t*1e3:7.2f} ms  {fl/t/1e12:6.1f} TFLOP/s  ({t/B*1e6:6.1f} us/program)")


def adamw_tail(n_params=150_000_000):
    rng = np.random.default_rng(0)
    shape = (n_params // 1024, 1024)
    lr, b1, b2, eps, wd = 1e-5, 0.9, 0.999, 1e-8, 0.1

    def update(p, m, v, g, count, mdtype):
        g32 = g.astype(jnp.float32)
        m32 = m.astype(jnp.float32) * b1 + (1 - b1) * g32
        v32 = v.astype(jnp.float32) * b2 + (1 - b2) * g32 * g32
        mhat = m32 / (1 - b1 ** count)
        vhat = v32 / (1 - b2 ** count)
        newp = p - lr * (mhat / (jnp.sqrt(vhat) + eps) + wd * p)
        return newp, m32.astype(mdtype), v32.astype(mdtype)

    for mdtype, label in ((jnp.float32, "fp32 moments"), (jnp.bfloat16, "bf16 moments")):
        p = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        m = jnp.zeros(shape, mdtype)
        v = jnp.zeros(shape, mdtype)
        g = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
        fn = jax.jit(
            lambda p, m, v, g: update(p, m, v, g, 10, mdtype),
            donate_argnums=(0, 1, 2),
        )
        # Donated buffers: thread the state through the loop (re-passing a
        # donated array is invalid and surfaces only at transfer on axon).
        p, m, v = fn(p, m, v, g)
        _sync(p)
        iters = 20
        t0 = time.perf_counter()
        for _ in range(iters):
            p, m, v = fn(p, m, v, g)
        _sync(p)
        t = (time.perf_counter() - t0) / iters
        msz = np.dtype("float32" if mdtype == jnp.float32 else "bfloat16").itemsize
        bytes_moved = n_params * (4 + msz + msz + 2 + 4 + msz + msz)  # r: p,m,v,g  w: p,m,v
        print(f"adamw {label}: {t*1e3:6.2f} ms  ({bytes_moved/t/1e9:5.0f} GB/s apparent)")


def adamw_pallas(n_params=150_000_000):
    """The OTHER optimizer-tail lever from the round-2 verdict: a single
    Pallas kernel doing the whole AdamW update (read p,m,v,g; write p,m,v)
    with explicit block pipelining, vs XLA's fused elementwise chain.  If
    Mosaic's double-buffered DMA beats XLA's loop on this purely
    memory-bound op, the kernel is worth wiring into the trainer."""
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)
    lr, b1, b2, eps, wd = 1e-5, 0.9, 0.999, 1e-8, 0.1
    block = 2048  # rows per program: 2048*1024*4B = 8 MB fp32 blocks
    cols = 1024
    rows = n_params // cols // block * block  # grid must tile exactly
    n_params = rows * cols

    def kernel(mdtype, p_ref, m_ref, v_ref, g_ref, np_ref, nm_ref, nv_ref):
        g32 = g_ref[:].astype(jnp.float32)
        m32 = m_ref[:].astype(jnp.float32) * b1 + (1 - b1) * g32
        v32 = v_ref[:].astype(jnp.float32) * b2 + (1 - b2) * g32 * g32
        mhat = m32 / (1 - b1 ** 10)
        vhat = v32 / (1 - b2 ** 10)
        p = p_ref[:]
        np_ref[:] = p - lr * (mhat / (jnp.sqrt(vhat) + eps) + wd * p)
        nm_ref[:] = m32.astype(mdtype)
        nv_ref[:] = v32.astype(mdtype)

    for mdtype, label in ((jnp.float32, "fp32 moments"), (jnp.bfloat16, "bf16 moments")):
        p = jnp.asarray(rng.standard_normal((rows, cols)), jnp.float32)
        m = jnp.zeros((rows, cols), mdtype)
        v = jnp.zeros((rows, cols), mdtype)
        g = jnp.asarray(rng.standard_normal((rows, cols)), jnp.bfloat16)
        blk = lambda dt: pl.BlockSpec((block, cols), lambda i: (i, 0), memory_space=pltpu.VMEM)
        fn = pl.pallas_call(
            functools.partial(kernel, mdtype),
            grid=(rows // block,),
            in_specs=[blk(jnp.float32), blk(mdtype), blk(mdtype), blk(jnp.bfloat16)],
            out_specs=[blk(jnp.float32), blk(mdtype), blk(mdtype)],
            out_shape=[
                jax.ShapeDtypeStruct((rows, cols), jnp.float32),
                jax.ShapeDtypeStruct((rows, cols), mdtype),
                jax.ShapeDtypeStruct((rows, cols), mdtype),
            ],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=128 * 1024 * 1024),
            interpret=jax.default_backend() not in ("tpu", "axon"),
        )
        jfn = jax.jit(fn, donate_argnums=(0, 1, 2))
        print(f"adamw pallas {label}: compiling...", flush=True)
        p, m, v = jfn(p, m, v, g)
        _sync(p)
        iters = 20
        t0 = time.perf_counter()
        for _ in range(iters):
            p, m, v = jfn(p, m, v, g)
        _sync(p)
        t = (time.perf_counter() - t0) / iters
        msz = np.dtype("float32" if mdtype == jnp.float32 else "bfloat16").itemsize
        bytes_moved = n_params * (4 + msz + msz + 2 + 4 + msz + msz)
        print(f"adamw pallas {label}: {t*1e3:6.2f} ms  ({bytes_moved/t/1e9:5.0f} GB/s apparent)")


def zeroshot_imagenet():
    from flyp_tpu.evaluation.zeroshot import class_embeddings, get_zeroshot_classifier
    from flyp_tpu.models import CLIPModel, MODEL_CONFIGS, init_clip_variables
    from flyp_tpu.templates import get_template

    on_tpu = jax.default_backend() in ("tpu", "axon")
    model = CLIPModel(MODEL_CONFIGS["ViT-B/16"], compute_dtype=jnp.bfloat16 if on_tpu else jnp.float32)
    variables = init_clip_variables(model, 0)
    template = get_template("openai_imagenet_template")
    classnames = [f"class number {i}" for i in range(1000)]

    t0 = time.perf_counter()
    head = get_zeroshot_classifier(model, variables, classnames, template, encode_batch=2048)
    _ = float(np.asarray(head.weight[0, 0]))
    t_total = time.perf_counter() - t0
    # Second build reuses the cached jitted encoder — the steady-state
    # per-epoch cost (`flyp_loss.py:601` runs this every epoch).
    t0 = time.perf_counter()
    head = get_zeroshot_classifier(model, variables, classnames, template, encode_batch=2048)
    _ = float(np.asarray(head.weight[0, 0]))
    t_steady = time.perf_counter() - t0
    # Tokenize-only share (host-side, cached nothing).
    from flyp_tpu.tokenizer import tokenize

    t0 = time.perf_counter()
    tokenize([t(n) for n in classnames[:100] for t in template])
    t_tok = (time.perf_counter() - t0) * 10
    print(
        f"zero-shot head 1000x80 (ViT-B/16): first {t_total:.1f} s (incl compile), "
        f"steady {t_steady:.1f} s/epoch, of which host tokenize ~{t_tok:.1f} s"
    )


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("matmul", "all"):
        matmul_ceiling()
    if which in ("depth", "all"):
        pallas_score_depth()
    if which in ("row_quant", "all"):
        row_quant()
    if which in ("adamw", "all"):
        adamw_tail()
    if which in ("adamw_pallas", "all"):
        adamw_pallas()
    if which in ("zeroshot", "all"):
        zeroshot_imagenet()
