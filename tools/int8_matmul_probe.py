"""Is int8 worth building a quantized serving path for on this chip?

The v5e MXU's int8 peak is ~394 TOPS vs 197 bf16 TFLOP/s.  Before building
weight/activation quantization into the serving forward
(tools/serving_bench.py), measure whether XLA's `dot_general` on int8
operands (int32 accumulation) actually delivers the 2× at the exact matmul
shapes the ViT-B/16 serving path runs — and how much dynamic activation
quantization (abs-max scale + round + cast, the cheapest scheme) eats.

Rates are reported as effective TOP/s = 2*M*N*K / time, so bf16 and int8
columns are directly comparable.

Usage: python -m tools.int8_matmul_probe [batch]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _time(fn, *args, iters=50):
    out = fn(*args)
    _ = float(jax.device_get(out.ravel()[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jax.device_get(out.ravel()[0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def main(batch=256):
    # ViT-B/16 serving shapes: M = batch * padded seq (208).
    M = batch * 208
    shapes = [
        ("qkv  [M,768]x[768,2304]", M, 768, 2304),
        ("out  [M,768]x[768,768]", M, 768, 768),
        ("mlp1 [M,768]x[768,3072]", M, 768, 3072),
        ("mlp2 [M,3072]x[3072,768]", M, 3072, 768),
    ]
    rng = np.random.default_rng(0)
    print(f"{'shape':28s} {'bf16':>10s} {'int8':>10s} {'int8+dq':>10s}   (TOP/s; dq = dynamic act quant)")
    for name, m, k, n in shapes:
        a16 = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
        b16 = jnp.asarray(rng.standard_normal((k, n)), jnp.bfloat16)
        a8 = jnp.asarray(rng.integers(-127, 127, (m, k)), jnp.int8)
        b8 = jnp.asarray(rng.integers(-127, 127, (k, n)), jnp.int8)
        flops = 2.0 * m * k * n

        f_bf16 = jax.jit(lambda a, b: jax.lax.dot(a, b, preferred_element_type=jnp.float32))
        f_int8 = jax.jit(lambda a, b: jax.lax.dot(a, b, preferred_element_type=jnp.int32))

        def f_dq(a, b, scale_b):
            # per-tensor dynamic abs-max quant of the activation, int8 matmul,
            # fp32 dequant — the cheapest serving-quant recipe.
            s = jnp.max(jnp.abs(a)).astype(jnp.float32) / 127.0
            a_q = jnp.clip(jnp.round(a.astype(jnp.float32) / s), -127, 127).astype(jnp.int8)
            acc = jax.lax.dot(a_q, b, preferred_element_type=jnp.int32)
            return acc.astype(jnp.float32) * (s * scale_b)

        t_bf16 = _time(f_bf16, a16, b16)
        t_int8 = _time(f_int8, a8, b8)
        t_dq = _time(jax.jit(f_dq), a16, b8, jnp.float32(0.01))
        print(
            f"{name:28s} {flops / t_bf16 / 1e12:10.1f} {flops / t_int8 / 1e12:10.1f}"
            f" {flops / t_dq / 1e12:10.1f}   (ms: {t_bf16*1e3:.2f} / {t_int8*1e3:.2f} / {t_dq*1e3:.2f})",
            flush=True,
        )


def _pallas_mm(a, b, out_dtype, bm=512, bn=512, interpret=False):
    """Plain blocked GEMM through Mosaic: one (bm, K)x(K, bn) dot per grid
    program, full-depth contraction (no k-loop — K<=3072 fits VMEM).  Used
    to check whether the MXU's int8 path is reachable when WE emit the dot,
    independent of XLA's int8 lowering."""
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M, K = a.shape
    _, N = b.shape
    # Block dims must TILE the array exactly — a truncating grid silently
    # skips the ragged tail and inflates the reported rate (caught by a
    # non-divisible verify shape; tests/test_tools.py pins it).
    def _tiling_block(dim, cap, align, axis):
        c = next((c for c in range(min(cap, dim), 0, -1) if dim % c == 0 and (c % align == 0 or c == dim)), None)
        if c is None:
            raise ValueError(f"_pallas_mm: no {align}-aligned tiling block for {axis}={dim} (cap {cap})")
        return c

    bm = _tiling_block(M, bm, 8, "M")
    bn = _tiling_block(N, bn, 128, "N")

    def kernel(a_ref, b_ref, o_ref):
        o_ref[...] = jnp.dot(a_ref[...], b_ref[...], preferred_element_type=out_dtype)

    return pl.pallas_call(
        kernel,
        grid=(M // bm, N // bn),
        in_specs=[
            pl.BlockSpec((bm, K), lambda i, j: (i, 0)),
            pl.BlockSpec((K, bn), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(a, b)


def main_pallas(batch=256):
    """int8 vs bf16 through a hand-written Mosaic GEMM at the best (qkv) and
    worst (out-proj) shapes from the XLA probe."""
    interpret = jax.default_backend() == "cpu"
    if interpret:
        # Functional check only: interpreted GEMMs at probe scale take hours.
        batch = min(batch, 2)
    M = batch * 208
    rng = np.random.default_rng(0)
    print(f"{'shape':28s} {'bf16-pallas':>12s} {'int8-pallas':>12s}   (TOP/s)")
    # big-square is the ceiling probe: if 2x int8 is reachable at ALL on this
    # chip, it shows here; the serving shapes then tell how much survives.
    shapes = [("qkv  [M,768]x[768,2304]", M, 768, 2304),
              ("out  [M,768]x[768,768]", M, 768, 768),
              ("big  [16384,4096]x[4096,4096]", 16384, 4096, 4096)]
    if interpret:
        shapes = shapes[:2]
    for name, m, k, n in shapes:
        a16 = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
        b16 = jnp.asarray(rng.standard_normal((k, n)), jnp.bfloat16)
        a8 = jnp.asarray(rng.integers(-127, 127, (m, k)), jnp.int8)
        b8 = jnp.asarray(rng.integers(-127, 127, (k, n)), jnp.int8)
        flops = 2.0 * m * k * n
        f16 = jax.jit(lambda a, b: _pallas_mm(a, b, jnp.float32, interpret=interpret))
        f8 = jax.jit(lambda a, b: _pallas_mm(a, b, jnp.int32, interpret=interpret))
        # correctness guard (tiny slice, exact in int32)
        ref = np.asarray(a8[:8].astype(np.int32)) @ np.asarray(b8[:, :128].astype(np.int32))
        got = np.asarray(jax.device_get(f8(a8, b8)))[:8, :128]
        assert np.array_equal(ref, got), "pallas int8 GEMM mismatch"
        t16 = _time(f16, a16, b16)
        t8 = _time(f8, a8, b8)
        print(f"{name:28s} {flops / t16 / 1e12:12.1f} {flops / t8 / 1e12:12.1f}"
              f"   (ms: {t16*1e3:.2f} / {t8*1e3:.2f})", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "pallas":
        main_pallas(int(sys.argv[2]) if len(sys.argv) > 2 else 256)
    else:
        main(int(sys.argv[1]) if len(sys.argv) > 1 else 256)
