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


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 256)
