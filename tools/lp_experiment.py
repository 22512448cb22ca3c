"""Does Lp == L (no 16-row padding) beat the padded block kernel at L=50?

The block kernel pads the sequence dim to a 16-multiple (`_pad_len`) for
Mosaic tile alignment — but Mosaic also accepts block dims EQUAL to the
array dims, so a block spanning the true L is legal without padding.  For
ViT-B/32's vision tower (L=50 -> Lp=64) padding costs 28% extra projection
rows and 64% extra score work; for B/16 (197 -> 208) it costs 5.6% / 11%.

This times attention_block fwd+bwd isolated at both pad rules, same chip
session (interpret-mode grad equivalence of Lp==L is asserted in
tests/test_attention_block.py).

Usage: python -m tools.lp_experiment [batch] [L] [D] [H]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import flyp_tpu.ops.attention_block as ab


def _time(fn, *args, iters=30):
    out = fn(*args)
    _ = float(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0]))
    return (time.perf_counter() - t0) / iters


def main(batch=512, L=50, D=768, H=12):
    on_tpu = jax.default_backend() in ("tpu", "axon")
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    interpret = not on_tpu
    rng = np.random.default_rng(0)

    x = jnp.asarray(rng.standard_normal((batch, L, D)), dtype)
    args = (
        jnp.ones((D,), jnp.float32),
        jnp.zeros((D,), jnp.float32),
        jnp.asarray(rng.standard_normal((3, D, D)) * D**-0.5, jnp.float32),
        jnp.zeros((3, D), jnp.float32),
        jnp.asarray(rng.standard_normal((D, D)) * D**-0.5, jnp.float32),
        jnp.zeros((D,), jnp.float32),
    )

    def loss(x, *a):
        return jnp.sum(ab.attention_block(x, *a, H, False, interpret).astype(jnp.float32) ** 2)

    orig = ab._pad_len
    results = {}
    for name, pad_fn in (("padded (Lp=%d)" % orig(L, dtype), orig), ("exact (Lp=L=%d)" % L, lambda l, d: l)):
        ab._pad_len = pad_fn
        try:
            fwd = jax.jit(lambda x, *a: ab.attention_block(x, *a, H, False, interpret))
            t_f = _time(fwd, x, *args)
            fb = jax.jit(jax.grad(loss, argnums=tuple(range(7))))
            t_fb = _time(fb, x, *args)
            results[name] = (t_f, t_fb)
            print(f"{name:20s}: fwd {t_f * 1e3:6.2f} ms   fwd+bwd {t_fb * 1e3:6.2f} ms", flush=True)
        except Exception as e:  # Mosaic may reject the unaligned block
            print(f"{name:20s}: FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)
        finally:
            ab._pad_len = orig


if __name__ == "__main__":
    a = [int(v) for v in sys.argv[1:5]]
    main(*a)
