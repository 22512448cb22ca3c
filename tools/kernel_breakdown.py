"""Per-component step-time breakdown on the real chip.

Times the isolated pieces of the ViT-B/16 batch-256 train step — attention
block fwd / fwd+bwd (vision + text shapes), the XLA MLP block, and the
AdamW update — each synchronized through a scalar fetch (axon's
block_until_ready returns at enqueue).  Multiplied by layer counts this
reconstructs the 260ms step and shows where the non-matmul time lives.

Usage: python -m tools.kernel_breakdown
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def _time(fn, *args, iters=30):
    out = fn(*args)
    _ = float(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0]))  # compile+sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0]))
    return (time.perf_counter() - t0) / iters


def main(batch=256):
    from flyp_tpu.models import MODEL_CONFIGS, CLIPModel, init_clip_params
    from flyp_tpu.ops.attention_block import attention_block
    from flyp_tpu.training.schedules import warmup_cosine_lr
    from flyp_tpu.training.train_state import create_train_state, make_optimizer

    on_tpu = jax.default_backend() in ("tpu", "axon")
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    interpret = not on_tpu
    rng = np.random.default_rng(0)
    rows = []

    # Text at L=32: the production loader applies exact context shrinking
    # (prompt-templated captions bucket to ~32 of the 77 slots), so timing
    # L=77 would overstate the text share ~2.4x vs the benched step.
    for name, L, D, H, layers in (("vision", 197, 768, 12, 12), ("text", 32, 512, 8, 12)):
        x = jnp.asarray(rng.standard_normal((batch, L, D)), dtype)
        p = dict(
            ln_scale=jnp.ones((D,), jnp.float32),
            ln_bias=jnp.zeros((D,), jnp.float32),
            wqkv=jnp.asarray(rng.standard_normal((3, D, D)) * D ** -0.5, jnp.float32),
            bqkv=jnp.zeros((3, D), jnp.float32),
            wout=jnp.asarray(rng.standard_normal((D, D)) * D ** -0.5, jnp.float32),
            bout=jnp.zeros((D,), jnp.float32),
        )
        args = (p["ln_scale"], p["ln_bias"], p["wqkv"], p["bqkv"], p["wout"], p["bout"])

        fwd = jax.jit(lambda x, *a: attention_block(x, *a, H, name == "text", interpret))
        t_fwd = _time(fwd, x, *args)

        def loss(x, *a):
            return jnp.sum(attention_block(x, *a, H, name == "text", interpret).astype(jnp.float32) ** 2)

        fwdbwd = jax.jit(jax.grad(loss, argnums=tuple(range(7))))
        t_fb = _time(fwdbwd, x, *args)
        rows.append((f"attn block {name} fwd", t_fwd, layers))
        rows.append((f"attn block {name} fwd+bwd", t_fb, layers))

        # XLA MLP block (LN2 + c_fc + gelu + c_proj + residual) at same shapes
        w1 = jnp.asarray(rng.standard_normal((D, 4 * D)) * D ** -0.5, jnp.float32)
        w2 = jnp.asarray(rng.standard_normal((4 * D, D)) * D ** -0.5, jnp.float32)

        def mlp(x, w1, w2):
            x32 = x.astype(jnp.float32)
            mu = jnp.mean(x32, axis=-1, keepdims=True)
            var = jnp.var(x32, axis=-1, keepdims=True)
            y = ((x32 - mu) * jax.lax.rsqrt(var + 1e-5)).astype(x.dtype)
            h = jnp.einsum("bld,dh->blh", y, w1.astype(x.dtype))
            h = h * jax.nn.sigmoid(1.702 * h)
            return x + jnp.einsum("blh,hd->bld", h, w2.astype(x.dtype))

        def mlp_loss(x, w1, w2):
            return jnp.sum(mlp(x, w1, w2).astype(jnp.float32) ** 2)

        t_mlp = _time(jax.jit(jax.grad(mlp_loss, argnums=(0, 1, 2))), x, w1, w2)
        rows.append((f"mlp block {name} fwd+bwd", t_mlp, layers))

    # AdamW update over the full ViT-B/16 state, bf16 moments like the bench
    # default (FLYP_ADAM_MOMENT_DTYPE).  The update must RETURN the new
    # opt_state: returning only the params lets XLA dead-code-eliminate the
    # moment stores (~1.2 GB of the real tail's HBM traffic) and reads ~30%
    # low — exactly the bandwidth this row exists to localize.
    import os

    model = CLIPModel(MODEL_CONFIGS["ViT-B/16"], compute_dtype=dtype)
    params = init_clip_params(model, 0)
    moment_dtype = os.environ.get("FLYP_ADAM_MOMENT_DTYPE", "bfloat16")
    opt = make_optimizer(warmup_cosine_lr(1e-5, 500, 10_000), weight_decay=0.1, moment_dtype=moment_dtype)
    state = create_train_state(params, opt)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)

    @jax.jit
    def update(state, grads):
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        import optax

        return optax.apply_updates(state.params, updates), opt_state

    t_opt = _time(update, state, grads)
    rows.append((f"adamw update (150M params, {moment_dtype} moments)", t_opt, 1))

    total = 0.0
    for name, t, mult in rows:
        print(f"{name:>32s}: {t*1e3:7.2f} ms x{mult:<3d} = {t*mult*1e3:7.1f} ms")
        if "fwd+bwd" in name or "adamw" in name:
            total += t * mult
    print(f"reconstructed fwd+bwd+opt total ~ {total*1e3:.0f} ms (measured step: ~260 ms)")


if __name__ == "__main__":
    main()
