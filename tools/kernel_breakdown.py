"""Per-component step-time breakdown on the real chip.

Times the isolated pieces of a train step — attention block fwd / fwd+bwd
(vision + text shapes), the XLA MLP block, the fixed tails (patch embed,
token embed, final projections, ClipLoss), and the AdamW update — each
synchronized through a scalar fetch (axon's block_until_ready returns at
enqueue).  Multiplied by layer counts this reconstructs the measured step
and shows where the non-matmul time lives.

Usage: python -m tools.kernel_breakdown [batch] [model]
e.g. ``python -m tools.kernel_breakdown 512 ViT-B/32`` for the B/32 map
(VERDICT round-4 task 5: localize the 11-MFU-point gap to B/16).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# (vision L, D, H, layers), (text L, D, H, layers) per family.  Text at the
# shrunk context (L=32): prompt-templated captions bucket to ~32 slots.
SHAPES = {
    "ViT-B/16": ((197, 768, 12, 12), (32, 512, 8, 12)),
    "ViT-B/32": ((50, 768, 12, 12), (32, 512, 8, 12)),
    "ViT-L/14": ((257, 1024, 16, 24), (32, 768, 12, 12)),
}


def _time(fn, *args, iters=30):
    out = fn(*args)
    _ = float(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0]))  # compile+sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0]))
    return (time.perf_counter() - t0) / iters


def main(batch=256, model_name="ViT-B/16"):
    from flyp_tpu.models import MODEL_CONFIGS, CLIPModel, init_clip_params
    from flyp_tpu.ops.attention_block import attention_block
    from flyp_tpu.training.schedules import warmup_cosine_lr
    from flyp_tpu.training.train_state import create_train_state, make_optimizer

    on_tpu = jax.default_backend() in ("tpu", "axon")
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    interpret = not on_tpu
    rng = np.random.default_rng(0)
    rows = []
    if model_name not in SHAPES:
        raise SystemExit(
            f"kernel_breakdown: no per-block shape table for {model_name!r}; "
            f"supported: {sorted(SHAPES)} (transformer towers only — ResNet "
            f"families have their own tools/rn50_breakdown.py)"
        )
    (vL, vD, vH, vlayers), (tL, tD, tH, tlayers) = SHAPES[model_name]

    for name, L, D, H, layers in (("vision", vL, vD, vH, vlayers), ("text", tL, tD, tH, tlayers)):
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

    model = CLIPModel(MODEL_CONFIGS[model_name], compute_dtype=dtype)
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
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(params)) / 1e6
    rows.append((f"adamw update ({n_params:.0f}M params, {moment_dtype} moments)", t_opt, 1))

    # The FULL benched train step, same session: the residual after
    # subtracting towers+opt is the fixed tails (patch/token embed, final
    # LN+proj, ClipLoss 2BxB softmax, logit-scale, loader casts).
    from bench import build_bench_step

    step_fn, state_b, images, tokens, _ = build_bench_step(
        batch, model_name, remat=model_name.startswith("ViT-L")
    )
    state_b, m = step_fn(state_b, images, tokens)
    _ = float(jax.device_get(m["loss"]))
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        state_b, m = step_fn(state_b, images, tokens)
    _ = float(jax.device_get(m["loss"]))
    t_step = (time.perf_counter() - t0) / iters

    total = 0.0
    for name, t, mult in rows:
        share = t * mult / t_step * 100 if ("fwd+bwd" in name or "adamw" in name) else 0.0
        tag = f"  ({share:4.1f}% of step)" if share else ""
        print(f"{name:>40s}: {t*1e3:7.2f} ms x{mult:<3d} = {t*mult*1e3:7.1f} ms{tag}")
        if share:
            total += t * mult
    resid = t_step - total
    print(f"{'full train step (measured)':>40s}: {t_step*1e3:7.1f} ms   ({batch / t_step:.0f} img/s)")
    print(f"{'residual = fixed tails':>40s}: {resid*1e3:7.1f} ms  ({resid / t_step * 100:.1f}% of step)")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 256,
         sys.argv[2] if len(sys.argv) > 2 else "ViT-B/16")
