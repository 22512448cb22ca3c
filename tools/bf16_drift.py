"""Quantify bf16-compute training drift vs fp32 on the real chip.

The reference trains fp16/fp32-mixed (`/root/reference/clip/model.py:381-403`
casts weights to half; LN/logit_scale islands stay fp32); the rebuild trains
bf16-compute with fp32 master weights.  This tool runs the SAME synthetic
FLYP trajectory twice — identical init, data, schedule, optimizer; only
``compute_dtype`` differs — and reports:

* per-checkpoint loss curves,
* max and final absolute loss divergence,
* image->text retrieval accuracy (the zero-shot-head proxy on the learned
  association task) for both legs.

Both legs run the XLA attention path so the measured delta is PURELY the
compute dtype (the Pallas kernel is bf16-specialized; its bf16-vs-XLA
equivalence is covered by the kernel regression tests).

Usage: FLYP_ATTENTION_IMPL=xla python -m tools.bf16_drift [steps]
Results recorded in docs/BENCHMARKS.md round 4.
"""

import dataclasses
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def build(compute_dtype, steps: int, batch: int):
    from flyp_tpu.models import CLIPModel, MODEL_CONFIGS, init_clip_params
    from flyp_tpu.training.schedules import warmup_cosine_lr
    from flyp_tpu.training.train_state import create_train_state, make_optimizer
    from flyp_tpu.training.train_step import make_train_step

    cfg = MODEL_CONFIGS["ViT-B/16"]
    cfg = dataclasses.replace(
        cfg,
        embed_dim=64,
        vision=dataclasses.replace(cfg.vision, image_size=64, patch_size=16, width=256, layers=4, heads=4),
        text=dataclasses.replace(cfg.text, context_length=32, vocab_size=4096, width=256, heads=4, layers=4),
    )
    model = CLIPModel(cfg, compute_dtype=compute_dtype)
    params = init_clip_params(model, 0)  # same seed both legs; params are fp32 either way
    optimizer = make_optimizer(warmup_cosine_lr(3e-4, 10, steps), weight_decay=0.1)
    state = create_train_state(params, optimizer)
    step_fn = make_train_step(model, optimizer, donate=False)
    return model, state, step_fn


def data(n: int):
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal((n, 64, 64, 3)), jnp.float32)
    tokens = np.zeros((n, 32), dtype=np.int32)
    tokens[:, 0] = 1
    tokens[:, 1:6] = rng.integers(2, 4000, (n, 5))
    tokens[:, 6] = 4095
    return images, jnp.asarray(tokens)


def retrieval_acc(model, state, images, tokens) -> float:
    """Image->text top-1 on the learned association (the zero-shot-head
    analog: classify each image against the caption bank)."""
    img_f, txt_f, scale = model.apply({"params": state.params}, images, tokens)
    logits = np.asarray((img_f.astype(jnp.float32) @ txt_f.astype(jnp.float32).T))
    return float((logits.argmax(axis=1) == np.arange(logits.shape[0])).mean())


def run_leg(dtype_name: str, steps: int, batch: int, pool: int, every: int = 10):
    """``pool`` > batch: each step trains on a fresh slice of a fixed
    ``pool``-pair corpus (identical sampling both legs), so the loss stays
    in the learning regime instead of memorizing in 20 steps — drift is
    measured where it matters.  ``pool == batch`` reproduces the pure
    convergence task."""
    dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[dtype_name]
    model, state, step_fn = build(dtype, steps, batch)
    images, tokens = data(pool)
    order_rng = np.random.default_rng(42)  # same batch sequence both legs
    curve = {}
    t0 = time.perf_counter()
    for i in range(steps):
        if pool > batch:
            idx = order_rng.choice(pool, size=batch, replace=False)
            bi, bt = images[idx], tokens[idx]
        else:
            bi, bt = images, tokens
        state, metrics = step_fn(state, bi, bt)
        if i % every == 0 or i == steps - 1:
            curve[i] = float(jax.device_get(metrics["loss"]))  # transfer = sync on axon
            print(f"  [{dtype_name}] step {i}: loss {curve[i]:.5f}", flush=True)
    acc = retrieval_acc(model, state, images[:batch], tokens[:batch])
    print(f"  [{dtype_name}] retrieval acc {acc:.4f}, {time.perf_counter() - t0:.1f}s", flush=True)
    return curve, acc


def main(steps: int = 300, batch: int = 64, pool: int = 64):
    print(f"backend={jax.default_backend()} steps={steps} batch={batch} pool={pool}", flush=True)
    curve32, acc32 = run_leg("float32", steps, batch, pool)
    curve16, acc16 = run_leg("bfloat16", steps, batch, pool)

    diffs = {i: abs(curve16[i] - curve32[i]) for i in curve32}
    max_step = max(diffs, key=diffs.get)
    result = {
        "metric": f"bf16-vs-fp32 training drift ({steps}-step synthetic FLYP, pool {pool})",
        "final_loss_fp32": round(curve32[steps - 1], 5),
        "final_loss_bf16": round(curve16[steps - 1], 5),
        "final_abs_divergence": round(diffs[steps - 1], 5),
        "max_abs_divergence": round(diffs[max_step], 5),
        "max_divergence_step": max_step,
        "retrieval_acc_fp32": acc32,
        "retrieval_acc_bf16": acc16,
        "acc_delta": round(acc16 - acc32, 4),
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:4]))
