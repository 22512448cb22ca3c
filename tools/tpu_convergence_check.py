"""On-chip training sanity: tiny CLIP, N steps, loss must fall toward the
InfoNCE floor ln(batch) at the same trajectory as the CPU/XLA path.

Validates a kernel's custom VJP end-to-end in real training on the TPU
(bf16, real compiles) — the numerics tests prove equivalence in fp32
interpret mode; this proves the compiled bf16 path trains.

Usage: FLYP_ATTENTION_IMPL=pallas_block python -m tools.tpu_convergence_check [steps]
"""

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main(steps: int = 120, batch: int = 64):
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
    on_tpu = jax.default_backend() in ("tpu", "axon")
    model = CLIPModel(cfg, compute_dtype=jnp.bfloat16 if on_tpu else jnp.float32)
    params = init_clip_params(model, 0)

    optimizer = make_optimizer(warmup_cosine_lr(3e-4, 10, steps), weight_decay=0.1)
    state = create_train_state(params, optimizer)
    step_fn = make_train_step(model, optimizer, donate=False)

    # A fixed synthetic association task: each of `batch` distinct images
    # pairs with a distinct caption — learnable to ~0 loss.
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal((batch, 64, 64, 3)), jnp.float32)
    tokens = np.zeros((batch, 32), dtype=np.int32)
    tokens[:, 0] = 1
    tokens[:, 1:6] = rng.integers(2, 4000, (batch, 5))
    tokens[:, 6] = 4095
    tokens = jnp.asarray(tokens)

    losses = []
    t0 = time.perf_counter()
    for i in range(steps):
        state, metrics = step_fn(state, images, tokens)
        if i % 20 == 0 or i == steps - 1:
            losses.append((i, float(jax.device_get(metrics["loss"]))))
            print(f"step {i}: loss {losses[-1][1]:.4f}", flush=True)
    dt = time.perf_counter() - t0

    first, last = losses[0][1], losses[-1][1]
    floor = float(np.log(batch))
    print(f"init ~{first:.3f} (ln {batch} = {floor:.3f}), final {last:.3f}, {dt:.1f}s")
    # Random init sits at or above the chance floor ln(B) (logit_scale=1/0.07
    # amplifies random-feature similarity structure); far below means a bug.
    assert floor - 0.3 < first < floor + 2.0, f"init loss {first} vs ln(batch) {floor}"
    assert last < first - 0.5, f"no convergence: {first} -> {last}"
    print("CONVERGENCE OK")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 120)
