"""Train-step and schedule tests on the 8-device CPU mesh."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from flyp_tpu.models import CLIPModel, MODEL_CONFIGS, init_clip_params
from flyp_tpu.parallel import create_mesh, shard_batch, replicate
from flyp_tpu.training import (
    create_train_state,
    make_optimizer,
    make_scheduler,
    make_train_step,
    warmup_cosine_lr,
)


def tiny_config():
    cfg = MODEL_CONFIGS["ViT-B/16"]
    return dataclasses.replace(
        cfg,
        embed_dim=32,
        vision=dataclasses.replace(cfg.vision, image_size=32, patch_size=16, width=64, layers=2, heads=1),
        text=dataclasses.replace(cfg.text, context_length=16, vocab_size=256, width=64, heads=1, layers=2),
    )


def make_batch(b=16, cfg=None, seed=0):
    rng = np.random.default_rng(seed)
    images = rng.standard_normal((b, 32, 32, 3)).astype(np.float32)
    tokens = np.zeros((b, 16), dtype=np.int32)
    for i in range(b):
        n = int(rng.integers(2, 14))
        tokens[i, :n] = rng.integers(1, 254, n)
        tokens[i, n] = 255
    return images, tokens


# ------------------------------------------------------------------ schedules


def test_warmup_cosine_matches_reference_math():
    base, warmup, steps, min_lr = 1e-5, 10, 100, 1e-7
    sched = warmup_cosine_lr(base, warmup, steps, min_lr)
    # Reference closure math (`utils.py:19-34`).
    for step in [0, 5, 9, 10, 50, 99]:
        if step < warmup:
            expected = base * (step + 1) / warmup
        else:
            e, es = step - warmup, steps - warmup
            expected = 0.5 * (1 + np.cos(np.pi * e / es)) * base + min_lr
        np.testing.assert_allclose(float(sched(step)), expected, rtol=1e-6)


def test_crestart_constant_within_epoch():
    sched = make_scheduler("crestart", 1e-5, 0, epochs=4, num_batches=10)
    assert float(sched(0)) == float(sched(9))
    assert float(sched(0)) != float(sched(10))
    # Restarts after t_0 epochs * steps_per_epoch.
    np.testing.assert_allclose(float(sched(0)), float(sched(100)), rtol=1e-6)


def test_scheduler_names():
    for name in ("default", "drestart", "default_slower", "crestart"):
        make_scheduler(name, 1e-5, 500, 10, 100)
    with pytest.raises(ValueError):
        make_scheduler("bogus", 1e-5, 500, 10, 100)


# ------------------------------------------------------------------ train step


def test_train_step_single_device_loss_decreases():
    cfg = tiny_config()
    model = CLIPModel(cfg)
    params = init_clip_params(model, 0)
    sched = warmup_cosine_lr(1e-3, 2, 50)
    opt = make_optimizer(sched, weight_decay=0.1)
    state = create_train_state(params, opt)
    step_fn = make_train_step(model, opt, donate=False)

    images, tokens = make_batch()
    losses = []
    for _ in range(5):
        state, metrics = step_fn(state, jnp.asarray(images), jnp.asarray(tokens))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert metrics["per_item_loss"].shape == (16,)
    assert int(state.step) == 5


def test_train_step_grad_norm_metric():
    """--log_grad_norm surfaces the global grad L2 norm (wandb.watch analog).

    The value must equal optax.global_norm of the loss gradients computed
    outside the step, and the metric must be absent by default.
    """
    import optax
    from flyp_tpu.ops import clip_loss

    cfg = tiny_config()
    model = CLIPModel(cfg)
    params = init_clip_params(model, 0)
    sched = warmup_cosine_lr(1e-3, 2, 50)
    opt = make_optimizer(sched, weight_decay=0.1)
    state = create_train_state(params, opt)
    images, tokens = make_batch()

    _, plain = make_train_step(model, opt, donate=False)(
        state, jnp.asarray(images), jnp.asarray(tokens)
    )
    assert "grad_norm" not in plain

    step_fn = make_train_step(model, opt, donate=False, log_grad_norm=True)
    _, metrics = step_fn(state, jnp.asarray(images), jnp.asarray(tokens))

    def mean_loss(p, i, t):
        img_f, txt_f, scale = model.apply({"params": p}, i, t)
        return jnp.mean(clip_loss(img_f, txt_f, scale))

    grads = jax.grad(mean_loss)(params, jnp.asarray(images), jnp.asarray(tokens))
    np.testing.assert_allclose(
        float(metrics["grad_norm"]), float(optax.global_norm(grads)), rtol=1e-4
    )

    # Mesh path: the metric is replicated and matches single-device.
    mesh = create_mesh()
    state_m = replicate(mesh, create_train_state(params, make_optimizer(sched, weight_decay=0.1)))
    sharded = make_train_step(
        model, make_optimizer(sched, weight_decay=0.1), mesh=mesh, donate=False, log_grad_norm=True
    )
    imgs_s, toks_s = shard_batch(mesh, (jnp.asarray(images), jnp.asarray(tokens)))
    _, m2 = sharded(state_m, imgs_s, toks_s)
    np.testing.assert_allclose(float(m2["grad_norm"]), float(metrics["grad_norm"]), rtol=1e-3)


def test_train_step_sharded_matches_single_device():
    """One pjit step on the 8-device mesh == the same step on one device."""
    cfg = tiny_config()
    model = CLIPModel(cfg)
    params = init_clip_params(model, 0)
    sched = warmup_cosine_lr(1e-3, 2, 50)

    images, tokens = make_batch()

    # Single device.
    opt = make_optimizer(sched, weight_decay=0.1)
    state1 = create_train_state(params, opt)
    single = make_train_step(model, opt, donate=False)
    state1, m1 = single(state1, jnp.asarray(images), jnp.asarray(tokens))

    # 8-way data-parallel mesh.
    mesh = create_mesh()
    opt2 = make_optimizer(sched, weight_decay=0.1)
    state2 = replicate(mesh, create_train_state(params, opt2))
    sharded = make_train_step(model, opt2, mesh=mesh, donate=False)
    imgs_s, toks_s = shard_batch(mesh, (jnp.asarray(images), jnp.asarray(tokens)))
    state2, m2 = sharded(state2, imgs_s, toks_s)

    np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(m2["per_item_loss"]), np.asarray(m1["per_item_loss"]), rtol=1e-4, atol=1e-5
    )

    # Gradients agree between the partitioned and single-device programs.
    # (Comparing post-Adam params instead would amplify float noise: the first
    # Adam step is ~lr*sign(g), so near-zero grads flip update signs.)
    from flyp_tpu.ops import clip_loss

    def mean_loss(p, i, t):
        img_f, txt_f, scale = model.apply({"params": p}, i, t)
        return jnp.mean(clip_loss(img_f, txt_f, scale))

    g1 = jax.grad(mean_loss)(params, jnp.asarray(images), jnp.asarray(tokens))
    from flyp_tpu.parallel.mesh import replicated_sharding, batch_sharding

    g2 = jax.jit(
        jax.grad(mean_loss),
        in_shardings=(replicated_sharding(mesh), batch_sharding(mesh), batch_sharding(mesh)),
        out_shardings=replicated_sharding(mesh),
    )(params, imgs_s, toks_s)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-3, atol=2e-6)

    # And the loss trajectory tracks over a few more sharded steps.
    for seed in (1, 2):
        imgs_n, toks_n = make_batch(seed=seed)
        state1, m1 = single(state1, jnp.asarray(imgs_n), jnp.asarray(toks_n))
        imgs_sn, toks_sn = shard_batch(mesh, (jnp.asarray(imgs_n), jnp.asarray(toks_n)))
        state2, m2 = sharded(state2, imgs_sn, toks_sn)
        np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]), rtol=5e-4, atol=5e-5)


def test_resnet_batch_stats_update():
    """Train-mode BatchNorm must update running stats through the train step."""
    from flyp_tpu.models.configs import CLIPConfig, TextConfig, VisionConfig
    from flyp_tpu.models.clip import CLIPModel

    cfg = CLIPConfig(
        embed_dim=32,
        vision=VisionConfig(image_size=32, width=16, patch_size=None, layers=0, heads=8, resnet_layers=(1, 1, 1, 1)),
        text=TextConfig(context_length=16, vocab_size=128, width=64, heads=1, layers=1),
    )
    model = CLIPModel(cfg)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal((8, 32, 32, 3)), jnp.float32)
    tokens = np.zeros((8, 16), dtype=np.int32)
    tokens[:, 0] = 1
    tokens[:, 1] = 127
    tokens = jnp.asarray(tokens)

    variables = model.init(jax.random.key(0), images, tokens)
    opt = make_optimizer(warmup_cosine_lr(1e-3, 2, 50), weight_decay=0.0)
    state = create_train_state(variables["params"], opt, variables["batch_stats"])
    step_fn = make_train_step(model, opt, donate=False)

    state2, _ = step_fn(state, images, tokens)
    before = jax.tree_util.tree_leaves(state.batch_stats)
    after = jax.tree_util.tree_leaves(state2.batch_stats)
    changed = any(not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(before, after))
    assert changed, "BatchNorm running stats did not update in train mode"


def test_factory_random_init_returns_batch_stats():
    """build_clip_model's random-init path must surface batch_stats so a
    from-scratch ResNet tower can run the mutable-BN train apply
    (ADVICE r2: factory previously dropped them)."""
    from flyp_tpu.config import ExperimentConfig
    from flyp_tpu.models.configs import CLIPConfig, TextConfig, VisionConfig
    from flyp_tpu.models.factory import build_clip_model

    cfg = ExperimentConfig(model="RN50", compute_dtype="float32")
    override = CLIPConfig(
        embed_dim=32,
        vision=VisionConfig(image_size=32, width=16, patch_size=None, layers=0, heads=8, resnet_layers=(1, 1, 1, 1)),
        text=TextConfig(context_length=16, vocab_size=128, width=64, heads=1, layers=1),
    )
    model, variables = build_clip_model(cfg, config_override=override)
    assert "batch_stats" in variables, "factory dropped the BN collection"
    # ViT towers have no BN; the collection must simply be absent, not empty.
    vit = ExperimentConfig(model="ViT-B/16", compute_dtype="float32")
    vit_override = CLIPConfig(
        embed_dim=32,
        vision=VisionConfig(image_size=32, width=16, patch_size=16, layers=1, heads=2),
        text=TextConfig(context_length=16, vocab_size=128, width=64, heads=1, layers=1),
    )
    _, vit_vars = build_clip_model(vit, config_override=vit_override)
    assert set(vit_vars) == {"params"}


def test_adam_moment_dtype_variants():
    """make_optimizer(..., moment_dtype=...): the custom transform matches
    optax.adamw exactly in fp32, tracks it closely with bfloat16 moments,
    and keeps the ScaleByAdamState layout (TP/FSDP walks, checkpoints)."""
    import optax

    from flyp_tpu.training.train_state import _scale_by_adam_moment_dtype, make_optimizer
    from flyp_tpu.training.schedules import warmup_cosine_lr

    rng = np.random.default_rng(0)
    params = {"w": jnp.asarray(rng.standard_normal((64, 64)), jnp.float32),
              "b": jnp.asarray(rng.standard_normal(64), jnp.float32)}
    grads = jax.tree_util.tree_map(lambda p: jnp.asarray(rng.standard_normal(p.shape), jnp.float32), params)

    ref = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)
    mine = _scale_by_adam_moment_dtype(0.9, 0.999, 1e-8, jnp.float32)
    s_ref, s_mine = ref.init(params), mine.init(params)
    for _ in range(3):
        u_ref, s_ref = ref.update(grads, s_ref)
        u_mine, s_mine = mine.update(grads, s_mine)
    for a, b in zip(jax.tree_util.tree_leaves(u_ref), jax.tree_util.tree_leaves(u_mine)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)

    sched = warmup_cosine_lr(1e-3, 2, 50)
    full32 = make_optimizer(sched, weight_decay=0.1)
    low = make_optimizer(sched, weight_decay=0.1, moment_dtype="bfloat16")
    s32, slow = full32.init(params), low.init(params)
    assert isinstance(slow.inner_state[0], optax.ScaleByAdamState)
    assert jax.tree_util.tree_leaves(slow.inner_state[0].mu)[0].dtype == jnp.bfloat16
    p32, plow = params, params
    for _ in range(3):
        u32, s32 = full32.update(grads, s32, p32)
        ulow, slow = low.update(grads, slow, plow)
        p32 = optax.apply_updates(p32, u32)
        plow = optax.apply_updates(plow, ulow)
    for a, b in zip(jax.tree_util.tree_leaves(p32), jax.tree_util.tree_leaves(plow)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-2, atol=2e-5)
