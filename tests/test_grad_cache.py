"""GradCache chunked-step parity (flyp_tpu/training/grad_cache.py).

The chunked step must compute the EXACT big-batch contrastive objective
(`/root/reference/clip/loss.py:192-211` semantics over the full batch) while
only ever materializing microbatch-sized activations.  Gradient exactness is
checked against a decomposition oracle — a single ``value_and_grad`` through
a chunk-wise forward + full-batch loss — using an SGD optimizer so post-step
params reflect the gradients directly (AdamW's step-1 ``g/|g|`` shape would
amplify float noise on near-zero entries into sign flips).  Trajectory
agreement with the direct step and the mesh-sharded path are covered
separately.
"""

import dataclasses

import numpy as np
import optax
import pytest

import jax
import jax.numpy as jnp

from flyp_tpu.models import CLIPModel, MODEL_CONFIGS, init_clip_params
from flyp_tpu.ops.losses import clip_loss
from flyp_tpu.parallel import create_mesh, replicate, shard_batch
from flyp_tpu.training import (
    create_train_state,
    make_chunked_train_step,
    make_optimizer,
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


def make_batch(b=16, seed=0):
    rng = np.random.default_rng(seed)
    images = rng.standard_normal((b, 32, 32, 3)).astype(np.float32)
    tokens = np.zeros((b, 16), dtype=np.int32)
    for i in range(b):
        n = int(rng.integers(2, 14))
        tokens[i, :n] = rng.integers(1, 254, n)
        tokens[i, n] = 255
    return jnp.asarray(images), jnp.asarray(tokens)


def sgd_optimizer(lr=0.05):
    return optax.inject_hyperparams(optax.sgd)(learning_rate=lambda step: lr)


def _oracle_step(model, params, images, tokens, chunks, lr, **loss_kw):
    """One SGD step on the big-batch objective via a chunk-wise forward —
    the mathematical definition the chunked step must reproduce."""
    b = images.shape[0]
    m = b // chunks

    def loss_fn(p):
        feats = [
            model.apply({"params": p}, images[i * m:(i + 1) * m], tokens[i * m:(i + 1) * m], train=True)
            for i in range(chunks)
        ]
        img_f = jnp.concatenate([f[0] for f in feats])
        txt_f = jnp.concatenate([f[1] for f in feats])
        per_item = clip_loss(img_f, txt_f, feats[0][2], **loss_kw)
        return jnp.mean(per_item)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    new_params = jax.tree_util.tree_map(lambda p, g: p - lr * g, params, grads)
    return float(loss), new_params


def _assert_trees_close(a, b, rtol, atol):
    for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=rtol, atol=atol)


def test_chunked_equals_oracle_sgd():
    model = CLIPModel(tiny_config())
    params = init_clip_params(model, 0)
    images, tokens = make_batch()
    lr = 0.05

    opt = sgd_optimizer(lr)
    state = create_train_state(params, opt)
    step = make_chunked_train_step(model, opt, chunks=4, donate=False)
    new_state, metrics = step(state, images, tokens)

    loss_o, params_o = _oracle_step(model, params, images, tokens, chunks=4, lr=lr)
    np.testing.assert_allclose(float(metrics["loss"]), loss_o, rtol=1e-6)
    assert metrics["per_item_loss"].shape == (16,)
    _assert_trees_close(new_state.params, params_o, rtol=1e-5, atol=5e-7)


@pytest.mark.parametrize("variant", ["soft", "ignore", "google_sup"])
def test_chunked_supervised_variants_equal_oracle(variant):
    model = CLIPModel(tiny_config())
    params = init_clip_params(model, 0)
    images, tokens = make_batch()
    labels = jnp.asarray(np.random.default_rng(1).integers(0, 3, 16))
    lr = 0.05
    kw = dict(ignore=variant == "ignore", google_sup_loss=variant == "google_sup")

    opt = sgd_optimizer(lr)
    state = create_train_state(params, opt)
    step = make_chunked_train_step(model, opt, chunks=2, use_ground_labels=True, donate=False, **kw)
    new_state, metrics = step(state, images, tokens, labels)

    loss_o, params_o = _oracle_step(
        model, params, images, tokens, chunks=2, lr=lr, ground_labels=labels, **kw
    )
    np.testing.assert_allclose(float(metrics["loss"]), loss_o, rtol=1e-6)
    assert np.ndim(metrics["per_item_loss"]) == 0  # supervised variants are scalars
    _assert_trees_close(new_state.params, params_o, rtol=1e-5, atol=5e-7)


def test_chunked_matches_direct_trajectory():
    """Same objective as the direct step: the AdamW loss trajectories track
    (routing goes through make_train_step's grad_cache_chunks switch)."""
    model = CLIPModel(tiny_config())
    params = init_clip_params(model, 0)
    opt = make_optimizer(warmup_cosine_lr(1e-3, 2, 50), weight_decay=0.1)
    state_d = create_train_state(params, opt)
    state_c = create_train_state(params, opt)
    direct = make_train_step(model, opt, donate=False)
    chunked = make_train_step(model, opt, donate=False, grad_cache_chunks=2)

    for seed in range(3):
        images, tokens = make_batch(seed=seed)
        state_d, m_d = direct(state_d, images, tokens)
        state_c, m_c = chunked(state_c, images, tokens)
        np.testing.assert_allclose(float(m_c["loss"]), float(m_d["loss"]), rtol=5e-5)
        np.testing.assert_allclose(
            float(m_c["learning_rate"]), float(m_d["learning_rate"]), rtol=1e-6
        )


def test_chunked_freeze_encoder():
    model = CLIPModel(tiny_config())
    params = init_clip_params(model, 0)
    images, tokens = make_batch()
    opt = make_optimizer(warmup_cosine_lr(1e-3, 2, 50), weight_decay=0.1)
    state = create_train_state(params, opt)
    step = make_chunked_train_step(model, opt, chunks=2, freeze_encoder=True, donate=False, log_grad_norm=True)
    new_state, metrics = step(state, images, tokens)

    # Visual tower bitwise frozen (no update, no decay); text tower trains.
    _assert_trees_close(new_state.params["visual"], state.params["visual"], rtol=0, atol=0)
    text_moved = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree_util.tree_leaves(new_state.params["text"]),
            jax.tree_util.tree_leaves(state.params["text"]),
        )
    )
    assert text_moved
    assert float(metrics["grad_norm"]) > 0


def test_chunked_resnet_chains_running_stats():
    """BN towers: microbatch statistics (torch-DataParallel-style), running
    stats chained across the chunks; grads equal the chunk-wise oracle."""
    from flyp_tpu.models.configs import CLIPConfig, TextConfig, VisionConfig

    cfg = CLIPConfig(
        embed_dim=32,
        vision=VisionConfig(image_size=32, width=16, patch_size=None, layers=0, heads=8, resnet_layers=(1, 1, 1, 1)),
        text=TextConfig(context_length=16, vocab_size=128, width=64, heads=1, layers=1),
    )
    model = CLIPModel(cfg)
    images, tokens = make_batch()
    variables = model.init(jax.random.key(0), images[:2], tokens[:2])
    lr = 0.05

    opt = sgd_optimizer(lr)
    state = create_train_state(variables["params"], opt, variables["batch_stats"])
    step = make_chunked_train_step(model, opt, chunks=2, donate=False)
    new_state, metrics = step(state, images, tokens)

    # Oracle: chunk-wise forward with chained mutable stats + full-batch loss.
    def chunk_apply(p, stats, im, tk):
        (f_i, f_t, s), upd = model.apply(
            {"params": p, "batch_stats": stats}, im, tk, train=True, mutable=["batch_stats"]
        )
        return f_i, f_t, s, upd["batch_stats"]

    def loss_fn(p):
        f1i, f1t, s, stats1 = chunk_apply(p, state.batch_stats, images[:8], tokens[:8])
        f2i, f2t, _, stats2 = chunk_apply(p, stats1, images[8:], tokens[8:])
        per_item = clip_loss(jnp.concatenate([f1i, f2i]), jnp.concatenate([f1t, f2t]), s)
        return jnp.mean(per_item), stats2

    (loss_o, stats_o), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    params_o = jax.tree_util.tree_map(lambda p, g: p - lr * g, state.params, grads)

    np.testing.assert_allclose(float(metrics["loss"]), float(loss_o), rtol=1e-6)
    _assert_trees_close(new_state.params, params_o, rtol=1e-5, atol=5e-7)
    _assert_trees_close(new_state.batch_stats, stats_o, rtol=1e-6, atol=1e-8)


def test_chunked_sharded_matches_single():
    """Mesh path: microbatches stay batch-sharded; loss matches 1-device.

    Params are compared under SGD so they reflect the gradients linearly —
    AdamW's step-1 ``g/|g|`` turns cross-device reduction-order noise on
    near-zero-gradient entries into ±lr sign flips (the AdamW trajectory is
    covered loss-level by ``test_chunked_matches_direct_trajectory``)."""
    model = CLIPModel(tiny_config())
    params = init_clip_params(model, 0)
    images, tokens = make_batch()
    opt = sgd_optimizer(0.05)

    single = make_chunked_train_step(model, opt, chunks=2, donate=False)
    state1, m1 = single(create_train_state(params, opt), images, tokens)

    mesh = create_mesh()
    state = replicate(mesh, create_train_state(params, opt))
    sharded_step = make_chunked_train_step(model, opt, mesh=mesh, chunks=2, donate=False)
    imgs_s, toks_s = shard_batch(mesh, (images, tokens))
    state2, m2 = sharded_step(state, imgs_s, toks_s)

    np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]), rtol=5e-4, atol=5e-5)
    assert m2["per_item_loss"].shape == (16,)
    _assert_trees_close(state2.params, state1.params, rtol=1e-3, atol=2e-6)


def test_chunked_fsdp_matches_single():
    """GradCache composes with FSDP (the realistic pairing — both are memory
    levers): chunked step over ZeRO-sharded params/moments via GSPMD
    propagation (mesh=None jit, as flyp.py's fsdp branch routes it) matches
    the single-device chunked step.  SGD for the same reason as the sharded
    test above."""
    from flyp_tpu.parallel import MeshConfig
    from flyp_tpu.parallel.fsdp import shard_train_state_fsdp

    model = CLIPModel(tiny_config())
    params = init_clip_params(model, 0)
    images, tokens = make_batch()
    opt = sgd_optimizer(0.05)

    single = make_chunked_train_step(model, opt, chunks=2, donate=False)
    state1, m1 = single(create_train_state(params, opt), images, tokens)

    mesh = create_mesh(MeshConfig(data=8, model=1))
    state2 = shard_train_state_fsdp(mesh, create_train_state(params, opt))
    step2 = make_chunked_train_step(model, opt, mesh=None, chunks=2, donate=False)
    imgs_s, toks_s = shard_batch(mesh, (images, tokens))
    state2, m2 = step2(state2, imgs_s, toks_s)

    np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]), rtol=5e-4, atol=5e-5)
    _assert_trees_close(state2.params, state1.params, rtol=1e-3, atol=2e-6)


def test_chunked_rejects_indivisible_batch():
    model = CLIPModel(tiny_config())
    params = init_clip_params(model, 0)
    opt = sgd_optimizer()
    state = create_train_state(params, opt)
    step = make_chunked_train_step(model, opt, chunks=3, donate=False)
    images, tokens = make_batch()
    with pytest.raises(ValueError, match="divisible"):
        step(state, images, tokens)
    with pytest.raises(ValueError, match="chunks"):
        make_chunked_train_step(model, opt, chunks=0)


def test_grad_cache_config_flag():
    from flyp_tpu.config import parse_arguments

    cfg = parse_arguments(["--train-dataset=ImageNet", "--grad_cache_chunks", "4"])
    assert cfg.grad_cache_chunks == 4
    assert parse_arguments(["--train-dataset=ImageNet"]).grad_cache_chunks == 1
