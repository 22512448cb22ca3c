"""FSDP/ZeRO param+moment sharding over the data axis (parallel/fsdp.py)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from flyp_tpu.models import CLIPModel, MODEL_CONFIGS, init_clip_params
from flyp_tpu.parallel import MeshConfig, create_mesh, shard_batch
from flyp_tpu.parallel.fsdp import fsdp_spec, shard_train_state_fsdp
from flyp_tpu.training import create_train_state, make_optimizer, make_train_step, warmup_cosine_lr


def tiny_model():
    cfg = MODEL_CONFIGS["ViT-B/16"]
    cfg = dataclasses.replace(
        cfg,
        embed_dim=32,
        vision=dataclasses.replace(cfg.vision, image_size=32, patch_size=16, width=64, layers=2, heads=2),
        text=dataclasses.replace(cfg.text, context_length=16, vocab_size=256, width=64, heads=2, layers=2),
    )
    return CLIPModel(cfg)


def test_fsdp_spec_rules():
    # Largest divisible dim is sharded; small tensors replicate.
    assert fsdp_spec((49408, 512), 8) == P("data", None)
    assert fsdp_spec((512, 2048), 8) == P(None, "data")
    assert fsdp_spec((768,), 8) == P(None)  # tiny -> replicated
    assert fsdp_spec((), 8) == P()
    # Indivisible dims replicate.
    assert fsdp_spec((49409, 513), 8) == P(None, None)


def test_fsdp_train_step_matches_single_device():
    model = tiny_model()
    params = init_clip_params(model, 0)
    opt = make_optimizer(warmup_cosine_lr(1e-3, 2, 50), weight_decay=0.1)

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal((16, 32, 32, 3)), jnp.float32)
    tokens = np.zeros((16, 16), dtype=np.int32)
    for i in range(16):
        n = int(rng.integers(2, 14))
        tokens[i, :n] = rng.integers(1, 254, n)
        tokens[i, n] = 255
    tokens = jnp.asarray(tokens)

    state1 = create_train_state(params, opt)
    step1 = make_train_step(model, opt, donate=False)
    state1, m1 = step1(state1, images, tokens)

    mesh = create_mesh(MeshConfig(data=8, model=1))
    state2 = shard_train_state_fsdp(mesh, create_train_state(params, opt))
    # The patch kernel [16,16,3,64] (49k elements) clears the size threshold:
    # its largest divisible dim (the 64 output channels) is sharded; the
    # smaller token embedding [256,64] stays replicated.
    patch = state2.params["visual"]["patch_kernel"]
    assert patch.sharding.spec == P(None, None, None, "data")
    mu = state2.opt_state.inner_state[0].mu["visual"]["patch_kernel"]
    assert mu.sharding.spec == P(None, None, None, "data")
    assert state2.params["text"]["token_embedding"].sharding.spec == P(None, None)

    step2 = make_train_step(model, opt, mesh=None, donate=False)
    imgs_s, toks_s = shard_batch(mesh, (images, tokens))
    state2, m2 = step2(state2, imgs_s, toks_s)

    np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(m2["per_item_loss"]), np.asarray(m1["per_item_loss"]), rtol=1e-4, atol=1e-5
    )

    # Gradients agree between the FSDP-sharded and single-device programs
    # (Adam's first step is ~lr*sign(g), which amplifies float noise on
    # near-zero grads — same comparison strategy as test_tensor_parallel).
    from flyp_tpu.ops import clip_loss
    from flyp_tpu.parallel.fsdp import _place

    def mean_loss(p, i, t):
        img_f, txt_f, scale = model.apply({"params": p}, i, t)
        return jnp.mean(clip_loss(img_f, txt_f, scale))

    g1 = jax.grad(mean_loss)(params, images, tokens)
    g2 = jax.jit(jax.grad(mean_loss))(_place(mesh, params), imgs_s, toks_s)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-3, atol=2e-6)
