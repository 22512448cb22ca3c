"""Multi-slice (DCN replica axis) data parallelism on the virtual CPU mesh.

The reference's only multi-node story is the dormant torch.distributed
all-gather in the loss (`/root/reference/clip/loss.py:19-69`); the TPU
rebuild expresses multi-slice deployments as an outer ``replica`` mesh axis
(SURVEY.md §2.7 "DCN axis only for multi-slice data parallelism").  The
GSPMD global-batch loss must be invariant to how the batch splits across
(replica, data) — these tests prove loss AND gradient equality against the
single-device step, and that replica composes with TP and FSDP.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from flyp_tpu.models import CLIPModel, MODEL_CONFIGS, init_clip_params
from flyp_tpu.parallel.mesh import (
    MeshConfig,
    REPLICA_AXIS,
    batch_axes,
    create_mesh,
    create_mesh_for_batch,
    replicate,
    shard_batch,
)
from flyp_tpu.training.schedules import warmup_cosine_lr
from flyp_tpu.training.train_state import create_train_state, make_optimizer
from flyp_tpu.training.train_step import make_train_step


def _tiny_model():
    cfg = MODEL_CONFIGS["ViT-B/16"]
    cfg = dataclasses.replace(
        cfg,
        embed_dim=32,
        vision=dataclasses.replace(cfg.vision, image_size=32, patch_size=16, width=64, layers=2, heads=2),
        text=dataclasses.replace(cfg.text, context_length=16, vocab_size=256, width=64, heads=2, layers=2),
    )
    return CLIPModel(cfg)


def _batch(n):
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal((n, 32, 32, 3)), jnp.float32)
    tokens = np.zeros((n, 16), dtype=np.int32)
    tokens[:, 0] = 1
    tokens[:, 1 : 4] = rng.integers(2, 250, (n, 3))
    tokens[:, 4] = 255
    return images, jnp.asarray(tokens)


def _loss_and_grads(model, params, images, tokens):
    from flyp_tpu.ops.losses import clip_loss

    def f(p):
        img_f, txt_f, scale = model.apply({"params": p}, images, tokens, train=True)
        return jnp.mean(clip_loss(img_f, txt_f, scale))

    loss, grads = jax.jit(jax.value_and_grad(f))(params)
    return float(loss), jax.device_get(grads)


def _run_step(mesh, model, params, images, tokens):
    optimizer = make_optimizer(warmup_cosine_lr(1e-3, 2, 50), weight_decay=0.1)
    state = create_train_state(params, optimizer)
    if mesh is None:
        step = make_train_step(model, optimizer, donate=False)
        state, metrics = step(state, images, tokens)
    else:
        state = replicate(mesh, state)
        step = make_train_step(model, optimizer, mesh=mesh, donate=False)
        sh_images, sh_tokens = shard_batch(mesh, (images, tokens))
        state, metrics = step(state, sh_images, sh_tokens)
    return jax.device_get(state.params), float(metrics["loss"])


def test_replica_mesh_matches_single_device():
    """(replica=2, data=4) == single device: same loss AND same gradients
    (the InfoNCE gather spans both batch axes).  Gradients, not post-AdamW
    params, are compared: Adam normalizes near-zero grads to ±lr, turning
    reduction-order noise into sign flips."""
    model = _tiny_model()
    params = init_clip_params(model, 0)
    images, tokens = _batch(16)

    ref_loss, ref_grads = _loss_and_grads(model, params, images, tokens)

    mesh = create_mesh(MeshConfig(data=4, model=1, replica=2))
    assert REPLICA_AXIS in mesh.axis_names and batch_axes(mesh) == (REPLICA_AXIS, "data")
    sh_images, sh_tokens = shard_batch(mesh, (images, tokens))
    ms_loss, ms_grads = _loss_and_grads(model, replicate(mesh, params), sh_images, sh_tokens)

    np.testing.assert_allclose(ms_loss, ref_loss, rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(ms_grads), jax.tree_util.tree_leaves(ref_grads)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4)

    # The full train step also executes cleanly on the replica mesh.
    _, step_loss = _run_step(mesh, model, params, images, tokens)
    np.testing.assert_allclose(step_loss, ref_loss, rtol=1e-5, atol=1e-6)


def test_replica_composes_with_tp():
    """(replica=2, model=2, data=2): TP param sharding under an outer DCN
    axis still produces a finite, correct-magnitude global-batch loss."""
    from flyp_tpu.parallel.tp import shard_train_state

    model = _tiny_model()
    params = init_clip_params(model, 0)
    images, tokens = _batch(8)

    _, ref_loss = _run_step(None, model, params, images, tokens)

    mesh = create_mesh(MeshConfig(data=2, model=2, replica=2))
    optimizer = make_optimizer(warmup_cosine_lr(1e-3, 2, 50), weight_decay=0.1)
    state = shard_train_state(mesh, create_train_state(params, optimizer))
    step = make_train_step(model, optimizer, mesh=None, donate=False)
    sh_images, sh_tokens = shard_batch(mesh, (images, tokens))
    state, metrics = step(state, sh_images, sh_tokens)
    np.testing.assert_allclose(float(metrics["loss"]), ref_loss, rtol=1e-5, atol=1e-6)


def test_replica_composes_with_fsdp():
    """Hybrid sharding: FSDP over the inner data axis, replication across
    replicas — one step matches the single-device loss."""
    from flyp_tpu.parallel.fsdp import shard_train_state_fsdp

    model = _tiny_model()
    params = init_clip_params(model, 0)
    images, tokens = _batch(8)

    _, ref_loss = _run_step(None, model, params, images, tokens)

    mesh = create_mesh(MeshConfig(data=4, model=1, replica=2))
    optimizer = make_optimizer(warmup_cosine_lr(1e-3, 2, 50), weight_decay=0.1)
    state = shard_train_state_fsdp(mesh, create_train_state(params, optimizer))
    step = make_train_step(model, optimizer, mesh=None, donate=False)
    sh_images, sh_tokens = shard_batch(mesh, (images, tokens))
    state, metrics = step(state, sh_images, sh_tokens)
    np.testing.assert_allclose(float(metrics["loss"]), ref_loss, rtol=1e-5, atol=1e-6)


def test_create_mesh_for_batch_respects_replica():
    mesh = create_mesh_for_batch(MeshConfig(data=-1, model=1, replica=2), batch_size=12)
    # 8 devices / 2 replicas = 4 data, but 12 % (4*2) != 0 -> capped to 3
    # (12 divides evenly across 2*3 shards).
    assert mesh.shape[REPLICA_AXIS] == 2
    assert mesh.shape["data"] == 3

    with pytest.raises(ValueError):
        create_mesh(MeshConfig(data=3, model=1, replica=2))

    # batch indivisible by the replica axis: clear error, not an opaque
    # device_put failure after data bottoms out at 1.
    with pytest.raises(ValueError, match="replica"):
        create_mesh_for_batch(MeshConfig(data=-1, model=1, replica=2), batch_size=7)
