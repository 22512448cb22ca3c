"""Tensor-parallel param sharding over the model mesh axis."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from flyp_tpu.models import CLIPModel, MODEL_CONFIGS, init_clip_params
from flyp_tpu.parallel import MeshConfig, create_mesh, shard_batch
from flyp_tpu.parallel.tp import clip_param_specs, shard_train_state
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


def make_batch(b=16):
    rng = np.random.default_rng(0)
    images = rng.standard_normal((b, 32, 32, 3)).astype(np.float32)
    tokens = np.zeros((b, 16), dtype=np.int32)
    for i in range(b):
        n = int(rng.integers(2, 14))
        tokens[i, :n] = rng.integers(1, 254, n)
        tokens[i, n] = 255
    return jnp.asarray(images), jnp.asarray(tokens)


def test_param_specs():
    model = tiny_model()
    params = init_clip_params(model, 0)
    specs = clip_param_specs(params)
    attn = specs["visual"]["transformer"]["block_0"]["attn"]
    # [3, D, D]: last axis is head-major features — sharding it is
    # head-group TP (the fused kernel runs per shard, no weight gather).
    assert attn["qkv_kernel"] == P(None, None, "model")
    assert attn["qkv_bias"] == P(None, "model")
    assert attn["out_kernel"] == P("model", None)
    mlp = specs["visual"]["transformer"]["block_0"]["mlp"]
    assert mlp["fc_kernel"] == P(None, "model")
    assert specs["logit_scale"] == P()
    assert specs["text"]["token_embedding"] == P()


def test_tp_train_step_matches_single_device():
    model = tiny_model()
    params = init_clip_params(model, 0)
    opt = make_optimizer(warmup_cosine_lr(1e-3, 2, 50), weight_decay=0.1)
    images, tokens = make_batch()

    # Single device reference.
    state1 = create_train_state(params, opt)
    step1 = make_train_step(model, opt, donate=False)
    state1, m1 = step1(state1, images, tokens)

    # 2-way TP x 4-way DP: params/moments sharded over 'model', batch over 'data'.
    mesh = create_mesh(MeshConfig(data=4, model=2))
    state2 = shard_train_state(mesh, create_train_state(params, opt))
    qkv = state2.params["visual"]["transformer"]["block_0"]["attn"]["qkv_kernel"]
    assert qkv.sharding.spec == P(None, None, "model")
    mu_qkv = state2.opt_state.inner_state[0].mu["visual"]["transformer"]["block_0"]["attn"]["qkv_kernel"]
    assert mu_qkv.sharding.spec == P(None, None, "model")

    step2 = make_train_step(model, opt, mesh=None, donate=False)  # shardings inferred
    imgs_s, toks_s = shard_batch(mesh, (images, tokens))
    state2, m2 = step2(state2, imgs_s, toks_s)

    np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]), rtol=1e-5, atol=1e-6)

    # Gradients agree between the TP-sharded and single-device programs.
    # (Adam's first step is ~lr*sign(g), which amplifies float noise on
    # near-zero grads — params are compared via grads, as in test_training.)
    from flyp_tpu.ops import clip_loss
    from flyp_tpu.parallel.tp import shard_params

    def mean_loss(p, i, t):
        img_f, txt_f, scale = model.apply({"params": p}, i, t)
        return jnp.mean(clip_loss(img_f, txt_f, scale))

    g1 = jax.grad(mean_loss)(params, images, tokens)
    g2 = jax.jit(jax.grad(mean_loss))(shard_params(mesh, params), imgs_s, toks_s)
    # atol covers scatter-add reduction-order noise in the embedding grads
    # (order changes under sharding; observed ~1e-5 max abs on fp32).
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-3, atol=2e-5)


def test_trainer_with_tp_mesh(tmp_path):
    """flyp_train end-to-end with --mesh_model 2 (TP x DP)."""
    import os

    import pandas as pd
    from PIL import Image

    from flyp_tpu.config import ExperimentConfig
    from flyp_tpu.training.flyp import flyp_train

    root = tmp_path / "corpus"
    rng = np.random.default_rng(0)
    classnames = ["lymph node", "lymph node containing metastatic tumor tissue"]
    rows = []
    for ci in range(2):
        d = root / "patchcamelyon" / "val" / f"class_{ci}"
        d.mkdir(parents=True)
        for i in range(8):
            p = d / f"{i}.png"
            Image.fromarray(
                np.full((36, 36, 3), 60 + 120 * ci, np.uint8) + rng.integers(0, 40, (36, 36, 3), dtype=np.uint8)
            ).save(p)
            rows.append({
                "title": f"this is a photo of {classnames[ci]}",
                "filepath": str(p), "label": ci, "guidance": 100, "img_id": ci * 10 + i,
            })
    csv = root / "train.tsv"
    pd.DataFrame(rows).to_csv(csv, sep="\t", index=False)

    cfg_m = MODEL_CONFIGS["ViT-B/16"]
    cfg_m = dataclasses.replace(
        cfg_m,
        embed_dim=32,
        vision=dataclasses.replace(cfg_m.vision, image_size=32, patch_size=16, width=64, layers=2, heads=2),
        text=dataclasses.replace(cfg_m.text, width=64, heads=2, layers=2),  # full 77-token context
    )
    model = CLIPModel(cfg_m)
    variables = {"params": init_clip_params(model, 0)}
    cfg = ExperimentConfig(
        train_dataset="PatchCamelyonVal",
        template="patchcamelyon_template",
        eval_datasets=["PatchCamelyonVal"],
        data_location=str(root),
        ft_data=str(csv),
        ft_data_test=str(csv),
        batch_size=8, lr=1e-3, epochs=1, workers=2, debug=True,
        compute_dtype="float32", log_dir=str(tmp_path / "logs"),
        mesh_model=2, mesh_data=4,
    )
    flyp_train(cfg, model=model, variables=variables, print_every=2)
    assert os.path.isfile(os.path.join(cfg.log_dir, "stats.tsv"))


def test_tp_train_step_with_pallas_qkv_attention(monkeypatch):
    """TP x DP step with the fused-QKV Pallas kernel (interpret mode): the
    custom_partitioning rule keeps batch sharding and gathers the model-axis
    feature shards, so --mesh_model > 1 no longer falls back to XLA."""
    import os

    from flyp_tpu.ops.attention import _default_impl

    monkeypatch.setenv("FLYP_ATTENTION_IMPL", "pallas_qkv")
    _default_impl.cache_clear()
    try:
        model = tiny_model()
        params = init_clip_params(model, 0)
        opt = make_optimizer(warmup_cosine_lr(1e-3, 2, 50), weight_decay=0.1)
        images, tokens = make_batch()

        state1 = create_train_state(params, opt)
        step1 = make_train_step(model, opt, donate=False)
        state1, m1 = step1(state1, images, tokens)

        mesh = create_mesh(MeshConfig(data=4, model=2))
        state2 = shard_train_state(mesh, create_train_state(params, opt))
        step2 = make_train_step(model, opt, mesh=None, donate=False)
        imgs_s, toks_s = shard_batch(mesh, (images, tokens))
        state2, m2 = step2(state2, imgs_s, toks_s)

        np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(m2["per_item_loss"]), np.asarray(m1["per_item_loss"]), rtol=1e-4, atol=1e-5
        )
    finally:
        _default_impl.cache_clear()
