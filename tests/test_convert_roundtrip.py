"""Reverse checkpoint conversion: flyp_tpu pytrees -> torch CLIP state dicts.

`export_clip_state_dict` lets fine-tuned checkpoints flow BACK to the torch
ecosystem (the forward direction is covered by tests/test_model_parity.py).
Pinned here: (a) export -> convert round-trips bit-exactly for both towers,
(b) the exported dict survives a .pt save/load cycle, and (c) the reference's
own ``build_model`` strict-loads the export and produces the same features —
the strongest interop proof available without pretrained weights.
"""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from flyp_tpu.models import CLIPModel, MODEL_CONFIGS, convert, init_clip_variables
from tests import ref_loader


def _tiny_cfg(tower="vit"):
    # Widths are multiples of 64 with heads == width // 64: the reference's
    # build_model derives heads that way (`clip/model.py:427-431`).
    cfg = MODEL_CONFIGS["ViT-B/16" if tower == "vit" else "RN50"]
    if tower == "vit":
        vision = dataclasses.replace(cfg.vision, image_size=32, patch_size=16, width=64, layers=2, heads=1)
    else:
        vision = dataclasses.replace(
            cfg.vision, image_size=32, width=8, layers=0, heads=4, resnet_layers=(1, 1, 1, 1)
        )
    text = dataclasses.replace(cfg.text, context_length=16, vocab_size=256, width=64, heads=1, layers=2)
    return dataclasses.replace(cfg, embed_dim=64, vision=vision, text=text)


def _tree_equal(a, b, path=""):
    assert set(a) == set(b), f"{path}: {set(a) ^ set(b)}"
    for k in a:
        if isinstance(a[k], dict):
            _tree_equal(a[k], b[k], f"{path}/{k}")
        else:
            np.testing.assert_array_equal(np.asarray(a[k], np.float32), np.asarray(b[k], np.float32), err_msg=f"{path}/{k}")


@pytest.mark.parametrize("tower", ["vit", "resnet"])
def test_export_convert_roundtrip(tower):
    cfg = _tiny_cfg(tower)
    model = CLIPModel(cfg)
    variables = init_clip_variables(model, 0)
    params, stats = variables["params"], variables.get("batch_stats")

    state = convert.export_clip_state_dict(params, stats, cfg)
    params2, stats2, cfg2 = convert.convert_clip_state_dict(state)

    assert cfg2 == cfg
    _tree_equal(params, params2)
    if tower == "resnet":
        _tree_equal(stats, stats2)


def test_export_pt_save_load_cycle(tmp_path):
    torch = pytest.importorskip("torch")  # noqa: F841 — save path needs torch
    cfg = _tiny_cfg("vit")
    model = CLIPModel(cfg)
    variables = init_clip_variables(model, 0)

    state = convert.export_clip_state_dict(variables["params"], None, cfg)
    path = str(tmp_path / "exported.pt")
    convert.save_torch_checkpoint(path, state)
    loaded = convert.load_torch_checkpoint(path)
    params2, _, cfg2 = convert.convert_clip_state_dict(loaded)
    assert cfg2 == cfg
    _tree_equal(variables["params"], params2)


@pytest.mark.skipif(not ref_loader.available(), reason="reference tree not mounted")
@pytest.mark.parametrize("tower", ["vit", "resnet"])
def test_reference_builds_from_export(tower):
    """The reference's build_model strict-loads our export and the two
    implementations produce the same features from the SAME (exported)
    weights — interop in the jax -> torch direction."""
    torch = pytest.importorskip("torch")
    ref_model = ref_loader.load_ref_module("clip/model.py", "ref_clip_model_rt")

    cfg = _tiny_cfg(tower)
    model = CLIPModel(cfg)
    variables = init_clip_variables(model, 0)
    state = convert.export_clip_state_dict(variables["params"], variables.get("batch_stats"), cfg)

    ref = ref_model.build_model({k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in state.items()})

    rng = np.random.default_rng(1)
    imgs = rng.standard_normal((3, 3, cfg.vision.image_size, cfg.vision.image_size)).astype(np.float32)
    toks = np.zeros((3, cfg.text.context_length), dtype=np.int64)
    for i in range(3):
        n = int(rng.integers(3, cfg.text.context_length - 1))
        toks[i, :n] = rng.integers(1, cfg.text.vocab_size - 1, n)
        toks[i, n] = cfg.text.vocab_size - 1  # highest id = pooling position

    with torch.no_grad():
        ref_img = ref.encode_image(torch.from_numpy(imgs)).numpy()
        ref_txt = ref.encode_text(torch.from_numpy(toks)).numpy()

    our_img = model.apply(variables, jnp.asarray(imgs.transpose(0, 2, 3, 1)), method="encode_image")
    our_txt = model.apply(variables, jnp.asarray(toks.astype(np.int32)), method="encode_text")
    np.testing.assert_allclose(np.asarray(our_img), ref_img, atol=3e-4, rtol=3e-4)
    np.testing.assert_allclose(np.asarray(our_txt), ref_txt, atol=3e-4, rtol=3e-4)


def test_export_checkpoint_tool(tmp_path):
    """tools/export_checkpoint reads a trainer orbax checkpoint and writes a
    .pt that converts back bit-exactly."""
    pytest.importorskip("torch")
    import optax

    from flyp_tpu.training.train_state import create_train_state
    from flyp_tpu.utils.checkpoint import save_checkpoint
    from tools.export_checkpoint import main as export_main

    cfg = _tiny_cfg("vit")
    model = CLIPModel(cfg)
    variables = init_clip_variables(model, 0)
    state = create_train_state(variables["params"], optax.sgd(1e-3), variables.get("batch_stats"))
    ckpt = str(tmp_path / "checkpoint_0")
    save_checkpoint(ckpt, state)

    out = str(tmp_path / "exported.pt")
    export_main(ckpt, out)
    params2, _, cfg2 = convert.convert_clip_state_dict(convert.load_torch_checkpoint(out))
    assert cfg2 == cfg
    _tree_equal(variables["params"], params2)
