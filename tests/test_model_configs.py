"""Structural pins for every named model config.

The reference sniffs architecture shapes out of checkpoint state dicts
(`/root/reference/clip/model.py:405-443`); here the configs are explicit,
so a typo in `models/configs.py` would silently build a tower the published
checkpoints cannot load into.  These tests pin each config's exact
parameter count (via ``jax.eval_shape`` — no memory is allocated, so even
RN50x64's 623M params are free to check) against the public OpenAI CLIP
model sizes, plus the cheap structural invariants.
"""

import numpy as np
import pytest

import jax

from flyp_tpu.models import CLIPModel, MODEL_CONFIGS
from flyp_tpu.models.clip import init_clip_variables

# Public OpenAI CLIP parameter counts (exact, incl. logit_scale).
EXPECTED_PARAMS = {
    "ViT-B/32": 151_277_313,
    "ViT-B/16": 149_620_737,
    "ViT-L/14": 427_616_513,
    "ViT-L/14@336px": 427_944_193,
    "RN50": 102_007_137,
    "RN101": 119_688_033,
    "RN50x4": 178_300_601,
    "RN50x16": 290_979_217,
    "RN50x64": 623_258_305,
}


def test_every_config_has_a_param_pin():
    assert set(EXPECTED_PARAMS) == set(MODEL_CONFIGS)


@pytest.mark.parametrize("name", sorted(MODEL_CONFIGS))
def test_param_count_matches_published_checkpoint(name):
    model = CLIPModel(MODEL_CONFIGS[name])
    shapes = jax.eval_shape(lambda m=model: init_clip_variables(m, 0))
    n = sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(shapes["params"]))
    assert n == EXPECTED_PARAMS[name], f"{name}: {n} params != published {EXPECTED_PARAMS[name]}"


@pytest.mark.parametrize("name", sorted(MODEL_CONFIGS))
def test_structural_invariants(name):
    cfg = MODEL_CONFIGS[name]
    assert cfg.text.width % cfg.text.heads == 0
    if cfg.vision.is_vit:
        assert cfg.vision.image_size % cfg.vision.patch_size == 0
        assert cfg.vision.width % cfg.vision.heads == 0
        # Every published CLIP transformer uses 64-wide heads.
        assert cfg.vision.width // cfg.vision.heads == 64
        assert cfg.text.width // cfg.text.heads == 64
    else:
        # ModifiedResNet: attnpool embeds at width*32 with 64-wide heads
        # (`clip/model.py:95-98`: heads = width * 32 // 64).
        assert len(cfg.vision.resnet_layers) == 4
        assert cfg.vision.heads == cfg.vision.width * 32 // 64
        # Attnpool's spatial grid: image_size / 32 per side.
        assert cfg.vision.image_size % 32 == 0
