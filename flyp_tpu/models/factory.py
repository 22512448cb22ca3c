"""Model construction from experiment config.

Mirrors ``CLIPEncoder``'s weight-source selection
(`/root/reference/src/models/modeling.py:10-23`): the model-name spelling
routes to OpenAI vs open_clip checkpoints; ``--clip_load`` restores a
fine-tuned checkpoint (torch ``.pt`` via the converter, or a flyp_tpu orbax
directory).  Without a checkpoint (no network egress in CI), params are
CLIP-initialized randomly.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from flyp_tpu.models.clip import CLIPModel, init_clip_variables
from flyp_tpu.models.configs import CLIPConfig, MODEL_CONFIGS, resolve_model_name
from flyp_tpu.models import convert


def build_clip_model(
    cfg,
    config_override: Optional[CLIPConfig] = None,
) -> Tuple[CLIPModel, dict]:
    """Returns (model, variables) per the experiment config."""
    compute_dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

    if config_override is not None:
        config = config_override
    else:
        key, _source = resolve_model_name(cfg.model)
        config = MODEL_CONFIGS[key]

    load_path = cfg.clip_load
    if load_path is None and getattr(cfg, "download_pretrained", False):
        # Opt-in pretrained acquisition (the reference always downloads,
        # `clip/clip.py:110`; this environment has no egress by default).
        from flyp_tpu.models.download import download_model

        load_path = download_model(cfg.model, cfg.cache_dir)
    if load_path and (load_path.endswith(".pt") or load_path.endswith(".bin")):
        state = convert.load_torch_checkpoint(load_path)
        # An explicit config_override must survive the checkpoint path too
        # (convert sniffs the config from tensor shapes otherwise).
        params, batch_stats, config = convert.convert_clip_state_dict(state, config_override)
        model = CLIPModel(config, compute_dtype=compute_dtype, remat=cfg.remat)
        variables = {"params": params}
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
        return model, variables

    model = CLIPModel(config, compute_dtype=compute_dtype, remat=cfg.remat)
    # ALL variable collections: ResNet towers carry batch_stats alongside
    # params; dropping them breaks the mutable-BN apply on from-scratch runs.
    variables = dict(init_clip_variables(model, cfg.seed))

    if load_path and os.path.isdir(load_path):
        from flyp_tpu.utils.checkpoint import _checkpointer

        restored = _checkpointer().restore(os.path.abspath(load_path))
        if isinstance(restored, dict) and "params" in restored and "step" in restored:
            # A trainer checkpoint_{epoch}[_step_{i}] payload (the
            # cont_finetune / eval-a-run flow): take the model collections,
            # drop optimizer + cursor state.
            new_params, new_stats = restored["params"], restored.get("batch_stats") or None
        else:  # bare param tree (save_params)
            new_params, new_stats = restored, None
        if jax.tree_util.tree_structure(new_params) != jax.tree_util.tree_structure(
            dict(variables["params"])
        ):
            raise ValueError(
                f"--clip_load checkpoint at {load_path} does not match model "
                f"{cfg.model}: parameter tree structures differ"
            )
        variables["params"] = new_params
        if new_stats is not None:
            variables["batch_stats"] = new_stats
    return model, variables
