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

    if load_path:
        if not os.path.isdir(load_path):
            raise FileNotFoundError(
                f"--clip_load path {load_path!r} is neither a torch .pt/.bin "
                "file nor an orbax checkpoint directory"
            )
        variables = _load_checkpoint_dir(load_path, cfg.model, variables)
    return model, variables


def _load_checkpoint_dir(load_path: str, model_name: str, variables: dict) -> dict:
    """Restore model collections from an orbax directory into ``variables``.

    Layout-sniffs from checkpoint METADATA (no tensor reads): either a
    trainer ``checkpoint_{e}[_step_{i}]`` payload (utils/checkpoint.py) or a
    bare ``save_params`` tree.  Only params (+batch_stats) are materialized
    — a trainer payload's AdamW moments (~2x params of host RAM and I/O)
    are never read.  Parameter leaf SHAPES are validated against the model
    up front, so a same-family mismatch (e.g. a ViT-B/32 checkpoint into a
    B/16 model — identical tree keys, different kernel/pos-embed shapes)
    fails here with a named-leaf error instead of deep inside ``apply``.
    """
    import numpy as np
    import orbax.checkpoint as ocp

    from flyp_tpu.utils.checkpoint import _checkpointer, restore_params, wait_for_saves

    wait_for_saves()  # a just-async-written checkpoint must be committed first
    tu = jax.tree_util
    path = os.path.abspath(load_path)
    ckptr = _checkpointer()
    try:
        meta = ckptr.metadata(path).item_metadata.tree
    except Exception as e:
        raise ValueError(
            f"--clip_load path {load_path!r} is not a readable orbax checkpoint: {e}"
        ) from e
    is_trainer = isinstance(meta, dict) and "params" in meta and "step" in meta
    params_meta = meta["params"] if is_trainer else meta
    stats_meta = (meta.get("batch_stats") or None) if is_trainer else None

    model_params = dict(variables["params"])
    if tu.tree_structure(params_meta) != tu.tree_structure(model_params):
        raise ValueError(
            f"--clip_load checkpoint at {load_path} does not match model "
            f"{model_name}: parameter tree structures differ"
        )
    flat_meta = tu.tree_flatten_with_path(params_meta)[0]
    mismatches = [
        f"{tu.keystr(kp)}: saved {tuple(m.shape)} vs model {tuple(np.shape(x))}"
        for (kp, m), x in zip(flat_meta, tu.tree_leaves(model_params))
        if tuple(m.shape) != tuple(np.shape(x))
    ]
    if mismatches:
        raise ValueError(
            f"--clip_load checkpoint at {load_path} does not match model "
            f"{model_name}: parameter shapes differ — " + "; ".join(mismatches[:5])
        )
    model_stats = variables.get("batch_stats")
    if model_stats is not None and stats_meta is None:
        raise ValueError(
            f"--clip_load checkpoint at {load_path} carries no batch_stats but "
            f"model {model_name} has BatchNorm towers: serving trained conv "
            "weights with fresh running statistics would be silently wrong. "
            "Load a trainer checkpoint or a torch .pt (both carry BN stats)."
        )

    if is_trainer:
        item = {"params": variables["params"]}
        if model_stats is not None:
            item["batch_stats"] = model_stats
        restore_args = tu.tree_map(lambda _: ocp.RestoreArgs(restore_type=np.ndarray), item)
        restored = ckptr.restore(path, item=item, transforms={}, restore_args=restore_args)
    else:  # bare param tree (save_params)
        restored = {"params": restore_params(path, variables["params"])}
    variables = dict(variables)
    variables["params"] = restored["params"]
    if model_stats is not None and "batch_stats" in restored:
        variables["batch_stats"] = restored["batch_stats"]
    return variables
