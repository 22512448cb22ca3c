"""Checkpoint conversion: torch CLIP state dicts <-> flyp_tpu param pytrees.

Understands the key layout shared by OpenAI CLIP (`/root/reference/clip/
model.py:405-443` sniffs shapes from it) and open_clip checkpoints.  Works on
dicts of numpy arrays or torch tensors; torch is only needed to *read* ``.pt``
files, never at train time.

Layout changes performed:
  * torch Linear ``[out, in]`` kernels -> ``[in, out]``
  * torch Conv ``[out, in, kh, kw]`` -> HWIO ``[kh, kw, in, out]``
  * fused attention ``in_proj_weight [3D, D]`` -> ``qkv_kernel [3, D, D]``
    (reshape then a per-tower transpose: the leading axis is q|k|v, and
    within each tower the output features are head-major, so the last axis
    dim-shards into head groups for tensor parallelism; the leading size-3
    axis keeps the tiled last-two dims 8/128-aligned on TPU)
  * LayerNorm ``weight``/``bias`` -> ``scale``/``bias`` (float32)
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np

from flyp_tpu.models.configs import CLIPConfig, TextConfig, VisionConfig


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().float().numpy()
    return np.asarray(x, dtype=np.float32)


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Read a ``.pt`` checkpoint (JIT archive or plain state dict) to numpy."""
    import torch

    try:
        model = torch.jit.load(path, map_location="cpu")
        state = model.state_dict()
    except RuntimeError:
        state = torch.load(path, map_location="cpu", weights_only=False)
        if isinstance(state, dict) and "state_dict" in state:
            state = {k[len("module.") :] if k.startswith("module.") else k: v for k, v in state["state_dict"].items()}
    return {k: _np(v) for k, v in state.items() if hasattr(v, "shape") or isinstance(v, (list, tuple))}


def sniff_config(state: Dict[str, Any]) -> CLIPConfig:
    """Infer the architecture from state-dict shapes (build_model parity)."""
    state = {k: _np(v) for k, v in state.items() if k not in ("input_resolution", "context_length", "vocab_size")}
    is_vit = "visual.proj" in state

    if is_vit:
        vision_width = state["visual.conv1.weight"].shape[0]
        vision_layers = len([k for k in state if k.startswith("visual.") and k.endswith(".attn.in_proj_weight")])
        patch = state["visual.conv1.weight"].shape[-1]
        grid = round((state["visual.positional_embedding"].shape[0] - 1) ** 0.5)
        vision = VisionConfig(
            image_size=patch * grid,
            width=vision_width,
            patch_size=patch,
            layers=vision_layers,
            heads=vision_width // 64,
        )
    else:
        blocks = tuple(
            len({k.split(".")[2] for k in state if k.startswith(f"visual.layer{b}")}) for b in (1, 2, 3, 4)
        )
        vision_width = state["visual.layer1.0.conv1.weight"].shape[0]
        out_grid = round((state["visual.attnpool.positional_embedding"].shape[0] - 1) ** 0.5)
        vision = VisionConfig(
            image_size=out_grid * 32,
            width=vision_width,
            patch_size=None,
            layers=0,
            heads=vision_width * 32 // 64,
            resnet_layers=blocks,
        )

    embed_dim = state["text_projection"].shape[1]
    text = TextConfig(
        context_length=state["positional_embedding"].shape[0],
        vocab_size=state["token_embedding.weight"].shape[0],
        width=state["ln_final.weight"].shape[0],
        heads=state["ln_final.weight"].shape[0] // 64,
        layers=len({k.split(".")[2] for k in state if k.startswith("transformer.resblocks")}),
    )
    return CLIPConfig(embed_dim=embed_dim, vision=vision, text=text)


def _convert_block(state: Dict[str, np.ndarray], prefix: str) -> Dict[str, Any]:
    return {
        "ln_1": {"scale": state[f"{prefix}.ln_1.weight"], "bias": state[f"{prefix}.ln_1.bias"]},
        "ln_2": {"scale": state[f"{prefix}.ln_2.weight"], "bias": state[f"{prefix}.ln_2.bias"]},
        "attn": {
            "qkv_kernel": state[f"{prefix}.attn.in_proj_weight"]
            .reshape(3, -1, state[f"{prefix}.attn.in_proj_weight"].shape[1])
            .transpose(0, 2, 1),
            "qkv_bias": state[f"{prefix}.attn.in_proj_bias"].reshape(3, -1),
            "out_kernel": state[f"{prefix}.attn.out_proj.weight"].T,
            "out_bias": state[f"{prefix}.attn.out_proj.bias"],
        },
        "mlp": {
            "fc_kernel": state[f"{prefix}.mlp.c_fc.weight"].T,
            "fc_bias": state[f"{prefix}.mlp.c_fc.bias"],
            "proj_kernel": state[f"{prefix}.mlp.c_proj.weight"].T,
            "proj_bias": state[f"{prefix}.mlp.c_proj.bias"],
        },
    }


def _convert_transformer(state: Dict[str, np.ndarray], prefix: str, layers: int) -> Dict[str, Any]:
    return {f"block_{i}": _convert_block(state, f"{prefix}.resblocks.{i}") for i in range(layers)}


def _convert_bn(state: Dict[str, np.ndarray], prefix: str) -> Tuple[Dict, Dict]:
    params = {"scale": state[f"{prefix}.weight"], "bias": state[f"{prefix}.bias"]}
    stats = {"mean": state[f"{prefix}.running_mean"], "var": state[f"{prefix}.running_var"]}
    return params, stats


def _convert_resnet(state: Dict[str, np.ndarray], cfg: VisionConfig, embed_dim: int) -> Tuple[Dict, Dict]:
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def conv_w(key):
        return state[key].transpose(2, 3, 1, 0)

    for i in (1, 2, 3):
        params[f"conv{i}"] = {"kernel": conv_w(f"visual.conv{i}.weight")}
        params[f"bn{i}"], stats[f"bn{i}"] = _convert_bn(state, f"visual.bn{i}")

    for stage in range(4):
        for b in range(cfg.resnet_layers[stage]):
            tp = f"visual.layer{stage + 1}.{b}"
            name = f"layer{stage + 1}_{b}"
            blk_p: Dict[str, Any] = {}
            blk_s: Dict[str, Any] = {}
            for i in (1, 2, 3):
                blk_p[f"conv{i}"] = {"kernel": conv_w(f"{tp}.conv{i}.weight")}
                blk_p[f"bn{i}"], blk_s[f"bn{i}"] = _convert_bn(state, f"{tp}.bn{i}")
            if f"{tp}.downsample.0.weight" in state:
                blk_p["downsample_conv"] = {"kernel": conv_w(f"{tp}.downsample.0.weight")}
                blk_p["downsample_bn"], blk_s["downsample_bn"] = _convert_bn(state, f"{tp}.downsample.1")
            params[name] = blk_p
            stats[name] = blk_s

    ap = "visual.attnpool"
    params["attnpool"] = {
        "positional_embedding": state[f"{ap}.positional_embedding"],
        **{
            proj: {"kernel": state[f"{ap}.{proj}.weight"].T, "bias": state[f"{ap}.{proj}.bias"]}
            for proj in ("q_proj", "k_proj", "v_proj", "c_proj")
        },
    }
    return params, stats


def convert_clip_state_dict(
    state: Dict[str, Any], config: Optional[CLIPConfig] = None
) -> Tuple[Dict[str, Any], Optional[Dict[str, Any]], CLIPConfig]:
    """Convert a torch CLIP state dict to ``(params, batch_stats, config)``.

    ``batch_stats`` is None for ViT towers (no BatchNorm).
    """
    state = {k: _np(v) for k, v in state.items() if k not in ("input_resolution", "context_length", "vocab_size")}
    config = config or sniff_config(state)

    if config.vision.is_vit:
        visual = {
            "patch_kernel": state["visual.conv1.weight"].transpose(2, 3, 1, 0),
            "class_embedding": state["visual.class_embedding"],
            "positional_embedding": state["visual.positional_embedding"],
            "ln_pre": {"scale": state["visual.ln_pre.weight"], "bias": state["visual.ln_pre.bias"]},
            "ln_post": {"scale": state["visual.ln_post.weight"], "bias": state["visual.ln_post.bias"]},
            "proj": state["visual.proj"],
            "transformer": _convert_transformer(state, "visual.transformer", config.vision.layers),
        }
        batch_stats = None
    else:
        visual, visual_stats = _convert_resnet(state, config.vision, config.embed_dim)
        batch_stats = {"visual": visual_stats}

    text = {
        "token_embedding": state["token_embedding.weight"],
        "positional_embedding": state["positional_embedding"],
        "ln_final": {"scale": state["ln_final.weight"], "bias": state["ln_final.bias"]},
        "text_projection": state["text_projection"],
        "transformer": _convert_transformer(state, "transformer", config.text.layers),
    }

    params = {
        "visual": visual,
        "text": text,
        "logit_scale": state["logit_scale"].reshape(()),
    }
    return params, batch_stats, config


# --- reverse conversion: flyp_tpu pytrees -> torch CLIP state dicts --------


def _export_block(block: Dict[str, Any], prefix: str, out: Dict[str, np.ndarray]) -> None:
    D = np.asarray(block["attn"]["qkv_kernel"]).shape[1]
    out[f"{prefix}.ln_1.weight"] = _np(block["ln_1"]["scale"])
    out[f"{prefix}.ln_1.bias"] = _np(block["ln_1"]["bias"])
    out[f"{prefix}.ln_2.weight"] = _np(block["ln_2"]["scale"])
    out[f"{prefix}.ln_2.bias"] = _np(block["ln_2"]["bias"])
    out[f"{prefix}.attn.in_proj_weight"] = _np(block["attn"]["qkv_kernel"]).transpose(0, 2, 1).reshape(3 * D, D)
    out[f"{prefix}.attn.in_proj_bias"] = _np(block["attn"]["qkv_bias"]).reshape(3 * D)
    out[f"{prefix}.attn.out_proj.weight"] = _np(block["attn"]["out_kernel"]).T
    out[f"{prefix}.attn.out_proj.bias"] = _np(block["attn"]["out_bias"])
    out[f"{prefix}.mlp.c_fc.weight"] = _np(block["mlp"]["fc_kernel"]).T
    out[f"{prefix}.mlp.c_fc.bias"] = _np(block["mlp"]["fc_bias"])
    out[f"{prefix}.mlp.c_proj.weight"] = _np(block["mlp"]["proj_kernel"]).T
    out[f"{prefix}.mlp.c_proj.bias"] = _np(block["mlp"]["proj_bias"])


def _export_bn(params: Dict, stats: Dict, prefix: str, out: Dict[str, np.ndarray]) -> None:
    out[f"{prefix}.weight"] = _np(params["scale"])
    out[f"{prefix}.bias"] = _np(params["bias"])
    out[f"{prefix}.running_mean"] = _np(stats["mean"])
    out[f"{prefix}.running_var"] = _np(stats["var"])
    # torch BatchNorm2d state dicts carry this counter; strict load needs it.
    out[f"{prefix}.num_batches_tracked"] = np.asarray(0, dtype=np.int64)


def export_clip_state_dict(
    params: Dict[str, Any], batch_stats: Optional[Dict[str, Any]] = None, config: Optional[CLIPConfig] = None
) -> Dict[str, np.ndarray]:
    """Inverse of :func:`convert_clip_state_dict`: a flyp_tpu param pytree
    (+ ``batch_stats`` for ResNet towers) -> the torch key/shape layout the
    OpenAI reference loads with ``build_model(state_dict)``
    (`/root/reference/clip/model.py:405-443`, strict ``load_state_dict``).

    Lets fine-tuned checkpoints flow BACK to the torch ecosystem; round-trip
    (export -> convert) is bit-exact (tests/test_convert_roundtrip.py).
    Weights export as float32 (build_model re-floats params anyway).
    """
    out: Dict[str, np.ndarray] = {}
    visual, text = params["visual"], params["text"]
    is_vit = "proj" in visual
    if config is not None and config.vision.is_vit != is_vit:
        raise ValueError(
            f"export_clip_state_dict: config says is_vit={config.vision.is_vit} "
            f"but the param tree is a {'ViT' if is_vit else 'ResNet'} tower"
        )
    if not is_vit and batch_stats is None:
        raise ValueError("export_clip_state_dict: ResNet towers need batch_stats (BN running stats)")

    if is_vit:
        out["visual.conv1.weight"] = _np(visual["patch_kernel"]).transpose(3, 2, 0, 1)
        out["visual.class_embedding"] = _np(visual["class_embedding"])
        out["visual.positional_embedding"] = _np(visual["positional_embedding"])
        out["visual.ln_pre.weight"] = _np(visual["ln_pre"]["scale"])
        out["visual.ln_pre.bias"] = _np(visual["ln_pre"]["bias"])
        out["visual.ln_post.weight"] = _np(visual["ln_post"]["scale"])
        out["visual.ln_post.bias"] = _np(visual["ln_post"]["bias"])
        out["visual.proj"] = _np(visual["proj"])
        for name, block in visual["transformer"].items():
            i = int(name.split("_")[1])
            _export_block(block, f"visual.transformer.resblocks.{i}", out)
    else:
        stats = (batch_stats or {}).get("visual", {})
        for i in (1, 2, 3):
            out[f"visual.conv{i}.weight"] = _np(visual[f"conv{i}"]["kernel"]).transpose(3, 2, 0, 1)
            _export_bn(visual[f"bn{i}"], stats[f"bn{i}"], f"visual.bn{i}", out)
        for name in visual:
            if not name.startswith("layer"):
                continue
            stage_b = name[len("layer"):]
            stage, b = stage_b.split("_")
            tp = f"visual.layer{stage}.{b}"
            blk, blk_s = visual[name], stats[name]
            for i in (1, 2, 3):
                out[f"{tp}.conv{i}.weight"] = _np(blk[f"conv{i}"]["kernel"]).transpose(3, 2, 0, 1)
                _export_bn(blk[f"bn{i}"], blk_s[f"bn{i}"], f"{tp}.bn{i}", out)
            if "downsample_conv" in blk:
                out[f"{tp}.downsample.0.weight"] = _np(blk["downsample_conv"]["kernel"]).transpose(3, 2, 0, 1)
                _export_bn(blk["downsample_bn"], blk_s["downsample_bn"], f"{tp}.downsample.1", out)
        ap = visual["attnpool"]
        out["visual.attnpool.positional_embedding"] = _np(ap["positional_embedding"])
        for proj in ("q_proj", "k_proj", "v_proj", "c_proj"):
            out[f"visual.attnpool.{proj}.weight"] = _np(ap[proj]["kernel"]).T
            out[f"visual.attnpool.{proj}.bias"] = _np(ap[proj]["bias"])

    out["token_embedding.weight"] = _np(text["token_embedding"])
    out["positional_embedding"] = _np(text["positional_embedding"])
    out["ln_final.weight"] = _np(text["ln_final"]["scale"])
    out["ln_final.bias"] = _np(text["ln_final"]["bias"])
    out["text_projection"] = _np(text["text_projection"])
    for name, block in text["transformer"].items():
        i = int(name.split("_")[1])
        _export_block(block, f"transformer.resblocks.{i}", out)
    out["logit_scale"] = _np(params["logit_scale"]).reshape(())
    return out


def save_torch_checkpoint(path: str, state: Dict[str, np.ndarray]) -> None:
    """Write an exported state dict as a ``.pt`` file torch can load
    (plain state dict — the reference's non-JIT load path,
    `/root/reference/clip/clip.py:129-136`)."""
    import torch

    torch.save({k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in state.items()}, path)
