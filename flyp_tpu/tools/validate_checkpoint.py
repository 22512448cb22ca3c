"""Validate a real CLIP checkpoint end-to-end: convert -> zero-shot eval.

Usage (needs a downloaded OpenAI/open_clip ``.pt`` and a dataset root):

    python -m flyp_tpu.tools.validate_checkpoint \
        --checkpoint ViT-B-16.pt --train-dataset ImageNet \
        --template openai_imagenet_template \
        --eval-datasets ImageNet,ImageNetV2 --data-location datasets/data

This is the accuracy-parity gate that CI cannot run (no network egress to
fetch weights): zero-shot ImageNet top-1 for OpenAI ViT-B/16 should land at
~68.3%, and a converted FLYP fine-tune at the paper numbers (BASELINE.md).
Optionally cross-checks encoder activations against the reference torch
implementation when it is mounted.
"""

from __future__ import annotations

import numpy as np


def activation_crosscheck(checkpoint_path: str, reference_root: str = "/root/reference") -> float:
    """Max abs diff of image/text features vs the reference torch model."""
    import importlib.util
    import os
    import sys

    import torch

    spec = importlib.util.spec_from_file_location("ref_clip_model", os.path.join(reference_root, "clip/model.py"))
    ref_model_mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_clip_model"] = ref_model_mod
    spec.loader.exec_module(ref_model_mod)

    from flyp_tpu.models import CLIPModel, convert

    state = convert.load_torch_checkpoint(checkpoint_path)
    params, batch_stats, config = convert.convert_clip_state_dict(state)

    ref = ref_model_mod.build_model({k: torch.tensor(v) for k, v in state.items()}).float().eval()

    import jax.numpy as jnp

    model = CLIPModel(config)
    variables = {"params": params}
    if batch_stats is not None:
        variables["batch_stats"] = batch_stats

    rng = np.random.default_rng(0)
    imgs = rng.standard_normal((2, 3, config.vision.image_size, config.vision.image_size)).astype(np.float32)
    vocab = config.text.vocab_size
    toks = np.zeros((2, config.text.context_length), dtype=np.int64)
    toks[:, 0] = vocab - 2  # SOT
    toks[:, 1:4] = rng.integers(1, vocab - 2, (2, 3))
    toks[:, 4] = vocab - 1  # EOT (highest id -> pooling position)

    # Per-block diff localization: hook every reference residual block and
    # capture the flax intermediates, so a conversion/numerics bug points at
    # a specific layer instead of "final features differ".
    ref_acts = {}

    def hook(name):
        def fn(_m, _i, out):
            ref_acts[name] = out.detach().float().numpy()
        return fn

    if config.vision.is_vit:
        for i, blk in enumerate(ref.visual.transformer.resblocks):
            blk.register_forward_hook(hook(f"visual.block_{i}"))
    for i, blk in enumerate(ref.transformer.resblocks):
        blk.register_forward_hook(hook(f"text.block_{i}"))

    with torch.no_grad():
        ref_img = ref.encode_image(torch.from_numpy(imgs)).numpy()
        ref_txt = ref.encode_text(torch.from_numpy(toks)).numpy()

    our_img, img_state = model.apply(
        variables, jnp.asarray(imgs.transpose(0, 2, 3, 1)), method="encode_image",
        capture_intermediates=True, mutable=["intermediates"],
    )
    our_txt, txt_state = model.apply(
        variables, jnp.asarray(toks.astype(np.int32)), method="encode_text",
        capture_intermediates=True, mutable=["intermediates"],
    )

    def block_diff(state, tower, i):
        node = state["intermediates"]
        for part in (tower, "transformer", f"block_{i}", "__call__"):
            node = node[part]
        ours = np.asarray(node[0])  # [B, L, D]
        theirs = ref_acts[f"{tower}.block_{i}"]
        if theirs.shape != ours.shape:  # torch blocks run LND
            theirs = theirs.transpose(1, 0, 2)
        return float(np.abs(ours - theirs).max())

    report = {}
    if config.vision.is_vit:
        for i in range(config.vision.layers):
            report[f"visual.block_{i}"] = block_diff(img_state, "visual", i)
    for i in range(config.text.layers):
        report[f"text.block_{i}"] = block_diff(txt_state, "text", i)
    report["image_features"] = float(np.abs(np.asarray(our_img) - ref_img).max())
    report["text_features"] = float(np.abs(np.asarray(our_txt) - ref_txt).max())
    for name, diff in report.items():
        print(f"  {name:>20s}: max abs diff {diff:.3e}")
    return max(report["image_features"], report["text_features"])


def main(argv=None):
    from flyp_tpu.config import build_parser

    p = build_parser()
    p.add_argument("--checkpoint", default=None, help="torch .pt checkpoint to validate")
    p.add_argument("--crosscheck", action="store_true", help="also diff activations vs the mounted reference")
    ns = p.parse_args(argv)

    if ns.checkpoint is None:
        if not ns.download_pretrained:
            p.error("pass --checkpoint or --download_pretrained")
        if ns.model is None:
            p.error("--download_pretrained needs --model (e.g. --model ViT-B/16)")
        from flyp_tpu.models.download import download_model

        ns.checkpoint = download_model(ns.model, ns.cache_dir)

    from flyp_tpu.config import ExperimentConfig

    known = {f.name for f in __import__("dataclasses").fields(ExperimentConfig)}
    cfg = ExperimentConfig(**{k: v for k, v in vars(ns).items() if k in known})
    cfg.clip_load = ns.checkpoint

    if ns.crosscheck:
        diff = activation_crosscheck(ns.checkpoint)
        print(f"max activation diff vs reference torch model: {diff:.2e}")

    from flyp_tpu.cli.zeroshot_eval import main as zs_main

    stats = zs_main(cfg)
    print(stats)


if __name__ == "__main__":
    main()
