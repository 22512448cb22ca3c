"""Hardware end-to-end check: the REAL trainer on the REAL chip.

``bench.py`` times the jitted step in isolation and
``tools/tpu_convergence_check.py`` trains a tiny CLIP through the raw step
function; this script instead drives the full product path — CSV loader,
``flyp_train``'s epoch loop (`/root/reference/src/models/flyp_loss.py:388-539`
equivalent), per-epoch zero-shot head rebuild, the eval harness, stats TSVs,
and an orbax checkpoint — with a full-size random-init ViT-B/16 in bfloat16
on whatever backend is available (the tunneled TPU chip under axon; CPU
works too, slowly).

Usage: python tools/tpu_e2e_check.py [--epochs 2] [--batch-size 64]
Exits non-zero if the run produced non-finite losses or missing artifacts.
"""

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd


def make_corpus(root: str, n_per_class: int = 32, px: int = 224):
    """Synthetic 2-class patchcamelyon tree + contrastive TSV (the same
    shape the CI trainer tests fabricate, at full image resolution)."""
    from PIL import Image

    rng = np.random.default_rng(0)
    classnames = ["lymph node", "lymph node containing metastatic tumor tissue"]
    rows = []
    for split in ("train", "val"):
        for ci in range(2):
            d = os.path.join(root, "patchcamelyon", split, f"class_{ci}")
            os.makedirs(d, exist_ok=True)
            for i in range(n_per_class):
                base = np.full((px, px, 3), 50 + 140 * ci, np.uint8)
                noise = rng.integers(0, 60, (px, px, 3), dtype=np.uint8)
                path = os.path.join(d, f"{i}.png")
                Image.fromarray(base + noise).save(path)
                if split == "train":
                    rows.append({
                        "title": f"this is a photo of {classnames[ci]}",
                        "filepath": path,
                        "label": ci,
                    })
    train_csv = os.path.join(root, "train.tsv")
    pd.DataFrame(rows).to_csv(train_csv, sep="\t", index=False)
    return train_csv


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--images-per-class", type=int, default=32)
    ap.add_argument("--model", default="ViT-B/16", help="any MODEL_CONFIGS key; RN50 exercises the BatchNorm/batch_stats path")
    args = ap.parse_args()

    import jax

    from flyp_tpu.config import ExperimentConfig
    from flyp_tpu.models import CLIPModel, MODEL_CONFIGS, init_clip_variables
    from flyp_tpu.training.flyp import flyp_train

    backend = jax.default_backend()
    on_tpu = backend in ("tpu", "axon")
    print(f"backend: {backend} ({jax.devices()[0].device_kind})")

    with tempfile.TemporaryDirectory() as tmp:
        train_csv = make_corpus(tmp, n_per_class=args.images_per_class)
        log_dir = os.path.join(tmp, "logs")
        ckpt_dir = os.path.join(tmp, "ckpt")

        cfg = ExperimentConfig(
            train_dataset="PatchCamelyonVal",
            template="patchcamelyon_template",
            eval_datasets=["PatchCamelyonVal"],
            data_location=tmp,
            ft_data=train_csv,
            ft_data_test=train_csv,
            batch_size=args.batch_size,
            lr=1e-5,
            wd=0.1,
            warmup_length=2,
            epochs=args.epochs,
            workers=4,
            debug=True,
            compute_dtype="bfloat16" if on_tpu else "float32",
            log_dir=log_dir,
            save=ckpt_dir,
        )

        import jax.numpy as jnp

        dtype = jnp.bfloat16 if on_tpu else jnp.float32
        model = CLIPModel(MODEL_CONFIGS[args.model], compute_dtype=dtype)
        variables = init_clip_variables(model, 0)
        flyp_train(cfg, model=model, variables=variables, print_every=1)

        stats = pd.read_csv(os.path.join(log_dir, "stats.tsv"), sep="\t")
        losses = stats["Avg ID FLYP Loss"].to_numpy(dtype=float)
        accs = stats["PatchCamelyonVal Accuracy"].to_numpy(dtype=float)
        assert len(stats) == args.epochs, f"expected {args.epochs} epoch rows, got {len(stats)}"
        assert np.all(np.isfinite(losses)), f"non-finite epoch losses: {losses}"
        assert np.all((accs >= 0) & (accs <= 1)), f"bad accuracies: {accs}"
        assert os.path.isdir(os.path.join(ckpt_dir, f"checkpoint_{args.epochs - 1}")), "missing final checkpoint"
        print(f"epoch losses: {losses.tolist()}  eval accs: {accs.tolist()}")
        print("full-trainer TPU e2e check OK")


if __name__ == "__main__":
    main()
