"""Progress-driven curriculum training end-to-end (cfg.progress path):
guidance chosen by per-guidance eval deltas, with exploration."""

import dataclasses
import os

import numpy as np
import pandas as pd
import pytest
from PIL import Image

from flyp_tpu.config import ExperimentConfig
from flyp_tpu.models import CLIPModel, MODEL_CONFIGS, init_clip_params
from flyp_tpu.training.flyp import flyp_train, progress_eval


def tiny_model():
    cfg = MODEL_CONFIGS["ViT-B/16"]
    cfg = dataclasses.replace(
        cfg,
        embed_dim=32,
        vision=dataclasses.replace(cfg.vision, image_size=32, patch_size=16, width=64, layers=2, heads=1),
        text=dataclasses.replace(cfg.text, width=64, heads=1, layers=2),
    )
    model = CLIPModel(cfg)
    return model, {"params": init_clip_params(model, 0)}


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("curri_corpus")
    rng = np.random.default_rng(0)
    classnames = ["lymph node", "lymph node containing metastatic tumor tissue"]

    for ci in range(2):
        d = root / "patchcamelyon" / "val" / f"class_{ci}"
        d.mkdir(parents=True)
        for i in range(4):
            Image.fromarray(
                np.full((36, 36, 3), 60 + 120 * ci, np.uint8) + rng.integers(0, 40, (36, 36, 3), dtype=np.uint8)
            ).save(d / f"{i}.png")

    rows = []
    img_id = 0
    for guidance in (2, 5, 100):
        for ci in range(2):
            d = root / "patchcamelyon" / "val" / f"class_{ci}"
            for i in range(4):
                rows.append({
                    "title": f"this is a photo of {classnames[ci]}",
                    "filepath": str(d / f"{i}.png"),
                    "label": ci, "guidance": guidance, "img_id": img_id,
                })
                img_id += 1
    csv = root / "train.tsv"
    pd.DataFrame(rows).to_csv(csv, sep="\t", index=False)
    return {"root": str(root), "train_csv": str(csv)}


def make_cfg(corpus, tmp_path, **overrides):
    defaults = dict(
        train_dataset="PatchCamelyonVal",
        template="patchcamelyon_template",
        eval_datasets=["PatchCamelyonVal"],
        data_location=corpus["root"],
        ft_data=corpus["train_csv"],
        ft_data_test=corpus["train_csv"],
        batch_size=4, lr=1e-3, wd=0.1, warmup_length=1, epochs=1, workers=2,
        debug=True, compute_dtype="float32", log_dir=str(tmp_path / "logs"),
    )
    defaults.update(overrides)
    return ExperimentConfig(**defaults)


def test_progress_eval_computes_guidance_deltas(corpus, tmp_path):
    model, variables = tiny_model()
    cfg = make_cfg(corpus, tmp_path)
    res, s, last, cur = progress_eval(cfg, model, variables, {}, epoch=0, logger=None)
    assert set(res.keys()) == {2, 5, 100}
    # First epoch: deltas equal the raw per-guidance accuracies.
    assert all(isinstance(v, float) for v in res.values())
    assert any(k.startswith("Guidance") and k.endswith("Accuracy") for k in last)

    # Second call: deltas relative to the recorded last performance.
    res2, _, _, cur2 = progress_eval(cfg, model, variables, last, epoch=1, logger=None)
    for g in (2, 5, 100):
        np.testing.assert_allclose(res2[g], cur2[g] - cur[g], atol=1e-9)


def test_progress_driven_training_runs(corpus, tmp_path):
    model, variables = tiny_model()
    cfg = make_cfg(corpus, tmp_path, curriculum=True, progress=True, explore=True, curriculum_epoch=2, epochs=1)
    flyp_train(cfg, model=model, variables=variables, print_every=5)
    stats = pd.read_csv(os.path.join(cfg.log_dir, "stats.tsv"), sep="\t")
    assert len(stats) == 1


def test_progress_eval_dump(corpus, tmp_path):
    model, variables = tiny_model()
    cfg = make_cfg(corpus, tmp_path, progress_eval=True, epochs=1)
    flyp_train(cfg, model=model, variables=variables, print_every=5)
    assert os.path.isfile(os.path.join(cfg.log_dir, "progress0.tsv"))
    assert os.path.isfile(os.path.join(cfg.log_dir, "progress0.pkl"))


def test_progress_train_best_guid_dump(corpus, tmp_path):
    model, variables = tiny_model()
    cfg = make_cfg(corpus, tmp_path, progress_train=True, epochs=1)
    flyp_train(cfg, model=model, variables=variables, print_every=5)
    import pickle

    with open(os.path.join(cfg.log_dir, "best_guid0.pkl"), "rb") as f:
        best = pickle.load(f)
    assert best.pop("Epoch") == 0
    assert all(g in (2, 5, 100) for g in best.values())