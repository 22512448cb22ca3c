"""Loss-pair clustering (--cluster loss) and --self_data eval paths."""

import dataclasses
import os
import pickle

import numpy as np
import pandas as pd
import pytest
from PIL import Image

from flyp_tpu.config import ExperimentConfig
from flyp_tpu.models import CLIPModel, MODEL_CONFIGS, init_clip_params
from flyp_tpu.training.flyp import flyp_train


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
    root = tmp_path_factory.mktemp("cluster_corpus")
    rng = np.random.default_rng(0)
    classnames = ["lymph node", "lymph node containing metastatic tumor tissue"]
    rows = []
    img_id = 0
    for guidance in (2, 100):
        for ci in range(2):
            d = root / "patchcamelyon" / "val" / f"class_{ci}"
            d.mkdir(parents=True, exist_ok=True)
            for i in range(4):
                p = d / f"{guidance}_{i}.png"
                Image.fromarray(
                    np.full((36, 36, 3), 60 + 120 * ci, np.uint8) + rng.integers(0, 40, (36, 36, 3), dtype=np.uint8)
                ).save(p)
                rows.append({
                    "title": f"this is a photo of {classnames[ci]}",
                    "filepath": str(p), "label": ci, "guidance": guidance, "img_id": img_id,
                })
                img_id += 1
    csv = root / "train.tsv"
    pd.DataFrame(rows).to_csv(csv, sep="\t", index=False)
    return {"root": str(root), "train_csv": str(csv)}


def test_cluster_loss_kmeans_dump(corpus, tmp_path):
    """--cluster loss + --progress_train: per-item losses paired with img_ids
    get KMeans(7)-clustered and dumped (`flyp_loss.py:566-578`)."""
    model, variables = tiny_model()
    cfg = ExperimentConfig(
        train_dataset="PatchCamelyonVal",
        template="patchcamelyon_template",
        eval_datasets=["PatchCamelyonVal"],
        data_location=corpus["root"],
        ft_data=corpus["train_csv"],
        ft_data_test=corpus["train_csv"],
        batch_size=8, lr=1e-3, epochs=1, workers=2, debug=True,
        compute_dtype="float32", log_dir=str(tmp_path / "logs"),
        cluster="loss", progress_train=True,
    )
    flyp_train(cfg, model=model, variables=variables, print_every=2)

    with open(os.path.join(cfg.log_dir, "group_guid0.pkl"), "rb") as f:
        pairs = pickle.load(f)
    assert len(pairs) == 16  # 2 batches x 8 items
    img_ids = {p[0] for p in pairs}
    assert img_ids <= set(range(16))
    labels = {p[2] for p in pairs}
    assert labels <= set(range(7))
    assert os.path.isfile(os.path.join(cfg.log_dir, "best_guid0.pkl"))


def test_self_data_eval_path(corpus, tmp_path):
    """--self_data: eval runs over the CSV with simple accuracy metrics."""
    from flyp_tpu.data.csv_data import get_csv_loader
    from flyp_tpu.evaluation.classifier import Classifier
    from flyp_tpu.evaluation.evaluator import eval_single_dataset
    from flyp_tpu.training.flyp import build_zeroshot_head

    model, variables = tiny_model()
    cfg = ExperimentConfig(
        train_dataset="PatchCamelyonVal",
        template="patchcamelyon_template",
        data_location=corpus["root"],
        ft_data=corpus["train_csv"],
        ft_data_test=corpus["train_csv"],
        batch_size=8, workers=2, self_data=False,
    )
    head = build_zeroshot_head(cfg, model, variables)
    clf = Classifier(model, variables, head, batch_size=8)
    data = get_csv_loader(cfg, is_train=False, image_size=32)

    cfg.self_data = True
    results = eval_single_dataset(clf, data, cfg)
    assert "top1" in results and 0.0 <= results["top1"] <= 1.0


def test_self_data_evaluate_scores_csv_not_registry(corpus, tmp_path):
    """Trainer-level evaluate() with --self_data must score the ft_data_test
    CSV, not the registry dataset (the reference passes dataset=None and
    reads the CSV loader, `eval.py:392-400,104-117`).  data_location points
    at a nonexistent tree, so touching the registry dataset would raise."""
    from flyp_tpu.data.csv_data import get_csv_loader
    from flyp_tpu.evaluation.classifier import Classifier
    from flyp_tpu.evaluation.evaluator import eval_single_dataset, evaluate
    from flyp_tpu.training.flyp import build_zeroshot_head

    model, variables = tiny_model()
    cfg = ExperimentConfig(
        train_dataset="PatchCamelyonVal",
        template="patchcamelyon_template",
        eval_datasets=["PatchCamelyonVal"],
        data_location=str(tmp_path / "no_such_tree"),
        ft_data=corpus["train_csv"],
        ft_data_test=corpus["train_csv"],
        batch_size=8, workers=2, self_data=False,
    )
    head = build_zeroshot_head(cfg, model, variables)
    clf = Classifier(model, variables, head, batch_size=8)

    cfg.self_data = True
    stats: dict = {}
    evaluate(clf, cfg, stats, logger=None)
    assert "PatchCamelyonVal Accuracy" in stats
    # Same number the direct CSV eval produces.
    direct = eval_single_dataset(clf, get_csv_loader(cfg, is_train=False, image_size=32), cfg)
    assert stats["PatchCamelyonVal Accuracy"] == round(direct["top1"], 4)
