"""Linear probe: encoder features + logistic-regression C sweep with warm
starts (`/root/reference/src/models/linear_lbfgs.py`).

Features are extracted once with the jitted image tower and cached to disk
via the shared `flyp_tpu.evaluation.features` utility (the FeatureDataset
pattern of `common.py:81-169`); the sweep selects the best C on the
evaluation features.  The upstream file hardcodes an author home directory
for the feature path (`linear_lbfgs.py:120`) — here ``cfg.cache_dir`` is
the root.
"""

from __future__ import annotations

import copy
import json
import os

import numpy as np

from flyp_tpu.data.registry import get_dataset_class
from flyp_tpu.data.transforms import eval_transform, train_transform
from flyp_tpu.evaluation.classifier import Classifier
from flyp_tpu.evaluation.features import get_features
from flyp_tpu.models.factory import build_clip_model
from flyp_tpu.models.head import ClassificationHead


def log_reg_warm_start_sweep(
    train_features,
    train_labels,
    test_features,
    test_labels,
    num_cs: int = 100,
    start_c: float = -1,
    end_c: float = 2,
    max_iter: int = 200,
    random_state: int = 0,
):
    """Warm-started L-BFGS logistic regression over a log-C grid
    (`linear_lbfgs.py:23-62`)."""
    from sklearn.linear_model import LogisticRegression

    cs = np.logspace(start_c, end_c, num_cs)
    clf = LogisticRegression(random_state=random_state, warm_start=True, max_iter=max_iter)
    best = {"acc": -1.0}
    for i, c in enumerate(cs):
        clf.C = c
        clf.fit(train_features, train_labels)
        acc = float((clf.predict(test_features) == test_labels).mean())
        if acc > best["acc"]:
            best = {
                "acc": acc,
                "coef": copy.deepcopy(clf.coef_),
                "intercept": copy.deepcopy(clf.intercept_),
                "c": float(c),
                "i": i,
            }
    return best


def linear_probe(cfg, logger, model=None, variables=None, num_cs: int = 100) -> dict:
    assert cfg.train_dataset is not None, "Please provide a training dataset."
    logger.info("Linear Probe")
    if model is None:
        model, variables = build_clip_model(cfg)
    image_size = model.config.vision.image_size

    clf = Classifier(model, variables, ClassificationHead.zeros(1, model.config.embed_dim), batch_size=cfg.batch_size)

    train_ds = get_dataset_class(cfg.train_dataset)(
        preprocess=train_transform(image_size), location=cfg.data_location,
        batch_size=cfg.batch_size, num_workers=cfg.workers,
    )
    # The probe fits on the FULL train features (no cross-host reduction);
    # disable per-process sharding of the feature-extraction loader.
    if getattr(getattr(train_ds, "train_loader", None), "shard_by_process", False):
        train_ds.train_loader.shard_by_process = False
    cache = cfg.cache_dir
    train = get_features(clf, train_ds, split="train", cache_dir=cache)
    train_features, train_labels = train["features"], train["labels"]

    eval_name = cfg.eval_datasets[0]
    eval_ds = get_dataset_class(eval_name)(
        preprocess=eval_transform(image_size), location=cfg.data_location,
        batch_size=cfg.batch_size, num_workers=cfg.workers,
    )
    test = get_features(clf, eval_ds, split="val", cache_dir=cache)
    test_features, test_labels = test["features"], test["labels"]

    best = log_reg_warm_start_sweep(train_features, train_labels, test_features, test_labels, num_cs=num_cs)
    logger.info(f"Best i {best['i']} best c : {best['c']} best acc : {best['acc']}")

    from flyp_tpu.parallel.multihost import is_primary

    if cache and is_primary():  # single writer: identical fit on every host
        os.makedirs(cache, exist_ok=True)
        np.savez(os.path.join(cache, f"best_probe_{cfg.run}.npz"), coef=best["coef"], intercept=best["intercept"])
        with open(os.path.join(cache, f"best_probe_{cfg.run}.json"), "w") as f:
            json.dump({"acc": best["acc"], "c": best["c"], "i": best["i"]}, f)
    return best
