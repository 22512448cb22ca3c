"""Generic encoder-feature extraction + on-disk cache.

Re-expresses `get_features`/`FeatureDataset`
(`/root/reference/src/datasets/common.py:81-169`): encode a dataset's
images once through the (frozen) image tower, cache ``features``/``labels``
(and ``paths`` when the loader yields them) keyed by dataset class name and
split, and serve them as an indexable dataset for probes and frozen-encoder
eval.  The cache is a single ``.npz`` per (dataset, split) instead of the
reference's per-tensor pickle files (no pickle anywhere in this package).

Note the cache is only valid while the encoder is frozen — FLYP training
updates the towers every step, so the per-epoch eval harness deliberately
re-encodes; this utility serves the linear probe, fisher-style analyses,
and zero-shot sweeps over many datasets with one fixed encoder.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from flyp_tpu.parallel import multihost
from flyp_tpu.utils.pipeline import OneStepLag, lagged_device_method


def _cache_path(cache_dir: str, dataset, split: str) -> str:
    return os.path.join(cache_dir, type(dataset).__name__, split, "features.npz")


def extract_loader_features(classifier, loader, with_paths: bool = False) -> Dict[str, np.ndarray]:
    """One encode pass over a loader: {'features', 'labels'[, 'paths']}."""
    feats, labels, paths = [], [], []
    dispatch, fetch = lagged_device_method(classifier, "features_device", "features")
    lag = OneStepLag()  # one-batch lag: overlap the feature fetch with the next encode
    for batch in loader:
        prev = lag.push(dispatch(batch["image"]))
        if prev is not None:
            feats.append(fetch(prev))
        labels.append(np.asarray(batch["label"]))
        if with_paths and "path" in batch:
            paths.extend(list(batch["path"]))
    prev = lag.flush()
    if prev is not None:
        feats.append(fetch(prev))
    out = {"features": np.concatenate(feats), "labels": np.concatenate(labels)}
    if paths:
        out["paths"] = np.asarray(paths)
    return out


def get_features(
    classifier,
    dataset,
    split: str = "train",
    cache_dir: Optional[str] = None,
    with_paths: bool = False,
) -> Dict[str, np.ndarray]:
    """Cached feature extraction for ``dataset.{train,test}_loader``.

    Matches the reference's hit/miss behavior (`common.py:96-118`): a warm
    cache is served without touching the encoder; a miss encodes and fills
    the cache when ``cache_dir`` is set.
    """
    cache = _cache_path(cache_dir, dataset, split) if cache_dir else None
    if cache and os.path.exists(cache):
        with np.load(cache, allow_pickle=False) as z:
            return {k: z[k] for k in z.files}

    loader = dataset.train_loader if split == "train" else dataset.test_loader
    out = extract_loader_features(classifier, loader, with_paths=with_paths)
    if cache and multihost.is_primary():
        # Single-writer rule (docs/PARITY.md divergence 13): probe/fisher
        # loaders are replicated across hosts, so every process reaches this
        # miss path with the same cache key.  Only the primary writes, and via
        # tmp+rename so a concurrent reader never sees a torn .npz.
        os.makedirs(os.path.dirname(cache), exist_ok=True)
        # np.savez appends .npz to names missing it — keep the suffix last.
        tmp = cache + f".{os.getpid()}.tmp.npz"
        np.savez(tmp, **out)
        os.replace(tmp, cache)
    return out


class FeatureDataset:
    """Indexable (feature, label) view (`common.py:156-169`)."""

    def __init__(self, data: Dict[str, np.ndarray]):
        self.features = data["features"]
        self.labels = data["labels"]

    def __len__(self) -> int:
        return len(self.features)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        return {"features": self.features[idx], "labels": self.labels[idx]}
