"""Evaluation metrics (host-side numpy)."""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np


def topk_accuracy(logits: np.ndarray, labels: np.ndarray, ks: Sequence[int] = (1,)) -> list:
    """Counts (not rates) of top-k correct, like `utils.py:69-77`."""
    order = np.argsort(-logits, axis=1)
    out = []
    for k in ks:
        out.append(float((order[:, :k] == labels[:, None]).any(axis=1).sum()))
    return out


def macro_f1(preds: np.ndarray, labels: np.ndarray, num_classes: Optional[int] = None) -> float:
    """Macro F1 matching torcheval's
    ``multiclass_f1_score(..., num_classes=N, average='macro')`` used at
    `eval.py:256`: classes absent from BOTH targets and predictions are
    EXCLUDED from the average (torcheval masks classes with zero
    label+prediction count), i.e. sklearn over the union of present class
    ids.  Averaging over all ``num_classes`` ids instead would deflate
    per-guidance curriculum F1 by ~(present/181) and change which guidance
    the progress trainer selects.  Without ``num_classes``, sklearn's
    present-labels default (the WILDS convention)."""
    from sklearn.metrics import f1_score

    if num_classes is not None:
        present = np.union1d(np.unique(labels), np.unique(preds))
        return float(f1_score(labels, preds, labels=present, average="macro", zero_division=0))
    return float(f1_score(labels, preds, average="macro", zero_division=0))


def per_class_tally(preds: np.ndarray, labels: np.ndarray, tally: Dict[int, list]) -> Dict[int, list]:
    """Accumulate {class: [correct, total]} (`eval.py:178-189`)."""
    for cls in np.unique(labels):
        sel = labels == cls
        rec = tally.setdefault(int(cls), [0, 0])
        rec[0] += int((preds[sel] == cls).sum())
        rec[1] += int(sel.sum())
    return tally
