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
    """Macro F1.  With ``num_classes`` the average spans all class ids
    (absent classes count as 0), matching torcheval's
    ``multiclass_f1_score(..., num_classes=N, average='macro')`` used at
    `eval.py:256`; without it, sklearn's present-labels default."""
    from sklearn.metrics import f1_score

    if num_classes is not None:
        return float(f1_score(labels, preds, labels=list(range(num_classes)), average="macro", zero_division=0))
    return float(f1_score(labels, preds, average="macro", zero_division=0))


def per_class_tally(preds: np.ndarray, labels: np.ndarray, tally: Dict[int, list]) -> Dict[int, list]:
    """Accumulate {class: [correct, total]} (`eval.py:178-189`)."""
    for cls in np.unique(labels):
        sel = labels == cls
        rec = tally.setdefault(int(cls), [0, 0])
        rec[0] += int((preds[sel] == cls).sum())
        rec[1] += int(sel.sum())
    return tally
