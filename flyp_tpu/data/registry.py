"""Name -> dataset-class resolution, the ``getattr(src.datasets, name)``
pattern of the reference (`flyp_loss.py:309`, `eval.py:392`)."""

from __future__ import annotations

from flyp_tpu.data import datasets as _datasets

# Lower-case aliases the reference registry exports (`src/datasets/__init__.py`).
_ALIASES = {
    "sst2Val": "SST2Val",
    "sst2Test": "SST2Test",
    "sst2Train": "SST2Train",
}


def get_dataset_class(name: str):
    name = _ALIASES.get(name, name)
    cls = getattr(_datasets, name, None)
    if cls is None:
        known = sorted(n for n in dir(_datasets) if not n.startswith("_"))
        raise KeyError(f"unknown dataset {name!r}; known: {known}")
    return cls
