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


def get_classnames_for(name: str, cfg=None):
    """Class names for a dataset *without* touching its on-disk tree.

    The reference instantiates the dataset just to read ``classnames``
    (`zeroshot.py:27-50`), which requires the data root to exist; the
    zero-shot head only needs the names, and for every supported suite they
    are derivable from packaged assets.
    """
    import pandas as pd

    from flyp_tpu.data.classnames import (
        IMAGENET_A_SUBLIST,
        IMAGENET_R_SUBLIST,
        fmow_classnames,
        get_classnames,
    )

    name = _ALIASES.get(name, name)
    cls = get_dataset_class(name)

    fixed = getattr(cls, "fixed_classnames", None)
    if fixed is not None:
        return list(fixed)

    if name.startswith("IWildCam"):
        import pathlib

        labels = pathlib.Path(__file__).parent / "metadata" / "iwildcam" / "labels.csv"
        df = pd.read_csv(labels)
        df = df[df["y"] < 99999]
        return [s.lower() for s in df["english"].tolist()]

    if name.startswith("FMOW"):
        return list(fmow_classnames)

    if name.startswith("ObjectNet"):
        from flyp_tpu.data.datasets.objectnet import get_metadata

        _, _, folder_to_ids, classname_map = get_metadata()
        return [classname_map[c].lower() for c in sorted(folder_to_ids.keys())]

    if "VidRobust" in name:
        return get_classnames("imagenet_vid_robust_classnames")

    base = get_classnames("openai")
    if name.startswith("ImageNetR"):
        return [base[i] for i in IMAGENET_R_SUBLIST]
    if name.startswith("ImageNetA") and name != "ImageNetAll":
        return [base[i] for i in IMAGENET_A_SUBLIST]
    if name.startswith("ImageNet"):
        return base
    if name.startswith("OxfordPet"):
        raise KeyError("OxfordPet classnames require the on-disk annotations; instantiate the dataset")
    raise KeyError(f"no static classnames for {name!r}")
