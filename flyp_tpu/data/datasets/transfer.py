"""Transfer / few-shot suites: Caltech-101, StanfordCars, Flowers-102,
PatchCamelyon, SST-2 (rendered text), OxfordPet
(`/root/reference/src/datasets/{caltech101,stanfordcars,flowers102,
patchcamelyon,sst2,oxfordPet}.py`).

All are ImageFolder trees: ``<root>/<dirname>/{train,val,test}`` plus
``train_shot_{k}`` dirs for the few-shot binary tasks.  The reference builds
test loaders with ``shuffle=True`` (SURVEY.md §5 quirk 7); accuracy is
order-invariant, so loaders here are deterministic instead.
"""

from __future__ import annotations

import os
from typing import Optional

from flyp_tpu.data.classnames import (
    caltech101_classnames,
    flowers102_classnames,
    patchcamelyon_classnames,
    sst2_classnames,
    stanfordcars_classnames,
)
from flyp_tpu.data.datasets.base import ImageFolderDataset, VisionDataset


class _FolderTransferDataset(VisionDataset):
    dirname: str = ""
    fixed_classnames = None
    test_subset: str = "test"
    supports_k_shot: bool = False

    def __init__(self, preprocess=None, location=os.path.expanduser("~/data"), k: Optional[int] = None, **kwargs):
        self.k = k
        kwargs.pop("subset", None)
        super().__init__(preprocess, location=location, **kwargs)

    def _resolve_classnames(self, classnames):
        self.classnames = list(self.fixed_classnames)

    def _train_location(self) -> str:
        if self.supports_k_shot and self.k is not None:
            return os.path.join(self.location, self.dirname, f"train_shot_{self.k}")
        return os.path.join(self.location, self.dirname, "train")

    def populate_train(self):
        root = self._train_location()
        if os.path.isdir(root):
            self.train_dataset = ImageFolderDataset.from_root(root, self.train_preprocess)
            self.train_loader = self.make_train_loader(self.train_dataset)
        else:
            self.train_dataset = None
            self.train_loader = None

    def get_test_dataset(self):
        return ImageFolderDataset.from_root(
            os.path.join(self.location, self.dirname, self.test_subset), self.preprocess
        )


class Caltech101Train(_FolderTransferDataset):
    dirname = "caltech-101"
    fixed_classnames = caltech101_classnames
    test_subset = "train"


class Caltech101Val(_FolderTransferDataset):
    dirname = "caltech-101"
    fixed_classnames = caltech101_classnames
    test_subset = "val"


class Caltech101Test(_FolderTransferDataset):
    dirname = "caltech-101"
    fixed_classnames = caltech101_classnames
    test_subset = "test"


class StanfordCarsTrain(_FolderTransferDataset):
    dirname = "StanfordCars"
    fixed_classnames = stanfordcars_classnames
    test_subset = "train"


class StanfordCarsVal(_FolderTransferDataset):
    dirname = "StanfordCars"
    fixed_classnames = stanfordcars_classnames
    test_subset = "val"


class StanfordCarsTest(_FolderTransferDataset):
    dirname = "StanfordCars"
    fixed_classnames = stanfordcars_classnames
    test_subset = "test"


class Flowers102Train(_FolderTransferDataset):
    dirname = "flowers102"
    fixed_classnames = flowers102_classnames
    test_subset = "train"


class Flowers102Val(_FolderTransferDataset):
    dirname = "flowers102"
    fixed_classnames = flowers102_classnames
    test_subset = "val"


class Flowers102Test(_FolderTransferDataset):
    dirname = "flowers102"
    fixed_classnames = flowers102_classnames
    test_subset = "test"


class PatchCamelyonTrain(_FolderTransferDataset):
    dirname = "patchcamelyon"
    fixed_classnames = patchcamelyon_classnames
    test_subset = "train"
    supports_k_shot = True


class PatchCamelyonVal(_FolderTransferDataset):
    dirname = "patchcamelyon"
    fixed_classnames = patchcamelyon_classnames
    test_subset = "val"
    supports_k_shot = True


class PatchCamelyonTest(_FolderTransferDataset):
    dirname = "patchcamelyon"
    fixed_classnames = patchcamelyon_classnames
    test_subset = "test"
    supports_k_shot = True


class SST2Train(_FolderTransferDataset):
    dirname = "sst2"
    fixed_classnames = sst2_classnames
    test_subset = "train"
    supports_k_shot = True


class SST2Val(_FolderTransferDataset):
    dirname = "sst2"
    fixed_classnames = sst2_classnames
    test_subset = "val"
    supports_k_shot = True


class SST2Test(_FolderTransferDataset):
    dirname = "sst2"
    fixed_classnames = sst2_classnames
    test_subset = "test"
    supports_k_shot = True


# OxfordPet: torchvision's OxfordIIITPet layout — images/ + annotations/.
_OXFORD_CAT_BREEDS = [
    "Abyssinian", "Bengal", "Birman", "Bombay", "British Shorthair",
    "Egyptian Mau", "English Cocker Spaniel", "Maine Coon", "Persian",
    "Ragdoll", "Russian Blue", "Siamese", "Sphynx",
]


class OxfordPet(VisionDataset):
    """37-breed OxfordIIITPet test split with the reference's cat/dog index
    lists (`oxfordPet.py:39-43`).  Directory layout:
    ``<root>/OxfordPets/test/oxford-iiit-pet/{images,annotations}``."""

    test_subset = "test"

    def _resolve_classnames(self, classnames):
        self.classnames = None  # derived from annotations at load time

    def _pet_root(self) -> str:
        return os.path.join(self.location, "OxfordPets", self.test_subset, "oxford-iiit-pet")

    def populate_train(self):
        self.train_dataset = None
        self.train_loader = None

    def get_test_dataset(self):
        root = self._pet_root()
        with open(os.path.join(root, "annotations", "test.txt")) as f:
            rows = [line.split() for line in f if line.strip() and not line.startswith("#")]
        # torchvision class names: breed token up to the trailing _<index>,
        # title-cased with spaces.
        def breed(stem):
            return " ".join(p.title() for p in stem.rsplit("_", 1)[0].split("_"))

        names = sorted({breed(r[0]) for r in rows})
        self.classnames = names
        samples = [
            (os.path.join(root, "images", r[0] + ".jpg"), names.index(breed(r[0]))) for r in rows
        ]
        self.class_cat = [n for n in names if n in _OXFORD_CAT_BREEDS]
        self.index_cat = [i for i, n in enumerate(names) if n in _OXFORD_CAT_BREEDS]
        self.index_dog = [i for i, n in enumerate(names) if n not in _OXFORD_CAT_BREEDS]
        return ImageFolderDataset(samples, self.preprocess)


class OxfordPetVal(OxfordPet):
    test_subset = "test"  # the reference points 'val' at the test split too


class OxfordPetTest(OxfordPet):
    test_subset = "test"
