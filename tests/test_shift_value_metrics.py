"""Value-level metric tests for ObjectNet and ImageNet-Vid-Robust.

Unlike the shape-level tests in test_shift_datasets.py, these drive the
FULL eval path (`eval_single_dataset` -> project_logits / custom accuracy /
post_loop_metrics) over realistic fixture trees — multi-imagenet-class
ObjectNet folders and multi-frame pmsets with multi-label frames — and
assert the metrics against hand-computed values
(`/root/reference/src/datasets/objectnet.py:110-140`,
`imagenet_vid_robust.py:24-156`).

The stub classifier encodes the desired 1000-way prediction in the image's
gray value, so the logits that reach the projection hooks depend on the
actual decoded/transformed pixels — the plumbing is tested end to end.
"""

import json
import os

import numpy as np
from PIL import Image

from flyp_tpu.config import ExperimentConfig
from flyp_tpu.data.transforms import CLIP_MEAN, CLIP_STD, eval_transform
from flyp_tpu.evaluation.evaluator import eval_single_dataset

#: gray value 40*(k+1) encodes "predict imagenet class _CLASS_OF_GRAY[k]"
_GRAY_STEP = 40


def _save_gray(path, slot: int):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    v = _GRAY_STEP * (slot + 1)
    Image.fromarray(np.full((48, 48, 3), v, np.uint8)).save(path)


class _GrayCodeClassifier:
    """predict_logits: recover the gray slot from the normalized image and
    emit one-hot 1000-way logits at the imagenet id that slot stands for."""

    def __init__(self, slot_to_imagenet_id):
        self.slot_to_imagenet_id = slot_to_imagenet_id

    def predict_logits(self, images):
        images = np.asarray(images)
        v255 = (images[..., 0] * CLIP_STD[0] + CLIP_MEAN[0]) * 255.0
        slots = np.rint(v255.mean(axis=(1, 2)) / _GRAY_STEP).astype(int) - 1
        logits = np.full((images.shape[0], 1000), -5.0, dtype=np.float32)
        for i, s in enumerate(slots):
            logits[i, self.slot_to_imagenet_id[int(s)]] = 5.0
        return logits


def _cfg(tmp_path):
    return ExperimentConfig(data_location=str(tmp_path), batch_size=4, workers=1)


def test_objectnet_value_level_accuracy(tmp_path):
    """Max-pool projection over a folder with MULTIPLE imagenet ids: a hit on
    the secondary id must count, a hit on another folder's id must not."""
    from flyp_tpu.data.datasets.objectnet import ObjectNet, get_metadata

    _, _, folder_to_ids, _ = get_metadata()
    multi_folder = next(f for f in sorted(folder_to_ids) if len(folder_to_ids[f]) >= 2)
    other_folder = next(f for f in sorted(folder_to_ids) if set(folder_to_ids[f]).isdisjoint(folder_to_ids[multi_folder]))

    ids_multi = folder_to_ids[multi_folder]
    ids_other = folder_to_ids[other_folder]

    img_root = tmp_path / "objectnet-1.0" / "images"
    # slot -> which imagenet id the classifier will fire on
    slot_to_id = {0: ids_multi[0], 1: ids_multi[1], 2: ids_other[0]}
    # multi_folder: one image hits the primary id, one hits the SECONDARY id
    # (both correct under max-pool), one hits the other folder's id (wrong).
    _save_gray(str(img_root / multi_folder / "a.png"), 0)
    _save_gray(str(img_root / multi_folder / "b.png"), 1)
    _save_gray(str(img_root / multi_folder / "c.png"), 2)
    # other_folder: one correct image.
    _save_gray(str(img_root / other_folder / "d.png"), 2)

    ds = ObjectNet(preprocess=eval_transform(32), location=str(tmp_path), batch_size=4, num_workers=1)
    results = eval_single_dataset(_GrayCodeClassifier(slot_to_id), ds, _cfg(tmp_path))
    assert results["top1"] == 3 / 4


def test_objectnet_valclasses_label_projection(tmp_path):
    """ObjectNetValClasses projects 0..999 labels into the 113 sublist."""
    from flyp_tpu.data.datasets.objectnet import ObjectNetValClasses, get_metadata

    _, _, folder_to_ids, _ = get_metadata()
    ds_cls_idx = {iid: i for i, f in enumerate(sorted(folder_to_ids)) for iid in folder_to_ids[f]}

    val_root = tmp_path / "ILSVRC2012" / "val"
    (val_root / "dummy").mkdir(parents=True)
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(val_root / "dummy" / "x.png")

    ds = ObjectNetValClasses(preprocess=eval_transform(32), location=str(tmp_path), batch_size=4, num_workers=1)
    some_ids = sorted(ds_cls_idx)[:5]
    projected = ds.project_labels(np.asarray(some_ids))
    assert [int(p) for p in projected] == [ds_cls_idx[i] for i in some_ids]
    # test-set indices point at the 50-image blocks of sublist classes
    idx = ds.get_test_indices()
    assert len(idx) == 50 * len(ds._class_sublist)
    assert idx[0] == ds._class_sublist[0] * 50


def _build_vid_robust_tree(tmp_path):
    base = tmp_path / "imagenet_vid_ytbb_robust" / "imagenet-vid-robust"
    (base / "misc").mkdir(parents=True)
    (base / "metadata").mkdir(parents=True)

    # 4 imagenet wnids -> 3 vid classes; vid class v001 merges TWO wnids.
    wnid_map = {"n100": "v000", "n101": "v001", "n102": "v001", "n103": "v002"}
    rev_wnid_map = {"v000": ["n100"], "v001": ["n101", "n102"], "v002": ["n103"]}
    imagenet_class_index = {str(i): [f"n{100+i}", f"cls{i}"] for i in range(4)}
    vid_class_index = {"0": ["v000", "vidA"], "1": ["v001", "vidB"], "2": ["v002", "vidC"]}
    for i in range(3, 30):
        vid_class_index[str(i)] = [f"vx{i}", f"vid{i}"]

    # Three anchors with 2/3/1-frame pmsets; one frame is multi-label.
    labels = {
        "val/vidA/anchor.png": [0],
        "val/vidA/f1.png": [0],
        "val/vidA/f2.png": [0, 1],  # accepts either vid class
        "val/vidB/anchor.png": [1],
        "val/vidB/f1.png": [1],
        "val/vidB/f2.png": [1],
        "val/vidB/f3.png": [1],
        "val/vidC/anchor.png": [2],
        "val/vidC/f1.png": [2],
    }
    pmsets = {
        "val/vidA/anchor.png": ["val/vidA/f1.png", "val/vidA/f2.png"],
        "val/vidB/anchor.png": ["val/vidB/f1.png", "val/vidB/f2.png", "val/vidB/f3.png"],
        "val/vidC/anchor.png": ["val/vidC/f1.png"],
    }

    json.dump(wnid_map, open(base / "misc/wnid_map.json", "w"))
    json.dump(rev_wnid_map, open(base / "misc/rev_wnid_map.json", "w"))
    json.dump(imagenet_class_index, open(base / "misc/imagenet_class_index.json", "w"))
    json.dump(vid_class_index, open(base / "misc/imagenet_vid_class_index.json", "w"))
    json.dump(labels, open(base / "metadata/labels.json", "w"))
    json.dump(pmsets, open(base / "metadata/pmsets.json", "w"))

    # Per-frame desired prediction, as imagenet class 0..3 (gray slot = class).
    #   vidA: anchor->0 (vid0 OK), f1->0 (OK), f2->2 (vid1, in [0,1] OK)
    #         => pm0 hit AND pm10 hit
    #   vidB: anchor->1 (vid1 OK), f1->2 (vid1 OK), f2->3 (vid2 WRONG), f3->1 (OK)
    #         => pm0 hit, pm10 miss
    #   vidC: anchor->0 (vid0 WRONG), f1->3 (vid2 OK)
    #         => pm0 miss, pm10 miss
    wanted = {
        "val/vidA/anchor.png": 0, "val/vidA/f1.png": 0, "val/vidA/f2.png": 2,
        "val/vidB/anchor.png": 1, "val/vidB/f1.png": 2, "val/vidB/f2.png": 3, "val/vidB/f3.png": 1,
        "val/vidC/anchor.png": 0, "val/vidC/f1.png": 3,
    }
    for key, slot in wanted.items():
        _save_gray(str(base / key), slot)
    return base


def test_vid_robust_pm0_pm10_hand_computed(tmp_path):
    from flyp_tpu.data.datasets.vid_robust import ImageNetVidRobust

    _build_vid_robust_tree(tmp_path)
    ds = ImageNetVidRobust(preprocess=eval_transform(32), location=str(tmp_path), batch_size=4, num_workers=1)

    # multi-wnid merge: rev map for vid class 1 holds imagenet ids {1, 2}
    assert sorted(ds.rev_class_idx_map[1]) == [1, 2]

    clf = _GrayCodeClassifier({i: i for i in range(4)})
    results = eval_single_dataset(clf, ds, _cfg(tmp_path))

    # Hand-computed: anchors A,B correct (pm0=2/3); only A's whole pmset
    # survives (pm10=1/3).
    assert results["pm0"] == 2 / 3
    assert results["pm10"] == 1 / 3
    assert results["merge_op"] == "max"


def test_vid_robust_projection_uses_max_merge(tmp_path):
    from flyp_tpu.data.datasets.vid_robust import ImageNetVidRobust

    _build_vid_robust_tree(tmp_path)
    ds = ImageNetVidRobust(preprocess=eval_transform(32), location=str(tmp_path), batch_size=4, num_workers=1)
    wide = np.full((1, 1000), -1.0, dtype=np.float32)
    wide[0, 1] = 2.0  # one of vid class 1's two imagenet ids
    wide[0, 2] = 7.0  # the other — max merge must pick this
    proj = ds.project_logits(wide)
    assert proj.shape == (1, 30)
    assert proj[0, 1] == 7.0 and proj[0].argmax() == 1
