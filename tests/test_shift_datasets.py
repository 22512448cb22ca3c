"""Distribution-shift dataset hooks over synthetic on-disk trees."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from flyp_tpu.data.transforms import eval_transform


def _save_img(path, seed=0):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(np.random.default_rng(seed).integers(0, 255, (40, 40, 3), dtype=np.uint8)).save(path)


def test_objectnet_metadata_and_projection(tmp_path):
    from flyp_tpu.data.datasets.objectnet import ObjectNet, get_metadata

    class_sublist, mask, folder_to_ids, classname_map = get_metadata()
    assert len(folder_to_ids) == 113
    assert sum(mask) == len(set(class_sublist))

    # Build two folders' worth of images.
    folders = sorted(folder_to_ids.keys())[:2]
    for f in folders:
        _save_img(str(tmp_path / "objectnet-1.0" / "images" / f / "img0.png"))

    ds = ObjectNet(preprocess=eval_transform(32), location=str(tmp_path), batch_size=4, num_workers=1)
    assert len(ds.classnames) == 113
    batch = next(iter(ds.test_loader))
    assert batch["image"].shape[0] == 2

    # 1000-way logits project to 113 by max over each class's imagenet ids.
    logits = np.zeros((2, 1000), dtype=np.float32)
    label_map_idx = sorted(folder_to_ids.keys()).index(folders[0])
    imagenet_ids = folder_to_ids[folders[0]]
    logits[0, imagenet_ids[0]] = 5.0
    projected = ds.project_logits(logits)
    assert projected.shape == (2, 113)
    assert projected[0].argmax() == label_map_idx

    # Custom accuracy consumes 113-wide logits directly.
    correct, n = ds.accuracy(projected, np.array([label_map_idx, 0]), None, None)
    assert n == 2 and correct >= 1

    # scatter_weights inverts the projection for head weights.
    w = np.zeros((4, 113), dtype=np.float32)
    w[:, label_map_idx] = 7.0
    scattered = ds.scatter_weights(w)
    assert scattered.shape == (4, 1000)
    assert (scattered[:, imagenet_ids[0]] == 7.0).all()


def test_vid_robust_pmset_scoring(tmp_path):
    from flyp_tpu.data.datasets.vid_robust import ImageNetVidRobust

    base = tmp_path / "imagenet_vid_ytbb_robust" / "imagenet-vid-robust"
    (base / "misc").mkdir(parents=True)
    (base / "metadata").mkdir(parents=True)

    # Two vid classes mapping to two imagenet wnids.
    wnid_map = {"n001": "v001", "n002": "v002"}
    rev_wnid_map = {"v001": ["n001"], "v002": ["n002"]}
    imagenet_class_index = {"0": ["n001", "classA"], "1": ["n002", "classB"]}
    vid_class_index = {str(i): [f"v{i+1:03d}", f"vid{i}"] for i in range(2)}
    for i in range(2, 30):
        vid_class_index[str(i)] = [f"vx{i}", f"vid{i}"]

    anchor = "val/videoA/frame0.png"
    pm = ["val/videoA/frame1.png"]
    labels = {anchor: [0], pm[0]: [0]}
    pmsets = {anchor: pm}

    json.dump(wnid_map, open(base / "misc/wnid_map.json", "w"))
    json.dump(rev_wnid_map, open(base / "misc/rev_wnid_map.json", "w"))
    json.dump(imagenet_class_index, open(base / "misc/imagenet_class_index.json", "w"))
    json.dump(vid_class_index, open(base / "misc/imagenet_vid_class_index.json", "w"))
    json.dump(labels, open(base / "metadata/labels.json", "w"))
    json.dump(pmsets, open(base / "metadata/pmsets.json", "w"))

    for key in (anchor, pm[0]):
        _save_img(str(base / key))

    ds = ImageNetVidRobust(preprocess=eval_transform(32), location=str(tmp_path), batch_size=4, num_workers=1)
    assert len(ds.classnames) == 30

    # Both anchor and perturbation predicted correctly -> pm0 = pm10 = 1.
    logits = np.zeros((2, 30), dtype=np.float32)
    logits[:, 0] = 3.0
    paths = [str(base / anchor), str(base / pm[0])]
    metrics = ds.post_loop_metrics(np.array([0, 0]), logits, paths, None)
    assert metrics["pm0"] == 1.0 and metrics["pm10"] == 1.0

    # Perturbation frame wrong -> anchor still right (pm0=1) but pm10=0.
    logits2 = logits.copy()
    logits2[1, :] = 0.0
    logits2[1, 5] = 9.0
    metrics2 = ds.post_loop_metrics(np.array([0, 0]), logits2, paths, None)
    assert metrics2["pm0"] == 1.0 and metrics2["pm10"] == 0.0

    # Projection: 1000-way -> 30-way via max.
    wide = np.zeros((1, 1000), dtype=np.float32)
    wide[0, 0] = 4.0  # imagenet class 0 -> vid class 0
    proj = ds.project_logits(wide)
    assert proj.shape == (1, 30) and proj[0].argmax() == 0
