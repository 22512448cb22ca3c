"""WILDS iWildCam/FMoW metadata readers over synthetic release trees."""

import json
import os

import numpy as np
import pandas as pd
import pytest
from PIL import Image

from flyp_tpu.data.transforms import eval_transform


def _img(path, seed=0):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(np.random.default_rng(seed).integers(0, 255, (40, 40, 3), dtype=np.uint8)).save(path)


@pytest.fixture(scope="module")
def iwildcam_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("wilds")
    d = root / "iwildcam_v2.0"
    rows = []
    md_images = []
    for i, (split, y, conf) in enumerate([
        ("train", 0, 0.99), ("train", 1, 0.10), ("id_val", 0, 0.99),
        ("test", 1, 0.99), ("test", 0, 0.99), ("id_test", 1, 0.50),
    ]):
        fname = f"img_{i}.jpg"
        _img(str(d / "train" / fname), seed=i)
        rows.append({"split": split, "filename": fname, "y": y, "image_id": f"id{i}"})
        md_images.append({"id": f"id{i}", "max_detection_conf": conf})
    pd.DataFrame(rows).to_csv(d / "metadata.csv", index=False)
    with open(d / "iwildcam2020_megadetector_results.json", "w") as f:
        json.dump({"images": md_images}, f)
    return str(root)


def test_iwildcam_splits(iwildcam_tree):
    from flyp_tpu.data.datasets.wilds_sets import IWildCam, IWildCamOOD

    ds = IWildCamOOD(preprocess=eval_transform(32), location=iwildcam_tree, batch_size=4, num_workers=1)
    assert len(ds.classnames) > 100  # packaged labels.csv
    batches = list(ds.test_loader)
    labels = np.concatenate([b["label"] for b in batches])
    assert sorted(labels.tolist()) == [0, 1]  # the two 'test' rows

    train = IWildCam(preprocess=eval_transform(32), location=iwildcam_tree, batch_size=4, num_workers=1)
    assert len(train.train_dataset) == 2


def test_iwildcam_megadetector_filter(iwildcam_tree):
    from flyp_tpu.data.datasets.wilds_sets import IWildCamNonEmpty

    ds = IWildCamNonEmpty(preprocess=eval_transform(32), location=iwildcam_tree, batch_size=4, num_workers=1)
    # train rows: conf 0.99 passes, conf 0.10 filtered.
    assert len(ds.train_dataset) == 1


def test_iwildcam_f1_metric(iwildcam_tree):
    from flyp_tpu.data.datasets.wilds_sets import IWildCamOOD

    ds = IWildCamOOD(preprocess=eval_transform(32), location=iwildcam_tree, batch_size=4, num_workers=1)
    logits = np.zeros((4, 5), dtype=np.float32)
    logits[np.arange(4), [0, 1, 1, 2]] = 5.0
    metrics = ds.post_loop_metrics(np.array([0, 1, 2, 2]), logits, None, None)
    assert 0.0 <= metrics["F1-macro_all"] <= 1.0
    assert metrics["acc_avg"] == 0.75  # preds [0,1,1,2] vs labels [0,1,2,2]


@pytest.fixture(scope="module")
def fmow_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("fmow")
    d = root / "fmow_v1.1"
    rows = [
        # idx, original split, year, category, region
        ("train", "2010-05-01T00:00:00Z", "airport", "Asia"),
        ("train", "2011-05-01T00:00:00Z", "barn", "Europe"),
        ("train", "2014-05-01T00:00:00Z", "port", "Asia"),      # OOD-year train row: belongs to NO split (WILDS)
        ("val", "2012-05-01T00:00:00Z", "airport", "Africa"),   # id_val
        ("val", "2014-05-01T00:00:00Z", "barn", "Asia"),        # OOD val
        ("test", "2012-06-01T00:00:00Z", "port", "Europe"),     # id_test
        ("test", "2017-01-01T00:00:00Z", "airport", "Americas"),# OOD test
        ("seq", "2017-01-01T00:00:00Z", "barn", "Asia"),        # dropped
        ("train", "2017-03-01T00:00:00Z", "barn", "Asia"),      # OOD-year train row: NOT in OOD test (split!='test')
        ("test", "2014-06-01T00:00:00Z", "port", "Europe"),     # OOD-year test row: NOT in OOD val (split!='val')
    ]
    meta = pd.DataFrame(
        [{"split": s, "timestamp": t, "category": c, "region": r} for s, t, c, r in rows]
    )
    os.makedirs(d / "images", exist_ok=True)
    meta.to_csv(d / "rgb_metadata.csv", index=False)
    for i in range(len(rows)):
        _img(str(d / "images" / f"rgb_img_{i}.png"), seed=i)
    return str(root)


def test_fmow_year_based_splits(fmow_tree):
    from flyp_tpu.data.datasets.wilds_sets import FMOW, FMOWID, FMOWIDVal, FMOWOOD

    # WILDS intersects the year cutoff with the ORIGINAL split column: the
    # 2017 'train' row and the 2014 'test' row belong to NO eval split.
    ood = FMOWOOD(preprocess=eval_transform(32), location=fmow_tree, batch_size=4, num_workers=1)
    assert len(ood.test_dataset) == 1  # only the 2017 test row (not the 2017 train row)

    val_ood = FMOW(preprocess=eval_transform(32), location=fmow_tree, batch_size=4, num_workers=1)
    val_paths, _, _ = val_ood._load_split("val")
    assert len(val_paths) == 1  # only the 2014 val row (not the 2014 test row)

    id_val = FMOWIDVal(preprocess=eval_transform(32), location=fmow_tree, batch_size=4, num_workers=1)
    assert len(id_val.test_dataset) == 1  # 2012 val row

    id_test = FMOWID(preprocess=eval_transform(32), location=fmow_tree, batch_size=4, num_workers=1)
    assert len(id_test.test_dataset) == 1  # 2012 test row

    train = FMOW(preprocess=eval_transform(32), location=fmow_tree, batch_size=4, num_workers=1)
    assert len(train.train_dataset) == 2  # pre-2013 train rows only


def test_fmow_worst_region(fmow_tree):
    from flyp_tpu.data.datasets.wilds_sets import FMOWOOD

    ds = FMOWOOD(preprocess=eval_transform(32), location=fmow_tree, batch_size=4, num_workers=1)
    logits = np.zeros((4, 62), dtype=np.float32)
    logits[np.arange(4), [0, 0, 6, 6]] = 1.0  # predict airport, airport, barn, barn
    labels = np.array([0, 6, 6, 6])
    regions = np.array(["Asia", "Asia", "Europe", "Europe"])
    metrics = ds.post_loop_metrics(labels, logits, regions, None)
    assert metrics["acc_region:Asia"] == 0.5
    assert metrics["acc_region:Europe"] == 1.0
    assert metrics["acc_worst_region"] == 0.5

    # 'Other' is reported per-region but excluded from the headline min
    # (WILDS takes the worst over the named regions only).
    logits5 = np.zeros((5, 62), dtype=np.float32)
    logits5[np.arange(5), [0, 0, 6, 6, 0]] = 1.0
    labels5 = np.array([0, 6, 6, 6, 6])  # the Other row is wrong
    regions5 = np.array(["Asia", "Asia", "Europe", "Europe", "Other"])
    m5 = ds.post_loop_metrics(labels5, logits5, regions5, None)
    assert m5["acc_region:Other"] == 0.0
    assert m5["acc_worst_region"] == 0.5  # min over Asia/Europe only


def test_fmow_country_code_region_mapping(tmp_path):
    """Real WILDS metadata has country_code, not region; the shipped
    country_code_mapping.csv routes codes to evaluation regions."""
    import pandas as pd

    from flyp_tpu.data.datasets.wilds_sets import FMOWOOD

    d = tmp_path / "fmow_v1.1"
    os.makedirs(d / "images", exist_ok=True)
    rows = [
        {"split": "test", "timestamp": "2017-01-01T00:00:00Z", "category": "airport", "country_code": "JPN"},
        {"split": "test", "timestamp": "2017-02-01T00:00:00Z", "category": "barn", "country_code": "FRA"},
        {"split": "test", "timestamp": "2017-03-01T00:00:00Z", "category": "port", "country_code": "XXX"},
    ]
    pd.DataFrame(rows).to_csv(d / "rgb_metadata.csv", index=False)
    pd.DataFrame(
        [{"country_code": "JPN", "region": "Asia"}, {"country_code": "FRA", "region": "Europe"}]
    ).to_csv(d / "country_code_mapping.csv", index=False)
    for i in range(3):
        _img(str(d / "images" / f"rgb_img_{i}.png"), seed=i)

    ds = FMOWOOD(preprocess=eval_transform(32), location=str(tmp_path), batch_size=4, num_workers=1)
    regions = sorted({s["metadata"] for s in (ds.test_dataset.get(i, np.random.default_rng(0)) for i in range(3))})
    assert regions == ["Asia", "Europe", "Other"]
