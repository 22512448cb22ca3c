"""Datacreation tools (SURVEY L5, `datacreation_scripts/` in the reference):
the offline generators that fabricate the contrastive training CSVs and
ImageFolder trees the trainer consumes.  Value-level tests on synthetic
fixtures; the folder_csv output round-trips through the training CSV loader.
"""

import os
import pickle

import numpy as np
import pandas as pd
import pytest
from PIL import Image


def _folder_tree(root, classes=("ant", "bee_fly"), per_class=3):
    for ci, c in enumerate(classes):
        d = root / c
        d.mkdir(parents=True)
        for i in range(per_class):
            Image.fromarray(np.full((8, 8, 3), 10 * ci + i, np.uint8)).save(d / f"{i}.png")


def test_folder_csv_schema_and_roundtrip(tmp_path):
    from flyp_tpu.templates import get_template
    from flyp_tpu.tools.datacreation.folder_csv import build_csv

    _folder_tree(tmp_path / "tree")
    out = tmp_path / "train.tsv"
    n = build_csv(str(tmp_path / "tree"), str(out), "patchcamelyon_template")
    template = get_template("patchcamelyon_template")
    assert n == 2 * 3 * len(template)

    df = pd.read_csv(out, sep="\t")
    assert list(df.columns) == ["title", "filepath", "label"]
    assert len(df) == n
    # Folder names become classnames (underscores -> spaces), labels follow
    # sorted-folder order, captions come from the template.
    assert set(df["label"]) == {0, 1}
    row = df[df["label"] == 1].iloc[0]
    assert row["title"] == template[0]("bee fly")
    assert os.path.isfile(row["filepath"])

    # Round-trip: the emitted CSV loads through the training dataset class.
    from flyp_tpu.data.csv_dataset import CsvContrastiveDataset
    from flyp_tpu.data.transforms import train_transform

    ds = CsvContrastiveDataset(str(out), train_transform(8), label_key="label")
    assert len(ds) == n
    item = ds.get(0, np.random.default_rng(0))
    assert item["image"].shape == (8, 8, 3) and item["tokens"].shape == (77,)


def test_folder_csv_no_labels_and_explicit_classnames(tmp_path):
    from flyp_tpu.tools.datacreation.folder_csv import build_csv

    _folder_tree(tmp_path / "tree")
    out = tmp_path / "nolabel.tsv"
    build_csv(
        str(tmp_path / "tree"), str(out), "simple_template",
        classnames=["one", "two"], with_labels=False,
    )
    df = pd.read_csv(out, sep="\t")
    assert list(df.columns) == ["title", "filepath"]
    assert df["title"].iloc[0] == "a photo of a one."
    with pytest.raises(AssertionError, match="classnames vs"):
        build_csv(str(tmp_path / "tree"), str(out), "simple_template", classnames=["only_one"])


def test_train_test_split(tmp_path):
    from flyp_tpu.tools.datacreation.train_test_split import split_folder

    _folder_tree(tmp_path / "flat", classes=("a", "b"), per_class=20)
    counts = split_folder(str(tmp_path / "flat"), str(tmp_path / "split"), seed=0)
    assert sum(counts.values()) == 40
    assert set(counts) == {"train", "val", "test"}
    # copy (not move) by default: sources intact.
    assert len(os.listdir(tmp_path / "flat" / "a")) == 20
    # Every file landed in exactly one split, class dirs preserved.
    seen = []
    for split in ("train", "val", "test"):
        for cls in ("a", "b"):
            seen += [f"{cls}/{f}" for f in os.listdir(tmp_path / "split" / split / cls)]
    assert sorted(seen) == sorted(f"{c}/{i}.png" for c in ("a", "b") for i in range(20))
    # Deterministic under the same seed.
    counts2 = split_folder(str(tmp_path / "flat"), str(tmp_path / "split2"), seed=0)
    assert counts2 == counts


def test_patchcamelyon_h5(tmp_path):
    h5py = pytest.importorskip("h5py")
    from flyp_tpu.tools.datacreation.patchcamelyon_h5 import convert_split, make_k_shot

    xs = np.arange(4 * 8 * 8 * 3, dtype=np.uint8).reshape(4, 8, 8, 3)
    ys = np.array([0, 1, 0, 1])
    with h5py.File(tmp_path / "x.h5", "w") as f:
        f.create_dataset("x", data=xs)
    with h5py.File(tmp_path / "y.h5", "w") as f:
        f.create_dataset("y", data=ys.reshape(-1, 1, 1, 1))

    train = tmp_path / "train"
    n = convert_split(str(tmp_path / "x.h5"), str(tmp_path / "y.h5"), str(train))
    assert n == 4
    assert sorted(os.listdir(train)) == ["class_0", "class_1"]
    got = np.asarray(Image.open(train / "class_1" / "1.png"))
    np.testing.assert_array_equal(got, xs[1])

    k_dir = tmp_path / "train_shot_1"
    assert make_k_shot(str(train), str(k_dir), k=1) == 2
    assert sorted(os.listdir(k_dir / "class_0")) == ["0.png"]


def test_fmow_csv(tmp_path):
    from flyp_tpu.data.classnames import fmow_classnames
    from flyp_tpu.templates import get_template
    from flyp_tpu.tools.datacreation.fmow_csv import build_csv

    cat_a, cat_b = fmow_classnames[0], fmow_classnames[5]
    meta = pd.DataFrame(
        {
            "split": ["train", "train", "seq", "val", "train"],
            "timestamp": [
                "2010-03-01T12:00:00Z",  # keep
                "2014-06-01T12:00:00Z",  # drop: OOD year
                "2010-01-01T00:00:00Z",  # drop: seq split
                "2011-01-01T00:00:00Z",  # drop: not train
                "2012-12-31T23:59:59Z",  # keep
            ],
            "category": [cat_a, cat_a, cat_a, cat_a, cat_b],
        }
    )
    root = tmp_path / "fmow_v1.1"
    root.mkdir()
    meta.to_csv(root / "rgb_metadata.csv", index=False)

    out = tmp_path / "fmow.tsv"
    template = get_template("fmow_template")
    n = build_csv(str(root), str(out))
    assert n == 2 * len(template)
    df = pd.read_csv(out, sep="\t")
    # Row indices into the ORIGINAL metadata key the image filenames.
    assert set(df["filepath"].map(os.path.basename)) == {"rgb_img_0.png", "rgb_img_4.png"}
    assert set(df["label"]) == {0, 5}
    assert df["title"].iloc[0] == template[0](cat_a)


def test_iwildcam_csv(tmp_path):
    from flyp_tpu.templates import get_template
    from flyp_tpu.tools.datacreation.iwildcam_csv import collect_rows, write_csv

    labels = tmp_path / "labels.csv"
    pd.DataFrame(
        {
            "name": ["red fox", "meerkat", "empty"],
            "english": ["red fox", "meerkat", "empty"],
            "y": [3, 7, 99999],  # 99999 rows are filtered out
        }
    ).to_csv(labels, index=False)

    root = tmp_path / "crops"
    fox = root / "red_fox"
    fox.mkdir(parents=True)

    def _img(p):
        p.parent.mkdir(parents=True, exist_ok=True)
        Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(p)

    # Base crops (guidance 100) + two Strength folders.  "a" appears at three
    # guidance values -> tracked img_id; "b" only at one -> img_id -1.
    _img(fox / "a.jpg")
    _img(fox / "b.jpg")
    _img(fox / "Strength30_aug" / "a.jpg")
    _img(fox / "Strength60_aug" / "a.jpg")
    _img(fox / "Strength60_aug" / "c.jpg")
    (root / "unknown_species").mkdir()  # not in labels.csv -> skipped

    df = collect_rows(str(root), str(labels), strength_folders=True)
    assert len(df) == 5
    assert set(df["guidance"]) == {100, 70, 40}
    a_rows = df[df["img_name"] == "a"]
    assert len(a_rows) == 3 and (a_rows["img_id"] >= 0).all()
    assert (df[df["img_name"] != "a"]["img_id"] == -1).all()

    out = tmp_path / "iwc.tsv"
    assert write_csv(df, str(labels), str(out)) == 5
    written = pd.read_csv(out, sep="\t")
    assert list(written.columns) == ["title", "title_1", "filepath", "label", "guidance", "img_id"]
    template = get_template("iwildcam_template")
    assert written["title"].iloc[0] == template[0]("red fox")
    assert set(written["label"]) == {3}

    # CLIP-score filter: only listed (strength-folder, species, img_id)
    # triples survive; base crops are never filtered.
    filt = {"Strength30_aug": {"red_fox": ["a"]}, "Strength60_aug": {"red_fox": []}}
    fp = tmp_path / "filter.pkl"
    with open(fp, "wb") as f:
        pickle.dump(filt, f)
    df2 = collect_rows(str(root), str(labels), strength_folders=True, clip_filter=str(fp))
    assert len(df2) == 3  # a.jpg + b.jpg base crops + Strength30 a.jpg
    assert set(df2["guidance"]) == {100, 70}
