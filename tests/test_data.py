"""Data pipeline tests over a synthetic image+TSV corpus."""

import os

import numpy as np
import pytest
from PIL import Image

from flyp_tpu.data import (
    CLIP_MEAN,
    CLIP_STD,
    CsvContrastiveDataset,
    DataLoader,
    eval_transform,
    train_transform,
)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    rng = np.random.default_rng(0)
    rows = ["title\tfilepath\tlabel\tguidance\timg_id"]
    for i in range(24):
        arr = rng.integers(0, 255, (40 + i, 48, 3), dtype=np.uint8)
        path = os.path.join(root, f"img_{i}.png")
        Image.fromarray(arr).save(path)
        guidance = [2, 5, 100][i % 3]
        rows.append(f"a photo of thing {i}\t{path}\t{i % 4}\t{guidance}\t{i}")
    csv_path = os.path.join(root, "train.tsv")
    with open(csv_path, "w") as f:
        f.write("\n".join(rows) + "\n")
    return str(csv_path)


def test_eval_transform_geometry():
    img = Image.fromarray(np.zeros((100, 60, 3), dtype=np.uint8))
    out = eval_transform(32)(img)
    assert out.shape == (32, 32, 3)
    # Black image maps to -mean/std exactly.
    np.testing.assert_allclose(out[0, 0], -CLIP_MEAN / CLIP_STD, rtol=1e-6)


def test_train_transform_shape_and_determinism():
    img = Image.fromarray(np.random.default_rng(1).integers(0, 255, (64, 80, 3), dtype=np.uint8))
    t = train_transform(32)
    a = t(img, np.random.default_rng(7))
    b = t(img, np.random.default_rng(7))
    c = t(img, np.random.default_rng(8))
    assert a.shape == (32, 32, 3)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)


def test_csv_dataset_basic(corpus):
    ds = CsvContrastiveDataset(corpus, eval_transform(32), label_key="label", return_guidance=True, return_img_id=True)
    assert len(ds) == 24
    s = ds.get(0, np.random.default_rng(0))
    assert s["image"].shape == (32, 32, 3)
    assert s["tokens"].shape == (77,)
    assert s["tokens"][0] == 49406
    assert s["label"] == 0 and s["guidance"] == 2 and s["img_id"] == 0


def test_csv_dataset_guidance_filter(corpus):
    ds = CsvContrastiveDataset(corpus, eval_transform(32), guidance=5, return_guidance=True)
    assert len(ds) == 8
    assert all(g == 5 for g in ds.guidance)


def test_csv_dataset_datalimit(corpus):
    ds = CsvContrastiveDataset(corpus, eval_transform(32), guidance=5, datalimit=3)
    assert len(ds) == 3


def test_csv_dataset_ori_proportion(corpus):
    # guidance-5 rows (8) mixed with guidance-100 rows at 20% of the total.
    ds = CsvContrastiveDataset(corpus, eval_transform(32), guidance=5, ori_proportion=0.2, return_guidance=True)
    n_ori = sum(1 for g in ds.guidance if g == 100)
    assert len(ds) == 10 and n_ori == 2


def test_csv_dataset_list_selection(corpus):
    ds = CsvContrastiveDataset(corpus, eval_transform(32), label_key="label", list_selection=[0, 1])
    assert all(l in (0, 1) for l in ds.labels)


def test_npy_sidecar_float_scales_like_topilimage(tmp_path):
    """Float [0,1] .npy sidecars scale by 255 before the uint8 cast
    (torchvision ToPILImage semantics, the reference's .pkl-tensor branch
    `laion.py:123-127`) — a plain cast would truncate them to black."""
    rng = np.random.default_rng(0)
    arr8 = rng.integers(0, 255, (8, 8, 3), dtype=np.uint8)
    np.save(tmp_path / "u8.npy", arr8)
    np.save(tmp_path / "f32.npy", arr8.astype(np.float32) / 255.0)
    csv = tmp_path / "t.tsv"
    csv.write_text(
        "title\tfilepath\n"
        f"a\t{tmp_path / 'u8.npy'}\n"
        f"a\t{tmp_path / 'f32.npy'}\n"
    )
    ds = CsvContrastiveDataset(str(csv), eval_transform(8))
    a = ds.get(0, np.random.default_rng(0))["image"]
    b = ds.get(1, np.random.default_rng(0))["image"]
    # Within one 1/255 quantum of the uint8 path (x/255*255 can truncate one
    # step down, exactly like torch's mul(255).byte()), and clearly not the
    # all-black constant a truncating cast would produce.
    assert np.abs(a - b).max() <= 1.01 / 255 / 0.26  # CLIP stds ~0.26-0.27
    assert b.std() > 0.1


def test_loader_abandoned_iterator_cancels_prefetch(tmp_path):
    """Breaking out of a DataLoader mid-epoch (fisher's max_batches cut, the
    few-shot scan) must cancel the queued prefetch window instead of decoding
    it to completion."""
    import time

    from flyp_tpu.data.loader import DataLoader

    fetched = []

    class DS:
        def __len__(self):
            return 400

        def get(self, idx, rng):
            fetched.append(idx)
            time.sleep(0.002)
            return {"x": np.zeros(1)}

    dl = DataLoader(DS(), batch_size=8, num_workers=2, seed=0)
    it = iter(dl)
    next(it)
    it.close()  # abandon: GeneratorExit -> finally -> shutdown(cancel_futures)
    assert len(fetched) < 200, f"prefetch ran {len(fetched)} decodes after abandon"


def test_loader_batches_and_determinism(corpus):
    ds = CsvContrastiveDataset(corpus, eval_transform(32), label_key="label")
    dl = DataLoader(ds, batch_size=8, shuffle=True, num_workers=4, seed=3)
    dl.set_epoch(0)
    batches_a = [b["label"].copy() for b in dl]
    dl.set_epoch(0)
    batches_b = [b["label"].copy() for b in dl]
    dl.set_epoch(1)
    batches_c = [b["label"].copy() for b in dl]
    assert len(batches_a) == 3
    assert batches_a[0].shape == (8,)
    np.testing.assert_array_equal(np.concatenate(batches_a), np.concatenate(batches_b))
    assert not np.array_equal(np.concatenate(batches_a), np.concatenate(batches_c))


def test_loader_batch_contents(corpus):
    ds = CsvContrastiveDataset(corpus, eval_transform(32))
    dl = DataLoader(ds, batch_size=6, shuffle=False, num_workers=2)
    batch = next(iter(dl))
    assert batch["image"].shape == (6, 32, 32, 3)
    assert batch["tokens"].shape == (6, 77)
    assert batch["image"].dtype == np.float32


def test_grain_csv_loader(corpus, tmp_path):
    """Grain backend: dict batches, deterministic per-epoch shuffles,
    drop_last train semantics, DataLoader-compatible surface."""
    grain = pytest.importorskip("grain")

    from flyp_tpu.config import ExperimentConfig
    from flyp_tpu.data.grain_data import get_grain_csv_loader

    cfg = ExperimentConfig(ft_data=corpus, ft_data_test=corpus, batch_size=4, workers=0, seed=0)
    loader = get_grain_csv_loader(cfg, is_train=True, image_size=32)
    n = len(loader.dataset)
    assert len(loader) == n // 4

    batches = list(loader)
    assert len(batches) == len(loader)
    assert batches[0]["image"].shape == (4, 32, 32, 3)
    assert batches[0]["tokens"].shape[0] == 4

    # Same epoch -> identical stream; new epoch -> reshuffled.
    again = list(loader)
    np.testing.assert_array_equal(batches[0]["tokens"], again[0]["tokens"])
    loader.set_epoch(1)
    shuffled = list(loader)
    assert not all(
        np.array_equal(a["tokens"], b["tokens"]) for a, b in zip(batches, shuffled)
    )
