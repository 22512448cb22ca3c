"""tf.data production input pipeline (host-side C++ decode)."""

import numpy as np
import pandas as pd
import pytest
from PIL import Image

pytest.importorskip("tensorflow")

from flyp_tpu.data.tfdata import TFDataCsvLoader


@pytest.fixture(scope="module")
def frame(tmp_path_factory):
    root = tmp_path_factory.mktemp("tfdata")
    rng = np.random.default_rng(0)
    rows = []
    for i in range(20):
        p = str(root / f"img{i}.jpg")
        Image.fromarray(rng.integers(0, 255, (50 + i, 60, 3), dtype=np.uint8)).save(p)
        rows.append({"title": f"a photo of thing {i}", "filepath": p, "guidance": 100})
    return pd.DataFrame(rows)


def test_train_batches(frame):
    dl = TFDataCsvLoader(frame, image_size=32, batch_size=8, train=True, seed=1)
    assert len(dl) == 2
    batches = list(dl)
    assert len(batches) == 2
    assert batches[0]["image"].shape == (8, 32, 32, 3)
    assert str(batches[0]["image"].dtype) == "bfloat16"
    assert batches[0]["tokens"].shape == (8, 77)
    assert batches[0]["tokens"][0, 0] == 49406


def test_eval_keeps_tail(frame):
    dl = TFDataCsvLoader(frame, image_size=32, batch_size=8, train=False, drop_last=False)
    sizes = [b["image"].shape[0] for b in dl]
    assert sizes == [8, 8, 4]


def test_epoch_shuffle(frame):
    dl = TFDataCsvLoader(frame, image_size=32, batch_size=20, train=True, seed=1)

    def sig():
        return np.concatenate([b["tokens"][:, :8].ravel() for b in dl])

    dl.set_epoch(0)
    a = sig()
    dl.set_epoch(0)
    b = sig()
    np.testing.assert_array_equal(a, b)
    dl.set_epoch(1)
    assert not np.array_equal(a, sig())


def test_list_selection_filters(frame, tmp_path):
    """cont_finetune's class restriction reaches the tfdata backend (it was
    silently dropped before: the trainer passes list_selection=list_classes
    and training must not proceed on all classes)."""
    from types import SimpleNamespace

    from flyp_tpu.data.tfdata import get_tfdata_csv_loader

    df = frame.copy()
    df["label"] = [i % 4 for i in range(len(df))]
    csv = tmp_path / "train.tsv"
    df.to_csv(csv, sep="\t", index=False)
    cfg = SimpleNamespace(
        ft_data=str(csv), ft_data_test=str(csv), csv_separator="\t",
        datalimit=-1, seed=0, batch_size=5, workers=1, get_labeled_csv=False,
    )
    dl_all = get_tfdata_csv_loader(cfg, is_train=True, image_size=32)
    dl_sel = get_tfdata_csv_loader(cfg, is_train=True, image_size=32, list_selection=[0, 2])
    assert len(dl_all) == 4 and len(dl_sel) == 2  # 20 rows -> 10 selected


def test_trainer_with_tfdata_backend(frame, tmp_path):
    """flyp_train consumes the tf.data backend end to end."""
    import dataclasses

    from flyp_tpu.config import ExperimentConfig
    from flyp_tpu.models import CLIPModel, MODEL_CONFIGS, init_clip_params
    from flyp_tpu.training.flyp import flyp_train

    cfg_m = MODEL_CONFIGS["ViT-B/16"]
    cfg_m = dataclasses.replace(
        cfg_m,
        embed_dim=32,
        vision=dataclasses.replace(cfg_m.vision, image_size=32, patch_size=16, width=64, layers=2, heads=1),
        text=dataclasses.replace(cfg_m.text, width=64, heads=1, layers=2),
    )
    model = CLIPModel(cfg_m)
    variables = {"params": init_clip_params(model, 0)}

    csv = tmp_path / "train.tsv"
    df = frame.copy()
    df["label"] = 0
    df.to_csv(csv, sep="\t", index=False)

    import os

    import pandas as pd
    from PIL import Image
    import numpy as np

    for ci in range(2):
        d = tmp_path / "patchcamelyon" / "val" / f"class_{ci}"
        d.mkdir(parents=True)
        Image.fromarray(np.zeros((36, 36, 3), np.uint8)).save(d / "0.png")

    cfg = ExperimentConfig(
        train_dataset="PatchCamelyonVal",
        template="patchcamelyon_template",
        eval_datasets=["PatchCamelyonVal"],
        data_location=str(tmp_path),
        ft_data=str(csv),
        ft_data_test=str(csv),
        batch_size=8, lr=1e-3, epochs=1, workers=2, debug=True,
        compute_dtype="float32", log_dir=str(tmp_path / "logs"),
        data_backend="tfdata",
    )
    flyp_train(cfg, model=model, variables=variables, print_every=2)
    assert os.path.isfile(os.path.join(cfg.log_dir, "stats.tsv"))
