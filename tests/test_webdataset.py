"""Tar-shard pipeline tests over synthetic shards."""

import io
import json
import os
import tarfile

import numpy as np
import pytest
from PIL import Image

from flyp_tpu.data.transforms import eval_transform
from flyp_tpu.data.webdataset import WebDatasetLoader, braceexpand, expand_urls, get_dataset_size


@pytest.fixture(scope="module")
def shards(tmp_path_factory):
    root = tmp_path_factory.mktemp("wds")
    rng = np.random.default_rng(0)
    sizes = {}
    for s in range(4):
        name = f"shard-{s:05d}.tar"
        with tarfile.open(root / name, "w") as tf:
            for i in range(6):
                key = f"{s:05d}{i:04d}"
                img = Image.fromarray(rng.integers(0, 255, (40, 40, 3), dtype=np.uint8))
                buf = io.BytesIO()
                img.save(buf, format="PNG")
                for ext, data in (("png", buf.getvalue()), ("txt", f"caption {key}".encode())):
                    info = tarfile.TarInfo(f"{key}.{ext}")
                    info.size = len(data)
                    tf.addfile(info, io.BytesIO(data))
        sizes[name] = 6
    with open(root / "sizes.json", "w") as f:
        json.dump(sizes, f)
    return str(root)


def test_braceexpand():
    assert braceexpand("s-{00..02}.tar") == ["s-00.tar", "s-01.tar", "s-02.tar"]
    assert braceexpand("{a,b}/{0..1}") == ["a/0", "a/1", "b/0", "b/1"]
    assert expand_urls("x.tar::y.tar") == ["x.tar", "y.tar"]


def test_dataset_size_from_sizes_json(shards):
    assert get_dataset_size(os.path.join(shards, "shard-{00000..00003}.tar")) == 24


def test_loader_batches(shards):
    loader = WebDatasetLoader(
        os.path.join(shards, "shard-{00000..00003}.tar"),
        transform=eval_transform(32),
        batch_size=8,
        num_workers=2,
    )
    batches = list(loader)
    assert len(batches) == len(loader) == 3
    assert batches[0]["image"].shape == (8, 32, 32, 3)
    assert batches[0]["tokens"].shape == (8, 77)


def test_loader_epoch_shuffle_deterministic(shards):
    def tokens_sig(loader):
        return np.concatenate([b["tokens"].ravel() for b in loader])

    kw = dict(transform=eval_transform(32), batch_size=4, num_workers=1)
    url = os.path.join(shards, "shard-{00000..00003}.tar")
    a = WebDatasetLoader(url, **kw)
    b = WebDatasetLoader(url, **kw)
    a.set_epoch(0), b.set_epoch(0)
    np.testing.assert_array_equal(tokens_sig(a), tokens_sig(b))
    # Some epoch must reorder the 4 shards relative to epoch 0.
    base = tokens_sig(a)
    diffs = []
    for e in (1, 2, 3):
        b.set_epoch(e)
        diffs.append(not np.array_equal(base, tokens_sig(b)))
    assert any(diffs)


def test_loader_tolerates_corrupt_shard(shards, tmp_path):
    bad = tmp_path / "bad.tar"
    bad.write_bytes(b"this is not a tar file")
    loader = WebDatasetLoader(
        [str(bad)] + expand_urls(os.path.join(shards, "shard-{00000..00001}.tar")),
        transform=eval_transform(32),
        batch_size=4,
        num_samples=12,
        num_workers=1,
    )
    batches = list(loader)
    assert len(batches) == 3  # 12 good samples / 4


def test_node_split(shards):
    url = os.path.join(shards, "shard-{00000..00003}.tar")
    kw = dict(transform=eval_transform(32), batch_size=2, num_workers=1, process_count=2)
    n0 = WebDatasetLoader(url, process_index=0, **kw)
    n1 = WebDatasetLoader(url, process_index=1, **kw)
    assert len(n0) == len(n1) == 6  # 24/2 processes /2 batch
    k0 = {tuple(b["tokens"][i]) for b in n0 for i in range(2)}
    k1 = {tuple(b["tokens"][i]) for b in n1 for i in range(2)}
    assert not (k0 & k1)  # disjoint across nodes


def test_shard_starved_host_still_yields_full_epoch(shards):
    """More hosts than shards: the strided node split would leave rank 5 of
    6 with NOTHING — it must fall back to a cyclic shard assignment and emit
    the promised batch count, or every other host's collective train step
    hangs mid-epoch."""
    url = os.path.join(shards, "shard-{00000..00003}.tar")
    loader = WebDatasetLoader(
        url, transform=eval_transform(32), batch_size=2, num_workers=1,
        num_samples=24, process_index=5, process_count=6,
    )
    batches = list(loader)
    assert len(batches) == len(loader) == 2  # 24 / 6 hosts / batch 2


def test_is_webdataset_dispatch():
    from flyp_tpu.data.webdataset import is_webdataset

    assert is_webdataset("shards-{00000..00099}.tar", "auto")
    assert is_webdataset("data/shard.tar", "auto")
    assert not is_webdataset("train.csv", "auto")
    assert not is_webdataset("train.tsv", "auto")
    assert is_webdataset("train.csv", "webdataset")  # explicit type wins
    assert not is_webdataset("x.tar", "csv")


def test_flyp_trainer_dispatches_tar_shards(shards, tmp_path):
    """flyp_train with --ft_data pointing at tar shards uses the webdataset
    pipeline end to end (`laion.py:602-619` dispatch parity)."""
    import dataclasses as dc
    import os

    import pandas as pd

    from flyp_tpu.config import ExperimentConfig
    from flyp_tpu.models import CLIPModel, MODEL_CONFIGS, init_clip_params
    from flyp_tpu.training.flyp import flyp_train

    cfg = MODEL_CONFIGS["ViT-B/16"]
    cfg = dc.replace(
        cfg,
        embed_dim=32,
        vision=dc.replace(cfg.vision, image_size=32, patch_size=16, width=64, layers=2, heads=1),
        text=dc.replace(cfg.text, width=64, heads=1, layers=2),
    )
    model = CLIPModel(cfg)
    variables = {"params": init_clip_params(model, 0)}

    exp = ExperimentConfig(
        ft_data=os.path.join(shards, "shard-{00000..00003}.tar"),
        batch_size=8,
        lr=1e-3,
        wd=0.1,
        warmup_length=1,
        epochs=1,
        workers=2,
        debug=True,
        compute_dtype="float32",
        log_dir=str(tmp_path / "logs"),
    )
    flyp_train(exp, model=model, variables=variables, print_every=1)
    stats = pd.read_csv(os.path.join(exp.log_dir, "stats.tsv"), sep="\t")
    assert len(stats) == 1 and "Avg ID FLYP Loss" in stats.columns
    # 24 samples / batch 8 = 3 train batches actually consumed.
    log_text = open(os.path.join(exp.log_dir, "log.log")).read()
    assert "Num batches is 3" in log_text


def test_node_split_equal_batch_counts_on_skewed_shards(tmp_path):
    """3 shards / 2 hosts: the strided shard split hands host 0 two shards
    (12 samples) and host 1 one (6), but num_samples//count//batch demands
    4 batches from BOTH — a host that merely exhausted its shards would
    yield 3 and hang the other host's collective step mid-epoch.  Workers
    must cycle their shards (wds `with_epoch` semantics, `laion.py:500-511`)
    until the quota is met."""
    import tarfile as _tarfile

    rng = np.random.default_rng(0)
    for s in range(3):
        with _tarfile.open(tmp_path / f"sk-{s:05d}.tar", "w") as tf:
            for i in range(6):
                key = f"{s:05d}{i:04d}"
                img = Image.fromarray(rng.integers(0, 255, (40, 40, 3), dtype=np.uint8))
                buf = io.BytesIO()
                img.save(buf, format="PNG")
                for ext, data in (("png", buf.getvalue()), ("txt", f"caption {key}".encode())):
                    info = _tarfile.TarInfo(f"{key}.{ext}")
                    info.size = len(data)
                    tf.addfile(info, io.BytesIO(data))

    url = os.path.join(str(tmp_path), "sk-{00000..00002}.tar")
    kw = dict(transform=eval_transform(32), batch_size=2, num_workers=1, num_samples=18, process_count=2)
    for rank in (0, 1):
        loader = WebDatasetLoader(url, process_index=rank, **kw)
        assert len(loader) == 4  # (18//2)//2
        batches = list(loader)
        assert len(batches) == 4, f"rank {rank} yielded {len(batches)} batches"
        assert all(b["image"].shape == (2, 32, 32, 3) for b in batches)
