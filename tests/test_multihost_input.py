"""Multi-process input sharding for the CSV-family backends.

The reference shards only its webdataset pipeline by node
(`/root/reference/src/datasets/laion.py:464-466`; the CSV path's
DistributedSampler is commented out at `:582`).  Here every host backend —
the threaded DataLoader, tf.data, and Grain — shards by JAX process, and
these tests simulate ``process_count`` of 2..4 on one host to prove the
shards are disjoint, exhaustive, and statically shaped per host.
"""

import os

import numpy as np
import pytest
from PIL import Image

from flyp_tpu.data.csv_dataset import CsvContrastiveDataset
from flyp_tpu.data.loader import DataLoader
from flyp_tpu.data.transforms import eval_transform


N_ROWS = 24


def _make_corpus(root, n_rows):
    rng = np.random.default_rng(0)
    rows = ["title\tfilepath\tlabel\tguidance\timg_id"]
    for i in range(n_rows):
        arr = rng.integers(0, 255, (36, 36, 3), dtype=np.uint8)
        path = os.path.join(root, f"img_{i}.png")
        Image.fromarray(arr).save(path)
        rows.append(f"a photo of thing {i}\t{path}\t{i % 4}\t100\t{i}")
    csv_path = os.path.join(root, "train.tsv")
    with open(csv_path, "w") as f:
        f.write("\n".join(rows) + "\n")
    return str(csv_path)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    return _make_corpus(tmp_path_factory.mktemp("mh_corpus"), N_ROWS)


@pytest.fixture(scope="module")
def corpus15(tmp_path_factory):
    # 15 rows does NOT divide by 2 processes x batch 4: the regression bait
    # for ceil-share splits.
    return _make_corpus(tmp_path_factory.mktemp("mh_corpus15"), 15)


def _dataset(corpus):
    return CsvContrastiveDataset(
        corpus, eval_transform(32), label_key="label", return_img_id=True, seed=0
    )


@pytest.mark.parametrize("count", [2, 3, 4])
def test_threaded_loader_shards_by_process(corpus, count):
    """Each simulated process sees a disjoint stride of the SAME seeded
    global order; the union covers every row exactly once."""
    seen = []
    for rank in range(count):
        loader = DataLoader(
            _dataset(corpus), batch_size=2, shuffle=True, drop_last=True,
            num_workers=2, seed=3, process_index=rank, process_count=count,
        )
        ids = []
        for batch in loader:
            assert batch["image"].shape == (2, 32, 32, 3)  # static per host
            ids.extend(int(x) for x in batch["img_id"])
        assert len(loader) == len(ids) // 2
        seen.append(set(ids))

    for a in range(count):
        for b in range(a + 1, count):
            assert not (seen[a] & seen[b]), f"shards {a} and {b} overlap"
    covered = set().union(*seen)
    # drop_last trims at most (batch-1) rows per process.
    assert len(covered) >= N_ROWS - count * 1
    assert covered <= set(range(N_ROWS))


def test_equal_batch_counts_on_uneven_shares(corpus15):
    """15 rows / 2 processes / batch 4: a ceil-share split hands rank 0 eight
    rows (2 batches) and rank 1 seven (1 batch) — rank 0 would then enter a
    collective train step rank 1 never joins, hanging the slice, and the two
    hosts would build different LR-schedule horizons from ``len(loader)``.
    Every process must get the same floor share (7 rows -> 1 batch each)."""
    per_rank = []
    for rank in range(2):
        loader = DataLoader(
            _dataset(corpus15), batch_size=4, shuffle=True, drop_last=True,
            num_workers=2, seed=3, process_index=rank, process_count=2,
        )
        ids = [int(x) for b in loader for x in b["img_id"]]
        assert len(loader) == len(ids) // 4
        per_rank.append(ids)
    assert len(per_rank[0]) == len(per_rank[1]) == 4
    assert not (set(per_rank[0]) & set(per_rank[1]))


def test_tfdata_equal_batch_counts_on_uneven_shares(corpus15):
    pytest.importorskip("tensorflow")
    import pandas as pd

    from flyp_tpu.data.tfdata import TFDataCsvLoader

    df = pd.read_csv(corpus15, sep="\t")
    n_batches = []
    for rank in range(2):
        loader = TFDataCsvLoader(
            df, image_size=32, batch_size=4, train=True, seed=3,
            process_index=rank, process_count=2,
        )
        n_iter = sum(1 for _ in loader)
        assert len(loader) == n_iter
        n_batches.append(n_iter)
    assert n_batches[0] == n_batches[1] == 1


def test_threaded_loader_shard_determinism(corpus):
    """A row's sample (augmentation stream) is identical no matter which
    process layout fetched it — seeds key on the dataset index."""
    one = {}
    for batch in DataLoader(_dataset(corpus), batch_size=2, shuffle=True, drop_last=False,
                            num_workers=2, seed=3, process_index=0, process_count=1):
        for i, img_id in enumerate(batch["img_id"]):
            one[int(img_id)] = batch["image"][i]
    for rank in (0, 1):
        for batch in DataLoader(_dataset(corpus), batch_size=2, shuffle=True, drop_last=False,
                                num_workers=2, seed=3, process_index=rank, process_count=2):
            for i, img_id in enumerate(batch["img_id"]):
                np.testing.assert_array_equal(batch["image"][i], one[int(img_id)])


@pytest.mark.parametrize("count", [2, 3])
def test_tfdata_loader_shards_by_process(corpus, count):
    tf = pytest.importorskip("tensorflow")  # noqa: F841
    import pandas as pd

    from flyp_tpu.data.tfdata import TFDataCsvLoader
    from flyp_tpu.tokenizer import tokenize

    df = pd.read_csv(corpus, sep="\t")
    # Row identity travels through the pipeline as the caption tokens.
    key_of = {tokenize([t])[0].astype(np.int64).tobytes(): i for i, t in enumerate(df["title"])}

    seen = []
    for rank in range(count):
        loader = TFDataCsvLoader(
            df, image_size=32, batch_size=2, train=True, seed=3,
            process_index=rank, process_count=count,
        )
        ids = []
        for batch in loader:
            assert batch["image"].shape == (2, 32, 32, 3)
            ids.extend(key_of[row.astype(np.int64).tobytes()] for row in batch["tokens"])
        assert len(loader) == len(ids) // 2
        seen.append(set(ids))

    for a in range(count):
        for b in range(a + 1, count):
            assert not (seen[a] & seen[b])
    covered = set().union(*seen)
    assert len(covered) >= N_ROWS - count * 1
    assert covered <= set(range(N_ROWS))


@pytest.mark.parametrize("count", [2, 3])
def test_grain_loader_shards_by_process(corpus, count):
    pytest.importorskip("grain")

    from flyp_tpu.data.grain_data import GrainLoader

    seen = []
    for rank in range(count):
        loader = GrainLoader(
            _dataset(corpus), batch_size=2, shuffle=True, drop_last=True,
            num_workers=0, seed=3, process_index=rank, process_count=count,
        )
        ids = []
        for batch in loader:
            assert batch["image"].shape == (2, 32, 32, 3)
            ids.extend(int(x) for x in batch["img_id"])
        assert len(loader) == len(ids) // 2
        seen.append(set(ids))

    for a in range(count):
        for b in range(a + 1, count):
            assert not (seen[a] & seen[b])
    covered = set().union(*seen)
    assert len(covered) >= N_ROWS - count * 2  # grain drops per-shard remainders too
    assert covered <= set(range(N_ROWS))

def test_resolve_process_validation():
    """An index without a count is a layout bug, not a silent fallback; and
    shard_by_process=False pins (0, 1) over EVERYTHING — the runtime grid
    and explicit overrides alike (an eval loader must never shard)."""
    from flyp_tpu.parallel.multihost import resolve_process

    assert resolve_process(3, 4) == (3, 4)
    assert resolve_process(None, None, shard_by_process=False) == (0, 1)
    assert resolve_process(3, 4, shard_by_process=False) == (0, 1)
    with pytest.raises(ValueError, match="process_count"):
        resolve_process(3, None)


def test_local_batch_size_slices_global_batch(corpus, monkeypatch):
    """cfg.batch_size keeps the reference's GLOBAL meaning: sharded train
    loaders yield batch/process_count rows each, so assembly reconstructs
    exactly the reference's per-step batch (and len(loader) — hence the LR
    horizon — matches the single-host math)."""
    import jax

    from flyp_tpu.config import ExperimentConfig
    from flyp_tpu.data.csv_data import get_csv_loader
    from flyp_tpu.parallel.multihost import local_batch_size

    monkeypatch.setattr(jax, "process_index", lambda: 0)
    monkeypatch.setattr(jax, "process_count", lambda: 2)

    assert local_batch_size(8) == 4
    with pytest.raises(ValueError, match="divisible"):
        local_batch_size(7)

    cfg = ExperimentConfig(ft_data=corpus, ft_data_test=corpus, batch_size=8, workers=1)
    train = get_csv_loader(cfg, is_train=True, image_size=32)
    assert train.batch_size == 4
    # Steps per epoch match the global math: N rows / global batch.
    assert len(train) == N_ROWS // 8
    # Eval keeps the full (replicated) batch.
    ev = get_csv_loader(cfg, is_train=False, image_size=32)
    assert ev.test_loader.batch_size == 8


def test_eval_loader_is_replicated_across_processes(corpus, monkeypatch):
    """Eval loaders must iterate the FULL test set on every host: the
    evaluator has no cross-host metric reduction, so a process-sharded
    test loader would silently score 1/count of the data and each host
    would log a different number as the full-dataset metric."""
    import jax

    monkeypatch.setattr(jax, "process_index", lambda: 1)
    monkeypatch.setattr(jax, "process_count", lambda: 4)

    # Train-style loaders (the default) shard by the runtime grid...
    train = DataLoader(
        _dataset(corpus), batch_size=2, shuffle=True, drop_last=True, num_workers=1, seed=0
    )
    assert len(train) == (N_ROWS // 4) // 2
    # ...eval loaders opt out and keep every row on every host.
    ev = DataLoader(
        _dataset(corpus), batch_size=2, shuffle=False, drop_last=False,
        num_workers=1, seed=0, shard_by_process=False,
    )
    assert len(ev) == N_ROWS // 2
    ids = sorted(int(x) for batch in ev for x in batch["img_id"])
    assert ids == list(range(N_ROWS))


def test_eval_construction_sites_disable_process_sharding(corpus):
    """The csv/tfdata factories request sharding for train and replication
    for eval (datasets/base.populate_test is covered by the default-off
    shard_by_process=False argument it passes)."""
    from flyp_tpu.config import ExperimentConfig
    from flyp_tpu.data.csv_data import get_csv_loader

    cfg = ExperimentConfig(ft_data=corpus, ft_data_test=corpus, batch_size=2, workers=1)
    assert get_csv_loader(cfg, is_train=True, image_size=32).shard_by_process
    assert not get_csv_loader(cfg, is_train=False, image_size=32).test_loader.shard_by_process

    try:
        from flyp_tpu.data.tfdata import get_tfdata_csv_loader
        import tensorflow  # noqa: F401
    except ImportError:
        return
    assert get_tfdata_csv_loader(cfg, is_train=True, image_size=32).shard_by_process
    assert not get_tfdata_csv_loader(cfg, is_train=False, image_size=32).shard_by_process


def test_research_trainer_loaders_are_replicated(corpus, monkeypatch):
    """Consumers that never assemble a global batch (few-shot scan,
    progress-validation beam trainer) opt out of sharding AND batch
    slicing: every host must see identical full batches, and k need not
    divide process_count."""
    import jax

    from flyp_tpu.config import ExperimentConfig
    from flyp_tpu.data.csv_data import get_csv_loader

    monkeypatch.setattr(jax, "process_index", lambda: 1)
    monkeypatch.setattr(jax, "process_count", lambda: 4)

    cfg = ExperimentConfig(ft_data=corpus, ft_data_test=corpus, batch_size=2, workers=1)
    loader = get_csv_loader(cfg, is_train=True, image_size=32, shard_by_process=False)
    assert loader.batch_size == 2 and not loader.shard_by_process
    assert len(loader) == N_ROWS // 2  # full set on every host


def test_single_host_protocol_guards(monkeypatch):
    """Progress validation and few-shot feed step functions host-local
    batches with no global assembly; on a multi-process runtime they must
    refuse loudly instead of silently diverging per host."""
    import jax

    from flyp_tpu.config import ExperimentConfig
    from flyp_tpu.training.few_shot import flyp_few_shot
    from flyp_tpu.training.progress import flyp_progress_validation

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    cfg = ExperimentConfig(train_dataset="PatchCamelyonVal", save="/tmp/unused", batch_size=2)
    with pytest.raises(NotImplementedError, match="single-host"):
        flyp_progress_validation(cfg, logger=None)
    with pytest.raises(NotImplementedError, match="single-host"):
        flyp_few_shot(cfg, logger=None)


def test_mesh_batch_grid_layouts(monkeypatch):
    """The input-sharding grid follows the mesh's batch-shard->process map,
    not the raw process count: DP meshes split the batch per process, TP
    meshes whose model axis spans processes need the FULL batch on every
    process (two model shards fed different data halves silently corrupt
    the loss — found by the real 2-process TP run), 2x2 layouts form two
    input groups, and replica meshes split over (replica, data) jointly."""
    from types import SimpleNamespace

    import jax

    from flyp_tpu.parallel import multihost

    def dev(p):
        return SimpleNamespace(process_index=p)

    def mesh(assign, names):
        arr = np.empty(np.shape(assign), object)
        for idx in np.ndindex(arr.shape):
            arr[idx] = dev(np.asarray(assign)[idx])
        return SimpleNamespace(devices=arr, axis_names=tuple(names))

    def grid(m, me):
        monkeypatch.setattr(jax, "process_index", lambda: me)
        return multihost._mesh_batch_grid(m)

    # DP (model=1, data=8), 2 procs x 4 devices: procs split the batch.
    dp = mesh([[0, 0, 0, 0, 1, 1, 1, 1]], ("model", "data"))
    assert grid(dp, 0) == (0, 2) and grid(dp, 1) == (1, 2)

    # TP (model=2, data=4), model rows == processes: full batch everywhere.
    tp = mesh([[0, 0, 0, 0], [1, 1, 1, 1]], ("model", "data"))
    assert grid(tp, 0) == (0, 1) and grid(tp, 1) == (0, 1)

    # TP x DP with 4 procs x 2 devices: procs {0,2} share batch shards 0-1,
    # procs {1,3} share 2-3 -> two input groups.
    tpdp = mesh([[0, 0, 1, 1], [2, 2, 3, 3]], ("model", "data"))
    assert grid(tpdp, 0) == (0, 2) and grid(tpdp, 2) == (0, 2)
    assert grid(tpdp, 1) == (1, 2) and grid(tpdp, 3) == (1, 2)

    # Multi-slice (replica=2, model=1, data=4): batch shards over
    # (replica, data) jointly -> replicas split the batch.
    rep = mesh([[[0, 0, 1, 1]], [[2, 2, 3, 3]]], ("replica", "model", "data"))
    assert grid(rep, 0) == (0, 4) and grid(rep, 3) == (3, 4)


def test_configure_input_sharding_single_process():
    """Single-process runs pin the trivial grid and local_batch_size keeps
    the full batch."""
    from jax.sharding import Mesh

    import jax

    from flyp_tpu.parallel import multihost
    from flyp_tpu.parallel.mesh import MeshConfig, create_mesh

    prev = multihost._INPUT_GRID
    try:
        mesh = create_mesh(MeshConfig(data=4, model=2))
        assert multihost.configure_input_sharding(mesh) == (0, 1)
        assert multihost.input_shard_grid() == (0, 1)
        assert multihost.local_batch_size(8) == 8
    finally:
        multihost._INPUT_GRID = prev


def test_resolve_process_and_batch_size_use_pinned_grid(monkeypatch):
    """Once a trainer pins the mesh-derived input grid, the lazy loader
    resolution and the batch slicing both read it — explicit overrides and
    the shard_by_process=False opt-out still win."""
    from flyp_tpu.parallel import multihost

    monkeypatch.setattr(multihost, "_INPUT_GRID", (1, 2))
    assert multihost.resolve_process(None, None) == (1, 2)
    assert multihost.input_shard_grid() == (1, 2)
    assert multihost.local_batch_size(8) == 4
    assert multihost.resolve_process(3, 4) == (3, 4)  # explicit override wins
    assert multihost.resolve_process(None, None, shard_by_process=False) == (0, 1)


def test_grain_start_batch_fast_forward(corpus):
    """GrainLoader.set_epoch(start_batch=k): the replayed stream equals the
    uninterrupted stream's suffix exactly (images, tokens, ids)."""
    pytest.importorskip("grain")

    from flyp_tpu.data.grain_data import GrainLoader

    def batches(start):
        loader = GrainLoader(
            _dataset(corpus), batch_size=4, shuffle=True, drop_last=True,
            num_workers=0, seed=3,
        )
        loader.set_epoch(2, start_batch=start)
        return list(loader)

    full, tail = batches(0), batches(2)
    assert len(full) == len(tail) + 2
    for a, b in zip(full[2:], tail):
        for key in ("image", "tokens", "img_id"):
            np.testing.assert_array_equal(a[key], b[key])
