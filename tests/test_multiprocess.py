"""REAL multi-process execution of the multi-host contract.

Every other multi-host test simulates ``process_count`` via explicit
overrides; these tests launch actual ``jax.distributed`` process groups on
localhost (gloo CPU collectives, 4 virtual devices per process — same 8
global devices as the rest of the suite) through
``tests/multiproc_driver.py`` and assert:

* the assembled GLOBAL batch stream (images, synced-width tokens, img_ids)
  is byte-identical under 1-process and 2-process layouts (the loader's
  batch-block process sharding makes it process-layout-invariant),
* per-step losses / final checkpoints of a 2-process run match the
  single-process run to collective-reduction tolerance (the per-device
  math is identical; only the cross-process all-reduce's summation order
  differs from the in-process one — measured ~1e-7 relative at step 0),
* two identical 2-process runs are BITWISE deterministic end to end,
* replicated eval produces the same stats.tsv,
* only process 0 writes artifacts (metrics.jsonl has exactly one writer),
* FSDP state sharded ACROSS processes checkpoints through the collective
  ``_global_host_state`` fetch, and a preempted 2-process FSDP run resumed
  from its step checkpoint reproduces the uninterrupted run's final params
  bitwise.

Reference behaviors being proven for real: `wds.split_by_node` input
sharding (`/root/reference/src/datasets/laion.py:464-466`) and the
distributed global-batch loss (`/root/reference/clip/loss.py:19-69`).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pandas as pd
import pytest
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DRIVER = os.path.join(REPO, "tests", "multiproc_driver.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    """Synthetic patchcamelyon tree + contrastive TSV.

    Class-1 captions run past one 16-token shrink bucket while class-0
    captions stay inside it, so per-process token widths genuinely disagree
    on mixed batches and the cross-host width sync in ``prefetch_to_device``
    executes its allgather-max + re-pad branch.
    """
    root = tmp_path_factory.mktemp("mp_corpus")
    rng = np.random.default_rng(0)
    captions = [
        "this is a photo of lymph node",
        "this is a photo of lymph node containing metastatic tumor tissue "
        "with irregular darkly stained nuclei visible across the sample",
    ]
    rows = []
    for split in ("train", "val"):
        for ci in range(2):
            d = root / "patchcamelyon" / split / f"class_{ci}"
            d.mkdir(parents=True)
            for i in range(8):
                base = np.full((36, 36, 3), 60 + 120 * ci, np.uint8)
                noise = rng.integers(0, 40, (36, 36, 3), dtype=np.uint8)
                Image.fromarray(base + noise).save(d / f"{i}.png")
                if split == "train":
                    rows.append(
                        {
                            "title": captions[ci],
                            "filepath": str(d / f"{i}.png"),
                            "label": ci,
                            "guidance": 100,
                            "img_id": ci * 10 + i,
                        }
                    )
    # 32 rows total -> 4 global batches of 8 per epoch.
    rows = rows * 2
    for j, r in enumerate(rows):
        r = dict(r)
        r["img_id"] = j
        rows[j] = r
    train_csv = root / "train.tsv"
    pd.DataFrame(rows).to_csv(train_csv, sep="\t", index=False)
    return {"root": str(root), "train_csv": str(train_csv)}


def _launch(corpus, run_dir, num_processes, extra=()):
    """Run one flyp_train across ``num_processes`` real processes; returns
    (per-process result dicts, run_dir)."""
    os.makedirs(run_dir, exist_ok=True)
    port = _free_port()
    local_devices = 8 // num_processes
    procs, outs, logs, logfs = [], [], [], []
    try:
        for pid in range(num_processes):
            out = os.path.join(run_dir, f"result_{pid}.json")
            log = os.path.join(run_dir, f"driver_{pid}.log")
            cmd = [
                sys.executable,
                DRIVER,
                "--num_processes", str(num_processes),
                "--process_id", str(pid),
                "--coordinator", f"localhost:{port}",
                "--local_devices", str(local_devices),
                "--train_csv", corpus["train_csv"],
                "--data_root", corpus["root"],
                "--log_dir", os.path.join(run_dir, "logs"),
                "--out", out,
                *extra,
            ]
            logfs.append(open(log, "w"))
            procs.append(
                subprocess.Popen(cmd, stdout=logfs[-1], stderr=subprocess.STDOUT, cwd=REPO)
            )
            outs.append(out)
            logs.append(log)
        rcs = [p.wait(timeout=900) for p in procs]
    finally:
        for f in logfs:
            f.close()
    for pid, rc in enumerate(rcs):
        if rc != 0:
            with open(logs[pid]) as f:
                tail = f.read()[-4000:]
            raise AssertionError(f"driver process {pid} exited {rc}:\n{tail}")
    results = []
    for o in outs:
        with open(o) as f:
            results.append(json.load(f))
    return results, run_dir


def _step_losses(run_dir, key="ID FLYP Loss"):
    """Per-step loss floats from the primary's metrics.jsonl."""
    path = os.path.join(run_dir, "logs", "metrics.jsonl")
    losses = []
    with open(path) as f:
        for line in f:
            rec = json.loads(line)
            if key in rec:
                losses.append(rec[key])
    return losses


def _checkpoint_tree(path):
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer().restore(path)


def _assert_trees_equal(a, b, exact=True, atol=1e-6, rtol=1e-5):
    import jax

    la, ta = jax.tree_util.tree_flatten(a)
    lb, tb = jax.tree_util.tree_flatten(b)
    assert ta == tb
    for x, y in zip(la, lb):
        x, y = np.asarray(x), np.asarray(y)
        if exact:
            np.testing.assert_array_equal(x, y)
        else:
            np.testing.assert_allclose(x, y, rtol=rtol, atol=atol)


@pytest.fixture(scope="module")
def single_run(corpus, tmp_path_factory):
    run_dir = str(tmp_path_factory.mktemp("mp_single"))
    results, _ = _launch(
        corpus, run_dir, num_processes=1,
        extra=["--cluster", "loss", "--save_dir", os.path.join(run_dir, "ckpt")],
    )
    return results, run_dir


@pytest.fixture(scope="module")
def dual_run(corpus, tmp_path_factory):
    run_dir = str(tmp_path_factory.mktemp("mp_dual"))
    results, _ = _launch(
        corpus, run_dir, num_processes=2,
        extra=["--cluster", "loss", "--save_dir", os.path.join(run_dir, "ckpt")],
    )
    return results, run_dir


def test_global_batch_stream_is_process_layout_invariant(corpus, tmp_path_factory):
    """sha256 of every assembled global batch's bytes — images, width-synced
    tokens, img_ids, fetched through the collective _global_host_state —
    matches across 1-process, 2-process, and 4-process assemblies (8
    devices split 1x8 / 2x4 / 4x2)."""
    hashes = {}
    for n in (1, 2, 4):
        run_dir = str(tmp_path_factory.mktemp(f"mp_batches{n}"))
        results, _ = _launch(corpus, run_dir, num_processes=n, extra=["--mode", "batches"])
        assert all(r["jax_process_count"] == n for r in results)
        per_proc = [r["batch_hashes"] for r in results]
        # Every process observes the same global values (the fetch is
        # collective), so the hash lists agree across ranks too.
        assert all(h == per_proc[0] for h in per_proc)
        hashes[n] = per_proc[0]
    assert len(hashes[1]) == 4
    assert hashes[1] == hashes[2] == hashes[4]


def test_two_process_run_is_real(dual_run):
    """The process grid is the JAX runtime's, not a simulated override."""
    results, _ = dual_run
    assert [r["jax_process_index"] for r in results] == [0, 1]
    assert all(r["jax_process_count"] == 2 for r in results)
    assert all(r["local_device_count"] == 4 for r in results)
    assert all(r["global_device_count"] == 8 for r in results)


def test_two_process_losses_match_single_process(single_run, dual_run):
    """Identical global batches + identical per-device math: the only
    divergence left is the cross-process collective's floating-point
    reduction order (gloo ring vs in-process XLA), bounded at ~1e-7
    relative per reduction.  4 steps stay within 1e-5."""
    _, single_dir = single_run
    _, dual_dir = dual_run
    s, d = _step_losses(single_dir), _step_losses(dual_dir)
    assert len(s) == len(d) == 4
    np.testing.assert_allclose(s, d, rtol=1e-5)


def test_two_process_eval_and_stats_match(single_run, dual_run):
    """Eval loaders replicate (every host scores the full val set); the
    primary's stats.tsv is identical across process layouts."""
    _, single_dir = single_run
    _, dual_dir = dual_run
    s = pd.read_csv(os.path.join(single_dir, "logs", "stats.tsv"), sep="\t", index_col=0)
    d = pd.read_csv(os.path.join(dual_dir, "logs", "stats.tsv"), sep="\t", index_col=0)
    pd.testing.assert_frame_equal(s, d)
    assert "PatchCamelyonVal Accuracy" in d.columns


def test_two_process_checkpoint_matches_single_process(single_run, dual_run):
    """The epoch checkpoint (fetched via the collective _global_host_state
    on both hosts, saved through orbax's collective single-writer path)
    stays ADJACENT to the single-process run's.  Not bitwise, and not tight:
    AdamW's early steps are ~sign(g)*lr, so a 1e-7 collective-order diff on
    a near-zero gradient component flips that component's whole +-lr update
    (measured max |diff| 1.5e-3 after 4 steps at lr=1e-3).  The bound here
    is a few lr-steps; the bitwise claims live in the rerun-determinism and
    FSDP-resume tests, where the collective layout is held fixed."""
    _, single_dir = single_run
    _, dual_dir = dual_run
    s = _checkpoint_tree(os.path.join(single_dir, "ckpt", "checkpoint_0"))
    d = _checkpoint_tree(os.path.join(dual_dir, "ckpt", "checkpoint_0"))
    _assert_trees_equal(s["params"], d["params"], exact=False, atol=1e-2, rtol=0)


def test_two_process_rerun_is_bitwise_deterministic(corpus, dual_run, tmp_path_factory):
    """Re-running the identical 2-process config reproduces per-step losses
    AND the full checkpoint (params + AdamW moments) bitwise: the real
    multi-process path — gloo collectives included — is deterministic."""
    _, first_dir = dual_run
    rerun_dir = str(tmp_path_factory.mktemp("mp_dual_rerun"))
    _launch(
        corpus, rerun_dir, num_processes=2,
        extra=["--cluster", "loss", "--save_dir", os.path.join(rerun_dir, "ckpt")],
    )
    assert _step_losses(first_dir) == _step_losses(rerun_dir)
    a = _checkpoint_tree(os.path.join(first_dir, "ckpt", "checkpoint_0"))
    b = _checkpoint_tree(os.path.join(rerun_dir, "ckpt", "checkpoint_0"))
    _assert_trees_equal(a["params"], b["params"])
    _assert_trees_equal(a["opt_state"], b["opt_state"])


def test_single_writer_discipline(dual_run):
    """Only process 0 owns artifacts: exactly one metrics.jsonl writer (no
    duplicated step records), process 1 reports non-primary, and both
    processes agree on the checkpoint path."""
    results, dual_dir = dual_run
    assert results[0]["is_primary"] is True
    assert results[1]["is_primary"] is False
    # 4 train steps -> exactly 4 loss records; a second writer would double
    # them (both processes run the same loop over the same shared log_dir).
    assert len(_step_losses(dual_dir)) == 4
    assert results[0]["model_path"] == results[1]["model_path"]


def test_fsdp_two_process_resume_bitwise(corpus, tmp_path_factory):
    """FSDP shards params/moments over the data axis, which SPANS the two
    processes — the checkpoint fetch must go through process_allgather (a
    device_get would raise).  A run preempted at step 1 (max_steps=2 writes
    checkpoint_0_step_1) and resumed to completion reproduces the
    uninterrupted run's final params bitwise, across real processes."""
    base = tmp_path_factory.mktemp("mp_fsdp")

    full_dir = str(base / "full")
    _launch(
        corpus, full_dir, num_processes=2,
        extra=["--fsdp", "--no_eval", "--save_dir", os.path.join(full_dir, "ckpt")],
    )

    resume_dir = str(base / "resumed")
    ckpt = os.path.join(resume_dir, "ckpt")
    _launch(
        corpus, resume_dir, num_processes=2,
        extra=["--fsdp", "--no_eval", "--save_dir", ckpt, "--max_steps", "2"],
    )
    assert os.path.isdir(os.path.join(ckpt, "checkpoint_0_step_1"))
    # Second invocation auto-resumes mid-epoch from the step checkpoint.
    _launch(
        corpus, resume_dir, num_processes=2,
        extra=["--fsdp", "--no_eval", "--save_dir", ckpt],
    )

    full = _checkpoint_tree(os.path.join(full_dir, "ckpt", "checkpoint_0"))
    resumed = _checkpoint_tree(os.path.join(ckpt, "checkpoint_0"))
    _assert_trees_equal(full["params"], resumed["params"])
    _assert_trees_equal(full["opt_state"], resumed["opt_state"])
    # The resumed epoch's loss average folds the pre-preemption partial sum.
    full_stats = pd.read_csv(os.path.join(full_dir, "logs", "stats.tsv"), sep="\t", index_col=0)
    res_stats = pd.read_csv(os.path.join(resume_dir, "logs", "stats.tsv"), sep="\t", index_col=0)
    assert float(full_stats["Avg ID FLYP Loss"].iloc[0]) == float(res_stats["Avg ID FLYP Loss"].iloc[0])


def test_tensor_parallel_two_process(corpus, dual_run, tmp_path_factory):
    """TP with the model axis spanning the process boundary: mesh
    (model=2, data=4) over 2 processes x 4 devices puts each model shard
    entirely on one process, so every TP feature-gather crosses gloo.
    The run must complete with the same loss trajectory as the 2-process
    DP run (same math, different reduction tree — collective tolerance),
    and its checkpoint must reassemble full-shape params through the
    collective _global_host_state fetch."""
    run_dir = str(tmp_path_factory.mktemp("mp_tp"))
    _launch(
        corpus, run_dir, num_processes=2,
        extra=["--mesh_model", "2", "--no_eval", "--save_dir", os.path.join(run_dir, "ckpt")],
    )
    tp_losses = _step_losses(run_dir)
    _, dual_dir = dual_run
    np.testing.assert_allclose(tp_losses, _step_losses(dual_dir), rtol=1e-4)

    import jax

    tree = _checkpoint_tree(os.path.join(run_dir, "ckpt", "checkpoint_0"))
    dp = _checkpoint_tree(os.path.join(dual_dir, "ckpt", "checkpoint_0"))
    shapes_tp = [np.asarray(x).shape for x in jax.tree_util.tree_leaves(tree["params"])]
    shapes_dp = [np.asarray(x).shape for x in jax.tree_util.tree_leaves(dp["params"])]
    assert shapes_tp == shapes_dp  # checkpoints hold FULL params, not shards


def test_multislice_two_process(corpus, dual_run, tmp_path_factory):
    """Multi-slice outer DP across real processes: mesh (replica=2,
    model=1, data=4) with each process owning one replica — the gradient
    all-reduce rides the cross-process link exactly like DCN on a real
    multi-slice deployment.  The batch shards over (replica, data)
    jointly, which on this device order equals the flat data=8 layout, so
    the loss trajectory must match the 2-process DP run to collective
    tolerance."""
    run_dir = str(tmp_path_factory.mktemp("mp_slice"))
    _launch(
        corpus, run_dir, num_processes=2,
        extra=["--mesh_replica", "2", "--no_eval", "--save_dir", os.path.join(run_dir, "ckpt")],
    )
    _, dual_dir = dual_run
    np.testing.assert_allclose(_step_losses(run_dir), _step_losses(dual_dir), rtol=1e-5)
    assert os.path.isdir(os.path.join(run_dir, "ckpt", "checkpoint_0"))


def test_ce_ablation_two_process(corpus, tmp_path_factory):
    """The CE-ablation trainer across real processes: its collective orbax
    save (the same primary-only-deadlock class fixed in flyp) and the
    VisionDataset loader's per-process slices must produce the
    single-process loss trajectory.  Batch SETS match across layouts (the
    image-folder loader keeps drop_last=False element striding), so the
    per-step mean CE agrees to reduction tolerance rather than bitwise."""
    runs = {}
    for n in (1, 2):
        run_dir = str(tmp_path_factory.mktemp(f"mp_ce{n}"))
        _launch(
            corpus, run_dir, num_processes=n,
            extra=["--trainer", "ce", "--no_eval", "--save_dir", os.path.join(run_dir, "ckpt")],
        )
        losses = _step_losses(run_dir, key="ID CE Loss")
        assert losses and all(np.isfinite(losses))
        assert os.path.isdir(os.path.join(run_dir, "ckpt", "checkpoint_0"))
        runs[n] = losses
    np.testing.assert_allclose(runs[1], runs[2], rtol=1e-5)
