"""Auxiliary subsystems: auto-resume, profiling utils, zero-shot CLI."""

import dataclasses
import os

import numpy as np
import pandas as pd
import pytest
from PIL import Image

import jax

from flyp_tpu.config import ExperimentConfig
from flyp_tpu.models import CLIPModel, MODEL_CONFIGS, init_clip_params
from flyp_tpu.training.flyp import flyp_train
from flyp_tpu.utils.profiling import StepTimer, device_peak_flops, mfu


def tiny_model():
    cfg = MODEL_CONFIGS["ViT-B/16"]
    cfg = dataclasses.replace(
        cfg,
        embed_dim=32,
        vision=dataclasses.replace(cfg.vision, image_size=32, patch_size=16, width=64, layers=2, heads=1),
        text=dataclasses.replace(cfg.text, width=64, heads=1, layers=2),
    )
    model = CLIPModel(cfg)
    return model, {"params": init_clip_params(model, 0)}


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("aux_corpus")
    rng = np.random.default_rng(0)
    classnames = ["lymph node", "lymph node containing metastatic tumor tissue"]
    rows = []
    for split in ("train", "val"):
        for ci in range(2):
            d = root / "patchcamelyon" / split / f"class_{ci}"
            d.mkdir(parents=True)
            for i in range(8):
                p = d / f"{i}.png"
                Image.fromarray(
                    np.full((36, 36, 3), 60 + 120 * ci, np.uint8)
                    + rng.integers(0, 40, (36, 36, 3), dtype=np.uint8)
                ).save(p)
                if split == "train":
                    rows.append({
                        "title": f"this is a photo of {classnames[ci]}",
                        "filepath": str(p), "label": ci, "guidance": 100, "img_id": ci * 10 + i,
                    })
    csv = root / "train.tsv"
    pd.DataFrame(rows).to_csv(csv, sep="\t", index=False)
    return {"root": str(root), "train_csv": str(csv)}


def base_cfg(corpus, tmp_path, **overrides):
    defaults = dict(
        train_dataset="PatchCamelyonVal",
        template="patchcamelyon_template",
        eval_datasets=["PatchCamelyonVal"],
        data_location=corpus["root"],
        ft_data=corpus["train_csv"],
        ft_data_test=corpus["train_csv"],
        batch_size=8, lr=1e-3, wd=0.1, warmup_length=1, epochs=2, workers=2,
        debug=True, compute_dtype="float32", log_dir=str(tmp_path / "logs"),
    )
    defaults.update(overrides)
    return ExperimentConfig(**defaults)


def test_auto_resume(corpus, tmp_path):
    save = str(tmp_path / "ckpt")
    model, variables = tiny_model()

    # Run 1: single epoch, checkpoint_0 written.  baseline=True makes this a
    # fixed-guidance run (cur_guidance=100) and debug=False enables the JSONL
    # sink so the guidance-row bookkeeping below is observable.
    cfg = base_cfg(corpus, tmp_path, epochs=1, save=save, baseline=True, debug=False)
    flyp_train(cfg, model=model, variables=variables, print_every=10)
    assert os.path.isdir(os.path.join(save, "checkpoint_0"))

    # Run 2: epochs=2 resumes from checkpoint_0 and only runs epoch 1.
    model2, variables2 = tiny_model()
    cfg2 = base_cfg(
        corpus, tmp_path, epochs=2, save=save, log_dir=str(tmp_path / "logs2"),
        baseline=True, debug=False,
    )
    flyp_train(cfg2, model=model2, variables=variables2, print_every=10)
    assert os.path.isdir(os.path.join(save, "checkpoint_1"))
    stats = pd.read_csv(os.path.join(cfg2.log_dir, "stats.tsv"), sep="\t")
    assert stats["Epoch"].tolist() == [1]  # only the resumed epoch ran

    # Fixed-guidance epoch resume keeps training on the quietly-built epoch-0
    # loader but must re-emit its suppressed "Image Guidance" row, so the
    # resumed metrics stream has the same shape as an uninterrupted run's.
    import json

    with open(os.path.join(cfg2.log_dir, "metrics.jsonl")) as f:
        guid_rows = [r for r in map(json.loads, f) if "Image Guidance" in r]
    assert guid_rows and guid_rows[0]["Image Guidance"] == 100
    assert guid_rows[0]["Epoch"] == 1  # the resumed epoch, not a spurious 0


def test_nonfinite_loss_guard(corpus, tmp_path):
    model, variables = tiny_model()
    # Absurd LR forces divergence quickly... instead inject NaN directly via
    # corrupted params for determinism.
    variables["params"]["logit_scale"] = jax.numpy.asarray(float("nan"))
    cfg = base_cfg(corpus, tmp_path, epochs=1)
    with pytest.raises(FloatingPointError):
        flyp_train(cfg, model=model, variables=variables, print_every=10)


def test_step_timer_and_mfu():
    timer = StepTimer()
    x = jax.numpy.ones(())
    for _ in range(3):
        timer.sync(x)
    assert len(timer.times) == 2 and timer.mean > 0
    assert device_peak_flops() > 0
    assert mfu(1e12, 1.0) > 0


def test_zeroshot_eval_cli(corpus, tmp_path, monkeypatch):
    from flyp_tpu.cli import zeroshot_eval

    model, variables = tiny_model()
    monkeypatch.setattr(
        "flyp_tpu.models.factory.build_clip_model", lambda cfg, config_override=None: (model, variables)
    )
    monkeypatch.setattr(zeroshot_eval, "build_clip_model", lambda cfg: (model, variables))
    cfg = base_cfg(corpus, tmp_path, save=str(tmp_path / "zs"))
    stats = zeroshot_eval.main(cfg)
    assert "PatchCamelyonVal Accuracy" in stats
    assert os.path.isdir(os.path.join(str(tmp_path / "zs"), "zeroshot_head"))


def test_imagenet_kshot_registered():
    from flyp_tpu.data.registry import get_dataset_class

    cls = get_dataset_class("ImageNetKShot")
    assert cls.__name__ == "ImageNetKShot"


def test_metrics_sink_wandb_mirror(tmp_path, monkeypatch):
    """The wandb adapter path (`flyp_loss.py:339-341,524,673`): with a wandb
    module importable, MetricsSink must init it, mirror every log record,
    and finish() on close; with --debug (enabled=False) no wandb call may
    happen at all."""
    import sys
    import types

    from flyp_tpu.utils.metrics_sink import MetricsSink

    calls = {"init": [], "log": [], "finish": 0}
    fake = types.ModuleType("wandb")
    fake.init = lambda **kw: calls["init"].append(kw)
    fake.log = lambda rec: calls["log"].append(dict(rec))
    fake.finish = lambda: calls.__setitem__("finish", calls["finish"] + 1)
    monkeypatch.setitem(sys.modules, "wandb", fake)

    sink = MetricsSink(str(tmp_path), enabled=True, config={"lr": 1e-5}, name="run1", group="g")
    assert calls["init"] and calls["init"][0]["project"] == "sd_exprs"
    assert calls["init"][0]["name"] == "run1"
    sink.log({"step": 1, "loss": 2.5})
    sink.log({"step": 2, "loss": 2.0})
    sink.close()
    assert calls["finish"] == 1

    # wandb records mirror the JSONL sink records exactly.
    import json

    with open(tmp_path / "metrics.jsonl") as f:
        jsonl = [json.loads(line) for line in f]
    assert [{k: r[k] for k in ("step", "loss")} for r in jsonl] == calls["log"]

    # --debug kills every wandb call (`flyp_loss.py:339`).
    calls["init"].clear()
    calls["log"].clear()
    dbg = MetricsSink(str(tmp_path), enabled=False)
    dbg.log({"step": 1})
    dbg.close()
    assert not calls["init"] and not calls["log"] and calls["finish"] == 1


def test_async_checkpoint_save_restore(tmp_path):
    """async_save commits on a background thread; after wait_for_saves (or
    the implicit wait in restore_checkpoint) the checkpoint restores
    bit-exactly, and orbax's tmp+rename keeps it atomic."""
    import optax

    from flyp_tpu.training.train_state import create_train_state
    from flyp_tpu.utils import checkpoint as ckpt

    params = {"w": np.arange(12, dtype=np.float32).reshape(3, 4), "b": np.zeros(4, np.float32)}
    state = create_train_state(params, optax.sgd(1e-2))
    path = str(tmp_path / "async_ckpt")
    ckpt.save_checkpoint(path, state, ckpt.CurriculumCursor(epoch=3), async_save=True)
    ckpt.wait_for_saves()

    template = create_train_state(jax.tree_util.tree_map(np.zeros_like, params), optax.sgd(1e-2))
    restored, cursor = ckpt.restore_checkpoint(path, template)
    np.testing.assert_array_equal(np.asarray(restored.params["w"]), params["w"])
    assert cursor.epoch == 3


def test_checkpoint_host_state_roundtrip_and_backcompat(tmp_path):
    """The host_state leaf (progress baselines, PCG64 exploration stream,
    loss pairs, MA dicts) JSON-round-trips exactly — including the 128-bit
    bit-generator ints — and a checkpoint saved WITHOUT it (round-4
    layout) restores with host=True returning None instead of raising."""
    import optax

    from flyp_tpu.training.train_state import create_train_state
    from flyp_tpu.utils import checkpoint as ckpt

    params = {"w": np.ones((2, 2), np.float32)}
    state = create_train_state(params, optax.sgd(1e-2))
    template = create_train_state(jax.tree_util.tree_map(np.zeros_like, params), optax.sgd(1e-2))

    rng = np.random.default_rng(7)
    rng.uniform()  # advance the stream so the state is mid-sequence
    blob = {
        "last_perform": {"Strength 2 Accuracy": np.float64(0.75), "Guidance 100 F1": 0.5},
        "explore_rng": rng.bit_generator.state,
        "loss_pairs": [[3, 0.25], [7, 1.5]],
        "progress_ma": {"2": [0.1, 0.2], "100": [0.3]},
    }
    path = str(tmp_path / "host_ckpt")
    ckpt.save_checkpoint(path, state, host=blob)
    _, _, restored = ckpt.restore_checkpoint(path, template, host=True)
    assert restored["last_perform"] == {"Strength 2 Accuracy": 0.75, "Guidance 100 F1": 0.5}
    assert restored["loss_pairs"] == [[3, 0.25], [7, 1.5]]
    assert restored["progress_ma"] == {"2": [0.1, 0.2], "100": [0.3]}
    # The restored RNG continues the exact stream the saved one would.
    r2 = np.random.default_rng()
    r2.bit_generator.state = restored["explore_rng"]
    expect = np.random.default_rng(7)
    expect.uniform()
    assert r2.uniform() == expect.uniform()

    # Round-4 layout (no host leaf): host=True degrades to None.
    legacy = str(tmp_path / "legacy_ckpt")
    ckpt.save_checkpoint(legacy, state)
    _, _, none_blob = ckpt.restore_checkpoint(legacy, template, host=True)
    assert none_blob is None
    # And mid+host ordering: (state, cursor, step_cursor, host).
    midp = str(tmp_path / "mid_ckpt")
    ckpt.save_checkpoint(midp, state, mid=ckpt.StepCursor(step_in_epoch=5), host=blob)
    _, _, sc, hb = ckpt.restore_checkpoint(midp, template, mid=True, host=True)
    assert sc.step_in_epoch == 5 and hb["loss_pairs"] == [[3, 0.25], [7, 1.5]]
