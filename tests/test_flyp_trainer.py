"""End-to-end FLYP trainer tests on a synthetic corpus (tiny model, CPU mesh)."""

import dataclasses
import os

import numpy as np
import pandas as pd
import pytest
from PIL import Image

from flyp_tpu.config import ExperimentConfig
from flyp_tpu.models import CLIPModel, MODEL_CONFIGS, init_clip_params
from flyp_tpu.training.curriculum import init_guidance_setting, seq_curri_guid
from flyp_tpu.training.flyp import flyp_train


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


def tiny_resnet():
    """Tiny RN50-family model (BatchNorm tower => variables carry batch_stats)."""
    from flyp_tpu.models import init_clip_variables

    cfg = MODEL_CONFIGS["RN50"]
    cfg = dataclasses.replace(
        cfg,
        embed_dim=32,
        vision=dataclasses.replace(
            cfg.vision, image_size=32, width=16, heads=2, resnet_layers=(1, 1, 1, 1)
        ),
        text=dataclasses.replace(cfg.text, width=64, heads=1, layers=2),
    )
    model = CLIPModel(cfg)
    return model, dict(init_clip_variables(model, 0))


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    """Synthetic patchcamelyon folder tree + contrastive TSV with guidance."""
    root = tmp_path_factory.mktemp("flyp_corpus")
    rng = np.random.default_rng(0)
    classnames = ["lymph node", "lymph node containing metastatic tumor tissue"]

    for split in ("train", "val"):
        for ci in range(2):
            d = root / "patchcamelyon" / split / f"class_{ci}"
            d.mkdir(parents=True)
            for i in range(8):
                base = np.full((36, 36, 3), 60 + 120 * ci, np.uint8)
                noise = rng.integers(0, 40, (36, 36, 3), dtype=np.uint8)
                Image.fromarray(base + noise).save(d / f"{i}.png")

    rows = []
    for guidance in (2, 100):
        for ci in range(2):
            d = root / "patchcamelyon" / "train" / f"class_{ci}"
            for i in range(8):
                rows.append({
                    "title": f"this is a photo of {classnames[ci]}",
                    "filepath": str(d / f"{i}.png"),
                    "label": ci,
                    "guidance": guidance,
                    "img_id": guidance * 100 + ci * 10 + i,
                })
    df = pd.DataFrame(rows)
    train_csv = root / "train.tsv"
    df.to_csv(train_csv, sep="\t", index=False)
    return {"root": str(root), "train_csv": str(train_csv)}


def make_cfg(corpus, tmp_path, **overrides):
    defaults = dict(
        train_dataset="PatchCamelyonVal",
        template="patchcamelyon_template",
        eval_datasets=["PatchCamelyonVal"],
        data_location=corpus["root"],
        ft_data=corpus["train_csv"],
        ft_data_test=corpus["train_csv"],
        batch_size=8,
        lr=1e-3,
        wd=0.1,
        warmup_length=2,
        epochs=1,
        workers=2,
        debug=True,
        compute_dtype="float32",
        log_dir=str(tmp_path / "logs"),
        save=None,
    )
    defaults.update(overrides)
    return ExperimentConfig(**defaults)


def test_flyp_train_end_to_end(corpus, tmp_path):
    model, variables = tiny_model()
    cfg = make_cfg(corpus, tmp_path, save=str(tmp_path / "ckpt"))
    flyp_train(cfg, model=model, variables=variables, print_every=2)

    stats = pd.read_csv(os.path.join(cfg.log_dir, "stats.tsv"), sep="\t")
    assert "Avg OOD Acc" in stats.columns
    assert "Avg ID FLYP Loss" in stats.columns
    assert "PatchCamelyonVal Accuracy" in stats.columns
    assert len(stats) == 1
    # class_stats TSV exists with per-dataset columns.
    cs = pd.read_csv(os.path.join(cfg.log_dir, "class_stats0.tsv"), sep="\t", index_col=0)
    assert list(cs.columns) == ["PatchCamelyonVal", "PatchCamelyonVal Count"]
    # checkpoint written
    assert os.path.isdir(os.path.join(str(tmp_path / "ckpt"), "checkpoint_0"))


def test_flyp_train_grad_cache(corpus, tmp_path):
    """The trainer end-to-end with GradCache chunking: same loop, chunked
    step (training/grad_cache.py), stats land as usual."""
    model, variables = tiny_model()
    cfg = make_cfg(corpus, tmp_path, grad_cache_chunks=2)
    flyp_train(cfg, model=model, variables=variables, print_every=2)
    stats = pd.read_csv(os.path.join(cfg.log_dir, "stats.tsv"), sep="\t")
    assert len(stats) == 1
    assert np.isfinite(stats["Avg ID FLYP Loss"].iloc[0])


def test_fsdp_curriculum_restart_keeps_pinned_shardings(corpus, tmp_path, monkeypatch):
    """FSDP + drestart curriculum: every step_fn build — the fresh one AND
    the scheduler-restart rebuild — must pin state_shardings from the
    ZeRO-placed state.  A replicated-default rebuild would silently reshard
    params/moments mid-run, and a shardings-inferred one would compile a
    second, ULP-divergent executable (breaking bitwise resume) — regression
    test for the build_step consolidation."""
    import flyp_tpu.training.flyp as flyp_mod
    from flyp_tpu.parallel.mesh import DATA_AXIS

    seen = []
    real_make = flyp_mod.make_train_step

    def recording_make(model, optimizer, mesh=None, **kw):
        seen.append((mesh, kw.get("state_shardings")))
        return real_make(model, optimizer, mesh=mesh, **kw)

    monkeypatch.setattr(flyp_mod, "make_train_step", recording_make)
    model, variables = tiny_model()
    cfg = make_cfg(
        corpus, tmp_path, fsdp=True, curriculum=True, curriculum_epoch=1,
        epochs=2, scheduler="drestart",
    )
    flyp_train(cfg, model=model, variables=variables, print_every=2)

    assert len(seen) >= 2, "curriculum restart never rebuilt the step"
    import jax

    for mesh, shardings in seen:
        assert mesh is not None, "FSDP builds must pass the mesh (batch/metric specs)"
        assert shardings is not None, "FSDP builds must pin state_shardings"
        specs = {s.spec for s in jax.tree_util.tree_leaves(shardings)}
        assert any(DATA_AXIS in str(spec) for spec in specs), (
            f"pinned shardings lost the ZeRO data-axis placement: {specs}"
        )


def test_flyp_train_curriculum(corpus, tmp_path):
    model, variables = tiny_model()
    cfg = make_cfg(corpus, tmp_path, curriculum=True, epochs=1)
    flyp_train(cfg, model=model, variables=variables, print_every=2)
    stats = pd.read_csv(os.path.join(cfg.log_dir, "stats.tsv"), sep="\t")
    assert len(stats) == 1


def test_flyp_train_test_flag_skips_training(corpus, tmp_path):
    model, variables = tiny_model()
    cfg = make_cfg(corpus, tmp_path, test=True)
    flyp_train(cfg, model=model, variables=variables)
    assert os.path.isfile(os.path.join(cfg.log_dir, "stats.tsv"))


def test_init_guidance_setting(corpus):
    cfg = ExperimentConfig(curriculum=True, ft_data=corpus["train_csv"], batch_size=8)
    s = init_guidance_setting(cfg)
    assert s.list_guidance == [2, 100]
    assert s.cur_guidance == 2

    cfg2 = ExperimentConfig(curriculum=True, curriculum_epoch=2, ft_data=corpus["train_csv"], batch_size=8)
    s2 = init_guidance_setting(cfg2)
    assert s2.num_batch_ori == 2  # 16 guidance-100 rows / batch 8
    assert s2.loop_times == 2  # ceil(2*2*8 / 16)

    cfg3 = ExperimentConfig(guidance=2, ft_data=corpus["train_csv"], batch_size=8)
    s3 = init_guidance_setting(cfg3)
    assert s3.list_guidance == [2] and s3.len_data == 16


def test_seq_curri_guid_state_machine():
    lg = [0, 2, 5, 100]
    # no_curri wraps around
    assert seq_curri_guid(lg, cur_guidance_id=3, ctype="no_curri") == (0, 0)
    # in_curri loops each guidance loop_times then advances, clamping at end
    gid, guid, times = seq_curri_guid(lg, cur_guidance_id=0, cur_str_times=1, ctype="in_curri", loop_times=2)
    assert (gid, guid, times) == (0, 0, 2)
    gid, guid, times = seq_curri_guid(lg, cur_guidance_id=0, cur_str_times=2, ctype="in_curri", loop_times=2)
    assert (gid, guid, times) == (1, 2, 1)
    gid, guid, times = seq_curri_guid(lg, cur_guidance_id=3, cur_str_times=2, ctype="in_curri", loop_times=2)
    assert (gid, guid, times) == (3, 100, 1)
    # out_curri jumps to guidance 100
    assert seq_curri_guid(lg, ctype="out_curri") == (3, 100, 1)


def test_cont_finetune_filters_classes(corpus, tmp_path):
    """Run once to produce class stats, restart with --cont_finetune, and
    assert the train loader was class-filtered (`flyp_loss.py:283-304`)."""
    model, variables = tiny_model()
    first = make_cfg(corpus, tmp_path, log_dir=str(tmp_path / "first"))
    flyp_train(first, model=model, variables=variables, print_every=2)
    stats_path = os.path.join(first.log_dir, "class_stats0.tsv")
    assert os.path.isfile(stats_path)

    # Force a deterministic filter outcome: both real classes fail the acc
    # gate; a phantom class 2 passes but has no rows. Class 0 is appended
    # unconditionally, so the train loader keeps exactly the class-0 rows.
    doctored = tmp_path / "class_stats_doctored.tsv"
    pd.DataFrame(
        {"PatchCamelyonVal": [0.9, 0.9, 0.3], "PatchCamelyonVal Count": [100, 100, 100]},
        index=["Class 0", "Class 1", "Class 2"],
    ).to_csv(doctored, sep="\t")

    cont = make_cfg(
        corpus, tmp_path,
        log_dir=str(tmp_path / "cont"),
        cont_finetune=True,
        class_stats_path=str(doctored),
        cont_filter_key="PatchCamelyonVal",
        cont_acc_threshold=0.5,
        cont_count_threshold=50,
    )
    model2, variables2 = tiny_model()
    flyp_train(cont, model=model2, variables=variables2, print_every=2)

    log_text = open(os.path.join(cont.log_dir, "log.log")).read()
    # Class 2 passes (0.3 <= 0.5, 100 >= 50); classes 0/1 fail on acc but 0
    # is always appended.
    assert "based on 2 classes: [2, 0]" in log_text
    # The 32-row CSV holds 16 class-0 rows -> 2 batches of 8 after the
    # filter (vs 4 unfiltered).
    assert "Num batches is 2" in log_text


def test_cont_finetune_class_filter_parsing(tmp_path):
    from flyp_tpu.training.flyp import _cont_finetune_classes
    from flyp_tpu.utils.logging import get_logger

    stats = tmp_path / "class_stats15.tsv"
    pd.DataFrame(
        {"IWildCamOOD": [0.2, 0.6, 0.5, 0.1], "IWildCamOOD Count": [60, 300, 49, 51]},
        index=[f"Class {i}" for i in (3, 5, 7, 9)],
    ).to_csv(stats, sep="\t")

    cfg = ExperimentConfig(cont_finetune=True, class_stats_path=str(stats))
    picked = _cont_finetune_classes(cfg, get_logger(None))
    # 3 (0.2<=0.5, 60>=50) and 9 (0.1, 51) pass; 5 fails acc; 7 fails count;
    # 0 is appended since absent.
    assert picked == [3, 9, 0]


def test_flyp_train_grain_backend(corpus, tmp_path):
    pytest.importorskip("grain")
    model, variables = tiny_model()
    cfg = make_cfg(corpus, tmp_path, data_backend="grain", workers=0, epochs=1)
    flyp_train(cfg, model=model, variables=variables, print_every=2)
    stats = pd.read_csv(os.path.join(cfg.log_dir, "stats.tsv"), sep="\t")
    assert len(stats) == 1 and "Avg ID FLYP Loss" in stats.columns


def test_fsdp_auto_resume_reshards(corpus, tmp_path, monkeypatch):
    """Auto-resume under --fsdp must re-shard the restored state exactly as
    the fresh path does — a replicated restore silently drops ZeRO sharding
    (and OOMs any model that only fits sharded)."""
    import flyp_tpu.parallel.fsdp as fsdp_mod

    calls = {"n": 0}
    real = fsdp_mod.shard_train_state_fsdp

    def counting(mesh, state):
        calls["n"] += 1
        return real(mesh, state)

    monkeypatch.setattr(fsdp_mod, "shard_train_state_fsdp", counting)

    model, variables = tiny_model()
    cfg = make_cfg(corpus, tmp_path, save=str(tmp_path / "ckpt"), fsdp=True, epochs=1)
    flyp_train(cfg, model=model, variables=variables, print_every=2)
    assert calls["n"] == 1  # fresh path shards once
    assert os.path.isdir(os.path.join(str(tmp_path / "ckpt"), "checkpoint_0"))

    # Second invocation resumes from checkpoint_0 and must shard AGAIN.
    model, variables = tiny_model()
    cfg2 = make_cfg(corpus, tmp_path, save=str(tmp_path / "ckpt"), fsdp=True, epochs=2,
                    log_dir=str(tmp_path / "logs2"))
    flyp_train(cfg2, model=model, variables=variables, print_every=2)
    assert calls["n"] == 3  # fresh shard + resume re-shard
    stats = pd.read_csv(os.path.join(cfg2.log_dir, "stats.tsv"), sep="\t")
    assert len(stats) == 1  # resumed at epoch 1 of 2
