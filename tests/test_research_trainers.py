"""End-to-end tests for the research trainers (few-shot, CE ablation,
fisher, linear probe, progress validation) plus checkpoint resume."""

import dataclasses
import os

import numpy as np
import pandas as pd
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from flyp_tpu.config import ExperimentConfig
from flyp_tpu.models import CLIPModel, MODEL_CONFIGS, init_clip_params
from flyp_tpu.utils.logging import get_logger


def tiny_model(seed=0):
    cfg = MODEL_CONFIGS["ViT-B/16"]
    cfg = dataclasses.replace(
        cfg,
        embed_dim=32,
        vision=dataclasses.replace(cfg.vision, image_size=32, patch_size=16, width=64, layers=2, heads=1),
        text=dataclasses.replace(cfg.text, width=64, heads=1, layers=2),
    )
    model = CLIPModel(cfg)
    return model, {"params": init_clip_params(model, seed)}


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("research_corpus")
    rng = np.random.default_rng(0)
    classnames = ["lymph node", "lymph node containing metastatic tumor tissue"]

    for split in ("train", "val", "test", "train_shot_4"):
        for ci in range(2):
            d = root / "patchcamelyon" / split / f"class_{ci}"
            d.mkdir(parents=True)
            for i in range(10):
                base = np.full((36, 36, 3), 50 + 140 * ci, np.uint8)
                Image.fromarray(base + rng.integers(0, 40, (36, 36, 3), dtype=np.uint8)).save(d / f"{i}.png")

    rows = []
    for guidance in (2, 100):
        for ci in range(2):
            d = root / "patchcamelyon" / "train" / f"class_{ci}"
            for i in range(10):
                rows.append({
                    "title": f"this is a photo of {classnames[ci]}",
                    "filepath": str(d / f"{i}.png"),
                    "label": ci,
                    "guidance": guidance,
                    "img_id": guidance * 100 + ci * 10 + i,
                })
    csv = root / "train.tsv"
    pd.DataFrame(rows).to_csv(csv, sep="\t", index=False)
    return {"root": str(root), "train_csv": str(csv)}


def make_cfg(corpus, tmp_path, **overrides):
    defaults = dict(
        train_dataset="PatchCamelyonVal",
        template="patchcamelyon_template",
        eval_datasets=["PatchCamelyonVal", "PatchCamelyonTest"],
        data_location=corpus["root"],
        ft_data=corpus["train_csv"],
        ft_data_test=corpus["train_csv"],
        batch_size=4,
        lr=1e-3,
        wd=0.1,
        warmup_length=1,
        epochs=2,
        workers=2,
        debug=True,
        compute_dtype="float32",
        log_dir=str(tmp_path / "logs"),
    )
    defaults.update(overrides)
    return ExperimentConfig(**defaults)


def test_few_shot(corpus, tmp_path):
    model, variables = tiny_model()
    cfg = make_cfg(corpus, tmp_path, k=4, epochs=2)
    logger = get_logger(None)
    from flyp_tpu.training.few_shot import flyp_few_shot

    val_acc, test_acc = flyp_few_shot(cfg, logger, model=model, variables=variables)
    assert 0.0 <= val_acc <= 1.0 and 0.0 <= test_acc <= 1.0


def test_few_shot_driver_two_runs(corpus, tmp_path):
    cfg = make_cfg(corpus, tmp_path, k=4, epochs=1)
    logger = get_logger(None)
    from flyp_tpu.training.few_shot import few_shot_driver

    summary = few_shot_driver(cfg, logger, num_runs=2, model_factory=lambda: tiny_model(1))
    assert set(summary) == {"Val", "Test", "ValDev", "TestDev"}
    assert os.path.isfile(os.path.join(cfg.log_dir, "stats_final.txt"))


def test_ce_ablation(corpus, tmp_path):
    model, variables = tiny_model()
    cfg = make_cfg(corpus, tmp_path, train_dataset="PatchCamelyonTrain", epochs=1)
    logger = get_logger(None)
    from flyp_tpu.training.ce_ablation import ce_ablation

    ce_ablation(cfg, logger, model=model, variables=variables, print_every=2)
    stats = pd.read_csv(os.path.join(cfg.log_dir, "stats.tsv"), sep="\t")
    assert "Avg OOD Acc" in stats.columns


def test_fisher(corpus, tmp_path):
    model, variables = tiny_model()
    fisher_path = str(tmp_path / "fisher.pkl")
    cfg = make_cfg(corpus, tmp_path, train_dataset="PatchCamelyonTrain", epochs=1, fisher=[fisher_path])
    logger = get_logger(None)
    from flyp_tpu.training.fisher import compute_fisher

    fisher = compute_fisher(cfg, logger, model=model, variables=variables, max_batches=2)
    leaves = jax.tree_util.tree_leaves(fisher)
    assert all(np.all(l >= 0) for l in leaves)
    assert any(np.any(l > 0) for l in leaves)
    assert os.path.isfile(fisher_path)


def test_bn_tower_ce_ablation_and_fisher(corpus, tmp_path):
    """BatchNorm towers (RN50 family) work in the research trainers too:
    the CE step threads batch_stats mutably (torch train-mode BN) and the
    Fisher passes run train-mode BN like the reference's model.train()."""
    from tests.test_flyp_trainer import tiny_resnet

    model, variables = tiny_resnet()
    assert "batch_stats" in variables
    cfg = make_cfg(corpus, tmp_path, train_dataset="PatchCamelyonTrain", epochs=1)
    logger = get_logger(None)
    from flyp_tpu.training.ce_ablation import ce_ablation

    ce_ablation(cfg, logger, model=model, variables=variables, print_every=2)
    stats = pd.read_csv(os.path.join(cfg.log_dir, "stats.tsv"), sep="\t")
    assert "Avg OOD Acc" in stats.columns

    model, variables = tiny_resnet()
    fisher_path = str(tmp_path / "fisher_rn.pkl")
    cfg = make_cfg(
        corpus, tmp_path, train_dataset="PatchCamelyonTrain", epochs=1,
        fisher=[fisher_path], log_dir=str(tmp_path / "fisher_logs"),
    )
    from flyp_tpu.training.fisher import compute_fisher

    fisher = compute_fisher(cfg, logger, model=model, variables=variables, max_batches=1)
    assert any(np.any(l > 0) for l in jax.tree_util.tree_leaves(fisher))


def test_fisher_bn_per_example_oracle():
    """Decomposition oracle for the BN-tower Fisher step: the reference's
    protocol is batch_size=1 (`fisher.py:50,62`) — ONE train-mode forward
    supplies both the sampling logits and the backward, so each example's
    label must be drawn from the SAME per-example-BN softmax its gradient
    differentiates.  The batched fisher_step must equal an explicit
    one-example-at-a-time loop sharing its label draws."""
    from tests.test_flyp_trainer import tiny_resnet
    from flyp_tpu.training.fisher import make_fisher_step

    model, variables = tiny_resnet()
    params, stats = variables["params"], variables["batch_stats"]
    rng_np = np.random.default_rng(0)
    W = jnp.asarray(rng_np.normal(size=(32, 5)).astype(np.float32))
    head = lambda f: f.astype(jnp.float32) @ W
    images = jnp.asarray(rng_np.normal(size=(4, 32, 32, 3)).astype(np.float32))
    rng = jax.random.key(7)

    fisher_step = make_fisher_step(model, head)
    sq_sum, n = fisher_step(params, stats, images, rng)
    assert int(n) == 4

    def enc1(p, im):
        feats, _ = model.apply(
            {"params": p, "batch_stats": stats}, im[None],
            method="encode_image", train=True, mutable=["batch_stats"],
        )
        return feats[0]

    # Per-example-BN logits; the distinction the oracle locks must be
    # material: full-batch-BN logits differ for this data.
    logits = jnp.stack([head(enc1(params, im)[None])[0] for im in images])
    feats_b, _ = model.apply(
        {"params": params, "batch_stats": stats}, images,
        method="encode_image", train=True, mutable=["batch_stats"],
    )
    assert not np.allclose(np.asarray(head(feats_b)), np.asarray(logits), atol=1e-3)

    labels = jax.random.categorical(rng, logits, axis=-1)

    def loss1(p, im, lab):
        lg = head(enc1(p, im)[None]).astype(jnp.float32)[0]
        return -jax.nn.log_softmax(lg)[lab]

    acc = jax.tree_util.tree_map(lambda a: jnp.zeros(a.shape, jnp.float32), params)
    for i in range(4):
        g = jax.grad(loss1)(params, images[i], labels[i])
        acc = jax.tree_util.tree_map(lambda a, b: a + b.astype(jnp.float32) ** 2, acc, g)

    for (path, ours), (_, ref) in zip(
        jax.tree_util.tree_leaves_with_path(sq_sum),
        jax.tree_util.tree_leaves_with_path(acc),
    ):
        np.testing.assert_allclose(
            np.asarray(ours), np.asarray(ref), rtol=1e-4, atol=1e-6,
            err_msg=f"fisher mismatch at {jax.tree_util.keystr(path)}",
        )


def test_bn_tower_few_shot_and_progress(corpus, tmp_path):
    """Few-shot snapshots and progress-validation beam snapshots must carry
    BN running stats: re-scoring the best model with different statistics
    would break the reproducibility asserts / beam selection."""
    from tests.test_flyp_trainer import tiny_resnet

    model, variables = tiny_resnet()
    cfg = make_cfg(corpus, tmp_path, k=4, epochs=1)
    logger = get_logger(None)
    from flyp_tpu.training.few_shot import flyp_few_shot

    val_acc, test_acc = flyp_few_shot(cfg, logger, model=model, variables=variables)
    assert 0.0 <= val_acc <= 1.0 and 0.0 <= test_acc <= 1.0

    model, variables = tiny_resnet()
    cfg = make_cfg(
        corpus, tmp_path, curriculum=True, save=str(tmp_path / "rn_snaps"),
        eval_datasets=["PatchCamelyonVal"], epochs=1, log_dir=str(tmp_path / "prog_logs"),
    )
    from flyp_tpu.training.progress import flyp_progress_validation

    beam = flyp_progress_validation(
        cfg, logger, model=model, variables=variables, beam_size=1, num_rounds=1,
        select_metric="Avg OOD Acc",
    )
    assert len(beam) >= 1


def test_linear_probe(corpus, tmp_path):
    model, variables = tiny_model()
    cfg = make_cfg(
        corpus, tmp_path, train_dataset="PatchCamelyonTrain",
        eval_datasets=["PatchCamelyonVal"], cache_dir=str(tmp_path / "cache"),
    )
    logger = get_logger(None)
    from flyp_tpu.training.linear_probe import linear_probe

    best = linear_probe(cfg, logger, model=model, variables=variables, num_cs=3)
    assert 0.0 <= best["acc"] <= 1.0
    assert best["coef"].shape[1] == 32


def test_progress_validation_beam(corpus, tmp_path):
    model, variables = tiny_model()
    cfg = make_cfg(
        corpus, tmp_path, curriculum=True, save=str(tmp_path / "snapshots"),
        eval_datasets=["PatchCamelyonVal"], epochs=1,
    )
    logger = get_logger(None)
    from flyp_tpu.training.progress import flyp_progress_validation

    beam = flyp_progress_validation(
        cfg, logger, model=model, variables=variables, beam_size=2, num_rounds=1,
        select_metric="Avg OOD Acc",
    )
    assert len(beam) >= 1
    # Snapshots are orbax directories (+ a JSON progress sidecar) — the repo
    # convention forbids pickling model state.
    assert all(os.path.isdir(p) for p in beam)
    assert all(os.path.isfile(p + ".perform.json") for p in beam)


def test_checkpoint_roundtrip(tmp_path):
    from flyp_tpu.training import create_train_state, make_optimizer, warmup_cosine_lr
    from flyp_tpu.utils.checkpoint import CurriculumCursor, restore_checkpoint, save_checkpoint

    model, variables = tiny_model()
    opt = make_optimizer(warmup_cosine_lr(1e-3, 2, 10), 0.1)
    state = create_train_state(variables["params"], opt)
    cursor = CurriculumCursor(epoch=3, cur_guidance=5, cur_str_times=2, cur_guidance_id=1)
    path = save_checkpoint(str(tmp_path / "ckpt"), state, cursor)

    state2 = create_train_state(tiny_model(9)[1]["params"], opt)
    restored, cursor2 = restore_checkpoint(path, state2)
    assert cursor2 == cursor
    a = jax.tree_util.tree_leaves(state.params)
    b = jax.tree_util.tree_leaves(restored.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_few_shot_scan_bounded_on_single_class(corpus, tmp_path):
    """A one-class CSV must raise instead of cycling the loader forever
    (regression: the unbounded `_cycle` turned the reference's latent hang
    into a guaranteed one)."""
    import pandas as pd

    df = pd.read_csv(corpus["train_csv"], sep="\t")
    one_class = df[df["label"] == 0]
    csv = tmp_path / "one_class.tsv"
    one_class.to_csv(csv, sep="\t", index=False)

    from flyp_tpu.data.csv_data import get_csv_loader
    from flyp_tpu.training.few_shot import _collect_balanced_contrastive_batch

    cfg = make_cfg(corpus, tmp_path, k=4, ft_data=str(csv))
    loader = get_csv_loader(cfg, is_train=True, image_size=32)
    with pytest.raises(RuntimeError, match="balanced few-shot batch"):
        _collect_balanced_contrastive_batch(loader, k=4)


def test_wise_interpolation():
    """WiSE-FT merges (`src/args.py` --alpha/--fisher lineage flags; Wortsman
    et al. 2022): uniform interpolation is exact per-leaf lerp, and the
    Fisher-weighted merge reduces to it when both Fishers are equal and
    respects the floor when one side's Fisher vanishes."""
    import jax.numpy as jnp
    import numpy as np

    from flyp_tpu.training.wise import fisher_interpolate, interpolate

    z = {"w": jnp.asarray([[1.0, 2.0]]), "b": jnp.asarray([0.0])}
    f = {"w": jnp.asarray([[3.0, 6.0]]), "b": jnp.asarray([4.0])}
    mid = interpolate(z, f, alpha=0.5)
    np.testing.assert_allclose(np.asarray(mid["w"]), [[2.0, 4.0]])
    np.testing.assert_allclose(np.asarray(mid["b"]), [2.0])
    # alpha=1 returns the fine-tuned tree exactly.
    np.testing.assert_allclose(np.asarray(interpolate(z, f, 1.0)["w"]), [[3.0, 6.0]])

    ones = jax.tree_util.tree_map(jnp.ones_like, z)
    fw = fisher_interpolate(z, f, ones, ones, alpha=0.5)
    np.testing.assert_allclose(np.asarray(fw["w"]), np.asarray(mid["w"]), rtol=1e-6)
    # Zero Fisher on the zero-shot side: the floor keeps the merge finite
    # and the fine-tuned weights dominate at any alpha.
    zeros = jax.tree_util.tree_map(jnp.zeros_like, z)
    dom = fisher_interpolate(z, f, zeros, ones, alpha=0.5)
    assert np.all(np.isfinite(np.asarray(dom["w"])))
    np.testing.assert_allclose(np.asarray(dom["w"]), np.asarray(f["w"]), rtol=1e-4)
