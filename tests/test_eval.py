"""Zero-shot head + evaluation harness end-to-end on a synthetic corpus."""

import dataclasses
import os

import numpy as np
import pytest
from PIL import Image

import jax.numpy as jnp

from flyp_tpu.evaluation import Classifier, eval_single_dataset, get_zeroshot_classifier
from flyp_tpu.evaluation.evaluator import evaluate
from flyp_tpu.models import CLIPModel, MODEL_CONFIGS, init_clip_params
from flyp_tpu.models.head import ClassificationHead
from flyp_tpu.templates import get_template
from flyp_tpu.data.datasets.base import ImageFolderDataset, VisionDataset


def tiny_model():
    cfg = MODEL_CONFIGS["ViT-B/16"]
    cfg = dataclasses.replace(
        cfg,
        embed_dim=32,
        vision=dataclasses.replace(cfg.vision, image_size=32, patch_size=16, width=64, layers=2, heads=1),
        text=dataclasses.replace(cfg.text, width=64, heads=1, layers=2),
    )
    model = CLIPModel(cfg)
    params = init_clip_params(model, 0)
    return model, {"params": params}


@pytest.fixture(scope="module")
def folder_corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("folder")
    rng = np.random.default_rng(0)
    for split in ("train", "test"):
        for cls in ("cat", "dog", "fish"):
            d = root / "toyset" / split / cls
            d.mkdir(parents=True)
            for i in range(4):
                Image.fromarray(rng.integers(0, 255, (36, 36, 3), dtype=np.uint8)).save(d / f"{i}.png")
    return str(root)


class ToyDataset(VisionDataset):
    image_size = 32

    def _resolve_classnames(self, classnames):
        self.classnames = ["cat", "dog", "fish"]

    def get_test_dataset(self):
        return ImageFolderDataset.from_root(os.path.join(self.location, "toyset", "test"), self.preprocess)


def test_zeroshot_head_math():
    model, variables = tiny_model()
    template = get_template("simple_template")
    head = get_zeroshot_classifier(model, variables, ["cat", "dog"], template)
    assert head.weight.shape == (2, 32)
    # Rows are unit-norm embeddings scaled by exp(logit_scale) = 1/0.07.
    norms = np.linalg.norm(np.asarray(head.weight), axis=1)
    np.testing.assert_allclose(norms, np.exp(np.asarray(variables["params"]["logit_scale"])), rtol=1e-4)


def test_macro_f1_torcheval_semantics():
    """The per-guidance F1 matches torcheval multiclass_f1_score(macro):
    classes absent from BOTH targets and predictions are EXCLUDED from the
    average (torcheval masks zero-count classes).  Averaging over all
    num_classes ids instead deflates a perfect 5-of-181-class bucket from
    1.0 to 0.028 and flips curriculum guidance choices.  Goldens emulated
    from torcheval's documented per-class counting."""
    from flyp_tpu.evaluation.metrics import macro_f1

    y = np.array([0, 1, 2, 3, 4])
    assert macro_f1(y, y, num_classes=181) == 1.0
    p = np.array([1, 1, 2, 3, 4])
    # Present classes {0,1,2,3,4}: f1 = [0, 2/3, 1, 1, 1] -> mean 0.7333...
    assert abs(macro_f1(p, y, num_classes=181) - 11 / 15) < 1e-9
    # A class present only in predictions still enters the average (f1=0).
    p2 = np.array([0, 1, 2, 3, 180])
    # Present {0,1,2,3,4,180}: f1 = [1, 1, 1, 1, 0, 0] -> 4/6
    assert abs(macro_f1(p2, y, num_classes=181) - 4 / 6) < 1e-9


def test_eval_single_dataset(folder_corpus):
    model, variables = tiny_model()
    head = get_zeroshot_classifier(model, variables, ["cat", "dog", "fish"], get_template("simple_template"))
    clf = Classifier(model, variables, head, batch_size=8)
    ds = ToyDataset(location=folder_corpus, batch_size=8, num_workers=2)

    class _Cfg:
        self_data = False

    results = eval_single_dataset(clf, ds, _Cfg())
    assert 0.0 <= results["top1"] <= 1.0
    assert set(results["class_top1"].keys()) <= {0, 1, 2}
    total = sum(v[1] for v in results["class_top1"].values())
    assert total == 12


def test_project_logits_hook(folder_corpus):
    model, variables = tiny_model()
    head = get_zeroshot_classifier(model, variables, ["cat", "dog", "fish"], get_template("simple_template"))
    clf = Classifier(model, variables, head, batch_size=8)

    class ProjectingToy(ToyDataset):
        def project_logits(self, logits):
            return logits[:, :2]  # drop class 'fish'

        def project_labels(self, labels):
            return np.clip(labels, 0, 1)

    ds = ProjectingToy(location=folder_corpus, batch_size=8, num_workers=2)

    class _Cfg:
        self_data = False

    results = eval_single_dataset(clf, ds, _Cfg())
    assert set(results["class_top1"].keys()) <= {0, 1}


def test_post_loop_metrics_hook(folder_corpus):
    model, variables = tiny_model()
    head = get_zeroshot_classifier(model, variables, ["cat", "dog", "fish"], get_template("simple_template"))
    clf = Classifier(model, variables, head, batch_size=8)

    class F1Toy(ToyDataset):
        def post_loop_metrics(self, labels, logits, metadata, cfg):
            preds = logits.argmax(axis=1)
            from flyp_tpu.evaluation.metrics import macro_f1

            return {"acc_avg": float((preds == labels).mean()), "F1-macro_all": macro_f1(preds, labels)}

    ds = F1Toy(location=folder_corpus, batch_size=8, num_workers=2)

    class _Cfg:
        self_data = False

    results = eval_single_dataset(clf, ds, _Cfg())
    assert "F1-macro_all" in results
    # process_train_stat passthrough: f1 keys land in train_stats.
    from flyp_tpu.evaluation.evaluator import process_train_stat

    stats = {}
    process_train_stat(results, stats, None, "Toy")
    assert "ToyF1-macro_all" in stats

    # --self_data takes precedence over post_loop_metrics: the reference
    # computes the plain argmax accuracy for self-data runs even on datasets
    # that define the hook (`eval.py:232-240`).
    class _SelfCfg:
        self_data = True

    self_results = eval_single_dataset(clf, ds, _SelfCfg())
    assert "F1-macro_all" not in self_results
    assert "acc" in self_results and self_results["top1"] == self_results["acc"]


def test_feature_cache_hit_skips_encoder(tmp_path):
    """get_features serves a warm cache without touching the encoder
    (`common.py:96-118` semantics)."""
    import numpy as np

    from flyp_tpu.evaluation.features import FeatureDataset, get_features

    class StubDataset:
        def __init__(self):
            batches = [
                {"image": np.zeros((2, 4, 4, 3), np.float32), "label": np.array([0, 1]), "path": ["a", "b"]},
                {"image": np.ones((2, 4, 4, 3), np.float32), "label": np.array([1, 0]), "path": ["c", "d"]},
            ]
            self.train_loader = batches
            self.test_loader = batches[:1]

    class CountingClassifier:
        calls = 0

        def features(self, images):
            CountingClassifier.calls += 1
            return np.asarray(images).reshape(len(images), -1)[:, :8]

    ds, clf = StubDataset(), CountingClassifier()
    out = get_features(clf, ds, split="train", cache_dir=str(tmp_path), with_paths=True)
    assert out["features"].shape == (4, 8)
    assert list(out["labels"]) == [0, 1, 1, 0]
    assert list(out["paths"]) == ["a", "b", "c", "d"]
    assert CountingClassifier.calls == 2

    # Warm cache: same result, zero encoder calls.
    again = get_features(clf, ds, split="train", cache_dir=str(tmp_path))
    assert CountingClassifier.calls == 2
    np.testing.assert_array_equal(again["features"], out["features"])

    # Different split misses the cache; FeatureDataset indexes correctly.
    val = get_features(clf, ds, split="val", cache_dir=str(tmp_path))
    assert CountingClassifier.calls == 3
    fd = FeatureDataset(val)
    assert len(fd) == 2 and fd[1]["labels"] == 1


def test_zeroshot_tokenize_cache(monkeypatch):
    """Per-epoch head rebuilds re-encode with NEW params but identical
    prompts; tokenization must run once (the reference re-tokenizes every
    epoch, `zeroshot.py:56-62`) while embeddings still track the params."""
    import jax

    from flyp_tpu.evaluation import zeroshot as zs

    model, variables = tiny_model()
    template = get_template("simple_template")
    zs._tokenize_tuple.cache_clear()
    calls = {"n": 0}
    real_tokenize = zs.tokenize

    def counting(prompts):
        calls["n"] += 1
        return real_tokenize(prompts)

    monkeypatch.setattr(zs, "tokenize", counting)
    h1 = get_zeroshot_classifier(model, variables, ["cat", "dog"], template)
    assert calls["n"] == 1
    v2 = jax.tree_util.tree_map(lambda x: x * 1.01, variables)
    h2 = get_zeroshot_classifier(model, v2, ["cat", "dog"], template)
    assert calls["n"] == 1  # cache hit on identical prompts
    assert not np.allclose(np.asarray(h1.weight), np.asarray(h2.weight))
    get_zeroshot_classifier(model, variables, ["cat", "bird"], template)
    assert calls["n"] == 2  # different classnames -> new tokenization


def test_zeroshot_token_cache_lru_evicts_one(monkeypatch):
    """Eviction must pop a single stale entry, not clear the cache: an eval
    loop over more datasets than the bound would otherwise thrash and
    re-tokenize everything every epoch."""
    from flyp_tpu.evaluation import zeroshot as zs

    zs._tokenize_tuple.cache_clear()
    calls = {"n": 0}
    real_tokenize = zs.tokenize

    def counting(prompts):
        calls["n"] += 1
        return real_tokenize(prompts)

    monkeypatch.setattr(zs, "tokenize", counting)
    # Fill past the bound (16): one tokenize per distinct prompt set; the
    # 17th insert evicts exactly one entry (the oldest, 0).
    for i in range(17):
        zs._tokenize_cached((f"a photo of a thing {i}",))
    assert calls["n"] == 17
    # 1..16 are all still hot — a clear-on-full cache would miss on every one.
    for i in range(1, 17):
        zs._tokenize_cached((f"a photo of a thing {i}",))
    assert calls["n"] == 17
    # Touching 1 refreshes it; the next insert evicts the LRU entry (2).
    zs._tokenize_cached(("a photo of a thing 1",))
    zs._tokenize_cached(("brand new prompts",))
    assert calls["n"] == 18
    zs._tokenize_cached(("a photo of a thing 1",))  # hit
    assert calls["n"] == 18
    zs._tokenize_cached(("a photo of a thing 2",))  # evicted -> miss
    assert calls["n"] == 19
    zs._tokenize_tuple.cache_clear()


def test_pipelined_eval_matches_sync_loop(folder_corpus):
    """The one-batch-lagged eval pipeline (predict_logits_device + lagged
    _process) must produce exactly the metrics of a synchronous
    predict-then-process loop — same top1 and per-class tallies."""
    model, variables = tiny_model()
    head = ClassificationHead.create(jnp.ones((3, 32), jnp.float32))
    clf = Classifier(model, variables, head, batch_size=8)
    ds = ToyDataset(None, location=folder_corpus, batch_size=8)

    class _Cfg:
        self_data = False

    result = eval_single_dataset(clf, ds, _Cfg())

    # Reference loop: strictly synchronous, same classifier + loader order.
    correct, n, per_class = 0.0, 0, {}
    for batch in ds.test_loader:
        labels = np.asarray(batch["label"])
        logits = clf.predict_logits(batch["image"])
        preds = logits.argmax(axis=1)
        correct += float((preds == labels).sum())
        n += labels.shape[0]
        for p, l in zip(preds, labels):
            rec = per_class.setdefault(int(l), [0, 0])
            rec[0] += int(p == l)
            rec[1] += 1

    assert result["top1"] == pytest.approx(correct / n)
    assert result["class_top1"] == per_class


def test_classifier_bf16_host_cast():
    """When the model computes in bf16, Classifier uploads bf16 images
    (halving H2D bytes); fp32-compute models keep fp32 uploads."""
    import ml_dtypes

    model, variables = tiny_model()
    head = ClassificationHead.create(jnp.ones((3, 32), jnp.float32))
    clf32 = Classifier(model, variables, head, batch_size=4)
    imgs = np.zeros((3, 32, 32, 3), np.float32)
    padded, n = clf32._pad(imgs)
    assert padded.dtype == np.float32 and n == 3 and padded.shape[0] == 4

    model16 = CLIPModel(model.config, compute_dtype=jnp.bfloat16)
    clf16 = Classifier(model16, variables, head, batch_size=4)
    padded16, _ = clf16._pad(imgs)
    assert padded16.dtype == ml_dtypes.bfloat16
