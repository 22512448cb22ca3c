"""ClipServer: bucketed, pipelined serving front-end (flyp_tpu/serving).

Exactness contract under test: padding to a batch bucket, splitting an
oversize request into chunks, slicing text to the bucketed max-EOT width,
and the one-step-lag stream must all return byte-identical results to a
direct unpadded forward (fp32 CPU) — bucketing is a compile-count lever,
never a numerics one.
"""

import numpy as np
import pytest

from flyp_tpu.serving import ClipServer

from tests.test_flyp_trainer import tiny_model


@pytest.fixture(scope="module")
def server():
    model, variables = tiny_model()
    return ClipServer(model, variables, image_buckets=(4, 8))


def _images(n, px=32, seed=0):
    return np.random.default_rng(seed).standard_normal((n, px, px, 3)).astype(np.float32)


def test_bucket_selection(server):
    assert [server.bucket_for(n) for n in (1, 4, 5, 8)] == [4, 4, 8, 8]
    assert server._chunks(3) == [(0, 3, 4)]
    assert server._chunks(8) == [(0, 8, 8)]
    assert server._chunks(21) == [(0, 8, 8), (8, 8, 8), (16, 5, 8)]
    with pytest.raises(ValueError, match="ascending"):
        ClipServer(server.model, server.variables, image_buckets=(8, 4))


def test_encode_images_matches_direct(server):
    """Pad-to-bucket and chunked oversize requests are exact.

    Bitwise WITHIN a compiled shape: the tower is batch-independent, so a
    row's feature cannot depend on what fills the padding rows, and every
    chunk of an oversize request equals the standalone request for the same
    rows.  Across DIFFERENT compiled shapes only fp reduction order changes
    (XLA tiles each shape independently), so the direct-unpadded comparison
    is allclose at fp32 tolerances."""
    imgs = _images(21)
    # Padding rows cannot leak: same [4] program, different pad contents.
    np.testing.assert_array_equal(
        server.encode_images(imgs[:3]), server.encode_images(imgs[:4])[:3]
    )
    # Chunking is positionally exact: same [8] program either way.
    out21 = server.encode_images(imgs)
    assert out21.shape == (21, server.model.config.embed_dim)
    np.testing.assert_array_equal(out21[:8], server.encode_images(imgs[:8]))
    np.testing.assert_array_equal(out21[16:], server.encode_images(imgs[16:]))
    # Cross-shape: matches the direct unpadded forward at fp32 tolerance.
    direct = np.asarray(
        server.model.apply(server.variables, imgs, normalize=True, method="encode_image")
    )
    np.testing.assert_allclose(out21, direct, rtol=2e-5, atol=2e-6)


def test_encode_texts_matches_full_context(server):
    """Width bucketing (shrink_context) is exact: causal tower + EOT pooling
    make post-EOT positions unreachable."""
    from flyp_tpu.tokenizer import tokenize

    caps = ["a photo of a cat", "a dog", "x " * 30, "short"] * 2  # mixed EOTs
    tokens = tokenize(caps)  # [8, 77] -> one [8, w] bucket chunk
    direct = np.asarray(
        server.model.apply(server.variables, tokens, normalize=True, method="encode_text")
    )
    out = server.encode_texts(caps)
    # Width slicing is value-preserving (causal tower + EOT pooling — the
    # property itself is pinned in test_tokenizer.py); across two compiled
    # widths XLA may group the same addends differently, so compare at fp32
    # tolerance here and bitwise only within identical programs below.
    np.testing.assert_allclose(out, direct, rtol=2e-5, atol=2e-6)
    # Pre-tokenized input takes the same path (bitwise: same program).
    np.testing.assert_array_equal(server.encode_texts(tokens), out)
    # Oversize requests chunk positionally exactly (same [8, w] program)...
    caps12 = caps + caps[:4]
    out12 = server.encode_texts(caps12)
    np.testing.assert_array_equal(out12[:8], out)
    # ...and the [4]-bucket tail matches the standalone [4]-bucket call.
    np.testing.assert_array_equal(out12[8:], server.encode_texts(caps[:4]))


def test_classify_and_top_k():
    model, variables = tiny_model()
    rng = np.random.default_rng(1)
    from flyp_tpu.models.head import ClassificationHead

    head = ClassificationHead.create(
        np.asarray(rng.standard_normal((7, model.config.embed_dim)), np.float32), normalize=True
    )
    srv = ClipServer(model, variables, head=head, image_buckets=(4, 8))
    imgs = _images(5, seed=2)
    logits = srv.classify(imgs)
    assert logits.shape == (5, 7)

    probs, idx = srv.top_k(imgs, k=3)
    assert probs.shape == idx.shape == (5, 3)
    assert (np.diff(probs, axis=1) <= 0).all()  # descending
    full = np.exp(logits - logits.max(axis=1, keepdims=True))
    full /= full.sum(axis=1, keepdims=True)
    np.testing.assert_allclose(probs[:, 0], full.max(axis=1), rtol=1e-6)
    assert (idx[:, 0] == full.argmax(axis=1)).all()

    # k clamps to the class count instead of silently under-filling.
    probs10, idx10 = srv.top_k(imgs, k=10)
    assert probs10.shape == idx10.shape == (5, 7)

    headless = ClipServer(model, variables, image_buckets=(4,))
    with pytest.raises(ValueError, match="head"):
        headless.classify(imgs)


def test_for_classification_head_matches_evaluator(server):
    """for_classification builds the SAME zero-shot head the per-epoch eval
    uses, so serving logits == evaluator logits."""
    from flyp_tpu.evaluation.classifier import Classifier
    from flyp_tpu.evaluation.zeroshot import get_zeroshot_classifier

    classnames = ["cat", "dog", "bird"]
    template = [lambda c: f"a photo of a {c}."]
    srv = ClipServer.for_classification(
        server.model, server.variables, classnames, template, image_buckets=(4, 8)
    )
    head = get_zeroshot_classifier(server.model, server.variables, classnames, template)
    clf = Classifier(server.model, server.variables, head, batch_size=8)
    imgs = _images(6, seed=3)
    np.testing.assert_array_equal(srv.classify(imgs), clf.predict_logits(imgs))


def test_similarity_retrieval(server):
    imgs, caps = _images(4, seed=4), ["a", "b", "c"]
    sim = server.similarity(server.encode_images(imgs), server.encode_texts(caps))
    assert sim.shape == (4, 3)
    scale = float(np.exp(np.asarray(server.variables["params"]["logit_scale"], np.float32)))
    fi = server.encode_images(imgs).astype(np.float32)
    ft = server.encode_texts(caps).astype(np.float32)
    np.testing.assert_allclose(sim, scale * fi @ ft.T, rtol=1e-6)


def test_stream_matches_batch_calls(server):
    batches = [_images(4, seed=5), _images(7, seed=6), _images(2, seed=7)]
    streamed = list(server.stream_features(iter(batches)))
    assert len(streamed) == 3
    for got, batch in zip(streamed, batches):
        np.testing.assert_array_equal(got, server.encode_images(batch))
    with pytest.raises(ValueError, match="largest bucket"):
        list(server.stream_features([_images(9)]))


def test_resnet_tower_serving_exact():
    """BN towers serve correctly: batch_stats ride along in ``variables`` and
    the forward uses RUNNING statistics (inference-mode BN), so a row's
    feature is independent of the padding rows — the pad-no-leak guarantee
    would break under train-mode BN.  Classify stays bitwise-equal to the
    evaluator path for RN50 too."""
    from flyp_tpu.evaluation.classifier import Classifier
    from flyp_tpu.evaluation.zeroshot import get_zeroshot_classifier

    from tests.test_flyp_trainer import tiny_resnet

    model, variables = tiny_resnet()
    assert "batch_stats" in variables
    classnames = ["cat", "dog", "bird"]
    template = [lambda c: f"a photo of a {c}."]
    srv = ClipServer.for_classification(
        model, variables, classnames, template, image_buckets=(4, 8)
    )
    imgs = _images(6, seed=8)
    # Pad rows can't leak through BatchNorm (same [4] program, different pad).
    np.testing.assert_array_equal(
        srv.encode_images(imgs[:3]), srv.encode_images(imgs[:4])[:3]
    )
    head = get_zeroshot_classifier(model, variables, classnames, template)
    clf = Classifier(model, variables, head, batch_size=8)
    np.testing.assert_array_equal(srv.classify(imgs), clf.predict_logits(imgs))


def test_from_checkpoint_serves_trainer_payloads(tmp_path):
    """ClipServer.from_checkpoint accepts every --clip_load artifact layout
    (epoch payload, step payload, bare param tree) and serves features
    bitwise-equal to a server built from the in-memory variables."""
    import optax

    from flyp_tpu.training.train_state import create_train_state
    from flyp_tpu.utils.checkpoint import StepCursor, save_checkpoint, save_params

    from tests.test_flyp_trainer import tiny_resnet

    model, variables = tiny_resnet()
    state = create_train_state(variables["params"], optax.adamw(1e-3), variables.get("batch_stats"))
    p_epoch = save_checkpoint(str(tmp_path / "checkpoint_0"), state)
    p_step = save_checkpoint(str(tmp_path / "checkpoint_0_step_2"), state, mid=StepCursor())
    p_bare = save_params(str(tmp_path / "bare"), variables["params"])

    imgs = _images(3, seed=9)
    want = ClipServer(model, variables, image_buckets=(4,)).encode_images(imgs)
    for path in (p_epoch, p_step):
        srv = ClipServer.from_checkpoint(
            path, compute_dtype="float32", config_override=model.config, image_buckets=(4,)
        )
        assert "batch_stats" in srv.variables  # BN tower stats survive the load
        np.testing.assert_array_equal(srv.encode_images(imgs), want)

    # A bare param tree has no BN running stats — serving a BatchNorm model
    # from one would silently pair trained weights with fresh stats; refuse.
    with pytest.raises(ValueError, match="batch_stats"):
        ClipServer.from_checkpoint(
            p_bare, compute_dtype="float32", config_override=model.config, image_buckets=(4,)
        )
    # A missing path is an error, not a silent random-init server.
    with pytest.raises(FileNotFoundError):
        ClipServer.from_checkpoint(
            str(tmp_path / "nope"), compute_dtype="float32",
            config_override=model.config, image_buckets=(4,),
        )

    # classnames shortcut builds the zero-shot head in the same call.
    srv = ClipServer.from_checkpoint(
        p_step, classnames=["cat", "dog"], compute_dtype="float32",
        config_override=model.config, image_buckets=(4,),
    )
    assert srv.classify(imgs).shape == (3, 2)


def test_serve_cli(tmp_path):
    """python -m flyp_tpu.cli.serve: checkpoint -> predictions TSV and
    features .npz, using the same ClipServer path the API exposes."""
    import optax
    from PIL import Image

    from flyp_tpu.cli.serve import collect_image_paths, main
    from flyp_tpu.training.train_state import create_train_state
    from flyp_tpu.utils.checkpoint import save_checkpoint

    from tests.test_flyp_trainer import tiny_model

    model, variables = tiny_model()
    state = create_train_state(variables["params"], optax.adamw(1e-3))
    ckpt = save_checkpoint(str(tmp_path / "checkpoint_0"), state)

    img_dir = tmp_path / "imgs" / "sub"
    img_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(5):
        Image.fromarray(rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)).save(
            img_dir / f"{i}.png"
        )
    (img_dir / "notes.txt").write_text("ignored")
    paths = collect_image_paths([str(tmp_path / "imgs")])
    assert len(paths) == 5

    out = tmp_path / "preds.tsv"
    rc = main(
        [
            "--checkpoint", ckpt, "--images", str(tmp_path / "imgs"),
            "--classnames", "cat,dog,bird", "--top-k", "2",
            "--image-buckets", "4,8", "--compute-dtype", "float32",
            "--output", str(out),
        ],
        config_override=model.config,
    )
    assert rc == 0
    import pandas as pd

    df = pd.read_csv(out, sep="\t")
    assert list(df.columns) == ["path", "pred", "prob", "top1", "top2"]
    assert len(df) == 5 and (df["pred"] == df["top1"]).all()
    assert df["prob"].between(1 / 3, 1.0).all()

    feats = tmp_path / "feats.npz"
    rc = main(
        [
            "--checkpoint", ckpt, "--images", str(tmp_path / "imgs"),
            "--features", str(feats), "--image-buckets", "4,8",
            "--compute-dtype", "float32",
        ],
        config_override=model.config,
    )
    assert rc == 0
    z = np.load(feats, allow_pickle=False)
    assert z["features"].shape == (5, model.config.embed_dim)
    assert z["features"].dtype == np.float32  # bf16 would be unreadable void bytes
    assert list(z["paths"]) == paths
    # Feature rows match the server API for the same preprocessing.
    from flyp_tpu.data.transforms import eval_transform

    tf = eval_transform(model.config.vision.image_size)
    imgs = np.stack([tf(Image.open(p)) for p in paths])
    srv = ClipServer(model, variables, image_buckets=(4, 8))
    np.testing.assert_array_equal(z["features"], srv.encode_images(imgs))

    # --train-dataset resolves classnames through the registry (no data root).
    out2 = tmp_path / "preds_ds.tsv"
    rc = main(
        [
            "--checkpoint", ckpt, "--images", str(tmp_path / "imgs"),
            "--train-dataset", "PatchCamelyonVal", "--template", "patchcamelyon_template",
            "--top-k", "1", "--image-buckets", "8", "--compute-dtype", "float32",
            "--output", str(out2),
        ],
        config_override=model.config,
    )
    assert rc == 0
    df2 = pd.read_csv(out2, sep="\t")
    assert set(df2["pred"]) <= {"lymph node", "lymph node containing metastatic tumor tissue"}

    with pytest.raises(SystemExit, match="classnames"):
        main(["--checkpoint", ckpt, "--images", str(tmp_path / "imgs")])
    with pytest.raises(SystemExit, match="top-k"):
        main(["--checkpoint", ckpt, "--images", str(tmp_path / "imgs"),
              "--classnames", "a,b", "--top-k", "0"])


def test_warmup_counts_programs():
    model, variables = tiny_model()
    from flyp_tpu.models.head import ClassificationHead

    head = ClassificationHead.create(
        np.asarray(np.eye(3, model.config.embed_dim), np.float32), normalize=True
    )
    srv = ClipServer(model, variables, head=head, image_buckets=(4, 8))
    # 2 buckets x (features + logits) + the full 2-width x 2-bucket text grid
    assert srv.warmup(text_widths=(16, 32)) == 8
    srv_nohead = ClipServer(model, variables, image_buckets=(4,))
    assert srv_nohead.warmup(text_widths=(16,)) == 2


def test_concurrent_callers_match_sequential():
    """ClipServer's documented concurrency contract (engine.py docstring):
    request methods are reentrant, so N threads hammering classify /
    encode_images / encode_texts concurrently produce bitwise the same
    results as sequential calls."""
    import concurrent.futures as cf

    from flyp_tpu.models.head import ClassificationHead

    model, variables = tiny_model()
    rng = np.random.default_rng(3)
    head = ClassificationHead.create(
        np.asarray(rng.standard_normal((5, model.config.embed_dim)), np.float32), normalize=True
    )
    srv = ClipServer(model, variables, head=head, image_buckets=(4, 8))

    requests = [
        ("classify", _images(6, seed=10)),
        ("encode_images", _images(11, seed=11)),
        ("classify", _images(3, seed=12)),
        ("encode_texts", ["a photo of a cat", "a photo of a dog sitting on a mat"]),
        ("encode_images", _images(8, seed=13)),
        ("classify", _images(8, seed=14)),
        ("encode_texts", ["one caption"]),
        ("encode_images", _images(2, seed=15)),
    ]

    def run(req):
        kind, payload = req
        return np.asarray(getattr(srv, kind)(payload))

    sequential = [run(r) for r in requests]
    for _round in range(3):  # repeated rounds shake out scheduling orders
        with cf.ThreadPoolExecutor(max_workers=4) as pool:
            concurrent = list(pool.map(run, requests))
        for s, c in zip(sequential, concurrent):
            np.testing.assert_array_equal(s, c)


def test_http_endpoints_match_direct_calls():
    """The stdlib HTTP front-end (serving/http.py) answers /healthz,
    /features, /text_features and /classify with exactly what the direct
    ClipServer calls return; malformed bodies come back as 400 JSON, not
    connection drops."""
    import io
    import json
    import threading
    import urllib.request

    from flyp_tpu.models.head import ClassificationHead
    from flyp_tpu.serving import serve_http

    model, variables = tiny_model()
    rng = np.random.default_rng(4)
    classnames = [f"class {i}" for i in range(6)]
    head = ClassificationHead.create(
        np.asarray(rng.standard_normal((6, model.config.embed_dim)), np.float32), normalize=True
    )
    srv = ClipServer(model, variables, head=head, image_buckets=(4, 8))
    httpd = serve_http(srv, 0, classnames=classnames)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        def get(path):
            with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}") as r:
                return r.status, json.loads(r.read())

        def post(path, body, ctype):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}{path}", data=body, headers={"Content-Type": ctype}
            )
            try:
                with urllib.request.urlopen(req) as r:
                    return r.status, json.loads(r.read())
            except urllib.error.HTTPError as e:
                return e.code, json.loads(e.read())

        status, health = get("/healthz")
        assert status == 200 and health["ok"] and health["num_classes"] == 6
        assert health["buckets"] == [4, 8]

        imgs = _images(5, seed=20)
        buf = io.BytesIO()
        np.save(buf, imgs)
        status, out = post("/classify?k=3", buf.getvalue(), "application/x-npy")
        assert status == 200
        probs, idx = srv.top_k(imgs, k=3)
        np.testing.assert_allclose(np.asarray(out["probs"]), probs, rtol=1e-6)
        assert np.asarray(out["indices"]).tolist() == idx.tolist()
        assert out["classes"][0][0] == classnames[idx[0, 0]]

        buf = io.BytesIO()
        np.save(buf, imgs)
        status, out = post("/features", buf.getvalue(), "application/x-npy")
        assert status == 200
        np.testing.assert_allclose(
            np.asarray(out["features"], np.float32),
            np.asarray(srv.encode_images(imgs), np.float32),
            rtol=1e-6,
        )

        # JSON image payloads work for tiny/manual requests.
        status, out_json = post(
            "/features", json.dumps({"images": imgs[:2].tolist()}).encode(), "application/json"
        )
        assert status == 200
        np.testing.assert_allclose(
            np.asarray(out_json["features"], np.float32),
            np.asarray(out["features"], np.float32)[:2],
            rtol=1e-6,
        )

        texts = ["a photo", "a much longer caption about a photo of something"]
        status, out = post("/text_features", json.dumps({"texts": texts}).encode(), "application/json")
        assert status == 200
        np.testing.assert_allclose(
            np.asarray(out["features"], np.float32),
            np.asarray(srv.encode_texts(texts), np.float32),
            rtol=1e-6,
        )

        status, err = post("/classify", b"not an npy body", "application/x-npy")
        assert status == 400 and "error" in err
        status, err = post("/nope", b"", "application/json")
        assert status == 404

        # Headless server: /classify refuses with 400, features still work.
        headless = ClipServer(model, variables, image_buckets=(4,))
        httpd2 = serve_http(headless, 0)
        port2 = httpd2.server_address[1]
        t2 = threading.Thread(target=httpd2.serve_forever, daemon=True)
        t2.start()
        try:
            req = urllib.request.Request(
                f"http://127.0.0.1:{port2}/classify", data=buf.getvalue(),
                headers={"Content-Type": "application/x-npy"},
            )
            try:
                with urllib.request.urlopen(req) as r:
                    code = r.status
            except urllib.error.HTTPError as e:
                code = e.code
                assert "head" in json.loads(e.read())["error"]
            assert code == 400
        finally:
            httpd2.shutdown()
            httpd2.server_close()
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_serve_cli_batch_mode_requires_images():
    import pytest as _pytest

    from flyp_tpu.cli.serve import main as serve_main

    with _pytest.raises(SystemExit, match="--images"):
        serve_main(["--checkpoint", "/nonexistent"])
