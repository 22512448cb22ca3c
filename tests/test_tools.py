"""Guards for the measurement tools in tools/ that carry on-chip claims.

These run in interpret/CPU mode: they pin the *correctness* of the probe
kernels and the A/B bench plumbing so the numbers recorded in
docs/BENCHMARKS.md stay attached to code that still computes the right
thing.  The rates themselves are chip-only and live in the docs.
"""

import numpy as np
import jax
import jax.numpy as jnp

from tests.test_wilds_readers import fmow_tree, iwildcam_tree  # noqa: F401


def test_pallas_probe_gemm_int8_exact():
    """The int8 probe GEMM (tools/int8_matmul_probe._pallas_mm) must be an
    exact int32-accumulated int8 matmul — the probe's TOP/s claims are
    meaningless if the kernel computes something cheaper."""
    from tools.int8_matmul_probe import _pallas_mm

    rng = np.random.default_rng(0)
    # Include a block-non-divisible N (2304 % 512 != 0): a truncating grid
    # would leave the ragged column tail uncomputed and inflate the probe's
    # reported TOP/s (caught live in round 4 — the fix picks tiling blocks).
    for m, k, n in [(1024, 768, 512), (512, 768, 2304), (512, 768, 768)]:
        a = jnp.asarray(rng.integers(-127, 127, (m, k)), jnp.int8)
        b = jnp.asarray(rng.integers(-127, 127, (k, n)), jnp.int8)
        out = _pallas_mm(a, b, jnp.int32, interpret=True)
        ref = np.asarray(a, np.int32) @ np.asarray(b, np.int32)
        np.testing.assert_array_equal(np.asarray(out), ref)


def test_pallas_probe_gemm_bf16():
    from tools.int8_matmul_probe import _pallas_mm

    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.standard_normal((512, 768)), jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((768, 512)), jnp.bfloat16)
    out = _pallas_mm(a, b, jnp.float32, interpret=True)
    ref = np.asarray(a, np.float32) @ np.asarray(b, np.float32)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-2, atol=1e-1)


def test_bench_ab_bakes_distinct_impls(monkeypatch, capsys):
    """bench.py --ab must AOT-compile each side under its own attn= override
    (a lazy jit trace silently measures the same impl twice — the footgun
    documented in docs/BENCHMARKS.md round 4), and must restore the
    process-wide impl afterwards."""
    import os

    import bench
    import flyp_tpu.models as models
    from __graft_entry__ import _tiny_config
    from flyp_tpu.ops.attention import _IMPL_ENV, _default_impl

    monkeypatch.setitem(models.MODEL_CONFIGS, "TINY-AB", _tiny_config())
    monkeypatch.setenv(_IMPL_ENV, "xla")
    _default_impl.cache_clear()

    seen = []
    orig_build = bench.build_bench_step

    def spy_build(*args, **kwargs):
        seen.append(_default_impl())
        return orig_build(*args, **kwargs)

    monkeypatch.setattr(bench, "build_bench_step", spy_build)
    result = bench.main_ab("TINY-AB:attn=pallas_block", "TINY-AB:attn=xla", batch_size=4)
    # Each side's build ran under its own impl...
    assert seen == ["pallas_block", "xla"], seen
    # ...the ratio is a real number from two executed programs...
    assert result["value"] > 0
    # ...and the process-wide impl was restored.
    assert os.environ.get(_IMPL_ENV) == "xla"
    assert _default_impl() == "xla"
    _default_impl.cache_clear()


def test_loop_sync_ab_smoke(monkeypatch, capsys):
    """The trainer-loop sync A/B runs both loop shapes and reports a ratio."""
    import flyp_tpu.models as models
    from __graft_entry__ import _tiny_config
    from tools.loop_sync_ab import main

    monkeypatch.setitem(models.MODEL_CONFIGS, "TINY-LOOP", _tiny_config())
    main(4, "TINY-LOOP")
    out = capsys.readouterr().out
    assert "sync/lagged" in out


def test_eval_sync_ab_smoke(monkeypatch, capsys):
    """The eval-loop sync A/B runs both loop shapes and reports a ratio."""
    import flyp_tpu.models as models
    from __graft_entry__ import _tiny_config
    from tools.eval_sync_ab import main

    monkeypatch.setitem(models.MODEL_CONFIGS, "TINY-EVAL", _tiny_config())
    main("TINY-EVAL", 4, classes=7)
    out = capsys.readouterr().out
    assert "sync/lagged" in out


def test_one_step_lag_contract():
    """OneStepLag: push returns the previous item (None first), flush drains."""
    from flyp_tpu.utils.pipeline import OneStepLag, host_cast_images

    lag = OneStepLag()
    assert lag.push(1) is None
    assert lag.push(2) == 1
    assert lag.push(3) == 2
    assert lag.flush() == 3
    assert lag.flush() is None
    assert lag.push("a") is None  # reusable after flush

    # host_cast_images: bf16 only for float inputs under bf16 compute.
    import ml_dtypes

    f32 = np.zeros((2, 4, 4, 3), np.float32)
    u8 = np.zeros((2, 4, 4, 3), np.uint8)
    assert host_cast_images(f32, jnp.bfloat16).dtype == ml_dtypes.bfloat16
    assert host_cast_images(f32, jnp.float32).dtype == np.float32
    assert host_cast_images(u8, jnp.bfloat16).dtype == np.uint8


def test_validate_checkpoint_argparse_errors(capsys):
    """The two bad-flag combinations exit with argparse errors, not
    tracebacks: no source at all, and --download_pretrained without the
    model name it needs (ADVICE round-4 coverage gap)."""
    import pytest

    from flyp_tpu.tools.validate_checkpoint import main

    with pytest.raises(SystemExit) as exc:
        main([])
    assert exc.value.code == 2
    assert "pass --checkpoint or --download_pretrained" in capsys.readouterr().err

    with pytest.raises(SystemExit) as exc:
        main(["--download_pretrained"])
    assert exc.value.code == 2
    assert "--download_pretrained needs --model" in capsys.readouterr().err


def test_validate_data_tool(iwildcam_tree, tmp_path, capsys):
    """The data-tree pre-flight (tools/validate_data.py): a good tree
    reports OK with split sizes + decode probe; an empty root, an unknown
    dataset name, and a tree with a deleted image all FAIL with named
    errors (exit 1), not tracebacks."""
    from flyp_tpu.tools.validate_data import main

    rc = main(["--dataset", "IWildCamOOD", "--root", iwildcam_tree, "--batch_size", "4", "--probe", "3"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "OK IWildCamOOD" in out
    assert "decode probe" in out and "test samples" in out

    rc = main(["--dataset", "IWildCamOOD", "--root", str(tmp_path / "empty")])
    assert rc == 1
    assert "FAIL" in capsys.readouterr().err

    rc = main(["--dataset", "NoSuchSet", "--root", iwildcam_tree])
    assert rc == 1
    assert "unknown dataset" in capsys.readouterr().err

    # A tree whose metadata references a file that is gone must be caught
    # by the existence scan, not at a user's first training run.
    import shutil

    broken = tmp_path / "broken"
    shutil.copytree(iwildcam_tree, broken)
    victims = sorted(broken.rglob("*.jpg"))
    assert victims
    for v in victims:  # metadata still references every file
        v.unlink()
    rc = main(["--dataset", "IWildCamOOD", "--root", str(broken)])
    err = capsys.readouterr().err
    assert rc == 1
    assert "missing" in err


def test_validate_data_fmow(fmow_tree, capsys):
    from flyp_tpu.tools.validate_data import main

    rc = main(["--dataset", "FMOWOOD", "--root", fmow_tree, "--batch_size", "4", "--probe", "2"])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "OK FMOWOOD" in out


def test_validate_data_objectnet(tmp_path, capsys):
    """Third family through the generic validator path: ObjectNet's
    metadata-driven folder tree (113-class map, packaged JSONs)."""
    from PIL import Image

    from flyp_tpu.data.datasets.objectnet import get_metadata
    from flyp_tpu.tools.validate_data import main

    _, _, folder_to_ids, _ = get_metadata()
    for f in sorted(folder_to_ids.keys())[:3]:
        d = tmp_path / "objectnet-1.0" / "images" / f
        d.mkdir(parents=True)
        Image.fromarray(np.zeros((36, 36, 3), np.uint8)).save(d / "img0.png")

    rc = main(["--dataset", "ObjectNet", "--root", str(tmp_path), "--probe", "2"])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "OK ObjectNet" in out and "classes:         113" in out
