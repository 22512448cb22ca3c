"""Keep the driver's multi-chip gate green: run the dry run in-process.

`tests/conftest.py` already provides the 8-device virtual CPU backend, so
this exercises `_dryrun_impl` directly (the subprocess bootstrap path in
`dryrun_multichip` is only for environments that see fewer devices).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_dryrun_multichip_full_epoch_cycle():
    import __graft_entry__ as g

    g._dryrun_impl(8)


def test_bench_runs_every_model_family_on_cpu():
    """bench.py is the driver's perf gate; its per-family FLOP-accounting
    branches (ViT analytic kernel additions vs ResNet XLA-only) must not
    crash.  Tiny batch, functional values only."""
    import bench

    for name in ("ViT-B/32", "RN50"):  # same branches as B/16, 4x fewer tokens
        result = bench.main(batch_size=2, model_name=name)
        assert result["value"] > 0
        assert result["extra"]["step_tflops"] > 0
