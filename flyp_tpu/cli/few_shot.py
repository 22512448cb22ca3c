"""Few-shot CLI entry point (`/root/reference/src/few_shot.py`): 50
independent restarts of the k-shot protocol, mean/std to stats_final.txt."""

from __future__ import annotations

import os

from flyp_tpu.config import parse_arguments
from flyp_tpu.training.few_shot import few_shot_driver
from flyp_tpu.utils.logging import get_logger


def main(cfg=None, num_runs: int = 50):
    cfg = cfg or parse_arguments()
    assert cfg.save is not None, "Please provide a path to store models"

    run_key = cfg.run_key()
    exp = cfg.exp_name or "few_shot"
    # os.path.join like cli/main.py (the reference string-concatenates in
    # both entry points, `few_shot.py:15-16` — a raw concat would drop
    # few-shot models OUTSIDE the --save tree main.py scans).
    cfg.save = os.path.join(cfg.save, exp, run_key)
    os.makedirs(cfg.save, exist_ok=True)
    cfg.log_dir = os.path.join("expt_logs", exp, run_key)
    os.makedirs(cfg.log_dir, exist_ok=True)
    logger = get_logger(cfg.log_dir)
    logger.info(cfg)

    return few_shot_driver(cfg, logger, num_runs=num_runs)


if __name__ == "__main__":
    main()
