"""Main CLI entry point (`/root/reference/src/main.py`).

Dispatch: ``--ce_ablation`` -> CE ablation, ``--progress_validation`` ->
progress-validation beam search, else the FLYP trainer.  Run directories are
keyed ``<exp_name>/_BS{bs}_WD{wd}_LR{lr}_run{n}`` exactly as upstream
(`main.py:22-28`).
"""

from __future__ import annotations

import os

from flyp_tpu.config import parse_arguments
from flyp_tpu.utils.logging import get_logger


def main(cfg=None):
    cfg = cfg or parse_arguments()

    run_key = cfg.run_key()
    exp = cfg.exp_name or "flyp"
    if cfg.save is not None:
        cfg.save = os.path.join(cfg.save, exp, run_key)
        os.makedirs(cfg.save, exist_ok=True)
    cfg.log_dir = os.path.join("expt_logs", exp, run_key)
    os.makedirs(cfg.log_dir, exist_ok=True)
    logger = get_logger(cfg.log_dir)
    logger.info(cfg)

    if cfg.ce_ablation:
        from flyp_tpu.training.ce_ablation import ce_ablation

        return ce_ablation(cfg, logger)
    if cfg.progress_validation:
        from flyp_tpu.training.progress import flyp_progress_validation

        return flyp_progress_validation(cfg, logger)

    from flyp_tpu.training.flyp import flyp_train

    return flyp_train(cfg, logger)


if __name__ == "__main__":
    main()
