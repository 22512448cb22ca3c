"""Standalone zero-shot evaluation (`/root/reference/src/models/zeroshot.py:
86-103`): build the prompt-template head from a (pretrained or fine-tuned)
CLIP model and run the eval suite, no training."""

from __future__ import annotations

import os

from flyp_tpu.config import parse_arguments
from flyp_tpu.evaluation.classifier import Classifier
from flyp_tpu.evaluation.evaluator import evaluate
from flyp_tpu.models.factory import build_clip_model
from flyp_tpu.training.flyp import build_zeroshot_head
from flyp_tpu.utils.checkpoint import save_params
from flyp_tpu.utils.logging import get_logger


def main(cfg=None):
    cfg = cfg or parse_arguments()
    cfg.log_dir = cfg.log_dir or os.path.join("expt_logs", cfg.exp_name or "zeroshot", cfg.run_key())
    logger = get_logger(cfg.log_dir)

    model, variables = build_clip_model(cfg)
    head = build_zeroshot_head(cfg, model, variables)
    classifier = Classifier(model, variables, head, batch_size=cfg.batch_size)

    train_stats: dict = {}
    evaluate(classifier, cfg, train_stats, logger)
    for key, value in train_stats.items():
        logger.info(f"{key}: {value}")

    if cfg.save is not None:
        path = save_params(os.path.join(cfg.save, "zeroshot_head"), {"weight": head.weight, "bias": head.bias})
        logger.info(f"Saved zero-shot head to {path}")
    return train_stats


if __name__ == "__main__":
    main()
