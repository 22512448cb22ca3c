"""Experiment metric sink.

The reference streams per-step metrics to wandb (`flyp_loss.py:339-341,524`);
this environment has no network, so the sink writes the same records to a
JSONL file (and to wandb when the package is importable and not disabled via
``--debug``, preserving upstream behavior)."""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional

import numpy as np


class MetricsSink:
    def __init__(self, log_dir: Optional[str], enabled: bool = True, project: str = "sd_exprs", config=None, name=None, group=None):
        self.enabled = enabled
        self._file = None
        self._wandb = None
        if not enabled:
            return
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self._file = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        try:  # pragma: no cover - wandb not installed in this image
            import wandb

            wandb.init(project=project, config=config, name=name, group=group)
            self._wandb = wandb
        except Exception:
            self._wandb = None

    def log(self, record: Dict[str, Any]) -> None:
        if not self.enabled:
            return
        if self._file is not None:

            def _clean(v):
                # Scalars (numpy/jax 0-d or size-1) -> float; larger arrays
                # -> lists (float() on a size>1 array raises and would kill
                # the train loop on a logging call).
                if hasattr(v, "item"):
                    size = getattr(v, "size", 1)
                    return float(v) if size == 1 else np.asarray(v).tolist()
                return v

            clean = {k: _clean(v) for k, v in record.items()}
            self._file.write(json.dumps({"ts": time.time(), **clean}) + "\n")
            self._file.flush()
        if self._wandb is not None:  # pragma: no cover
            self._wandb.log(record)

    def close(self) -> None:
        if self._file is not None:
            self._file.close()
        if self._wandb is not None:  # pragma: no cover
            # Upstream shells out to `wandb sync` at exit (`flyp_loss.py:673`);
            # finish() flushes the run through the client API instead.
            self._wandb.finish()
