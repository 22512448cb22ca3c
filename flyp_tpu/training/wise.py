"""WiSE-FT weight-space ensembling.

The reference parses ``--alpha``, ``--wise_save``, ``--fisher``, and
``--fisher_floor`` (`src/args.py`) but never wires them in the released
training code — they are the dormant WiSE-FT lineage flags.  This module
implements the evident capability: interpolate zero-shot and fine-tuned
parameter pytrees, uniformly or Fisher-weighted (Wortsman et al., 2022)."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def interpolate(zeroshot_params: Any, finetuned_params: Any, alpha: float) -> Any:
    """theta = (1 - alpha) * zeroshot + alpha * finetuned."""
    return jax.tree_util.tree_map(
        lambda z, f: (1.0 - alpha) * z + alpha * f, zeroshot_params, finetuned_params
    )


def fisher_interpolate(
    zeroshot_params: Any,
    finetuned_params: Any,
    fisher_zeroshot: Any,
    fisher_finetuned: Any,
    alpha: float = 0.5,
    fisher_floor: float = 1e-8,
) -> Any:
    """Fisher-weighted merge: per-parameter convex combination with weights
    proportional to (floored) Fisher information."""

    def merge(z, f, fz, ff):
        wz = (1.0 - alpha) * jnp.maximum(fz, fisher_floor)
        wf = alpha * jnp.maximum(ff, fisher_floor)
        return (wz * z + wf * f) / (wz + wf)

    return jax.tree_util.tree_map(merge, zeroshot_params, finetuned_params, fisher_zeroshot, fisher_finetuned)
