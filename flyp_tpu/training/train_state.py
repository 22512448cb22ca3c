"""Train state: params + AdamW optimizer state as one pytree.

The optimizer matches the reference setup (`/root/reference/src/models/
flyp_loss.py:368-371`): torch AdamW defaults (betas 0.9/0.999, eps 1e-8),
decoupled weight decay applied to *every* parameter (the reference passes a
single param group — LN scales and logit_scale included; kept for parity).
The schedule is injected as a hyperparameter so the current LR is readable
from the optimizer state for logging.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    step: jax.Array
    params: Any
    opt_state: Any
    batch_stats: Any = None  # ResNet towers only

    def learning_rate(self) -> jax.Array:
        return self.opt_state.hyperparams["learning_rate"]


def _scale_by_adam_moment_dtype(b1: float, b2: float, eps: float, moment_dtype) -> optax.GradientTransformation:
    """optax.scale_by_adam with BOTH moments stored in ``moment_dtype``
    (bfloat16 halves the optimizer state's HBM footprint and traffic — the
    isolated 150M-param update drops 7.6 -> 5.8 ms on v5e, tools/mfu_levers)
    while all arithmetic stays float32.  State shape mirrors
    ``optax.ScaleByAdamState`` so TP/FSDP sharding walks and checkpoints
    treat it identically."""

    def init(params):
        zeros = lambda p: jnp.zeros_like(p, dtype=moment_dtype)
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree_util.tree_map(zeros, params),
            nu=jax.tree_util.tree_map(zeros, params),
        )

    def update(updates, state, params=None):
        del params
        count = optax.safe_increment(state.count)
        m32s = jax.tree_util.tree_map(
            lambda g, m: b1 * m.astype(jnp.float32) + (1 - b1) * g.astype(jnp.float32), updates, state.mu
        )
        v32s = jax.tree_util.tree_map(
            lambda g, v: b2 * v.astype(jnp.float32) + (1 - b2) * jnp.square(g.astype(jnp.float32)),
            updates, state.nu,
        )
        bc1 = 1 - b1 ** count.astype(jnp.float32)
        bc2 = 1 - b2 ** count.astype(jnp.float32)
        new_updates = jax.tree_util.tree_map(
            lambda m32, v32, g: ((m32 / bc1) / (jnp.sqrt(v32 / bc2) + eps)).astype(g.dtype),
            m32s, v32s, updates,
        )
        new_state = optax.ScaleByAdamState(
            count=count,
            mu=jax.tree_util.tree_map(lambda m32: m32.astype(moment_dtype), m32s),
            nu=jax.tree_util.tree_map(lambda v32: v32.astype(moment_dtype), v32s),
        )
        return new_updates, new_state

    return optax.GradientTransformation(init, update)


def make_optimizer(
    schedule: Callable, weight_decay: float, moment_dtype: str | None = None
) -> optax.GradientTransformation:
    """AdamW with torch-default hyperparameters.

    ``moment_dtype``: None/"float32" stores the Adam moments in float32
    (exact reference parity); "bfloat16" halves their HBM footprint and the
    update's bandwidth at a ~1e-3 relative rounding on the moment
    accumulators (opt-in via ``--adam_moment_dtype``)."""
    if moment_dtype in (None, "float32", jnp.float32):
        return optax.inject_hyperparams(optax.adamw)(
            learning_rate=schedule, b1=0.9, b2=0.999, eps=1e-8, weight_decay=weight_decay
        )
    dtype = jnp.bfloat16 if moment_dtype in ("bfloat16", jnp.bfloat16) else jnp.dtype(moment_dtype)

    def adamw_low_moments(learning_rate, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.1):
        return optax.chain(
            _scale_by_adam_moment_dtype(b1, b2, eps, dtype),
            optax.add_decayed_weights(weight_decay),
            optax.scale_by_learning_rate(learning_rate),
        )

    return optax.inject_hyperparams(adamw_low_moments)(
        learning_rate=schedule, b1=0.9, b2=0.999, eps=1e-8, weight_decay=weight_decay
    )


def create_train_state(
    params: Any,
    optimizer: optax.GradientTransformation,
    batch_stats: Any = None,
) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=optimizer.init(params),
        batch_stats=batch_stats,
    )
