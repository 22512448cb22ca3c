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


def make_optimizer(schedule: Callable, weight_decay: float) -> optax.GradientTransformation:
    return optax.inject_hyperparams(optax.adamw)(
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
