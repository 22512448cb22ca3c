"""Learning-rate schedules with reference-exact math.

``warmup_cosine_lr`` reproduces `cosine_lr` at `/root/reference/src/models/
utils.py:19-34`: linear warmup ``base*(step+1)/warmup`` then
``0.5*(1+cos(pi*e/es))*base + min_lr`` (note: *added* min_lr, the upstream
convention).  ``crestart_lr`` reproduces the 'crestart' trainer branch
(`flyp_loss.py:380-382` + `scheduler.step(epoch)` at `:510`): torch
CosineAnnealingWarmRestarts stepped with the *epoch* index each batch, which
holds LR constant within an epoch.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp


def warmup_cosine_lr(base_lr: float, warmup_length: int, steps: int, min_lr: float = 0.0) -> Callable:
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = base_lr * (step + 1.0) / max(warmup_length, 1)
        e = step - warmup_length
        es = max(steps - warmup_length, 1)
        cos = 0.5 * (1.0 + jnp.cos(jnp.pi * e / es)) * base_lr + min_lr
        return jnp.where(step < warmup_length, warm, cos)

    return schedule


def crestart_lr(base_lr: float, t_0: int, eta_min: float = 0.01, steps_per_epoch: int | None = None) -> Callable:
    """Warm-restart cosine, restarting every ``t_0`` epochs (T_mult=1).

    When ``steps_per_epoch`` is given the schedule maps a global *step* to its
    epoch first (the trainer steps the torch scheduler with the epoch index).
    """

    def schedule(step):
        e = jnp.asarray(step, jnp.float32)
        if steps_per_epoch is not None:
            e = jnp.floor(e / steps_per_epoch)
        t_cur = jnp.mod(e, t_0)
        return eta_min + (base_lr - eta_min) * 0.5 * (1.0 + jnp.cos(jnp.pi * t_cur / t_0))

    return schedule


def make_scheduler(
    name: str,
    base_lr: float,
    warmup_length: int,
    epochs: int,
    num_batches: int,
    min_lr: float = 0.0,
    start_epoch: int = 0,
) -> Callable:
    """Build the trainer's schedule by name ('default'/'drestart'/'default_slower'/'crestart'),
    mirroring `flyp_loss.py:373-383`."""
    total = (epochs - start_epoch) * num_batches
    if name in ("default", "drestart"):
        return warmup_cosine_lr(base_lr, warmup_length, total, min_lr)
    if name == "default_slower":
        return warmup_cosine_lr(base_lr, warmup_length, total * 2, min_lr)
    if name == "crestart":
        return crestart_lr(base_lr, t_0=num_batches, eta_min=0.01, steps_per_epoch=num_batches)
    raise ValueError(f"invalid scheduler type {name}!")
