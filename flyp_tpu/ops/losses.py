"""Contrastive (InfoNCE) loss with global-batch semantics, plus the three
supervised variants of the reference ClipLoss (`/root/reference/clip/loss.py:
72-211`).

FLYP's accuracy depends on the *effective* contrastive batch (SURVEY.md §7):
the logit matrix must span the full data-parallel batch.  Two TPU-native ways
to get that, both supported here:

* **pjit / GSPMD (default)**: jit the train step over a Mesh with the batch
  dim sharded and call ``clip_loss`` with no ``axis_name``.  The global
  ``img @ txt.T`` is written as global math; XLA partitions it and inserts
  the all-gather over ICI automatically, with gradients flowing to both
  towers on every shard by construction.
* **shard_map**: pass ``axis_name``; features are gathered explicitly with
  ``jax.lax.all_gather`` (differentiable — no rank-splice hack like the
  torch path at `clip/loss.py:62-67`) and per-item losses are returned for
  the local rows only (``local_loss=True``) or all global rows.

Per-item losses are returned for the default variant (the reference uses
``reduction='none'`` at `clip/loss.py:208` and the curriculum machinery
consumes per-item values); supervised variants return scalars, as upstream
does.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _log_softmax_diag_ce(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Per-row cross entropy with integer labels: logsumexp(row) - row[label]."""
    lse = jax.nn.logsumexp(logits, axis=-1)
    picked = jnp.take_along_axis(logits, labels[:, None], axis=-1)[:, 0]
    return lse - picked


def _soft_ce(logits: jax.Array, target_probs: jax.Array) -> jax.Array:
    return -jnp.sum(target_probs * jax.nn.log_softmax(logits, axis=-1), axis=-1)


def clip_loss(
    image_features: jax.Array,
    text_features: jax.Array,
    logit_scale: jax.Array,
    ground_labels: Optional[jax.Array] = None,
    *,
    ignore: bool = False,
    google_sup_loss: bool = False,
    axis_name: Optional[str] = None,
    local_loss: bool = False,
) -> jax.Array:
    """Bidirectional contrastive loss over L2-normalized features.

    Args:
      image_features / text_features: ``[B, D]`` (already normalized).
      logit_scale: scalar temperature, already exponentiated.
      ground_labels: optional ``[B]`` integer class labels enabling the
        supervised variants (`clip/loss.py:123-192`).
      ignore: mask same-class negatives variant (`:132-159`).
      google_sup_loss: excluded-denominator per-positive variant (`:160-187`).
      axis_name: mapped axis to gather over (shard_map path).  None = the
        caller provides global (or pjit-sharded-global) arrays.
      local_loss: with ``axis_name``, return only this shard's rows.
        Applies to the default variant only: the supervised variants need
        the full pairwise label matrix and return a scalar that must be
        identical on every shard, so they always use the gathered square
        logits (``local_loss`` is a perf knob, not a semantics knob).

    Returns:
      ``[B_global]`` (or ``[B_local]`` with ``local_loss``) per-item losses
      for the default variant; a scalar for the supervised variants.
    """
    assert not (ignore and google_sup_loss), "please specify only one"

    img = image_features.astype(jnp.float32)
    txt = text_features.astype(jnp.float32)
    scale = logit_scale.astype(jnp.float32)

    rank = 0
    local_b = img.shape[0]
    # Supervised variants ignore local_loss (see docstring): rectangular
    # [B_local, B_global] logits would mis-index the label-equality matrix
    # and produce shard-dependent scalars.
    local_loss = local_loss and ground_labels is None
    if axis_name is not None:
        rank = jax.lax.axis_index(axis_name)
        all_img = jax.lax.all_gather(img, axis_name, tiled=True)
        all_txt = jax.lax.all_gather(txt, axis_name, tiled=True)
        if local_loss:
            logits_per_image = scale * img @ all_txt.T  # [B_local, B_global]
            logits_per_text = scale * txt @ all_img.T
        else:
            logits_per_image = scale * all_img @ all_txt.T  # [B_global, B_global]
            logits_per_text = logits_per_image.T
        if ground_labels is not None:
            ground_labels = jax.lax.all_gather(ground_labels, axis_name, tiled=True)
    else:
        logits_per_image = scale * img @ txt.T
        logits_per_text = logits_per_image.T

    n = logits_per_image.shape[0]

    if ground_labels is not None:
        # Label-equality matrix over the (global) batch.
        equal = (ground_labels[None, :] == ground_labels[:, None]).astype(jnp.float32)

        if ignore:
            # Drop same-class off-diagonal negatives from the denominator.
            eye = jnp.eye(n, dtype=jnp.float32)
            keep = 1.0 - (equal - eye)  # 0 where a same-class negative sits

            def masked_infonce(logits):
                z = jnp.exp(logits - jnp.max(logits, axis=1, keepdims=True)) * keep
                diag = jnp.diagonal(z)
                return -jnp.log(diag / jnp.sum(z, axis=1))

            return (jnp.mean(masked_infonce(logits_per_image)) + jnp.mean(masked_infonce(logits_per_text))) / 2.0

        if google_sup_loss:
            # Supervised contrastive: each positive pair scored against a
            # denominator that excludes its own term, averaged per anchor.
            def sup(logits):
                z = jnp.exp(logits - jnp.max(logits, axis=1, keepdims=True))
                denom = jnp.sum(z, axis=1, keepdims=True) - z
                per_pair = -jnp.log(z / denom) * equal
                return jnp.mean(jnp.sum(per_pair, axis=1) / jnp.sum(equal, axis=1))

            return (sup(logits_per_image) + sup(logits_per_text)) / 2.0

        # Soft-label CE over the normalized label-equality matrix (`:188-192`).
        soft = equal / jnp.sum(equal, axis=1, keepdims=True)
        return (jnp.mean(_soft_ce(logits_per_image, soft)) + jnp.mean(_soft_ce(logits_per_text, soft))) / 2.0

    # Default InfoNCE: diagonal labels; per-item losses (reduction='none').
    if axis_name is not None and local_loss:
        labels = jnp.arange(local_b) + local_b * rank
    else:
        labels = jnp.arange(n)
    return (_log_softmax_diag_ce(logits_per_image, labels) + _log_softmax_diag_ce(logits_per_text, labels)) / 2.0
