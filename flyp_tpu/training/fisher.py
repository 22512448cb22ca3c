"""Diagonal Fisher information of the classifier
(`/root/reference/src/models/fisher.py`).

The reference runs batch-size-1 passes and accumulates squared gradients per
parameter with labels sampled from the model's own softmax.  TPU-native
version: per-example gradients via ``jax.vmap(jax.grad)`` inside one jitted
program — the same estimator at full batch throughput, no bs=1 loop.
"""

from __future__ import annotations

import os
import pickle
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from flyp_tpu.data.registry import get_dataset_class
from flyp_tpu.data.transforms import train_transform
from flyp_tpu.models.factory import build_clip_model


def make_fisher_step(model, head, label_smoothing: float = 0.0):
    """Returns fn(params, batch_stats, images, rng) -> (grad^2 sums, count).

    ``batch_stats`` is None for ViT towers; for ResNet towers the reference
    runs `model.train()` during Fisher accumulation (`fisher.py:62,78`), so
    BatchNorm normalizes each (here: single-example) pass by its own batch
    statistics; the running-stat updates are side effects the reference
    never saves, so they are discarded here."""

    def _encode(params, batch_stats, image_batch):
        variables = {"params": params}
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
            feats, _ = model.apply(
                variables, image_batch, method="encode_image", train=True, mutable=["batch_stats"]
            )
            return feats
        return model.apply(variables, image_batch, method="encode_image")

    def single_loss(params, batch_stats, image, label):
        feats = _encode(params, batch_stats, image[None])
        logits = head(feats).astype(jnp.float32)[0]
        num_classes = logits.shape[-1]
        onehot = jax.nn.one_hot(label, num_classes)
        if label_smoothing > 0:
            onehot = onehot * (1 - label_smoothing) + label_smoothing / num_classes
        return -jnp.sum(onehot * jax.nn.log_softmax(logits))

    @jax.jit
    def fisher_step(params, batch_stats, images, rng):
        if batch_stats is None:
            feats = _encode(params, None, images)
        else:
            # The reference protocol is batch_size=1 (`fisher.py:50,62`): ONE
            # forward provides both the sampling logits and the backward, so
            # with train-mode BN each example is normalized by its own
            # statistics in BOTH places.  Sample from the same per-example-BN
            # softmax the per-example gradient below differentiates — a
            # full-batch-BN sampling forward would draw labels from a
            # different distribution than the one whose log-prob is being
            # differentiated, biasing the Fisher estimate.
            feats = jax.vmap(lambda im: _encode(params, batch_stats, im[None])[0])(images)
        logits = head(feats).astype(jnp.float32)
        labels = jax.random.categorical(rng, logits, axis=-1)

        per_example_grads = jax.vmap(jax.grad(single_loss), in_axes=(None, None, 0, 0))(
            params, batch_stats, images, labels
        )
        sq_sum = jax.tree_util.tree_map(lambda g: jnp.sum(g.astype(jnp.float32) ** 2, axis=0), per_example_grads)
        return sq_sum, images.shape[0]

    return fisher_step


def compute_fisher(cfg, logger=None, model=None, variables=None, head=None, max_batches: Optional[int] = None):
    """Accumulate the diagonal Fisher over the train set and pickle it
    (`fisher.py:27-114`)."""
    assert cfg.train_dataset is not None, "Please provide a training dataset."
    assert cfg.fisher is not None, "Please provide a path to save the Fisher to through --fisher."
    (save_path,) = cfg.fisher if isinstance(cfg.fisher, (list, tuple)) else (cfg.fisher,)
    save_path = os.path.expanduser(save_path)

    if model is None:
        model, variables = build_clip_model(cfg)
    if head is None:
        from flyp_tpu.training.flyp import build_zeroshot_head

        head = build_zeroshot_head(cfg, model, variables)

    image_size = model.config.vision.image_size
    dataset = get_dataset_class(cfg.train_dataset)(
        preprocess=train_transform(image_size), location=cfg.data_location,
        batch_size=cfg.batch_size, num_workers=cfg.workers,
    )
    # Whole-dataset statistic with no cross-host reduction: every process
    # must see the FULL train set (a per-process shard would estimate the
    # Fisher on 1/count of the data).
    if getattr(dataset.train_loader, "shard_by_process", False):
        dataset.train_loader.shard_by_process = False

    fisher_step = make_fisher_step(model, head, cfg.ls)
    params = variables["params"]
    acc = jax.tree_util.tree_map(lambda p: jnp.zeros(p.shape, jnp.float32), params)
    count = 0
    rng = jax.random.key(cfg.seed)

    for epoch in range(cfg.epochs):
        dataset.train_loader.set_epoch(epoch)
        for i, batch in enumerate(dataset.train_loader):
            if max_batches is not None and i >= max_batches:
                break
            rng, sub = jax.random.split(rng)
            sq_sum, n = fisher_step(params, variables.get("batch_stats"), jnp.asarray(batch["image"]), sub)
            acc = jax.tree_util.tree_map(jnp.add, acc, sq_sum)
            count += int(n)

    fisher = jax.tree_util.tree_map(lambda a: np.asarray(a / max(count, 1)), acc)
    from flyp_tpu.parallel.multihost import is_primary

    if is_primary():  # single writer: all hosts compute the identical estimate
        os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
        with open(save_path, "wb") as f:
            pickle.dump(fisher, f)
        if logger is not None:
            logger.info(f"Saved Fisher ({count} samples) to {save_path}")
    return fisher
