"""Classifier = CLIP image tower + classification head, compiled once.

The torch side wraps modules (`ImageClassifier`, `/root/reference/src/models/
modeling.py:78-104`); here the classifier is a fixed-shape jitted program:
batches are padded to one static shape so the whole eval suite reuses a
single XLA executable per image size.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from flyp_tpu.models.clip import CLIPModel
from flyp_tpu.models.head import ClassificationHead
from flyp_tpu.utils.pipeline import host_cast_images


import functools


@functools.lru_cache(maxsize=8)
def _jitted_fns(model: CLIPModel, normalize_features: bool):
    """One jitted (logits, feats) pair per (model config, flag): the trainer
    builds a fresh Classifier every epoch (new head values, same program)
    and must reuse the compiled executable instead of re-tracing.  linen
    modules are frozen dataclasses, so equal configs share an entry and the
    LRU bound keeps the 50-restart few-shot protocol from pinning every
    model it ever built."""

    def logits_fn(variables, head, images):
        feats = model.apply(variables, images, method="encode_image")
        if normalize_features:
            # ImageClassifier_Norm re-normalizes before the head
            # (`modeling.py:107-134`); the head may normalize again.
            feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
        return head(feats)

    def feats_fn(variables, images):
        return model.apply(variables, images, method="encode_image")

    return jax.jit(logits_fn), jax.jit(feats_fn)


class Classifier:
    def __init__(
        self,
        model: CLIPModel,
        variables: dict,
        head: ClassificationHead,
        batch_size: int = 128,
        normalize_features: bool = False,
    ):
        self.model = model
        self.variables = variables
        self.head = head
        self.batch_size = batch_size
        self.normalize_features = normalize_features
        self._logits_fn, self._feats_fn = _jitted_fns(model, normalize_features)

    def replace_head(self, head: ClassificationHead) -> "Classifier":
        return Classifier(self.model, self.variables, head, self.batch_size, self.normalize_features)

    def _pad(self, images: np.ndarray):
        # Cast BEFORE padding so the ragged-tail concat copies half the bytes.
        images = host_cast_images(images, self.model.compute_dtype)
        n = images.shape[0]
        if n > self.batch_size:
            # np.zeros((negative, ...)) would raise an opaque ValueError.
            raise ValueError(
                f"batch of {n} images exceeds this Classifier's compiled "
                f"batch_size={self.batch_size}; split the request (or use "
                "flyp_tpu.serving.ClipServer, which buckets and chunks)"
            )
        if n != self.batch_size:
            pad = self.batch_size - n
            images = np.concatenate([images, np.zeros((pad, *images.shape[1:]), images.dtype)], axis=0)
        return images, n

    def predict_logits_device(self, images: np.ndarray):
        """Dispatch only: ``(device logits, n_valid)`` with NO host fetch.

        The eval loop dispatches batch i+1 before fetching batch i's logits
        (``np.asarray`` later), overlapping the device->host transfer and the
        host-side metric work with device compute — the same one-step lag the
        train loops use (docs/BENCHMARKS.md round 4)."""
        padded, n = self._pad(np.asarray(images))
        return self._logits_fn(self.variables, self.head, jnp.asarray(padded)), n

    def predict_logits(self, images: np.ndarray) -> np.ndarray:
        """[n<=batch_size, H, W, C] host array -> [n, num_classes] logits."""
        out, n = self.predict_logits_device(images)
        return np.asarray(out)[:n]

    def features_device(self, images: np.ndarray):
        """Dispatch-only twin of :meth:`features` (see predict_logits_device)."""
        padded, n = self._pad(np.asarray(images))
        return self._feats_fn(self.variables, jnp.asarray(padded)), n

    def features(self, images: np.ndarray) -> np.ndarray:
        out, n = self.features_device(images)
        return np.asarray(out)[:n]
