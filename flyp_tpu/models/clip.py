"""Two-tower CLIP model.

Joint behavior mirrors `/root/reference/clip/model.py:247-378`: both towers
embed into a shared space, features are L2-normalized, and the learned
``logit_scale`` is returned exponentiated.  The torch ``forward(image=None)``
/ ``forward(text=None)`` single-tower branches become explicit
``encode_image`` / ``encode_text`` methods.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from flyp_tpu.models.configs import CLIPConfig
from flyp_tpu.models.text import TextTransformer
from flyp_tpu.models.vit import VisionTransformer


def l2_normalize(x: jax.Array, axis: int = -1, eps: float = 0.0) -> jax.Array:
    # Norm in float32 for stability with bf16 features.
    x32 = x.astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(x32 * x32, axis=axis, keepdims=True) + eps)
    return (x32 / norm).astype(x.dtype)


class CLIPModel(nn.Module):
    config: CLIPConfig
    compute_dtype: jnp.dtype = jnp.float32
    remat: bool = False

    def setup(self):
        if self.config.vision.is_vit:
            self.visual = VisionTransformer(self.config.vision, self.config.embed_dim, remat=self.remat)
        else:
            from flyp_tpu.models.resnet import ModifiedResNet

            self.visual = ModifiedResNet(self.config.vision, self.config.embed_dim)
        self.text = TextTransformer(
            self.config.text, self.config.embed_dim, remat=self.remat, compute_dtype=self.compute_dtype
        )
        self.logit_scale = self.param(
            "logit_scale",
            lambda key: jnp.asarray(self.config.logit_scale_init, jnp.float32),
        )

    def encode_image(self, images: jax.Array, normalize: bool = False, train: bool = False) -> jax.Array:
        # ``train`` matters twice: ResNet towers run torch train-mode
        # BatchNorm (batch stats + running-stat updates — the reference
        # fine-tunes with model.train(), `flyp_loss.py:412`), and ViT
        # towers keep the fused kernels' backward residuals (qkv/o saves);
        # inference skips those writes.
        feats = self.visual(images.astype(self.compute_dtype), train=train)
        return l2_normalize(feats) if normalize else feats

    def encode_text(self, tokens: jax.Array, normalize: bool = False, train: bool = False) -> jax.Array:
        feats = self.text(tokens, train=train)
        return l2_normalize(feats) if normalize else feats

    def __call__(
        self, images: Optional[jax.Array], tokens: Optional[jax.Array], train: bool = False
    ) -> Any:
        """Dual-tower forward: L2-normalized features + exp(logit_scale).

        With one input None, returns the other tower's *unnormalized*
        features, matching `clip/model.py:363-369`.
        """
        if images is None:
            return self.encode_text(tokens, train=train)
        if tokens is None:
            return self.encode_image(images, train=train)
        image_features = self.encode_image(images, normalize=True, train=train)
        text_features = self.encode_text(tokens, normalize=True, train=train)
        return image_features, text_features, jnp.exp(self.logit_scale)


def init_clip_variables(
    model: CLIPModel, rng: jax.Array | int = 0, image_batch: int = 1
) -> dict:
    """Initialize ALL variable collections with CLIP's published init
    distribution — params plus batch_stats for the ModifiedResNet towers."""
    if isinstance(rng, int):
        rng = jax.random.key(rng)
    cfg = model.config
    images = jnp.zeros((image_batch, cfg.vision.image_size, cfg.vision.image_size, 3), model.compute_dtype)
    tokens = jnp.zeros((image_batch, cfg.text.context_length), jnp.int32)
    return model.init(rng, images, tokens)


def init_clip_params(
    model: CLIPModel, rng: jax.Array | int = 0, image_batch: int = 1
) -> dict:
    """Initialize a parameter pytree with CLIP's published init distribution."""
    return init_clip_variables(model, rng, image_batch)["params"]
