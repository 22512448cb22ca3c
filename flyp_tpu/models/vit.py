"""Vision Transformer image tower.

Structure follows `/root/reference/clip/model.py:204-244`: conv patchify,
class token, learned positional embedding, pre-LN, transformer, post-LN on
the class token, linear projection to the joint embedding space.  Layout is
batch-major throughout (no LND permutes — that is a torch artifact)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from flyp_tpu.models.configs import VisionConfig
from flyp_tpu.models.layers import LayerNormFp32, Transformer


class VisionTransformer(nn.Module):
    config: VisionConfig
    embed_dim: int
    remat: bool = False

    @nn.compact
    def __call__(self, images: jax.Array, train: bool = False) -> jax.Array:
        """images: [B, H, W, 3] (NHWC, TPU-native layout) -> [B, embed_dim]."""
        cfg = self.config
        scale = cfg.width ** -0.5

        patch_kernel = self.param(
            "patch_kernel",
            nn.initializers.lecun_normal(),
            (cfg.patch_size, cfg.patch_size, 3, cfg.width),
            jnp.float32,
        )
        class_embedding = self.param(
            "class_embedding", nn.initializers.normal(scale), (cfg.width,), jnp.float32
        )
        positional_embedding = self.param(
            "positional_embedding", nn.initializers.normal(scale), (cfg.seq_len, cfg.width), jnp.float32
        )

        dtype = images.dtype
        # Patchify: a strided conv is a reshaping matmul; XLA lowers it to the
        # MXU as [B*grid*grid, patch*patch*3] @ [patch*patch*3, width].
        # Conv in the activation dtype: XLA accumulates bf16 convs in fp32 on
        # the MXU, and mixed-dtype preferred_element_type breaks the conv
        # transpose (cotangent dtype mismatch) under autodiff.
        x = jax.lax.conv_general_dilated(
            images,
            patch_kernel.astype(dtype),
            window_strides=(cfg.patch_size, cfg.patch_size),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        B = x.shape[0]
        x = x.reshape(B, -1, cfg.width)  # [B, grid*grid, width]

        cls = jnp.broadcast_to(class_embedding.astype(dtype), (B, 1, cfg.width))
        x = jnp.concatenate([cls, x], axis=1)
        x = x + positional_embedding.astype(dtype)
        x = LayerNormFp32(name="ln_pre")(x)

        x = Transformer(cfg.width, cfg.layers, cfg.heads, causal=False, remat=self.remat, name="transformer")(x, train)

        x = LayerNormFp32(name="ln_post")(x[:, 0, :])

        proj = self.param("proj", nn.initializers.normal(scale), (cfg.width, self.embed_dim), jnp.float32)
        return jnp.einsum("bd,de->be", x, proj.astype(dtype), preferred_element_type=jnp.float32).astype(dtype)
