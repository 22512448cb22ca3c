"""Causal text transformer tower.

Structure follows `/root/reference/clip/model.py:348-361`: token embedding,
learned positional embedding, causal transformer, final LN, and pooling at
the end-of-text position (EOT has the highest token id, so ``argmax`` over
the token ids locates it) followed by the text projection."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from flyp_tpu.models.configs import TextConfig
from flyp_tpu.models.layers import LayerNormFp32, Transformer


class TextTransformer(nn.Module):
    config: TextConfig
    embed_dim: int
    remat: bool = False
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jax.Array, train: bool = False) -> jax.Array:
        """tokens: [B, context_length] int32 -> [B, embed_dim]."""
        cfg = self.config
        token_embedding = self.param(
            "token_embedding", nn.initializers.normal(0.02), (cfg.vocab_size, cfg.width), jnp.float32
        )
        positional_embedding = self.param(
            "positional_embedding", nn.initializers.normal(0.01), (cfg.context_length, cfg.width), jnp.float32
        )

        dtype = self.compute_dtype
        x = token_embedding[tokens].astype(dtype)
        # Accept contexts shorter than the trained length: in a CAUSAL tower
        # positions past the EOT cannot influence the pooled feature, so a
        # batch sliced to its max EOT position (tokenizer.shrink_context)
        # produces bit-identical features at a fraction of the FLOPs.
        x = x + positional_embedding[: tokens.shape[1]].astype(dtype)
        x = Transformer(cfg.width, cfg.layers, cfg.heads, causal=True, remat=self.remat, name="transformer")(x, train)
        x = LayerNormFp32(name="ln_final")(x)

        # Pool at the EOT token (highest id in each row, `clip/model.py:359`).
        eot_idx = jnp.argmax(tokens, axis=-1)
        pooled = jnp.take_along_axis(x, eot_idx[:, None, None], axis=1)[:, 0, :]

        text_projection = self.param(
            "text_projection", nn.initializers.normal(cfg.width ** -0.5), (cfg.width, self.embed_dim), jnp.float32
        )
        return jnp.einsum(
            "bd,de->be", pooled, text_projection.astype(dtype), preferred_element_type=jnp.float32
        ).astype(dtype)
