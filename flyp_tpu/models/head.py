"""Classification head: a linear probe over encoder features.

Equivalent to `/root/reference/src/models/modeling.py:45-75`: optional L2
normalization of the inputs, then ``W x + b``.  Implemented as a registered
pytree so heads flow through jit/pjit and checkpoints like any other params.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ClassificationHead:
    weight: jax.Array  # [num_classes, embed_dim]
    bias: jax.Array  # [num_classes]
    normalize: bool = dataclasses.field(default=True, metadata={"static": True})

    @classmethod
    def create(cls, weights: jax.Array, biases: jax.Array | None = None, normalize: bool = True):
        weights = jnp.asarray(weights)
        if biases is None:
            biases = jnp.zeros((weights.shape[0],), weights.dtype)
        return cls(weight=weights, bias=jnp.asarray(biases), normalize=normalize)

    @classmethod
    def zeros(cls, num_classes: int = 1000, embed_dim: int = 512, normalize: bool = True):
        return cls.create(jnp.zeros((num_classes, embed_dim), jnp.float32), normalize=normalize)

    def __call__(self, features: jax.Array) -> jax.Array:
        if self.normalize:
            x32 = features.astype(jnp.float32)
            features = (x32 / jnp.linalg.norm(x32, axis=-1, keepdims=True)).astype(features.dtype)
        return (
            jnp.einsum("bd,cd->bc", features, self.weight.astype(features.dtype), preferred_element_type=jnp.float32)
            + self.bias
        ).astype(jnp.float32)
