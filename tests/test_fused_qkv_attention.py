"""Fused-QKV attention kernel vs the XLA reference (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from flyp_tpu.ops.attention import xla_attention
from flyp_tpu.ops.fused_qkv_attention import fused_qkv_attention


def ref(qkv, heads, causal):
    B, L, threeD = qkv.shape
    D = threeD // 3
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(B, L, heads, D // heads)
    k = k.reshape(B, L, heads, D // heads)
    v = v.reshape(B, L, heads, D // heads)
    return xla_attention(q, k, v, causal).reshape(B, L, D)


@pytest.mark.parametrize("causal,L,H", [(False, 197, 4), (True, 77, 2), (False, 30, 2)])
def test_forward_matches(causal, L, H):
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.standard_normal((2, L, 3 * 64 * H)) * 0.3, jnp.float32)
    ours = fused_qkv_attention(qkv, H, causal, True)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref(qkv, H, causal)), atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_gradients_match(causal):
    rng = np.random.default_rng(1)
    qkv = jnp.asarray(rng.standard_normal((1, 30, 3 * 128)) * 0.3, jnp.float32)

    g1 = jax.grad(lambda x: jnp.sum(fused_qkv_attention(x, 2, causal, True) ** 2))(qkv)
    g2 = jax.grad(lambda x: jnp.sum(ref(x, 2, causal) ** 2))(qkv)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=5e-5, rtol=5e-4)
