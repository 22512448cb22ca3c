"""Pallas fused attention vs the XLA reference (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from flyp_tpu.ops.attention import xla_attention
from flyp_tpu.ops.flash_attention import flash_attention


def make_qkv(B=2, L=197, H=3, D=64, seed=0, dtype=np.float32):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.standard_normal((B, L, H, D)) * 0.3, dtype)
    return mk(), mk(), mk()


@pytest.mark.parametrize("causal,L", [(False, 197), (True, 77), (False, 64), (True, 16)])
def test_forward_matches_xla(causal, L):
    q, k, v = make_qkv(L=L)
    ours = flash_attention(q, k, v, causal, True)
    ref = xla_attention(q, k, v, causal)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("causal,L", [(False, 30), (True, 30)])
def test_gradients_match_xla(causal, L):
    q, k, v = make_qkv(B=1, L=L, H=2)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, causal, True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(xla_attention(q, k, v, causal) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5, rtol=5e-4)


@pytest.mark.parametrize("causal", [False, True])
def test_padding_is_masked(causal):
    """L=100 is not tile-aligned, so the kernel zero-pads K/V internally;
    the padded rows must not contribute to the softmax.  The XLA reference
    sees only the unpadded L=100 arrays, so ANY leakage from the kernel's
    internal padding (a masking regression) shows up as a value mismatch —
    finiteness alone would pass with wrong values."""
    q, k, v = make_qkv(B=1, L=100, H=2)
    ours = flash_attention(q, k, v, causal, True)
    ref = xla_attention(q, k, v, causal)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_cross_attention_falls_through_to_xla():
    """The RN attnpool's query-row-0 form (1-row q against HW+1 keys,
    models/resnet.py AttentionPool2d) must not crash the forced-pallas
    path: the kernel is self-attention only and signals NotImplementedError
    so multi_head_attention falls back to XLA."""
    from flyp_tpu.ops.attention import multi_head_attention

    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.standard_normal((2, 1, 4, 16)) * 0.3, np.float32)
    k = jnp.asarray(rng.standard_normal((2, 50, 4, 16)) * 0.3, np.float32)
    v = jnp.asarray(rng.standard_normal((2, 50, 4, 16)) * 0.3, np.float32)
    with pytest.raises(NotImplementedError):
        flash_attention(q, k, v, False, True)
    out = multi_head_attention(q, k, v, causal=False, impl="pallas")
    ref = xla_attention(q, k, v, False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)
