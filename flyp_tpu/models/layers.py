"""Shared transformer layers with TPU-friendly dtype policy.

Numerics follow the reference CLIP blocks (`/root/reference/clip/model.py:
155-201`): LayerNorm runs in float32 regardless of the activation dtype (the
"fp32 island"), the MLP uses QuickGELU, and attention uses a fused QKV
projection.  Matmuls run in the activation dtype (bfloat16 on TPU) so they
land on the MXU; accumulation is float32 via ``preferred_element_type``.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from flax import linen as nn

import os

from flyp_tpu.ops.attention import multi_head_attention

# Matmul output policy: "native" emits outputs in the activation dtype (the
# MXU still accumulates in fp32 internally; saves fp32->bf16 convert traffic
# between ops); "fp32" forces fp32 outputs via preferred_element_type.
_MATMUL_OUT = os.environ.get("FLYP_MATMUL_OUT", "native")


def _einsum(spec: str, x: jax.Array, w: jax.Array) -> jax.Array:
    w = w.astype(x.dtype)
    if _MATMUL_OUT == "fp32":
        return jnp.einsum(spec, x, w, preferred_element_type=jnp.float32).astype(x.dtype)
    return jnp.einsum(spec, x, w)


def quick_gelu(x: jax.Array) -> jax.Array:
    """x * sigmoid(1.702 x) — CLIP's GELU approximation (`clip/model.py:164`)."""
    return x * jax.nn.sigmoid(1.702 * x)


class LayerNormFp32(nn.Module):
    """LayerNorm computed in float32, result cast back to the input dtype.

    Mirrors the fp16-safe LayerNorm subclass at `clip/model.py:155-161`;
    on TPU the same trick keeps bf16 activations stable.
    """

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        orig_dtype = x.dtype
        dim = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (dim,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (dim,), jnp.float32)
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.var(x32, axis=-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.epsilon)
        return (y * scale + bias).astype(orig_dtype)


class MultiHeadAttention(nn.Module):
    """Self-attention with a fused QKV projection.

    The kernel is stored ``[3, D, D]`` — q/k/v on the LEADING axis so the
    tiled last-two dims stay 8/128-aligned (a middle size-3 axis forces
    XLA relayout copies on every use, grad, and Adam moment — measured
    ~12 ms/step on ViT-L, tools/layout_copies.py); the last
    (output-feature) axis is head-major, so a plain dim-sharding of that
    axis over the ``model`` mesh axis IS head-group tensor parallelism.
    Torch ``nn.MultiheadAttention`` in_proj ``[3D, D]`` converts with a
    reshape + per-tower transpose.
    """

    width: int
    heads: int
    causal: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, L, D = x.shape
        head_dim = self.width // self.heads

        qkv_kernel = self.param(
            "qkv_kernel", nn.initializers.normal(self.width ** -0.5), (3, D, D), jnp.float32
        )
        qkv_bias = self.param("qkv_bias", nn.initializers.zeros, (3, D), jnp.float32)
        out_kernel = self.param(
            "out_kernel", nn.initializers.normal(self.width ** -0.5), (D, D), jnp.float32
        )
        out_bias = self.param("out_bias", nn.initializers.zeros, (D,), jnp.float32)

        # [B, L, 3, D]: keeping q/k/v and head-features as separate axes lets
        # GSPMD keep head shards local under TP (a [D, 3D] flatten would mix
        # the sharded axis and force a gather).
        qkv = _einsum("bld,tde->blte", x, qkv_kernel) + qkv_bias.astype(x.dtype)

        from flyp_tpu.ops.attention import _default_impl

        if _default_impl() == "pallas_qkv":
            # Wide-boundary Pallas kernel: heads are sliced on-chip; the
            # split/reshape chain never materializes in HBM.  Interpret mode
            # on CPU backends lets the same path run in tests.
            from flyp_tpu.ops.fused_qkv_attention import fused_qkv_attention

            o = fused_qkv_attention(
                qkv.reshape(B, L, 3 * D), self.heads, self.causal, jax.default_backend() == "cpu"
            )
        else:
            q = qkv[:, :, 0].reshape(B, L, self.heads, head_dim)
            k = qkv[:, :, 1].reshape(B, L, self.heads, head_dim)
            v = qkv[:, :, 2].reshape(B, L, self.heads, head_dim)
            o = multi_head_attention(q, k, v, causal=self.causal)
            o = o.reshape(B, L, D)

        return _einsum("bld,de->ble", o, out_kernel) + out_bias.astype(x.dtype)


class MLP(nn.Module):
    """c_fc -> QuickGELU -> c_proj (4x expansion), `clip/model.py:175-179`."""

    width: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        hidden = 4 * self.width
        fc_kernel = self.param("fc_kernel", nn.initializers.normal((2 * self.width) ** -0.5), (self.width, hidden), jnp.float32)
        fc_bias = self.param("fc_bias", nn.initializers.zeros, (hidden,), jnp.float32)
        proj_kernel = self.param("proj_kernel", nn.initializers.normal(self.width ** -0.5), (hidden, self.width), jnp.float32)
        proj_bias = self.param("proj_bias", nn.initializers.zeros, (self.width,), jnp.float32)

        h = quick_gelu(_einsum("bld,dh->blh", x, fc_kernel) + fc_bias.astype(x.dtype))
        return _einsum("blh,hd->bld", h, proj_kernel) + proj_bias.astype(x.dtype)


class _LNParams(nn.Module):
    """Parameter-holder with LayerNormFp32's exact param tree (used when the
    fused block kernel consumes the params directly)."""

    @nn.compact
    def __call__(self, dim: int):
        scale = self.param("scale", nn.initializers.ones, (dim,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (dim,), jnp.float32)
        return scale, bias


class _AttnParams(nn.Module):
    """Parameter-holder with MultiHeadAttention's exact param tree."""

    width: int

    @nn.compact
    def __call__(self):
        D = self.width
        return (
            self.param("qkv_kernel", nn.initializers.normal(D ** -0.5), (3, D, D), jnp.float32),
            self.param("qkv_bias", nn.initializers.zeros, (3, D), jnp.float32),
            self.param("out_kernel", nn.initializers.normal(D ** -0.5), (D, D), jnp.float32),
            self.param("out_bias", nn.initializers.zeros, (D,), jnp.float32),
        )


class _MLPParams(nn.Module):
    """Parameter-holder with MLP's exact param tree."""

    width: int

    @nn.compact
    def __call__(self):
        D = self.width
        hidden = 4 * D
        return (
            self.param("fc_kernel", nn.initializers.normal((2 * D) ** -0.5), (D, hidden), jnp.float32),
            self.param("fc_bias", nn.initializers.zeros, (hidden,), jnp.float32),
            self.param("proj_kernel", nn.initializers.normal(D ** -0.5), (hidden, D), jnp.float32),
            self.param("proj_bias", nn.initializers.zeros, (D,), jnp.float32),
        )


class ResidualBlock(nn.Module):
    """Pre-LN transformer block (`clip/model.py:169-190`)."""

    width: int
    heads: int
    causal: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        from flyp_tpu.ops.attention import _default_impl

        impl = _default_impl()
        if impl in ("pallas_block", "pallas_block_mlp"):
            # Whole-sub-block fusion: LN1 + QKV + attention + out-proj +
            # residual as one Pallas kernel; params keep the exact tree
            # layout of the module path, so checkpoints are interchangeable.
            # Inference skips the backward-residual writes (still
            # differentiable: its bwd regenerates them with one recompute).
            from flyp_tpu.ops.attention_block import attention_block, attention_block_inference

            interpret = jax.default_backend() == "cpu"
            ln_scale, ln_bias = _LNParams(name="ln_1")(self.width)
            qkv_k, qkv_b, out_k, out_b = _AttnParams(self.width, name="attn")()
            block_fn = attention_block if train else attention_block_inference
            x = block_fn(
                x, ln_scale, ln_bias, qkv_k, qkv_b, out_k, out_b,
                self.heads, self.causal, interpret,
            )
            if impl == "pallas_block_mlp":
                # Fused MLP block: measured SLOWER than XLA's MLP on v5e
                # (the forced h_pre residual write outweighs the LN/hidden
                # round trips XLA already fuses) — opt-in for other parts.
                from flyp_tpu.ops.mlp_block import mlp_block

                ln2_scale, ln2_bias = _LNParams(name="ln_2")(self.width)
                fc_k, fc_b, proj_k, proj_b = _MLPParams(self.width, name="mlp")()
                return mlp_block(x, ln2_scale, ln2_bias, fc_k, fc_b, proj_k, proj_b, interpret)
            return x + MLP(self.width, name="mlp")(LayerNormFp32(name="ln_2")(x))

        x = x + MultiHeadAttention(self.width, self.heads, self.causal, name="attn")(
            LayerNormFp32(name="ln_1")(x)
        )
        x = x + MLP(self.width, name="mlp")(LayerNormFp32(name="ln_2")(x))
        return x


class Transformer(nn.Module):
    """Stack of residual blocks with optional per-block rematerialization."""

    width: int
    layers: int
    heads: int
    causal: bool = False
    remat: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        # train is static (Python control flow inside the block); remat must
        # treat it as such.  The policy pins the fused attention kernel's
        # saved residuals (tagged in ops/attention_block._block_fwd), so the
        # backward never re-runs the Pallas forward — only the MLP entry is
        # rematerialized.  With the XLA attention impl no tags exist and the
        # policy degrades to full per-block remat.
        if self.remat:
            policy = jax.checkpoint_policies.save_only_these_names(
                "attn_block_out", "attn_block_o", "attn_block_q",
                "attn_block_k", "attn_block_v", "attn_block_lse",
            )
            block_cls = nn.remat(ResidualBlock, static_argnums=(2,), policy=policy)
        else:
            block_cls = ResidualBlock
        for i in range(self.layers):
            x = block_cls(self.width, self.heads, self.causal, name=f"block_{i}")(x, train)
        return x
