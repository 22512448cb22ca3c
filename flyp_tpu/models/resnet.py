"""ModifiedResNet image tower (RN50 family).

Follows `/root/reference/clip/model.py:12-152`: 3-conv stem with avg-pool,
anti-aliased strided bottlenecks (avg-pool before the strided conv), and a
QKV attention pool instead of global average pooling.  NHWC layout.

BatchNorm carries running statistics in the ``batch_stats`` collection; pass
``train=True`` (with ``mutable=['batch_stats']``) to update them during
fine-tuning, matching torch train-mode BN.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from flyp_tpu.models.configs import VisionConfig
from flyp_tpu.ops.attention import multi_head_attention


class TorchBatchNorm(nn.Module):
    """BatchNorm with torch-exact train-mode semantics.

    `torch.nn.BatchNorm2d` normalizes with the BIASED batch variance but
    updates ``running_var`` with the UNBIASED one (``n/(n-1)`` correction);
    flax's ``nn.BatchNorm`` uses the biased variance for both, drifting the
    running stats by ~1/(n-1) per step
    (``test_training_trajectory_parity[rn]`` catches this).  Param/stat
    names match flax (``scale``/``bias``, ``mean``/``var``) so checkpoint
    conversion and sharding walks are unchanged.  Statistics are computed
    in float32 regardless of the activation dtype (same islands policy as
    LayerNorm); ``momentum`` follows the flax convention (torch 0.1 ==
    flax 0.9)."""

    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, use_running_average: bool) -> jax.Array:
        feat = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (feat,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (feat,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((feat,), jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((feat,), jnp.float32))

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            x32 = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(x32, axis=axes)
            var = jnp.var(x32, axis=axes)
            if not self.is_initializing():
                n = x.size // feat
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * var * (n / max(n - 1, 1))

        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.epsilon)
        out = y * scale + bias
        return out.astype(self.dtype or x.dtype)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    expansion: int = 4

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        inplanes = x.shape[-1]
        out_planes = self.planes * self.expansion
        # Keep the compute dtype of the input (bf16 on TPU): without an
        # explicit dtype flax promotes bf16 activations x fp32 params to
        # fp32, halving the MXU conv rate (measured: 25% -> see
        # docs/BENCHMARKS.md).  Params stay fp32; BN statistics are fp32
        # internally regardless.
        dt = x.dtype

        def conv(n, features, kernel, name):
            return nn.Conv(features, (kernel, kernel), padding="SAME" if kernel > 1 else "VALID",
                           use_bias=False, dtype=dt, name=name)(n)

        def bn(n, name):
            return TorchBatchNorm(momentum=0.9, epsilon=1e-5, dtype=dt, name=name)(n, use_running_average=not train)

        out = nn.relu(bn(conv(x, self.planes, 1, "conv1"), "bn1"))
        out = nn.relu(bn(conv(out, self.planes, 3, "conv2"), "bn2"))
        if self.stride > 1:
            out = nn.avg_pool(out, (self.stride, self.stride), strides=(self.stride, self.stride))
        out = bn(conv(out, out_planes, 1, "conv3"), "bn3")

        identity = x
        if self.stride > 1 or inplanes != out_planes:
            identity = nn.avg_pool(x, (self.stride, self.stride), strides=(self.stride, self.stride)) if self.stride > 1 else x
            identity = nn.Conv(out_planes, (1, 1), use_bias=False, dtype=dt, name="downsample_conv")(identity)
            identity = TorchBatchNorm(momentum=0.9, epsilon=1e-5, dtype=dt, name="downsample_bn")(identity, use_running_average=not train)

        return nn.relu(out + identity)


class AttentionPool2d(nn.Module):
    embed_dim: int
    heads: int
    output_dim: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """x: [B, H, W, C] -> [B, output_dim] via query-at-mean QKV attention.

        The reference (`clip/model.py:71-92`) runs full self-attention over
        all HW+1 tokens and keeps only ``x[0]``.  Attention rows are
        independent, so projecting q for the mean token alone is numerically
        identical — for gradients too (the discarded output rows carry zero
        cotangents, so dWq/dk/dv match) — and drops ~40% of the pool's
        FLOPs (per-stage timing in tools/rn50_breakdown.py)."""
        B, H, W, C = x.shape
        x = x.reshape(B, H * W, C)
        x = jnp.concatenate([x.mean(axis=1, keepdims=True), x], axis=1)  # [B, HW+1, C]

        pos = self.param(
            "positional_embedding", nn.initializers.normal(C ** -0.5), (H * W + 1, C), jnp.float32
        )
        x = x + pos.astype(x.dtype)

        def dense(n, features, name):
            return nn.Dense(features, dtype=x.dtype, name=name)(n)

        hd = self.embed_dim // self.heads
        q = dense(x[:, :1], self.embed_dim, "q_proj").reshape(B, 1, self.heads, hd)
        k = dense(x, self.embed_dim, "k_proj").reshape(B, -1, self.heads, hd)
        v = dense(x, self.embed_dim, "v_proj").reshape(B, -1, self.heads, hd)
        o = multi_head_attention(q, k, v, causal=False)
        o = o.reshape(B, self.embed_dim)
        return dense(o, self.output_dim, "c_proj")  # the mean-token output (`clip/model.py:92`)


def fold_conv_weight(w: jax.Array, fi: int, fo: int, stride: int) -> tuple[jax.Array, tuple[int, int]]:
    """Rewrite a KxK/stride conv weight for space-to-depth-folded operands.

    Input folded by ``fi`` (channel index ``(di*fi+dj)*cin + c``), output
    folded by ``fo`` (``(a*fo+b)*cout + o``); requires ``fi == stride*fo``
    so both sides live on the same folded grid.  Returns the folded weight
    ``[Kf, Kf, fi*fi*cin, fo*fo*cout]`` (structured zeros where the original
    receptive field has no tap) and the (top, bottom) spatial padding that
    reproduces the original ``K//2`` zero padding.  The folded conv is
    numerically identical: every original multiply appears exactly once.
    """
    K, _, cin, cout = w.shape
    assert fi == stride * fo, (fi, stride, fo)
    P = K // 2
    offs = [stride * a - P + kh for a in range(fo) for kh in range(K)]
    pad_top = -(min(offs) // fi) if min(offs) < 0 else 0
    kf = pad_top + max(offs) // fi + 1

    wf = jnp.zeros((kf, kf, fi * fi * cin, fo * fo * cout), w.dtype)
    for a in range(fo):
        for kh in range(K):
            off = stride * a - P + kh
            ki, di = pad_top + off // fi, off % fi
            for b in range(fo):
                for kw in range(K):
                    offw = stride * b - P + kw
                    kj, dj = pad_top + offw // fi, offw % fi
                    ci = (di * fi + dj) * cin
                    co = (a * fo + b) * cout
                    wf = wf.at[ki, kj, ci : ci + cin, co : co + cout].set(w[kh, kw])
    return wf, (pad_top, kf - 1 - pad_top)


def space_to_depth(x: jax.Array, f: int) -> jax.Array:
    """[B, H, W, C] -> [B, H/f, W/f, f*f*C], channel index (di*f+dj)*C + c."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // f, f, W // f, f, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // f, W // f, f * f * C)


class _FoldedStemConv(nn.Module):
    """A stem conv evaluated on space-to-depth-folded operands.

    Declares the kernel under the SAME path/shape/init as the ``nn.Conv``
    it replaces (``<name>/kernel``, ``[K, K, cin, cout]``, lecun-normal), so
    checkpoints, the torch converter, and sharding walks are unchanged; the
    fold to the dense >=128-channel kernel happens inside the forward."""

    features: int
    kernel: int
    cin: int
    fi: int
    fo: int
    stride: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        w = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel, self.kernel, self.cin, self.features),
            jnp.float32,
        )
        wf, pad = fold_conv_weight(w.astype(x.dtype), self.fi, self.fo, self.stride)
        return jax.lax.conv_general_dilated(
            x, wf, window_strides=(1, 1), padding=(pad, pad),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class ModifiedResNet(nn.Module):
    config: VisionConfig
    embed_dim: int

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        cfg = self.config
        width = cfg.width

        dt = x.dtype  # compute dtype (see Bottleneck)

        def bn(n, name):
            return TorchBatchNorm(momentum=0.9, epsilon=1e-5, dtype=dt, name=name)(n, use_running_average=not train)

        if cfg.stem_impl == "s2d":
            # Space-to-depth stem: the three low-channel convs
            # (C=3/32/32 underfill the 128-lane MXU) run on 2x2-folded
            # operands at 56^2 x >=48 channels; weights fold inside the
            # forward (fold_conv_weight), so numerics and the param tree
            # match the reference stem exactly.  The final avg_pool is a
            # free mean over the folded sub-grid.  Measured A/B in
            # docs/BENCHMARKS.md round 4.
            def bn_folded(n, name):
                B, H, W, F = n.shape
                flat = n.reshape(B, H, W * 4, F // 4)  # channel=(sub, c): stats pool subs
                flat = bn(flat, name)
                return flat.reshape(B, H, W, F)

            x = space_to_depth(x, 4)  # [B, 56, 56, 48]
            x = nn.relu(bn_folded(_FoldedStemConv(width // 2, 3, 3, fi=4, fo=2, stride=2, name="conv1")(x), "bn1"))
            x = nn.relu(bn_folded(_FoldedStemConv(width // 2, 3, width // 2, fi=2, fo=2, stride=1, name="conv2")(x), "bn2"))
            x = nn.relu(bn_folded(_FoldedStemConv(width, 3, width // 2, fi=2, fo=2, stride=1, name="conv3")(x), "bn3"))
            B, H, W, F = x.shape
            x = x.reshape(B, H, W, 4, F // 4).mean(axis=3).astype(dt)  # == avg_pool(2,2)
        else:
            # 3-conv stem.
            x = nn.relu(bn(nn.Conv(width // 2, (3, 3), strides=2, padding=1, use_bias=False, dtype=dt, name="conv1")(x), "bn1"))
            x = nn.relu(bn(nn.Conv(width // 2, (3, 3), padding=1, use_bias=False, dtype=dt, name="conv2")(x), "bn2"))
            x = nn.relu(bn(nn.Conv(width, (3, 3), padding=1, use_bias=False, dtype=dt, name="conv3")(x), "bn3"))
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))

        for stage, (blocks, planes, stride) in enumerate(
            zip(cfg.resnet_layers, (width, width * 2, width * 4, width * 8), (1, 2, 2, 2))
        ):
            for b in range(blocks):
                x = Bottleneck(planes, stride if b == 0 else 1, name=f"layer{stage + 1}_{b}")(x, train=train)

        return AttentionPool2d(width * 32, cfg.heads, self.embed_dim, name="attnpool")(x)
