"""RN50 stem: space-to-depth folding experiments (VERDICT round-4 task 1).

Round 3 declared the RN50 stem+stage1 ceiling "structural/HBM-bound"
(tools/rn50_breakdown.py: stem 17.8% of peak, stage1 13.5%).  The standard
TPU counter-move was never tried: fold the spatial 2x2 grid into channels
(space-to-depth) so the low-channel convs (C=3/32/64, which underfill the
128-lane MXU and may carry padded layouts in HBM) become dense >=128-channel
convs at half the spatial resolution.  Numerically identical for reshaped
weights; this tool measures whether it is FASTER before we wire it into
`flyp_tpu/models/resnet.py` (ref stem: /root/reference/clip/model.py:99-110).

Experiments, each fwd+bwd, batch 256, bf16, scalar-fetch synchronized:

  ew_*          elementwise x*2+1 probes — if the [112,112,32] form moves
                more bytes/time than the equal-element [56,56,128] form,
                stored layouts pad the 32-channel minor dim.
  conv2_*       stem conv2 (3x3 s1 32->32 @112^2) vs its dense folded twin
                (3x3 s1 128->128 @56^2; 4x the MACs, same logical bytes).
  conv3_*       stem conv3 (3x3 s1 32->64) vs folded (128->256).
  conv1_*       stem conv1 (3x3 s2 3->32 @224^2) vs s2d input (2x2 s1
                12->32 @112^2) vs fully folded (2x2 s1 48->128 @56^2).
  stage1c2_*    stage1 bottleneck 3x3 (64->64 @56^2) vs folded
                (256->256 @28^2).
  bn_*          train-mode BN+relu alone at both geometries (the stats +
                normalize passes that bound the stem if it is HBM-floor).

Usage: python -m tools.stem_experiments [batch]
"""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from flyp_tpu.models.resnet import TorchBatchNorm


def _sync(x) -> float:
    return float(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0]))


def _time(fn, *args, iters=20):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


class ConvBNRelu(nn.Module):
    features: int
    kernel: int
    stride: int = 1
    groups_per_channel: int = 1  # folded BN: stats per original channel

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        dt = x.dtype
        pad = self.kernel // 2
        y = nn.Conv(self.features, (self.kernel, self.kernel), strides=self.stride,
                    padding=pad, use_bias=False, dtype=dt, name="conv")(x)
        if self.groups_per_channel > 1:
            # Folded-domain BN: channel axis is (sub, C); statistics must
            # pool the sub positions to stay equivalent to the unfolded op.
            g = self.groups_per_channel
            B, H, W, F = y.shape
            yr = y.reshape(B, H, W, g, F // g).astype(jnp.float32)
            mean = jnp.mean(yr, axis=(0, 1, 2, 3))
            var = jnp.var(yr, axis=(0, 1, 2, 3))
            scale = self.param("scale", nn.initializers.ones, (F // g,), jnp.float32)
            bias = self.param("bias", nn.initializers.zeros, (F // g,), jnp.float32)
            out = (yr - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias
            y = out.reshape(B, H, W, F).astype(dt)
        else:
            y = TorchBatchNorm(momentum=0.9, epsilon=1e-5, dtype=dt, name="bn")(
                y, use_running_average=not train)
        return nn.relu(y)


def run_module(name, mod, shape, dt, rng, iters=20):
    x = jnp.asarray(rng.standard_normal(shape), dt)
    variables = mod.init(jax.random.PRNGKey(0), x)
    params = variables["params"]
    stats = variables.get("batch_stats")

    if stats:
        def loss(params, x):
            out, _ = mod.apply({"params": params, "batch_stats": stats}, x,
                               train=True, mutable=["batch_stats"])
            return jnp.sum(out.astype(jnp.float32) ** 2)
    else:
        def loss(params, x):
            return jnp.sum(mod.apply({"params": params}, x).astype(jnp.float32) ** 2)

    fwdbwd = jax.jit(jax.grad(loss))
    compiled = fwdbwd.lower(params, x).compile()
    cost = compiled.cost_analysis() or {}
    flops = float(cost.get("flops", 0.0))
    nbytes = float(cost.get("bytes accessed", 0.0))
    t = _time(fwdbwd, params, x, iters=iters)
    report(name, t, flops, nbytes)
    return t


def run_fn(name, fn, shape, dt, rng, iters=20):
    x = jnp.asarray(rng.standard_normal(shape), dt)
    jfn = jax.jit(fn)
    compiled = jfn.lower(x).compile()
    cost = compiled.cost_analysis() or {}
    flops = float(cost.get("flops", 0.0))
    nbytes = float(cost.get("bytes accessed", 0.0))
    t = _time(jfn, x, iters=iters)
    report(name, t, flops, nbytes)
    return t


PEAK = 197e12  # v5e bf16; relative A/Bs are what matter here
HBM = 819e9


def report(name, t, flops, nbytes):
    tfs = flops / t / 1e12 if t else 0.0
    gbs = nbytes / t / 1e9 if t else 0.0
    print(f"  {name:34s} {t * 1e3:7.2f} ms  {flops / 1e9:8.1f} GF  {tfs:6.1f} TF/s "
          f"({tfs * 1e12 / PEAK * 100:4.1f}%)  {nbytes / 1e6:8.0f} MB acc  {gbs:5.0f} GB/s "
          f"({gbs * 1e9 / HBM * 100:4.1f}% HBM)", flush=True)


def main(batch: int = 256):
    dt = jnp.bfloat16 if jax.default_backend() in ("tpu", "axon") else jnp.float32
    rng = np.random.default_rng(0)
    print(f"batch={batch} dtype={dt.__name__} backend={jax.default_backend()}", flush=True)

    # --- elementwise layout probes ---
    run_fn("ew 112x112x32", lambda x: x * 2 + 1, (batch, 112, 112, 32), dt, rng)
    run_fn("ew 56x56x128", lambda x: x * 2 + 1, (batch, 56, 56, 128), dt, rng)
    run_fn("ew 224x224x3", lambda x: x * 2 + 1, (batch, 224, 224, 3), dt, rng)
    run_fn("ew 56x56x64 (stage1)", lambda x: x * 2 + 1, (batch, 56, 56, 64), dt, rng)

    # --- train-mode BN+relu alone at both geometries ---
    run_module("bn 112x112x32", ConvBNRelu(32, 1), (batch, 112, 112, 32), dt, rng)
    run_module("bn 56x56x128 grouped", ConvBNRelu(128, 1, groups_per_channel=4), (batch, 56, 56, 128), dt, rng)

    # --- conv2: 3x3 s1 32->32 vs dense folded 128->128 ---
    run_module("conv2 orig 3x3 32->32 @112", ConvBNRelu(32, 3), (batch, 112, 112, 32), dt, rng)
    run_module("conv2 fold 3x3 128->128 @56", ConvBNRelu(128, 3, groups_per_channel=4), (batch, 56, 56, 128), dt, rng)

    # --- conv3: 3x3 s1 32->64 vs dense folded 128->256 ---
    run_module("conv3 orig 3x3 32->64 @112", ConvBNRelu(64, 3), (batch, 112, 112, 32), dt, rng)
    run_module("conv3 fold 3x3 128->256 @56", ConvBNRelu(256, 3, groups_per_channel=4), (batch, 56, 56, 128), dt, rng)

    # --- conv1: 3x3 s2 3->32 @224 vs s2d variants ---
    run_module("conv1 orig 3x3s2 3->32 @224", ConvBNRelu(32, 3, stride=2), (batch, 224, 224, 3), dt, rng)
    run_module("conv1 s2d 2x2 12->32 @112", ConvBNRelu(32, 2), (batch, 112, 112, 12), dt, rng)
    run_module("conv1 fold 2x2 48->128 @56", ConvBNRelu(128, 2, groups_per_channel=4), (batch, 56, 56, 48), dt, rng)

    # --- stage1 bottleneck 3x3: 64->64 @56 vs folded 256->256 @28 ---
    run_module("s1c2 orig 3x3 64->64 @56", ConvBNRelu(64, 3), (batch, 56, 56, 64), dt, rng)
    run_module("s1c2 fold 3x3 256->256 @28", ConvBNRelu(256, 3, groups_per_channel=4), (batch, 28, 28, 256), dt, rng)

    # --- stage1 1x1s: 64->256 @56 vs folded 256->1024 @28 ---
    run_module("s1c3 orig 1x1 64->256 @56", ConvBNRelu(256, 1), (batch, 56, 56, 64), dt, rng)
    run_module("s1c3 fold 1x1 256->1024 @28", ConvBNRelu(1024, 1, groups_per_channel=4), (batch, 28, 28, 256), dt, rng)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 256)
