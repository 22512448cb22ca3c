"""Per-stage RN50 train-step breakdown on the real chip.

RN50 runs at 36.7% MFU (docs/BENCHMARKS.md round-3 family table) vs the
65% the ViT family reaches — the gap is conv-bound, but WHERE?  This times
the isolated pieces of the ModifiedResNet tower (`/root/reference/
clip/model.py:95-152` structure) fwd+bwd at batch 256 in bf16, each
synchronized through a scalar fetch (axon's ``block_until_ready`` returns
at enqueue), and divides each piece's XLA cost-analysis FLOPs by its time:
a per-stage %-of-peak map that says which convs sit below the MXU ceiling.

Expected suspects: the stem (C_in=3 on conv1 uses 3/128 MXU lanes;
32-channel conv2/3 use 32/128) and stage 1 (N=64 output channels on the
3x3s), vs the 1x1-dominated deep stages which are plain matmuls.

Usage: python -m tools.rn50_breakdown [batch]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from flyp_tpu.models.resnet import AttentionPool2d, Bottleneck, TorchBatchNorm


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


class Stem(nn.Module):
    """The 3-conv stem + avg-pool (`clip/model.py:99-110`)."""

    width: int = 64

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        dt = x.dtype

        def bn(n, name):
            return TorchBatchNorm(momentum=0.9, epsilon=1e-5, dtype=dt, name=name)(n, use_running_average=not train)

        x = nn.relu(bn(nn.Conv(self.width // 2, (3, 3), strides=2, padding=1, use_bias=False, dtype=dt, name="conv1")(x), "bn1"))
        x = nn.relu(bn(nn.Conv(self.width // 2, (3, 3), padding=1, use_bias=False, dtype=dt, name="conv2")(x), "bn2"))
        x = nn.relu(bn(nn.Conv(self.width, (3, 3), padding=1, use_bias=False, dtype=dt, name="conv3")(x), "bn3"))
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class Stage(nn.Module):
    blocks: int
    planes: int
    stride: int

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        for b in range(self.blocks):
            x = Bottleneck(self.planes, self.stride if b == 0 else 1, name=f"b{b}")(x, train=train)
        return x


def main(batch: int = 256):
    on_tpu = jax.default_backend() in ("tpu", "axon")
    dt = jnp.bfloat16 if on_tpu else jnp.float32
    # Device-kind peak lookup shared with bench.py (a hardcoded 197e12
    # misranks every stage on non-v5e generations).
    from bench import peak_flops_for

    peak = peak_flops_for(jax.devices()[0]) if on_tpu else float("inf")
    rng = np.random.default_rng(0)

    pieces = [
        ("stem  224->56, 3->64ch", Stem(64), (batch, 224, 224, 3), True),
        ("stage1 3x @56^2 pl64", Stage(3, 64, 1), (batch, 56, 56, 64), True),
        ("stage2 4x @56->28 pl128", Stage(4, 128, 2), (batch, 56, 56, 256), True),
        ("stage3 6x @28->14 pl256", Stage(6, 256, 2), (batch, 28, 28, 512), True),
        ("stage4 3x @14->7 pl512", Stage(3, 512, 2), (batch, 14, 14, 1024), True),
        ("attnpool 50tok d2048", AttentionPool2d(2048, 32, 1024), (batch, 7, 7, 2048), False),
    ]

    total_t, total_f = 0.0, 0.0
    print(f"batch={batch} dtype={dt.__name__} backend={jax.default_backend()}")
    for name, mod, shape, has_bn in pieces:
        x = jnp.asarray(rng.standard_normal(shape), dt)
        variables = mod.init(jax.random.PRNGKey(0), x)
        params = variables["params"]

        if has_bn:
            stats = variables["batch_stats"]

            def loss(params, x, stats=stats, mod=mod):
                out, _ = mod.apply({"params": params, "batch_stats": stats}, x, train=True, mutable=["batch_stats"])
                return jnp.sum(out.astype(jnp.float32) ** 2)
        else:

            def loss(params, x, mod=mod):
                return jnp.sum(mod.apply({"params": params}, x).astype(jnp.float32) ** 2)

        fwdbwd = jax.jit(jax.grad(loss))
        compiled = fwdbwd.lower(params, x).compile()
        flops = float((compiled.cost_analysis() or {}).get("flops", 0.0))
        t = _time(fwdbwd, params, x)
        total_t += t
        total_f += flops
        tfs = flops / t / 1e12 if t else 0.0
        print(f"  {name:28s} {t * 1e3:7.2f} ms  {flops / 1e9:8.1f} GF  {tfs:6.1f} TF/s  {tfs * 1e12 / peak * 100:5.1f}% peak")

    tfs = total_f / total_t / 1e12 if total_t else 0.0
    print(f"  {'TOWER fwd+bwd total':28s} {total_t * 1e3:7.2f} ms  {total_f / 1e9:8.1f} GF  {tfs:6.1f} TF/s  {tfs * 1e12 / peak * 100:5.1f}% peak")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 256)
