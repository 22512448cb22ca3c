"""Benchmark: ViT-B/16 FLYP contrastive fine-tuning throughput on one chip.

Measures steady-state images/sec for the full jitted train step (dual-tower
forward, global-batch InfoNCE, AdamW update) in bfloat16, plus MFU from
XLA's own FLOP estimate.  Prints ONE JSON line:
``{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}``.

``vs_baseline``: the reference publishes no throughput numbers
(BASELINE.md), so the ratio is measured MFU / 0.45 — the driver-set
north-star MFU target on this hardware.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# Peak dense bf16 TFLOP/s per chip by TPU generation.
PEAK_TFLOPS = {
    "v5 lite": 197.0,  # v5e
    "v5e": 197.0,
    "v5p": 459.0,
    "v4": 275.0,
    "v6 lite": 918.0,  # v6e
    "v6e": 918.0,
}


def peak_flops_for(device) -> float:
    kind = getattr(device, "device_kind", "").lower()
    for key, tflops in PEAK_TFLOPS.items():
        if key in kind:
            return tflops * 1e12
    # Unknown generation: the v5e number. MFU on a faster chip would read
    # HIGH, not low — warn so the published line is never silently wrong.
    import logging

    logging.getLogger("flyp_tpu").warning(
        "bench: unknown TPU device_kind %r; MFU uses the v5e peak (197 TF/s)",
        getattr(device, "device_kind", device),
    )
    return 197.0e12


def build_bench_parts(batch_size: int, model_name: str, remat: bool, config_overrides: dict | None = None):
    """Model, optimizer, initial state and synthetic inputs for the bench.

    bf16 Adam moments: -1.8 ms/step measured (tools/mfu_levers; fp32 math,
    only the stored accumulators round).  The bench reports the recommended
    TPU training config; the trainer default stays float32 for exact
    reference parity (--adam_moment_dtype opts in).
    FLYP_ADAM_MOMENT_DTYPE=float32 reverts.  Caption lengths (6-20 tokens)
    mirror prompt-templated classnames, and the same exact context
    shrinking the trainer's loader applies runs before the device
    transfer."""
    import os

    from flyp_tpu.models import CLIPModel, MODEL_CONFIGS, init_clip_variables
    from flyp_tpu.tokenizer import shrink_context
    from flyp_tpu.training.schedules import warmup_cosine_lr
    from flyp_tpu.training.train_state import create_train_state, make_optimizer

    on_tpu = jax.default_backend() in ("tpu", "axon")
    compute_dtype = jnp.bfloat16 if on_tpu else jnp.float32
    config = MODEL_CONFIGS[model_name]
    if config_overrides:
        import dataclasses

        vision_fields = {f.name for f in dataclasses.fields(config.vision)}
        vis = {k: v for k, v in config_overrides.items() if k in vision_fields}
        top = {k: v for k, v in config_overrides.items() if k not in vision_fields}
        config = dataclasses.replace(config, vision=dataclasses.replace(config.vision, **vis), **top)
    model = CLIPModel(config, compute_dtype=compute_dtype, remat=remat)
    variables = init_clip_variables(model, 0)
    moment_dtype = os.environ.get("FLYP_ADAM_MOMENT_DTYPE", "bfloat16")
    optimizer = make_optimizer(warmup_cosine_lr(1e-5, 500, 10_000), weight_decay=0.1, moment_dtype=moment_dtype)
    state = create_train_state(variables["params"], optimizer, variables.get("batch_stats"))

    rng = np.random.default_rng(0)
    px = config.vision.image_size
    images = jnp.asarray(rng.standard_normal((batch_size, px, px, 3)), compute_dtype)
    tokens_np = np.zeros((batch_size, 77), dtype=np.int32)
    tokens_np[:, 0] = 49406
    lengths = rng.integers(6, 20, batch_size)
    for i, n in enumerate(lengths):
        tokens_np[i, 1:n] = rng.integers(1, 49000, n - 1)
        tokens_np[i, n] = 49407
    tokens = jnp.asarray(shrink_context(tokens_np))
    return model, optimizer, state, images, tokens, config


def build_bench_step(batch_size: int, model_name: str, remat: bool, config_overrides: dict | None = None):
    """The EXACT train step + synthetic inputs the bench times.

    Shared with ``tools/layout_copies.py`` so the audited HLO can never
    drift from the benched program; ``tools/grad_cache_bench.py`` swaps
    only the jit via :func:`build_bench_parts`."""
    from flyp_tpu.training.train_step import make_train_step

    model, optimizer, state, images, tokens, config = build_bench_parts(
        batch_size, model_name, remat, config_overrides
    )
    step_fn = make_train_step(model, optimizer, donate=True)
    return step_fn, state, images, tokens, config


def main(batch_size: int = 256, steps: int = 20, warmup: int = 3, model_name: str = "ViT-B/16", remat: bool = False):
    device = jax.devices()[0]
    on_tpu = jax.default_backend() in ("tpu", "axon")
    if not on_tpu:
        batch_size, steps, warmup = min(batch_size, 8), 2, 1  # functional check only

    step_fn, state, images, tokens, config = build_bench_step(batch_size, model_name, remat)
    ctx = tokens.shape[1]

    # XLA's FLOP estimate for the whole train step (fwd+bwd+update).
    try:
        compiled = step_fn.lower(state, images, tokens).compile()
        cost = compiled.cost_analysis()
        step_flops = float((cost or {}).get("flops", 0.0))
    except Exception:
        step_flops = 0.0

    # Pallas custom calls are opaque to XLA's cost analysis: when the fused
    # attention kernel is active, add its analytic FLOPs (QK^T + PV, fwd
    # 2 matmuls + bwd 4, padded sequence length).
    from flyp_tpu.ops.attention import _default_impl

    impl = _default_impl()
    if step_flops and impl.startswith("pallas"):
        def _attn_flops(L, H, head_dim, layers, pad):
            lp = ((L + pad - 1) // pad) * pad
            per_mm = batch_size * H * lp * lp * head_dim * 2
            return layers * (2 + 4) * per_mm

        # ModifiedResNet towers run XLA convs (fully visible to cost
        # analysis); only transformer towers hide FLOPs in the kernel.
        # head_dim derives from each tower's own width/heads (all current
        # configs use 64, but a hardcode would silently miscount new ones).
        vis_tokens = config.vision.seq_len if config.vision.is_vit else 0
        if config.vision.is_vit:
            vh = config.vision.heads
            step_flops += _attn_flops(vis_tokens, vh, config.vision.width // vh, config.vision.layers, 16)
        th = config.text.heads
        step_flops += _attn_flops(ctx, th, config.text.width // th, config.text.layers, 16)

    if step_flops and impl.startswith("pallas_block"):
        # The block kernels also hide the QKV projection (fwd + dW + dY),
        # the out-projection forward AND its in-kernel `do = g @ Wout^T`
        # backward; with pallas_block_mlp, the MLP forward matmuls too.
        # dWout runs in XLA and is counted by cost analysis.
        with_mlp = impl == "pallas_block_mlp"

        def _proj_flops(L, D, layers):
            qkv = 2 * batch_size * L * D * 3 * D  # one matmul
            out = 2 * batch_size * L * D * D
            mlp = 2 * (2 * batch_size * L * D * 4 * D) if with_mlp else 0
            return layers * (3 * qkv + 2 * out + mlp)

        if config.vision.is_vit:
            step_flops += _proj_flops(vis_tokens, config.vision.width, config.vision.layers)
        step_flops += _proj_flops(ctx, config.text.width, config.text.layers)

    # NOTE: on the tunneled 'axon' platform block_until_ready returns at
    # enqueue time; a host transfer is the only true synchronization.  Time
    # through a scalar fetch of the last step's loss.
    for _ in range(warmup):
        state, metrics = step_fn(state, images, tokens)
    _ = float(jax.device_get(metrics["loss"]))

    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = step_fn(state, images, tokens)
    last_loss = float(jax.device_get(metrics["loss"]))
    dt = time.perf_counter() - t0

    step_time = dt / steps
    images_per_sec = batch_size / step_time
    mfu = (step_flops / step_time) / peak_flops_for(device) if step_flops else 0.0

    result = {
        "metric": f"images/sec/chip {model_name} contrastive FT",
        "value": round(images_per_sec, 2),
        "unit": "img/s",
        # The reference publishes no numbers (BASELINE.md); the only
        # quantitative bar is the driver-set north star of 45% MFU, so
        # vs_baseline = mfu/0.45 — NOT a torch-throughput comparison.
        "vs_baseline": round(mfu / 0.45, 4) if mfu else 0.0,
        "extra": {
            "baseline_def": "driver north-star 0.45 MFU (reference publishes no perf numbers)",
            "step_time_s": round(step_time, 4),
            "batch_size": batch_size,
            "mfu": round(mfu, 4),
            "step_tflops": round(step_flops / 1e12, 2),
            "device": str(getattr(device, "device_kind", device)),
            "loss": round(last_loss, 4),
        },
    }
    print(json.dumps(result))
    return result


def parse_spec(spec: str):
    """``MODEL[+remat][:field=value,...]`` -> (model_name, remat, overrides).

    Override fields resolve against VisionConfig first, then CLIPConfig
    (e.g. ``RN50:stem_impl=s2d``).  Values parse as int, then float, else
    stay strings."""
    overrides = {}
    if ":" in spec:
        spec, kvs = spec.split(":", 1)
        for kv in kvs.split(","):
            k, v = kv.split("=")
            for cast in (int, float):
                try:
                    overrides[k] = cast(v)
                    break
                except ValueError:
                    continue
            else:
                overrides[k] = v
    remat = spec.endswith("+remat")
    model_name = spec[: -len("+remat")] if remat else spec
    return model_name, remat, overrides


def main_ab(spec_a: str, spec_b: str, batch_size: int = 256, blocks: int = 6, steps_per_block: int = 10):
    """Interleaved A/B: alternate two configs within ONE session and report
    paired per-block statistics.

    RN50 benches carry ~±5% *between-session* noise on this tunneled chip
    while reproducing exactly within a session (docs/BENCHMARKS.md round 3b
    NOTE); interleaving blocks of the two programs makes conv-heavy claims
    self-defending: both sides see the same host state, and the per-block
    pairing cancels slow drift.  Prints a per-block table to stderr and one
    JSON line to stdout."""
    on_tpu = jax.default_backend() in ("tpu", "axon")
    if not on_tpu:
        batch_size, blocks, steps_per_block = min(batch_size, 8), 2, 2

    from flyp_tpu.ops.attention import _IMPL_ENV, _default_impl

    base_attn = os.environ.get(_IMPL_ENV)
    sides = {}
    try:
        for label, spec in (("A", spec_a), ("B", spec_b)):
            model_name, remat, overrides = parse_spec(spec)
            # The attention impl is read from the env at TRACE time (lru_cached):
            # set/restore it around each side's build so an `attn=` override
            # bakes into that side's compiled program ONLY.
            attn = overrides.pop("attn", base_attn)
            if attn is None:
                os.environ.pop(_IMPL_ENV, None)
            else:
                os.environ[_IMPL_ENV] = str(attn)
            _default_impl.cache_clear()
            step_fn, state, images, tokens, _ = build_bench_step(batch_size, model_name, remat, overrides)
            # jit traces LAZILY at first call — which would happen after the env
            # is restored for the other side.  AOT-compile here so the impl
            # choice is baked in while this side's env is active.
            step_fn = step_fn.lower(state, images, tokens).compile()
            sides[label] = {"spec": spec, "step": step_fn, "state": state, "images": images, "tokens": tokens}
    finally:
        # Both programs are AOT-compiled now; restore the process-wide impl so
        # a programmatic caller doesn't inherit side B's override.
        if base_attn is None:
            os.environ.pop(_IMPL_ENV, None)
        else:
            os.environ[_IMPL_ENV] = base_attn
        _default_impl.cache_clear()

    def run_block(side, steps):
        t0 = time.perf_counter()
        for _ in range(steps):
            side["state"], metrics = side["step"](side["state"], side["images"], side["tokens"])
        _ = float(jax.device_get(metrics["loss"]))  # axon: only a transfer syncs
        return time.perf_counter() - t0

    # Warmup (compile + first real block) both sides before any timed block.
    for side in sides.values():
        run_block(side, 3)

    times = {"A": [], "B": []}
    for i in range(blocks):
        for label in ("A", "B"):
            dt = run_block(sides[label], steps_per_block)
            times[label].append(dt / steps_per_block)
        ra, rb = batch_size / times["A"][-1], batch_size / times["B"][-1]
        print(f"block {i}: A {ra:8.1f} img/s   B {rb:8.1f} img/s   A/B {ra / rb:6.4f}", file=sys.stderr, flush=True)

    imgps = {k: [batch_size / t for t in v] for k, v in times.items()}
    ratios = [a / b for a, b in zip(imgps["A"], imgps["B"])]

    def _stats(xs):
        m = sum(xs) / len(xs)
        sd = (sum((x - m) ** 2 for x in xs) / max(len(xs) - 1, 1)) ** 0.5
        return {"mean": round(m, 2), "std": round(sd, 2), "min": round(min(xs), 2), "max": round(max(xs), 2)}

    result = {
        "metric": f"A/B paired throughput ratio [{spec_a}] / [{spec_b}]",
        "value": round(sum(ratios) / len(ratios), 4),
        "unit": "ratio",
        "vs_baseline": 1.0,
        "extra": {
            "batch_size": batch_size,
            "blocks": blocks,
            "steps_per_block": steps_per_block,
            "ratio": _stats(ratios),
            "A_imgps": _stats(imgps["A"]),
            "B_imgps": _stats(imgps["B"]),
        },
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--ab":
        spec_a, spec_b = sys.argv[2], sys.argv[3]
        bs = int(sys.argv[4]) if len(sys.argv) > 4 else 256
        main_ab(spec_a, spec_b, batch_size=bs)
    else:
        bs = int(sys.argv[1]) if len(sys.argv) > 1 else 256
        name = sys.argv[2] if len(sys.argv) > 2 else "ViT-B/16"
        # Remat (with the saved-kernel-residuals policy) only where activations
        # don't fit outright: the ViT-L family at 16 GB.
        main(batch_size=bs, model_name=name, remat=name.startswith("ViT-L"))
