"""Inference/serving throughput + latency on one chip.

The training path is benched by bench.py; this measures the PRODUCT's other
hot loop — the eval/serving forward (`evaluation/classifier.py`: encode_image
-> zero-shot head logits), which the trainer runs over six ID/OOD suites
every epoch (reference: `/root/reference/src/models/eval.py:135-157`) and
which a deployment serves standalone.  The forward routes to
`attention_block_inference` (models/layers.py:202) — no backward-residual
HBM writes.

Reports, per batch size: images/s, fwd-only MFU (XLA cost analysis of the
compiled program + analytic Pallas-kernel FLOPs, same method bench.py
uses), and per-batch latency.  One JSON line at the end.

Usage: python -m tools.serving_bench [model] [batch,batch,...]
Default: ViT-B/16 at 8, 256, 1024.  Each batch size is one TPU compile
(~4-6 min on the tunneled chip) — keep the list short.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from bench import peak_flops_for


def fwd_attn_flops(batch, L, D, H, layers, pad=16):
    """Analytic fwd FLOPs hidden inside the block kernel per tower:
    QKV projection + QK^T + PV + out projection, padded sequence."""
    lp = ((L + pad - 1) // pad) * pad
    hd = D // H
    qkv = 2 * batch * lp * D * 3 * D
    scores = 2 * batch * H * lp * lp * hd * 2  # QK^T + PV
    out = 2 * batch * lp * D * D
    return layers * (qkv + scores + out)


def main(model_name="ViT-B/16", batch_sizes=(8, 256, 1024), classes=1000, iters=30):
    from flyp_tpu.evaluation.classifier import Classifier
    from flyp_tpu.models import CLIPModel, MODEL_CONFIGS, init_clip_variables
    from flyp_tpu.models.head import ClassificationHead
    from flyp_tpu.ops.attention import _default_impl

    device = jax.devices()[0]
    on_tpu = jax.default_backend() in ("tpu", "axon")
    if not on_tpu:
        batch_sizes, iters = [min(b, 8) for b in batch_sizes][:1], 2

    config = MODEL_CONFIGS[model_name]
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    model = CLIPModel(config, compute_dtype=dtype)
    variables = init_clip_variables(model, 0)
    rng = np.random.default_rng(0)
    head = ClassificationHead.create(
        jnp.asarray(rng.standard_normal((classes, config.embed_dim)) * config.embed_dim**-0.5, jnp.float32),
        normalize=True,
    )
    px = config.vision.image_size
    peak = peak_flops_for(device)
    impl = _default_impl()
    rows = {}

    for bs in batch_sizes:
        clf = Classifier(model, variables, head, batch_size=bs)
        images = jnp.asarray(rng.standard_normal((bs, px, px, 3)), dtype)

        # Compile + FLOP count via the same jitted fn the Classifier uses.
        fn = clf._logits_fn
        flops = 0.0
        try:
            cost = fn.lower(variables, head, images).compile().cost_analysis()
            flops = float((cost or {}).get("flops", 0.0))
        except Exception:
            pass
        if flops and impl.startswith("pallas") and config.vision.is_vit:
            flops += fwd_attn_flops(bs, config.vision.seq_len, config.vision.width,
                                    config.vision.heads, config.vision.layers)

        out = fn(variables, head, images)
        _ = float(jax.device_get(out.ravel()[0]))  # axon: only a transfer syncs
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(variables, head, images)
        _ = float(jax.device_get(out.ravel()[0]))
        dt = (time.perf_counter() - t0) / iters

        mfu = flops / dt / peak if flops else 0.0
        rows[bs] = {
            "img_per_s": round(bs / dt, 1),
            "latency_ms": round(dt * 1e3, 2),
            "fwd_mfu": round(mfu, 4),
            "fwd_tflops": round(flops / 1e12, 3),
        }
        print(f"batch {bs:5d}: {bs / dt:8.1f} img/s   {dt * 1e3:7.2f} ms/batch   fwd MFU {mfu * 100:5.1f}%",
              file=sys.stderr, flush=True)

    best = max(rows.values(), key=lambda r: r["img_per_s"])
    print(json.dumps({
        "metric": f"serving images/sec/chip {model_name} zero-shot classification ({classes} classes)",
        "value": best["img_per_s"],
        "unit": "img/s",
        "vs_baseline": round(best["fwd_mfu"] / 0.45, 4),
        "extra": {"per_batch": rows, "device": str(getattr(device, "device_kind", device)), "attn_impl": impl},
    }))
    return rows


if __name__ == "__main__":
    name = sys.argv[1] if len(sys.argv) > 1 else "ViT-B/16"
    sizes = tuple(int(v) for v in sys.argv[2].split(",")) if len(sys.argv) > 2 else (8, 256, 1024)
    main(name, sizes)
