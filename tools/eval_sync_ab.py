"""Eval-loop host-sync A/B: per-batch logits fetch vs one-batch-lagged pipeline.

`evaluation/evaluator.py` now dispatches batch i+1's forward before fetching
batch i's logits (`Classifier.predict_logits_device` + the lagged `_process`
drain) so the [B, classes] device->host transfer and the host-side metric
work overlap device compute.  This measures both loop shapes around the
exact jitted `_logits_fn` the evaluator uses, interleaved in one session.

Usage: python -m tools.eval_sync_ab [model] [batch]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main(model_name="ViT-B/16", batch=256, blocks=2, steps=6, classes=1000):
    from flyp_tpu.evaluation.classifier import Classifier
    from flyp_tpu.models import CLIPModel, MODEL_CONFIGS, init_clip_variables
    from flyp_tpu.models.head import ClassificationHead

    on_tpu = jax.default_backend() in ("tpu", "axon")
    if not on_tpu:
        batch, blocks, steps = min(batch, 8), 1, 2

    config = MODEL_CONFIGS[model_name]
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    model = CLIPModel(config, compute_dtype=dtype)
    variables = init_clip_variables(model, 0)
    rng = np.random.default_rng(0)
    head = ClassificationHead.create(
        jnp.asarray(rng.standard_normal((classes, config.embed_dim)) * config.embed_dim**-0.5, jnp.float32),
        normalize=True,
    )
    clf = Classifier(model, variables, head, batch_size=batch)
    px = config.vision.image_size
    images = np.asarray(rng.standard_normal((batch, px, px, 3)), np.float32)

    _ = clf.predict_logits(images)  # compile + warm

    def host_work(logits, labels):
        # Representative per-batch metric work (argmax + tally).
        preds = logits.argmax(axis=1)
        return float((preds == labels).sum())

    labels = rng.integers(0, classes, batch)

    def sync_block(n):
        t0 = time.perf_counter()
        acc = 0.0
        for _ in range(n):
            logits = clf.predict_logits(images)  # dispatch + fetch, serialized
            acc += host_work(logits, labels)
        return (time.perf_counter() - t0) / n

    def lagged_block(n):
        t0 = time.perf_counter()
        acc, pend = 0.0, None
        for _ in range(n):
            dev, nv = clf.predict_logits_device(images)  # dispatch only
            if pend is not None:
                acc += host_work(np.asarray(pend[0])[: pend[1]], labels)
            pend = (dev, nv)
        acc += host_work(np.asarray(pend[0])[: pend[1]], labels)
        return (time.perf_counter() - t0) / n

    for b in range(blocks):
        ts, tl = sync_block(steps), lagged_block(steps)
        print(
            f"block {b}: sync {ts*1e3:7.2f} ms/batch ({batch/ts:7.1f} img/s)   "
            f"lagged {tl*1e3:7.2f} ms/batch ({batch/tl:7.1f} img/s)   sync/lagged {ts/tl:6.4f}",
            flush=True,
        )


if __name__ == "__main__":
    name = sys.argv[1] if len(sys.argv) > 1 else "ViT-B/16"
    bs = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    main(name, bs)
