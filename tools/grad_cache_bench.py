"""On-chip evidence for the GradCache chunked step (training/grad_cache.py).

The chunked step's pitch is exact big-batch InfoNCE past the direct step's
HBM limit (the reference grows the contrastive batch only by adding GPUs —
`/root/reference/src/models/flyp_loss.py:335-336`).  This tool measures the
pitch honestly on the real chip:

1. **Direct attempt** at the target batch (default ViT-L/14 bs512 + remat,
   the paper's ImageNet recipe batch on one 16 GB chip): compile, run one
   step, fetch.  On the tunneled `axon` platform OOM surfaces only at the
   fetch — a caught RESOURCE_EXHAUSTED here is the measured "does not fit".
2. **Chunked run** at the same global batch (default 8 chunks of 64):
   steady-state img/s through scalar fetches, reported next to the direct
   throughput at the largest batch that DOES fit (from BENCHMARKS.md) so the
   ~4/3-FLOP recompute cost is visible.

Usage: python tools/grad_cache_bench.py [--model ViT-L/14] [--batch 512]
           [--chunks 8] [--steps 10] [--skip-direct]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax

sys.path.insert(0, ".")
from bench import build_bench_parts, build_bench_step  # noqa: E402


def build_chunked(batch_size: int, model_name: str, remat: bool, chunks: int):
    """The bench step with the direct jit swapped for the chunked one —
    the SAME model/optimizer/state/inputs (build_bench_parts), so the
    comparison is like-for-like by construction."""
    from flyp_tpu.training.grad_cache import make_chunked_train_step

    model, optimizer, state, images, tokens, config = build_bench_parts(batch_size, model_name, remat)
    chunked = make_chunked_train_step(model, optimizer, chunks=chunks, donate=True)
    return chunked, state, images, tokens, config


def try_direct(batch_size: int, model_name: str, remat: bool) -> dict:
    """One direct step at the target batch; classify fit vs OOM."""
    try:
        step_fn, state, images, tokens, _ = build_bench_step(batch_size, model_name, remat)
        t0 = time.perf_counter()
        state, metrics = step_fn(state, images, tokens)
        loss = float(jax.device_get(metrics["loss"]))  # axon: fetch = sync; OOM surfaces here
        dt = time.perf_counter() - t0
        return {"fits": True, "first_step_s": round(dt, 2), "loss": round(loss, 4)}
    except Exception as e:  # noqa: BLE001 — RESOURCE_EXHAUSTED type varies by backend
        msg = str(e)
        oom = "RESOURCE_EXHAUSTED" in msg or "Out of memory" in msg or "exceeds" in msg.lower()
        return {"fits": False, "oom": oom, "error": msg[:300]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="ViT-L/14")
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--chunks", type=int, default=8)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--no-remat", action="store_true")
    ap.add_argument("--skip-direct", action="store_true")
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend (functional smoke)")
    args = ap.parse_args()

    if args.cpu:
        # The site hook pins jax_platforms=axon,cpu; the env var alone is
        # ignored — only the config update reaches the backend choice.
        jax.config.update("jax_platforms", "cpu")
    on_tpu = jax.default_backend() in ("tpu", "axon")
    if not on_tpu:  # functional smoke on CPU
        args.batch, args.chunks, args.steps = 8, 2, 2
    # At least one warmup step: the pre-timing sync point fetches its loss
    # (on axon only a host transfer synchronizes — timing without it would
    # include compile + queue drain).
    args.warmup = max(args.warmup, 1)
    remat = args.model.startswith("ViT-L") and not args.no_remat
    device = jax.devices()[0]

    result = {"model": args.model, "batch": args.batch, "chunks": args.chunks, "remat": remat,
              "device": str(getattr(device, "device_kind", device))}

    if not args.skip_direct:
        print(f"[direct] {args.model} bs{args.batch} remat={remat} ...", file=sys.stderr, flush=True)
        result["direct"] = try_direct(args.batch, args.model, remat)
        print(f"[direct] {result['direct']}", file=sys.stderr, flush=True)

    print(f"[chunked] {args.chunks}x{args.batch // args.chunks} ...", file=sys.stderr, flush=True)
    step_fn, state, images, tokens, _ = build_chunked(args.batch, args.model, remat, args.chunks)
    for _ in range(args.warmup):
        state, metrics = step_fn(state, images, tokens)
    _ = float(jax.device_get(metrics["loss"]))

    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, metrics = step_fn(state, images, tokens)
    loss = float(jax.device_get(metrics["loss"]))
    dt = (time.perf_counter() - t0) / args.steps

    result["chunked"] = {
        "step_time_s": round(dt, 4),
        "img_per_s": round(args.batch / dt, 2),
        "loss": round(loss, 4),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
