"""Host input-path evidence: native C++ decode+transform vs PIL, per core.

The TPU consumes 1128 img/s (ViT-B/16 bs256 training, BENCHMARKS.md); this
container has ONE host core, so the input pipeline can never be proven at
chip rate here (CLAUDE.md).  What CAN be measured on one core, and is, per
VERDICT round-4 task 7:

* per-image decode + transform cost (us/image) — JPEG and PNG, train
  (RandomResizedCrop) and eval (resize+centercrop) transform paths,
  native (`native/flyp_native.cc` via ctypes, GIL-released) vs PIL
  (`data/transforms.py`, the reference's worker-process path it replaces,
  `/root/reference/src/datasets/laion.py:123-133`),
* images/s/core for each path,
* the host-cores-per-chip requirement implied by the chip's consumption.

Multi-thread scaling of the GIL-free path is covered by the opt-in test
``tests/test_native_decode.py::test_multithread_scaling`` (skips below 4
cores — this 1-core container can't exercise it; a real TPU host has 100+).

Usage: python -m tools.host_decode_bench [n_images] [px]
"""

import io
import json
import sys
import time

import numpy as np

CHIP_RATES = {"ViT-B/16 bs256": 1128.0, "RN50 bs256": 1626.0, "ViT-B/32 bs512": 3133.0}


def make_images(n: int, src_px: int = 480):
    """Synthetic photos (noise + gradients, so JPEG entropy is realistic)."""
    from PIL import Image

    rng = np.random.default_rng(0)
    jpegs, pngs = [], []
    for _ in range(n):
        y, x = np.mgrid[0:src_px, 0:src_px]
        base = (128 + 60 * np.sin(x / 17.0) * np.cos(y / 23.0)).astype(np.uint8)
        arr = np.stack([base, np.roll(base, 7, 0), np.roll(base, 13, 1)], -1)
        arr = np.clip(arr.astype(np.int16) + rng.integers(-25, 25, arr.shape), 0, 255).astype(np.uint8)
        img = Image.fromarray(arr)
        for fmt, out in (("JPEG", jpegs), ("PNG", pngs)):
            buf = io.BytesIO()
            img.save(buf, format=fmt, quality=90)
            out.append(buf.getvalue())
    return jpegs, pngs


def time_path(fn, payloads, iters: int) -> float:
    """Mean us/image over ``iters`` passes of the payload list."""
    fn(payloads[0])  # warm caches / lazy builds
    t0 = time.perf_counter()
    for _ in range(iters):
        for p in payloads:
            fn(p)
    return (time.perf_counter() - t0) / (iters * len(payloads)) * 1e6


def main(n_images: int = 32, px: int = 224, iters: int = 4):
    from PIL import Image

    from flyp_tpu.data import native_decode
    from flyp_tpu.data.transforms import eval_transform, train_transform

    assert native_decode.available(), "native library failed to build"
    jpegs, pngs = make_images(n_images)
    print(f"{n_images} synthetic 480px images; JPEG ~{len(jpegs[0]) // 1024}KB, "
          f"PNG ~{len(pngs[0]) // 1024}KB; target {px}px", flush=True)

    rng = np.random.default_rng(1)
    nat_train = native_decode.NativeTransform(px, train=True)
    nat_eval = native_decode.NativeTransform(px, train=False)
    pil_train = train_transform(px)
    pil_eval = eval_transform(px)

    def pil_path(transform):
        def run(data):
            img = Image.open(io.BytesIO(data))
            return transform(img.convert("RGB") if img.mode != "RGB" else img, rng)
        return run

    rows = {}
    for fmt, payloads in (("jpeg", jpegs), ("png", pngs)):
        rows[f"native_train_{fmt}"] = time_path(lambda d: nat_train.from_bytes(d, rng), payloads, iters)
        rows[f"native_eval_{fmt}"] = time_path(nat_eval.from_bytes, payloads, iters)
        rows[f"pil_train_{fmt}"] = time_path(pil_path(pil_train), payloads, iters)
        rows[f"pil_eval_{fmt}"] = time_path(pil_path(pil_eval), payloads, iters)

    print(f"\n{'path':24s} {'us/img':>9s} {'img/s/core':>11s}")
    for k, us in rows.items():
        print(f"{k:24s} {us:9.0f} {1e6 / us:11.1f}")

    nat_rate = 1e6 / rows["native_train_jpeg"]
    pil_rate = 1e6 / rows["pil_train_jpeg"]
    print(f"\nnative/PIL speedup (train jpeg): {nat_rate / pil_rate:.2f}x")
    print("host cores per chip to feed training (train-jpeg path):")
    cores = {}
    for name, rate in CHIP_RATES.items():
        cores[name] = {"native": rate / nat_rate, "pil": rate / pil_rate}
        print(f"  {name:16s}: native {cores[name]['native']:5.1f} cores   PIL {cores[name]['pil']:5.1f} cores")

    print(json.dumps({
        "metric": "host decode+transform us/image (1 core)",
        "us_per_image": {k: round(v, 1) for k, v in rows.items()},
        "img_per_s_per_core": {k: round(1e6 / v, 1) for k, v in rows.items()},
        "native_over_pil_train_jpeg": round(nat_rate / pil_rate, 3),
        "cores_per_chip": {k: {kk: round(vv, 2) for kk, vv in v.items()} for k, v in cores.items()},
    }))


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:3]))
