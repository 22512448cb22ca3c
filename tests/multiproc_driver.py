"""Subprocess driver for the REAL multi-process integration tests.

``test_multiprocess.py`` launches N copies of this script with
``jax.distributed.initialize`` on a localhost coordinator (gloo CPU
collectives), each owning ``8 // N`` virtual CPU devices, so the
multi-host contract (docs/PARITY.md divergence 13) executes its real
branches instead of the simulated ``process_count`` overrides used by
``test_multihost_input.py``:

* ``global_batch_from_local`` -> ``jax.make_array_from_process_local_data``
  (each host contributes its loader slice of the global batch),
* ``prefetch_to_device``'s cross-host token-width sync (local shrink
  buckets disagree; allgather-max then re-pad),
* ``_global_host_state`` -> ``multihost_utils.process_allgather`` for the
  checkpoint fetch, the ``--cluster loss`` per-item-loss vector, and the
  batch-sharded ``img_id`` fetch,
* single-writer artifact discipline (``is_primary`` gating of metrics
  sink, stats.tsv, orbax saves),
* replicated eval loaders (every process scores the full test set).

The reference runs these for real across ranks (`wds.split_by_node`,
`/root/reference/src/datasets/laion.py:464-466`; the dormant distributed
loss `/root/reference/clip/loss.py:19-69`); this driver is the rebuild's
equivalent executable proof.

Run standalone for debugging:
    python tests/multiproc_driver.py --num_processes 1 --process_id 0 \
        --local_devices 8 --train_csv ... --data_root ... --log_dir ... --out ...
"""

import argparse
import dataclasses
import json
import os
import re
import sys

import numpy as np

# Launched by path (`python tests/multiproc_driver.py`), so the repo root is
# not on sys.path the way pytest's rootdir is.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--num_processes", type=int, required=True)
    p.add_argument("--process_id", type=int, required=True)
    p.add_argument("--coordinator", default="localhost:7641")
    p.add_argument("--local_devices", type=int, required=True)
    p.add_argument("--train_csv", required=True)
    p.add_argument("--data_root", required=True)
    p.add_argument("--log_dir", required=True)
    p.add_argument("--save_dir", default=None)
    p.add_argument("--out", required=True, help="per-process result JSON")
    p.add_argument("--cluster", default="")
    p.add_argument("--fsdp", action="store_true")
    p.add_argument("--mesh_replica", type=int, default=1,
                   help=">1: multi-slice outer DP (each process = one slice with "
                        "mesh_replica == num_processes; the gradient all-reduce "
                        "crosses the process boundary like DCN would)")
    p.add_argument("--mesh_model", type=int, default=1,
                   help=">1: tensor-parallel over the model axis (2 procs x 4 "
                        "devices with mesh_model=2 puts each model shard on "
                        "ONE process — TP collectives cross the process boundary)")
    p.add_argument("--max_steps", type=int, default=0)
    p.add_argument("--save_every_n_steps", type=int, default=0)
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--no_eval", action="store_true", help="skip the per-epoch eval suite")
    p.add_argument("--trainer", choices=["flyp", "ce"], default="flyp",
                   help="ce: drive the CE-ablation trainer (its collective "
                        "orbax save + VisionDataset global-batch assembly)")
    p.add_argument(
        "--mode",
        choices=["train", "batches"],
        default="train",
        help="train: run flyp_train; batches: assemble one epoch of global "
        "batches through prefetch_to_device and hash their global bytes",
    )
    return p.parse_args(argv)


def setup_runtime(num_processes: int, process_id: int, local_devices: int, coordinator: str):
    """Force the CPU backend with ``local_devices`` virtual devices and (for
    N>1) join the gloo-backed process group.  Must run before anything
    imports jax-the-backend; conftest's 8-device XLA_FLAGS are inherited by
    subprocesses and must be overridden, not appended to."""
    flags = re.sub(
        r"--xla_force_host_platform_device_count=\d+", "", os.environ.get("XLA_FLAGS", "")
    )
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={local_devices}"
    ).strip()

    import jax

    # The site hook pins jax_platforms to the TPU tunnel; env alone is ignored.
    jax.config.update("jax_platforms", "cpu")
    # Match conftest: bitwise comparisons need identical matmul precision.
    jax.config.update("jax_default_matmul_precision", "highest")
    if num_processes > 1:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax


def tiny_model():
    """Same tiny ViT-B/16 shrink as tests/test_flyp_trainer.py (seeded init:
    every process constructs bitwise-identical params)."""
    from flyp_tpu.models import CLIPModel, MODEL_CONFIGS, init_clip_params

    cfg = MODEL_CONFIGS["ViT-B/16"]
    cfg = dataclasses.replace(
        cfg,
        embed_dim=32,
        vision=dataclasses.replace(cfg.vision, image_size=32, patch_size=16, width=64, layers=2, heads=1),
        text=dataclasses.replace(cfg.text, width=64, heads=1, layers=2),
    )
    model = CLIPModel(cfg)
    return model, {"params": init_clip_params(model, 0)}


def hash_global_batches(args, jax):
    """Assemble one epoch of global batches exactly as the trainer does
    (sharded CSV loader slice -> prefetch_to_device over the mesh ->
    ``make_array_from_process_local_data``), then hash each batch's GLOBAL
    bytes.  Identical hash lists across process layouts prove the assembled
    global batch stream — images, synced-width tokens, img_ids — is
    process-layout-invariant at the byte level."""
    import hashlib

    from flyp_tpu.config import ExperimentConfig
    from flyp_tpu.data.csv_data import get_csv_loader
    from flyp_tpu.data.loader import prefetch_to_device
    from flyp_tpu.parallel.mesh import MeshConfig, create_mesh_for_batch
    from flyp_tpu.training.flyp import _global_host_state

    cfg = ExperimentConfig(
        ft_data=args.train_csv, ft_data_test=args.train_csv, batch_size=8,
        workers=2, cluster="loss",  # img_id rides the batch
    )
    mesh = create_mesh_for_batch(MeshConfig(), cfg.batch_size)
    loader = get_csv_loader(cfg, is_train=True, image_size=32, return_img_id=True)
    hashes = []
    for batch in prefetch_to_device(loader, mesh, size=2):
        h = hashlib.sha256()
        for key in ("image", "tokens", "img_id"):
            arr = np.ascontiguousarray(np.asarray(_global_host_state(batch[key])))
            h.update(str(arr.shape).encode() + str(arr.dtype).encode() + arr.tobytes())
        hashes.append(h.hexdigest())
    return hashes


def main(argv=None):
    args = parse_args(argv)
    jax = setup_runtime(args.num_processes, args.process_id, args.local_devices, args.coordinator)

    from flyp_tpu.config import ExperimentConfig
    from flyp_tpu.parallel.multihost import is_primary
    from flyp_tpu.training.flyp import flyp_train

    if args.mode == "batches":
        hashes = hash_global_batches(args, jax)
        with open(args.out, "w") as f:
            json.dump(
                {
                    "process_id": args.process_id,
                    "jax_process_count": jax.process_count(),
                    "batch_hashes": hashes,
                },
                f,
            )
        print(f"driver proc {args.process_id}: hashed {len(hashes)} batches", flush=True)
        return

    cfg = ExperimentConfig(
        train_dataset="PatchCamelyonVal",
        template="patchcamelyon_template",
        eval_datasets=[] if args.no_eval else ["PatchCamelyonVal"],
        data_location=args.data_root,
        ft_data=args.train_csv,
        ft_data_test=args.train_csv,
        batch_size=8,  # GLOBAL batch: each process's loader yields 8/N rows
        lr=1e-3,
        wd=0.1,
        warmup_length=2,
        epochs=args.epochs,
        workers=2,
        debug=False,  # metrics.jsonl on the primary (single-writer assert)
        compute_dtype="float32",
        log_dir=args.log_dir,
        save=args.save_dir,
        cluster=args.cluster,
        fsdp=args.fsdp,
        mesh_model=args.mesh_model,
        mesh_replica=args.mesh_replica,
        max_steps=args.max_steps,
        save_every_n_steps=args.save_every_n_steps,
        exp_name="multiproc",
    )

    model, variables = tiny_model()
    if args.trainer == "ce":
        from flyp_tpu.training.ce_ablation import ce_ablation
        from flyp_tpu.utils.logging import get_logger

        cfg.train_dataset = "PatchCamelyonTrain"
        model_path = ce_ablation(
            cfg, get_logger(args.log_dir), model=model, variables=variables, print_every=1
        )
    else:
        model_path = flyp_train(cfg, model=model, variables=variables, print_every=1)

    result = {
        "process_id": args.process_id,
        "jax_process_index": jax.process_index(),
        "jax_process_count": jax.process_count(),
        "local_device_count": jax.local_device_count(),
        "global_device_count": jax.device_count(),
        "is_primary": is_primary(),
        "model_path": model_path,
    }
    with open(args.out, "w") as f:
        json.dump(result, f)
    print(f"driver proc {args.process_id}: done -> {args.out}", flush=True)


if __name__ == "__main__":
    main()
    sys.exit(0)
