"""Progress-validation beam search over guidance sequences
(`/root/reference/src/models/flyp_loss_progress.py:30-298`).

Protocol: snapshot the initial model; for two beam rounds, take each
surviving snapshot, rank guidance values by per-guidance eval progress,
train one full pass on each guidance from the same snapshot, evaluate the
full suite, and keep the top-5 (model, optimizer, progress-state) snapshots
by the selection metric (IWildCamOOD macro-F1 upstream).  Snapshots carry
optimizer state and the progress baseline, unlike the main trainer's
checkpoints.
"""

from __future__ import annotations

import copy
import json
import os
import shutil

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from flyp_tpu.data.csv_data import get_csv_loader
from flyp_tpu.evaluation.classifier import Classifier
from flyp_tpu.utils.pipeline import OneStepLag, host_cast_images
from flyp_tpu.evaluation.evaluator import evaluate
from flyp_tpu.models.factory import build_clip_model
from flyp_tpu.training.flyp import _avg_ood_acc, _host_variables, build_zeroshot_head, progress_eval
from flyp_tpu.training.schedules import make_scheduler
from flyp_tpu.training.train_state import create_train_state, make_optimizer
from flyp_tpu.training.train_step import make_train_step


def _save_snapshot(path, state, last_perform, step):
    """Orbax snapshot directory + JSON sidecar (no pickle for model state —
    repo convention; the sidecar holds only the small progress baseline,
    a {stat name: float} dict, and the step counter)."""
    from flyp_tpu.utils.checkpoint import _checkpointer

    payload = {
        "params": jax.tree_util.tree_map(np.asarray, jax.device_get(state.params)),
        "opt_state": jax.tree_util.tree_map(np.asarray, jax.device_get(state.opt_state)),
        # BN running stats are trajectory state (the reference snapshots the
        # full state_dict incl. buffers, `flyp_loss_progress.py:177-180`);
        # restoring stale pretrained stats would score beams wrongly.
        "batch_stats": (
            jax.tree_util.tree_map(np.asarray, jax.device_get(state.batch_stats))
            if state.batch_stats is not None else {}
        ),
    }
    _checkpointer().save(os.path.abspath(path), payload, force=True)
    with open(path + ".perform.json", "w") as f:
        json.dump({"last_perform": last_perform, "step": int(step)}, f)
    return path


def _remove_snapshot(path):
    shutil.rmtree(path, ignore_errors=True)
    sidecar = path + ".perform.json"
    if os.path.exists(sidecar):
        os.remove(sidecar)


def flyp_progress_validation(
    cfg,
    logger,
    model=None,
    variables=None,
    beam_size: int = 5,
    num_rounds: int = 2,
    select_metric: str = "IWildCamOODF1-macro_all",
):
    assert cfg.train_dataset is not None, "Please provide a training dataset."
    assert cfg.save is not None, "progress validation needs --save for snapshots"
    from flyp_tpu.parallel.multihost import process_count

    if process_count() > 1:
        # The beam trainer feeds step_fn host-local batches with no global
        # assembly and every host would race on the snapshot paths; the
        # reference runs this protocol on one node (`flyp_loss_progress.py`).
        raise NotImplementedError("progress validation is a single-host protocol; run with one JAX process")
    logger.info("Fine-tuning Using FLYP Loss (progress validation)")

    log_dir = cfg.log_dir or os.path.join("expt_logs", cfg.exp_name or "progress", cfg.run_key())
    os.makedirs(log_dir, exist_ok=True)
    os.makedirs(cfg.save, exist_ok=True)

    if model is None:
        model, variables = build_clip_model(cfg)
    image_size = model.config.vision.image_size

    if cfg.scheduler not in ("default", "drestart"):
        raise ValueError(f"invalid scheduler type {cfg.scheduler}!")
    schedule = make_scheduler(cfg.scheduler, cfg.lr, cfg.warmup_length, cfg.epochs, 1000, cfg.min_lr)
    optimizer = make_optimizer(schedule, cfg.wd, cfg.adam_moment_dtype)
    state = create_train_state(variables["params"], optimizer, variables.get("batch_stats"))
    step_fn = make_train_step(model, optimizer, donate=False)

    def restore(path):
        from flyp_tpu.utils.checkpoint import _checkpointer

        with open(path + ".perform.json") as f:
            meta = json.load(f)
        template = create_train_state(variables["params"], optimizer, variables.get("batch_stats"))
        snap = _checkpointer().restore(
            os.path.abspath(path),
            item={
                "params": jax.tree_util.tree_map(np.asarray, jax.device_get(template.params)),
                "opt_state": jax.tree_util.tree_map(np.asarray, jax.device_get(template.opt_state)),
                "batch_stats": (
                    jax.tree_util.tree_map(np.asarray, jax.device_get(template.batch_stats))
                    if template.batch_stats is not None else {}
                ),
            },
        )
        restored = create_train_state(
            snap["params"], optimizer, snap["batch_stats"] if template.batch_stats is not None else None
        )
        opt_state = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(restored.opt_state),
            jax.tree_util.tree_leaves(snap["opt_state"]),
        )
        import dataclasses as _dc

        return _dc.replace(restored, opt_state=opt_state), meta["last_perform"], meta["step"]

    def train_on_guidance(state, guid, step):
        from flyp_tpu.tokenizer import shrink_context

        # Replicated (shard_by_process=False): batches feed step_fn directly
        # with no global assembly, so every host must hold the identical full
        # batch.  The beam search is a single-host protocol (reference
        # scope); see the process-count guard in flyp_progress_validation.
        loader = get_csv_loader(cfg, is_train=True, image_size=image_size, guidance=guid, shard_by_process=False)
        loss_sum, batches = 0.0, 0
        lag = OneStepLag()  # one-step-lagged loss fetch: overlap the host sync
        for batch in loader:
            # Exact context shrinking (same as the main trainer's loader).
            tokens = shrink_context(np.asarray(batch["tokens"]))
            images = host_cast_images(batch["image"], model.compute_dtype)  # halve H2D bytes
            state, metrics = step_fn(state, jnp.asarray(images), jnp.asarray(tokens))
            prev = lag.push(metrics)
            if prev is not None:
                loss_sum += float(prev["loss"])
            step += 1
            batches += 1
        prev = lag.flush()
        if prev is not None:
            loss_sum += float(prev["loss"])
        return state, step, loss_sum / max(batches, 1)

    # 0. snapshot the starting point.
    init_path = os.path.join(cfg.save, "cur_point-1_guidpath-1")
    _save_snapshot(init_path, state, {}, 0)
    logger.info("Saving model to " + init_path)

    stats = []
    beam = [init_path]
    epoch = -1
    while epoch < num_rounds - 1:
        epoch += 1
        candidates = []
        for last_path in beam:
            last_name = os.path.basename(last_path)
            last_guid_path_str = last_name.split("guidpath")[1]

            state, last_perform, step = restore(last_path)
            host_vars = _host_variables(state)  # incl. batch_stats for BN towers
            res_progress, str_progress, last_perform, _ = progress_eval(
                cfg, model, host_vars, last_perform, epoch, logger
            )
            ranked = sorted(res_progress.items(), key=lambda kv: kv[1], reverse=True)

            pd.DataFrame.from_dict({**str_progress, "epoch": epoch}, orient="index").to_csv(
                os.path.join(log_dir, f"progress{epoch}_before_guidpath{last_guid_path_str}.tsv"), sep="\t"
            )

            for guid, _progress in ranked:
                epoch_stats = {"last_model_name": last_name, "epoch": epoch}
                state, last_perform, step = restore(last_path)

                cur_guid_path = last_guid_path_str.split("=") + [str(guid)]
                cur_guid_path_str = "=".join(cur_guid_path)

                state, step, id_flyp_loss_avg = train_on_guidance(state, guid, step)

                host_vars = _host_variables(state)  # incl. batch_stats for BN towers
                _, str_progress, last_perform, _ = progress_eval(
                    cfg, model, host_vars, last_perform, epoch, logger
                )
                pd.DataFrame.from_dict({**str_progress, "epoch": epoch}, orient="index").to_csv(
                    os.path.join(log_dir, f"progress{epoch}_after_guidpath{cur_guid_path_str}.tsv"), sep="\t"
                )

                head = build_zeroshot_head(cfg, model, host_vars)
                clf = Classifier(model, host_vars, head, batch_size=cfg.batch_size)
                evaluate(clf, cfg, epoch_stats, logger)

                epoch_stats["Trained_guid"] = guid
                epoch_stats["Avg OOD Acc"] = round(_avg_ood_acc(epoch_stats), 4)
                epoch_stats["Avg ID FLYP Loss"] = round(id_flyp_loss_avg, 4)
                epoch_stats = {k: v for k, v in epoch_stats.items() if " Class" not in k}

                score = epoch_stats.get(select_metric, epoch_stats.get("Avg OOD Acc", 0.0))
                candidates.append({
                    "epoch": epoch,
                    "guid": guid,
                    "last_perform": copy.deepcopy(last_perform),
                    "guid_path": cur_guid_path_str,
                    "step": step,
                    "score": score,
                    "state": jax.device_get(state),
                })
                stats.append(epoch_stats)
                pd.DataFrame(stats).to_csv(
                    os.path.join(log_dir, f"stats{epoch}_after_guidpath{cur_guid_path_str}.tsv"), sep="\t"
                )

        for old in beam:
            _remove_snapshot(old)
        candidates = sorted(candidates, key=lambda c: c["score"], reverse=True)[:beam_size]
        beam = []
        for cand in candidates:
            path = os.path.join(cfg.save, f"cur_point{epoch}_guidpath{cand['guid_path']}")
            _save_snapshot(path, cand["state"], cand["last_perform"], cand["step"])
            logger.info("Saving model to " + path)
            beam.append(path)
        logger.info(f"Saved top-{beam_size} model: {beam}")

    return beam
