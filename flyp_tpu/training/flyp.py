"""The FLYP trainer: contrastive fine-tuning with per-epoch zero-shot eval.

TPU-native re-expression of `/root/reference/src/models/flyp_loss.py:257-673`:

* One jitted train step runs the dual-tower forward, global-batch InfoNCE,
  and AdamW update over the device mesh (params replicated, batch sharded —
  replaces ``nn.DataParallel`` + the dormant torch.distributed path).
* The curriculum state machine (guidance sequencing, curriculum_epoch loop
  budget, progress-driven selection with 15% exploration, proportion mixing,
  loss-pair clustering) is preserved verbatim in behavior.
* Per epoch: orbax checkpoint (params + optimizer + curriculum cursor —
  upstream drops optimizer state), fresh zero-shot head from the updated
  text tower, full eval-suite pass, Avg-OOD aggregation (skipping the
  literal 'ImageNet Accuracy' key, as upstream), class_stats{n}.tsv and
  stats.tsv with identical filenames/columns.
"""

from __future__ import annotations

import os
import pickle

import jax
import numpy as np
import pandas as pd

from flyp_tpu.data.csv_data import get_csv_loader
from flyp_tpu.data.registry import get_classnames_for
from flyp_tpu.evaluation.classifier import Classifier
from flyp_tpu.evaluation.evaluator import evaluate
from flyp_tpu.evaluation.zeroshot import get_zeroshot_classifier
from flyp_tpu.models.factory import build_clip_model
from flyp_tpu.parallel.mesh import MeshConfig, create_mesh_for_batch, replicate
from flyp_tpu.templates import get_template
from flyp_tpu.training.curriculum import (
    choose_guidance_by_progress,
    init_guidance_setting,
    seq_curri_guid,
)
from flyp_tpu.training.schedules import make_scheduler
from flyp_tpu.utils.pipeline import OneStepLag
from flyp_tpu.training.train_state import create_train_state, make_optimizer
from flyp_tpu.training.train_step import make_train_step
from flyp_tpu.utils.checkpoint import CurriculumCursor, StepCursor, save_checkpoint, wait_for_saves
from flyp_tpu.utils.logging import get_logger
from flyp_tpu.utils.metrics_sink import MetricsSink


def _resolve_zeroshot_classnames(cfg):
    """Classname source for the per-epoch zero-shot head
    (`zeroshot.py:26-50`)."""
    if cfg.self_data:
        import pathlib

        labels = pathlib.Path(__file__).parent.parent / "data" / "metadata" / "iwildcam" / "labels.csv"
        df = pd.read_csv(labels)
        df = df[df["y"] < 99999]
        return df["english"].tolist()
    return get_classnames_for(cfg.train_dataset, cfg)


def build_zeroshot_head(cfg, model, variables):
    template = get_template(cfg.template)
    classnames = _resolve_zeroshot_classnames(cfg)
    return get_zeroshot_classifier(model, variables, classnames, template)


def progress_eval(cfg, model, variables, last_perform, epoch, logger, progress_ma=None):
    """Per-guidance eval deltas vs the previous epoch (`flyp_loss.py:107-149`)."""
    head = build_zeroshot_head(cfg, model, variables)
    clf = Classifier(model, variables, head, batch_size=cfg.batch_size)
    eval_data = get_csv_loader(cfg, is_train=False, image_size=model.config.vision.image_size, return_guidance=True)
    stats: dict = {}
    evaluate(clf, cfg, stats, logger, progress_eval=True, eval_batch_loader=eval_data)

    keyword = "Accuracy" if cfg.progress_metric == "Acc" else "F1"
    res_progress, str_progress, cur_stats = {}, {}, {}
    for key, value in stats.items():
        if "Number" in key or keyword not in key:
            continue
        last = last_perform.get(key, 0)
        guid = int(key.replace("Strength ", "").replace("Guidance ", "").replace(" Accuracy", "").replace(" F1", ""))
        if cfg.ma_progress and progress_ma is not None:
            progress_ma.setdefault(guid, []).append(value)
            value = float(np.mean(progress_ma[guid]))
        str_progress[f"Guidance {guid}"] = round(value - last, 6)
        res_progress[guid] = value - last
        cur_stats[guid] = value
    return res_progress, str_progress, dict(stats), cur_stats


def progress_eval_train(cfg, model, variables, epoch, logger, progress_ma=None):
    """Per-image best-guidance scan over the train CSV
    (`flyp_loss.py:152-194`, `eval.py:34-78`)."""
    head = build_zeroshot_head(cfg, model, variables)
    clf = Classifier(model, variables, head, batch_size=cfg.batch_size)
    data = get_csv_loader(
        cfg, is_train=False, image_size=model.config.vision.image_size,
        return_guidance=True, return_img_id=True, only_img_id=True,
    )
    dict_preds: dict = {}
    for batch in data.test_loader:
        logits = clf.predict_logits(batch["image"])
        probs = np.exp(logits - logits.max(axis=1, keepdims=True))
        probs /= probs.sum(axis=1, keepdims=True)
        for i in range(len(batch["label"])):
            img_id = int(batch["img_id"][i])
            dict_preds.setdefault(img_id, []).append(
                [int(batch["guidance"][i]), float(probs[i, int(batch["label"][i])])]
            )

    dict_best_guid = {}
    for img_id, pairs in dict_preds.items():
        if cfg.ma_progress and progress_ma is not None:
            progress_ma.setdefault(img_id, []).extend(pairs)
            merged = progress_ma[img_id]
            pairs = [
                [g, float(np.mean([p for gg, p in merged if gg == g]))]
                for g in {g for g, _ in merged}
            ]
        dict_best_guid[img_id] = sorted(pairs, key=lambda x: x[-1], reverse=True)[0][0]
    return dict_best_guid


def _avg_ood_acc(epoch_stats: dict) -> float:
    """Mean accuracy over eval sets, skipping the literal 'ImageNet Accuracy'
    ID key (`flyp_loss.py:604-616`)."""
    ood_acc, num = 0.0, 0
    for k, v in epoch_stats.items():
        if "Accuracy" in k and "Class" not in k and "Guidance" not in k:
            if k == "ImageNet Accuracy":
                continue
            ood_acc += v
            num += 1
    return ood_acc / num if num else 0.0


def _write_class_stats(epoch_stats: dict, eval_datasets, log_dir: str, epoch: int) -> None:
    """class_stats{epoch}.tsv with per-dataset accuracy/count columns
    (`flyp_loss.py:620-653`)."""
    ind = {k: i for i, k in enumerate(eval_datasets)}
    class_stats: dict = {}
    for k, v in epoch_stats.items():
        if " Class " not in k:
            continue
        ds_name, rest = k.split(" Class ", 1)
        row = None
        if "Accuracy" in rest:
            row, col = f"Class {rest.replace(' Accuracy', '')}", 2 * ind[ds_name]
        elif "Number" in rest:
            row, col = f"Class {rest.replace(' Number', '')}", 2 * ind[ds_name] + 1
        if row is not None:
            class_stats.setdefault(row, [0] * 2 * len(eval_datasets))[col] = v
    columns = []
    for name in eval_datasets:
        columns += [name, name + " Count"]
    pd.DataFrame.from_dict(class_stats, orient="index", columns=columns).to_csv(
        os.path.join(log_dir, f"class_stats{epoch}.tsv"), sep="\t"
    )


def _cont_finetune_classes(cfg, logger):
    """Class filter for ``--cont_finetune`` (`flyp_loss.py:294-304`): read a
    prior run's ``class_stats{n}.tsv`` and keep the classes whose OOD accuracy
    stayed at or below ``cont_acc_threshold`` despite at least
    ``cont_count_threshold`` examples; class 0 is always kept.  The prior
    checkpoint itself arrives via ``--clip_load`` (the reference hardcodes
    both paths; here they are flags)."""
    assert cfg.class_stats_path, "--cont_finetune needs --class_stats_path (a prior run's class_stats{n}.tsv)"
    df = pd.read_csv(cfg.class_stats_path, sep="\t", index_col=0)
    acc_col, count_col = cfg.cont_filter_key, f"{cfg.cont_filter_key} Count"
    picked = df[(df[acc_col] <= cfg.cont_acc_threshold) & (df[count_col] >= cfg.cont_count_threshold)]
    list_classes = [int(str(ix).replace("Class ", "")) for ix in picked.index]
    if 0 not in list_classes:
        list_classes.append(0)
    logger.info(f"Only continuing finetune ckpt based on {len(list_classes)} classes: {list_classes}")
    return list_classes


def _parse_checkpoint_name(d: str):
    """``checkpoint_{e}[_step_{i}]`` -> ``(ordering_key, kind)`` or None.

    The single home of the checkpoint-name grammar (resume scan and step
    pruning must agree on it): ``checkpoint_{e}`` means "epoch e completed"
    and orders as ``(e+1, -1)``; ``checkpoint_{e}_step_{i}`` means "epoch e,
    step i completed" and orders as ``(e, i)``.  Orbax tmp dirs
    (``*.orbax-checkpoint-tmp-*``) fail the isdigit guards."""
    if not d.startswith("checkpoint_"):
        return None
    e, sep, s = d[len("checkpoint_") :].partition("_step_")
    if not e.isdigit():
        return None
    if not sep:
        return (int(e) + 1, -1), "epoch"
    if s.isdigit():
        return (int(e), int(s)), "step"
    return None


def _latest_checkpoint(save_dir: str):
    """Find the newest checkpoint in ``save_dir``; ``(kind, path)`` or None."""
    best = None
    for d in os.listdir(save_dir):
        parsed = _parse_checkpoint_name(d)
        if parsed is None:
            continue
        key, kind = parsed
        if best is None or key > best[0]:
            best = (key, (kind, os.path.join(save_dir, d)))
    return best[1] if best else None


def _prune_step_checkpoints(save_dir: str, keep: int = 2) -> None:
    """Delete superseded step-checkpoint dirs, keeping the ``keep`` newest
    by ordering key.  Epoch checkpoints are never touched.  ``keep=2``
    pairs with async saves: the newest may still be committing, the one
    before it is the last known-committed fallback."""
    import shutil

    entries = []
    for d in os.listdir(save_dir):
        parsed = _parse_checkpoint_name(d)
        if parsed is not None and parsed[1] == "step":
            entries.append((parsed[0], os.path.join(save_dir, d)))
    for _, path in sorted(entries)[: max(0, len(entries) - keep)]:
        shutil.rmtree(path, ignore_errors=True)


def _global_host_state(tree):
    """Fetch a (possibly sharded) device pytree to host numpy on EVERY host.

    Single process: plain ``device_get``.  Multi-host: FSDP/TP shard state
    over axes that span processes, so ``device_get`` of a
    non-fully-addressable ``jax.Array`` raises — ``process_allgather``
    reassembles the global value instead.  This is a COLLECTIVE: all hosts
    must call it (do not gate it on ``is_primary``)."""
    if jax.process_count() == 1:
        return jax.device_get(tree)
    from jax.experimental import multihost_utils  # pragma: no cover - real slice only

    return multihost_utils.process_allgather(tree, tiled=True)  # pragma: no cover


def _host_variables(state):
    out = {"params": _global_host_state(state.params)}
    if state.batch_stats is not None:
        out["batch_stats"] = _global_host_state(state.batch_stats)
    return out


def flyp_train(cfg, logger=None, model=None, variables=None, print_every: int = 100):
    """Run FLYP fine-tuning; returns the last checkpoint path (if saving)."""
    log_dir = cfg.log_dir or os.path.join("expt_logs", cfg.exp_name or "flyp", cfg.run_key())
    os.makedirs(log_dir, exist_ok=True)
    logger = logger or get_logger(log_dir)
    # Single-writer rule: on multi-host runs every process computes identical
    # epoch stats (replicated eval) and the same state, so only process 0
    # writes TSVs/JSONL/pickles — concurrent writes to shared storage would
    # race.  Orbax checkpoint saves are the one exception: they are
    # collective (all processes call; orbax elects its own writer).
    from flyp_tpu.parallel.multihost import is_primary

    primary = is_primary()
    sink = MetricsSink(
        log_dir, enabled=not cfg.debug and primary, config=vars(cfg), name=cfg.exp_name, group=cfg.wandb_group_name
    )

    if model is None:
        model, variables = build_clip_model(cfg)
    image_size = model.config.vision.image_size

    mesh = create_mesh_for_batch(
        MeshConfig(cfg.mesh_data, cfg.mesh_model, replica=getattr(cfg, "mesh_replica", 1)),
        cfg.batch_size,
    )
    logger.info(f"Mesh: {mesh}")
    # Pin the input-sharding grid to THIS mesh's batch-shard->process map:
    # on TP meshes whose model axis spans processes, every process loads
    # the full batch (grid count < process_count) — see multihost.py.
    from flyp_tpu.parallel.multihost import configure_input_sharding

    configure_input_sharding(mesh)

    # cont_finetune: the prior run's checkpoint is restored via --clip_load
    # (in build_clip_model), and its per-class stats TSV drives a class
    # filter on the train loader (`flyp_loss.py:283-304`).
    list_classes = _cont_finetune_classes(cfg, logger) if cfg.cont_finetune else None

    guid = init_guidance_setting(cfg, logger, list_classes=list_classes)
    cur_guidance_id, cur_guidance = guid.cur_guidance_id, guid.cur_guidance
    list_guidance, loop_times = guid.list_guidance, guid.loop_times
    cur_str_times = 1

    ori_proportion = 0.1 if cfg.proportion else None

    if cfg.save_every_n_steps or cfg.max_steps:
        # Step checkpoints promise an EXACT resumed trajectory, which needs
        # a batch-level fast-forward of a seeded order: the threads/native
        # CSV loader skips for free (data/loader.py set_epoch(start_batch)),
        # Grain replays the consumed prefix once (grain_data.py set_epoch).
        # tf.data's shuffle buffer and webdataset's tar streams cannot
        # replay "the rest of pass p" exactly.
        from flyp_tpu.data.webdataset import is_webdataset as _is_wds

        if getattr(cfg, "data_backend", "threads") == "tfdata" or _is_wds(
            cfg.ft_data, cfg.dataset_type
        ):
            raise ValueError(
                "--save_every_n_steps/--max_steps need the threads/native/grain "
                "CSV backends (deterministic mid-epoch fast-forward); "
                f"data_backend={cfg.data_backend!r} or webdataset streams are unsupported"
            )
    import ml_dtypes

    from flyp_tpu.data.loader import prefetch_to_device

    image_dtype = ml_dtypes.bfloat16 if cfg.compute_dtype == "bfloat16" else None

    def load_train_loader(epoch, guidance, str_times, proportion, log_row=True):
        if guidance is not None and log_row:
            logger.info(f"loading image guidance = {guidance}, loop times {str_times}")
            sink.log({"Epoch": epoch, "Image Guidance": guidance})
        backend = getattr(cfg, "data_backend", "threads")
        from flyp_tpu.data.webdataset import WebDatasetLoader, is_webdataset

        if is_webdataset(cfg.ft_data, cfg.dataset_type):
            # LAION-style tar shards (dispatch parity with `laion.py:602-619`);
            # guidance/curriculum semantics are CSV-only, as upstream.
            from flyp_tpu.data.transforms import train_transform

            transform = train_transform(image_size)
            if backend == "native":
                from flyp_tpu.data import native_decode

                if native_decode.available():
                    transform = native_decode.native_train_transform(image_size)
            from flyp_tpu.parallel.multihost import input_shard_grid, local_batch_size

            grid_rank, grid_count = input_shard_grid()
            return WebDatasetLoader(
                cfg.ft_data,
                transform,
                local_batch_size(cfg.batch_size),
                num_samples=cfg.train_num_samples,
                seed=cfg.seed,
                num_workers=cfg.workers,
                process_index=grid_rank,
                process_count=grid_count,
            )
        if backend == "tfdata" and cfg.cluster != "loss":
            from flyp_tpu.data.tfdata import get_tfdata_csv_loader

            return get_tfdata_csv_loader(
                cfg, is_train=True, image_size=image_size, guidance=guidance,
                ori_proportion=proportion, list_selection=list_classes,
            )
        if backend == "grain":
            from flyp_tpu.data.grain_data import get_grain_csv_loader

            return get_grain_csv_loader(
                cfg, is_train=True, image_size=image_size, guidance=guidance,
                list_selection=list_classes, ori_proportion=proportion,
                return_img_id=(cfg.cluster == "loss"),
            )
        return get_csv_loader(
            cfg, is_train=True, image_size=image_size,
            guidance=guidance, list_selection=list_classes, ori_proportion=proportion,
            return_img_id=(cfg.cluster == "loss"),
        )

    def device_iter(loader):
        # Host->device prefetch: batches are cast (bf16 halves H2D bytes),
        # sharded over the data axis, and staged ahead of the step.
        return iter(prefetch_to_device(loader, mesh, size=2, image_dtype=image_dtype))

    # A pending auto-resume (scanned early so the epoch-0 loader below can be
    # built quietly): the resume paths rebuild the loader from the restored
    # cursor, so logging an "Image Guidance" row for THIS loader would write a
    # spurious pre-resume entry to the metrics stream.  The loader itself is
    # still built — num_batches (the scheduler horizon) must come from the
    # epoch-0 loader to match the uninterrupted run's LR trajectory exactly.
    resume_found = (
        _latest_checkpoint(cfg.save) if cfg.save is not None and os.path.isdir(cfg.save) else None
    )
    ft_loader = load_train_loader(
        0, cur_guidance, cur_str_times, ori_proportion, log_row=resume_found is None
    )
    num_batches = len(ft_loader)
    if cfg.curriculum:
        if cfg.curriculum_epoch is None:
            num_batches = (
                int(guid.len_data / cfg.batch_size) if guid.len_data is not None
                else num_batches * len(list_guidance)
            )
        else:
            num_batches = guid.num_batch_ori
    logger.info(f"Num batches is {num_batches}")

    schedule = make_scheduler(cfg.scheduler, cfg.lr, cfg.warmup_length, cfg.epochs, num_batches, cfg.min_lr)
    optimizer = make_optimizer(schedule, cfg.wd, cfg.adam_moment_dtype)
    state = create_train_state(variables["params"], optimizer, variables.get("batch_stats"))
    use_tp = cfg.mesh_model > 1

    def build_step(optimizer, placed_state=None):
        # TP and FSDP states carry their own shardings — pin the jit's state
        # in/out shardings to that EXACT placement (not the replicated mesh
        # default, which would silently undo ZeRO/TP).  Pinning the outputs
        # too keeps every step — fresh, post-drestart, or post-restore — on
        # ONE executable: with inferred out-shardings the state drifts to an
        # equivalently-sharded but differently-spelled placement, a restored
        # state then compiles a second executable, and its ULP-different
        # reduction order breaks bitwise resume (test_multiprocess.py).
        state_shardings = (
            jax.tree_util.tree_map(lambda x: x.sharding, placed_state)
            if placed_state is not None
            else None
        )
        return make_train_step(
            model, optimizer,
            mesh=mesh,
            log_grad_norm=cfg.log_grad_norm,
            freeze_encoder=cfg.freeze_encoder,
            grad_cache_chunks=cfg.grad_cache_chunks,
            state_shardings=state_shardings,
        )

    if use_tp:
        # Tensor-parallel over the model axis: params/moments carry Megatron
        # shardings; the jitted step runs TP x DP under those pins.
        from flyp_tpu.parallel.tp import shard_train_state

        # The fused-QKV Pallas kernel is GSPMD-partitionable (its
        # custom_partitioning rule keeps batch sharding and gathers the
        # model-axis feature shards), so TP runs keep the flagship kernel.
        state = shard_train_state(mesh, state)
        step_fn = build_step(optimizer, state)
    elif cfg.fsdp:
        # ZeRO-style: params + AdamW moments sharded over the data axis;
        # GSPMD inserts the gathers/reduce-scatters (SURVEY §2.7 optional).
        from flyp_tpu.parallel.fsdp import shard_train_state_fsdp

        state = shard_train_state_fsdp(mesh, state)
        step_fn = build_step(optimizer, state)
    else:
        state = replicate(mesh, state)
        step_fn = build_step(optimizer)

    explore_rng = np.random.default_rng(cfg.seed)
    stats = []
    last_perform: dict = {}
    loss_pairs: list = []
    resume_progress_ma: dict = {}  # mid-epoch resume restores the MA dict
    model_path = None
    start_epoch = 0

    # Auto-resume from the latest checkpoint in --save (the reference shipped
    # this commented out at `flyp_loss.py:318-333`; here it is real, and the
    # checkpoint carries optimizer state + curriculum cursor).  Step
    # checkpoints (--save_every_n_steps / --max_steps) additionally carry a
    # StepCursor and resume MID-epoch with an exact trajectory: same loader
    # pass, same remaining batches (seeded order fast-forward), same partial
    # epoch-loss sum.  Checkpoints additionally carry the trainer HOST state
    # (the reference persists only its curriculum cursor,
    # `flyp_loss.py:545-552`): progress's last_perform + exploration RNG
    # stream, `--cluster loss` loss_pairs, and `--ma_progress` moving
    # averages all round-trip, so resumed --progress runs reproduce the
    # uninterrupted run's guidance choices exactly.
    data_pass = 0
    batch_in_pass = 0
    cur_proportion = ori_proportion  # the active loader's ori_proportion
    resume_epoch_mid = -1  # epoch being resumed mid-way (-1: none)
    resume_step = 0  # first step index to run in that epoch
    resume_loss_sum = 0.0
    if resume_found is not None:
        from flyp_tpu.utils.checkpoint import restore_checkpoint

        kind, path = resume_found
        logger.info(f"Auto-resuming from {path}")
        host_state = _global_host_state(state)
        if kind == "step":
            host_state, cursor, mid_cursor, host_blob = restore_checkpoint(
                path, host_state, mid=True, host=True
            )
        else:
            host_state, cursor, host_blob = restore_checkpoint(path, host_state, host=True)
        if host_blob is not None:
            # Trainer host state round-trips: progress selection and loss
            # clustering continue exactly where the saved run stood.
            last_perform = host_blob["last_perform"]
            loss_pairs = [list(p) for p in host_blob["loss_pairs"]]
            explore_rng.bit_generator.state = host_blob["explore_rng"]
            resume_progress_ma = {int(k): v for k, v in host_blob["progress_ma"].items()}
        elif cfg.progress:
            # Pre-round-5 checkpoints carry no host state: the resumed run
            # re-baselines progress at zero and restarts the exploration
            # stream, so guidance choices may diverge.  Warn, don't refuse
            # (the reference has no resume at all).
            logger.warning(
                "auto-resume with --progress from a checkpoint without host "
                "state: last_perform and the exploration RNG restart; "
                "progress-driven guidance choices may diverge from an "
                "uninterrupted run"
            )
        if use_tp:
            from flyp_tpu.parallel.tp import shard_train_state

            state = shard_train_state(mesh, host_state)
        elif cfg.fsdp:
            from flyp_tpu.parallel.fsdp import shard_train_state_fsdp

            # Re-shard exactly as the fresh path did: a replicated
            # restore would silently drop ZeRO sharding (and OOM any
            # model that only fits sharded).
            state = shard_train_state_fsdp(mesh, host_state)
        else:
            state = replicate(mesh, host_state)
        cur_guidance = cursor.cur_guidance
        cur_str_times = cursor.cur_str_times
        cur_guidance_id = cursor.cur_guidance_id
        if kind == "step":
            start_epoch = cursor.epoch
            resume_epoch_mid = cursor.epoch
            resume_step = mid_cursor.step_in_epoch + 1
            resume_loss_sum = mid_cursor.id_flyp_loss_sum
            data_pass = mid_cursor.data_pass
            batch_in_pass = mid_cursor.batch_in_pass
            cur_proportion = None if mid_cursor.proportion < 0 else mid_cursor.proportion
            # Rebuild the loader the original run was mid-way through and
            # fast-forward past its consumed batches; the iterator then
            # yields exactly the stream the preempted run would have seen.
            # log_row=False: the interrupted run already logged this pass's
            # "Image Guidance" row to the shared metrics stream — re-logging
            # would duplicate it vs an uninterrupted run.
            ft_loader = load_train_loader(
                start_epoch, cur_guidance, cur_str_times, cur_proportion, log_row=False
            )
            ft_loader.set_epoch(data_pass, start_batch=batch_in_pass)
        else:
            start_epoch = cursor.epoch + 1
            if cfg.curriculum and cur_guidance is not None:
                ft_loader = load_train_loader(start_epoch, cur_guidance, cur_str_times, ori_proportion)
            elif cur_guidance is not None:
                # Fixed-guidance runs (--baseline / --guidance N) keep training
                # on the quietly-built epoch-0 loader — re-emit the guidance
                # row its build suppressed so the resumed metrics stream has
                # the same shape as an uninterrupted run's.
                logger.info(f"loading image guidance = {cur_guidance}, loop times {cur_str_times}")
                sink.log({"Epoch": start_epoch, "Image Guidance": cur_guidance})
        # stats.tsv is rewritten from the in-memory list at each epoch
        # end; reload the completed epochs' rows so a resumed run keeps
        # the cumulative file instead of silently dropping pre-resume
        # history (the production preemption setup reuses one log_dir).
        stats_path = os.path.join(log_dir, "stats.tsv")
        if os.path.isfile(stats_path):
            prev = pd.read_csv(stats_path, sep="\t", index_col=0)
            for _, row in prev.iterrows():
                if not row.get("Epoch", -1) < start_epoch:
                    continue
                r = row.dropna().to_dict()
                for k in ("Epoch", "epoch"):
                    # iterrows upcasts whole rows to float; epochs are ints.
                    if k in r:
                        r[k] = int(r[k])
                stats.append(r)

    drestart_done = False
    steps_this_run = 0
    # --profile_dir: XProf trace of a steady-state step window (skips the
    # compile/warmup steps); closed on EVERY exit path below.
    from flyp_tpu.utils.profiling import StepWindowTrace

    prof = StepWindowTrace(cfg.profile_dir, cfg.profile_start_step, cfg.profile_steps)
    ft_iterator = device_iter(ft_loader)

    try:
        for epoch in range(start_epoch, cfg.epochs):
            # curriculum_epoch rollover to guidance-100 training (`flyp_loss.py:390-406`).
            if cfg.curriculum_epoch is not None and epoch >= cfg.curriculum_epoch:
                if cfg.scheduler == "drestart" and not drestart_done:
                    # Swap only the LR schedule, keeping Adam moments and the
                    # global step — the reference rebuilds the stateless cosine
                    # closure but never touches optimizer state
                    # (`flyp_loss.py:390-395`).
                    drestart_done = True
                    logger.info("Restart scheduler")
                    # Horizon = epochs - curriculum_epoch.  The reference writes
                    # `epochs - start_epoch - curriculum_epoch`
                    # (`flyp_loss.py:393-394`) but its resume is disabled, so
                    # start_epoch is always 0 there; subtracting a real resume
                    # epoch here would shrink the horizon (to <= 0 for late
                    # resumes, oscillating the cosine every step) and make a
                    # resumed trajectory diverge from an uninterrupted one.
                    schedule_r = make_scheduler(
                        "default", cfg.lr, cfg.warmup_length,
                        max(cfg.epochs - cfg.curriculum_epoch, 1), num_batches, cfg.min_lr,
                    )
                    optimizer = make_optimizer(schedule_r, cfg.wd, cfg.adam_moment_dtype)
                    step_fn = build_step(
                        optimizer, state if (use_tp or cfg.fsdp) else None
                    )
                if cur_guidance != 0 and cur_guidance != 100:
                    logger.info("Restart dataloader")
                    cur_guidance = 100
                    cur_guidance_id = list_guidance.index(100)
                    cur_str_times = 1
                    ft_loader = load_train_loader(epoch, cur_guidance, cur_str_times, None)
                    # Keep the step-checkpoint bookkeeping consistent with the
                    # rollover path: this is a NEW pass (fresh shuffle stream,
                    # zero batches consumed, no ori-mixing) — a step checkpoint
                    # saved inside it must rebuild THIS loader state, not the
                    # pre-restart one.
                    cur_proportion = None
                    data_pass += 1
                    batch_in_pass = 0
                    ft_loader.set_epoch(data_pass)
                    ft_iterator = device_iter(ft_loader)

            logger.info(f"Epoch : {epoch}")
            epoch_stats = {"Epoch": epoch, "epoch": epoch}
            # The per-epoch moving-average dict: a mid-epoch resume re-enters
            # this epoch with the saved MA state; every other epoch starts
            # fresh (matching an uninterrupted run, which resets it here).
            progress_ma: dict = resume_progress_ma if epoch == resume_epoch_mid else {}
            # Mid-epoch resume re-enters this epoch at the saved step with the
            # saved partial loss sum, so stats.tsv matches an uninterrupted run.
            start_step = resume_step if epoch == resume_epoch_mid else 0
            id_flyp_loss_sum = resume_loss_sum if epoch == resume_epoch_mid else 0.0

            # One-step-lagged metrics drain: converting the loss to a host float
            # is the only per-step synchronization, and doing it immediately
            # after the dispatch leaves the device idle from step-end until the
            # host finishes the fetch + logging and enqueues the next step.
            # Holding step i's metrics until step i+1 has been dispatched keeps
            # one step always in flight (the fetch then overlaps device compute);
            # the torch reference pays the bubble via per-step `.item()`
            # (`flyp_loss.py:493-513`).  Costs: the non-finite-loss guard fires
            # one step late (one extra wasted step, same traceback quality), and
            # log lines trail dispatch by one step.
            lag = OneStepLag()  # holds (step_idx, device metrics, img_ids-for-clustering)

            def drain_metrics(pend):
                nonlocal id_flyp_loss_sum
                j, m, img_ids = pend
                # per_item_loss is BATCH-SHARDED (train_step metric shardings):
                # on multi-host a plain device_get of a non-fully-addressable
                # array raises, and only --cluster loss consumes it — fetch
                # the replicated scalars alone, and reassemble the per-item
                # vector collectively when clustering needs it.
                m = dict(m)
                per_item = m.pop("per_item_loss", None)
                if img_ids is not None and jax.process_count() == 1:
                    # Single host: the per-item vector rides the SAME transfer
                    # as the scalars — one host round trip per drained step.
                    m, per_item_host = jax.device_get((m, per_item))
                else:
                    per_item_host = None
                    m = jax.device_get(m)  # ONE host transfer for the scalars
                loss_val = float(m["loss"])
                if not np.isfinite(loss_val):
                    # Failure detection (SURVEY.md §5): surface divergence at the
                    # step it happens instead of training through NaNs.
                    raise FloatingPointError(
                        f"non-finite loss {loss_val} at epoch {epoch} step {j}; "
                        f"lr={float(m['learning_rate']):.3e}"
                    )
                id_flyp_loss_sum += loss_val
                if img_ids is not None:
                    if per_item_host is None:
                        # Multi-host: reassemble the batch-sharded vector
                        # collectively (a plain device_get raises on
                        # non-fully-addressable arrays).
                        per_item_host = _global_host_state(per_item)
                    loss_pairs.extend(
                        zip(np.asarray(img_ids).tolist(), np.asarray(per_item_host).tolist())
                    )
                record = {
                    "Epoch": epoch,
                    "ID FLYP Loss": loss_val,
                    "Learning Rate": float(m["learning_rate"]),
                }
                if "grad_norm" in m:
                    # --log_grad_norm: the wandb.watch(log="gradients") analog
                    # (`flyp_loss.py:341`), computed in-step at no extra cost.
                    record["Gradient Norm"] = float(m["grad_norm"])
                sink.log(record)
                if j % print_every == 0:
                    pct = 100 * j / num_batches
                    logger.info(f"Train Epoch: {epoch} [{pct:.0f}% {j}/{num_batches}]\tID FLYP Loss: {loss_val:.4f}")

            for i in range(start_step, num_batches):
                if cfg.test:
                    logger.info("Skipping training process")
                    break

                try:
                    batch = next(ft_iterator)
                    batch_in_pass += 1
                except StopIteration:
                    proportion = None
                    if cfg.curriculum:
                        if cfg.curriculum_epoch is not None and epoch > cfg.curriculum_epoch:
                            cur_guidance = 100
                            cur_guidance_id = list_guidance.index(100)
                            cur_str_times = 1
                        else:
                            if not cfg.progress:
                                if cfg.curriculum_epoch is None:
                                    cur_guidance_id, cur_guidance = seq_curri_guid(
                                        list_guidance, cur_guidance_id=cur_guidance_id, ctype="no_curri"
                                    )
                                else:
                                    cur_guidance_id, cur_guidance, cur_str_times = seq_curri_guid(
                                        list_guidance,
                                        cur_guidance_id=cur_guidance_id,
                                        cur_str_times=cur_str_times,
                                        ctype="in_curri",
                                        loop_times=loop_times,
                                    )
                            else:
                                res_progress, _, last_perform, _ = progress_eval(
                                    cfg, model, _host_variables(state), last_perform, epoch, logger
                                )
                                cur_guidance_id, cur_guidance = choose_guidance_by_progress(
                                    res_progress, list_guidance, cfg.explore, explore_rng
                                )
                                cur_str_times = 0
                            if cfg.proportion and cfg.curriculum_epoch:
                                proportion = 1 / cfg.curriculum_epoch * epoch
                        ft_loader = load_train_loader(epoch, cur_guidance, cur_str_times, proportion)
                        cur_proportion = proportion
                    # Advance the shuffle stream on every pass (torch reshuffles
                    # implicitly per DataLoader iteration; ours is explicit).
                    data_pass += 1
                    ft_loader.set_epoch(data_pass)
                    ft_iterator = device_iter(ft_loader)
                    try:
                        batch = next(ft_iterator)
                    except StopIteration:
                        # A bare StopIteration raised inside this except
                        # block would escape flyp_train uncaught.
                        raise RuntimeError(
                            f"train loader for guidance {cur_guidance} produced no "
                            f"batches (fewer than batch_size={cfg.batch_size} rows "
                            "after guidance/class filtering?)"
                        ) from None
                    batch_in_pass = 1

                prof.step(steps_this_run)
                state, metrics = step_fn(state, batch["image"], batch["tokens"])

                prev = lag.push(
                    # img_id rides the batch sharding: reassemble collectively
                    # on multi-host (np.asarray of a cross-process array raises).
                    (i, metrics, _global_host_state(batch["img_id"]) if cfg.cluster == "loss" else None)
                )
                if prev is not None:
                    drain_metrics(prev)  # step i is in flight; fetch of i-1 overlaps it

                # -- preemption safety: step checkpoints + clean step-budget exit.
                steps_this_run += 1
                hit_budget = bool(cfg.max_steps) and steps_this_run >= cfg.max_steps
                periodic = (
                    cfg.save is not None  # without a save dir the sync would buy nothing
                    and cfg.save_every_n_steps
                    and (i + 1) % cfg.save_every_n_steps == 0
                    and i + 1 < num_batches  # the epoch checkpoint follows anyway
                )
                if hit_budget or periodic:
                    pend = lag.flush()  # fold step i's loss into the saved sum
                    if pend is not None:
                        drain_metrics(pend)
                    if cfg.save is not None:
                        step_path = os.path.join(cfg.save, f"checkpoint_{epoch}_step_{i}")
                        # Collective fetch AND collective save on ALL hosts:
                        # orbax's save path barrier-syncs every JAX process (a
                        # primary-only call deadlocks the primary — executed
                        # proof in test_multiprocess.py); orbax itself writes
                        # from exactly one host.
                        ckpt_state = _global_host_state(state)
                        os.makedirs(cfg.save, exist_ok=True)
                        save_checkpoint(
                            step_path,
                            ckpt_state,
                            CurriculumCursor(epoch, cur_guidance, cur_str_times, cur_guidance_id),
                            async_save=True,
                            mid=StepCursor(
                                i,
                                data_pass,
                                batch_in_pass,
                                id_flyp_loss_sum,
                                -1.0 if cur_proportion is None else float(cur_proportion),
                            ),
                            host={
                                "last_perform": last_perform,
                                "explore_rng": explore_rng.bit_generator.state,
                                "loss_pairs": loss_pairs,
                                "progress_ma": {str(k): v for k, v in progress_ma.items()},
                            },
                        )
                        if primary:
                            logger.info("Saving step checkpoint to " + step_path)
                            # Superseded step checkpoints (full params+moments
                            # payloads) would grow disk without bound on a long
                            # preemptible run.  AsyncCheckpointer.save blocks on
                            # the PREVIOUS commit, so keeping the 2 newest keys
                            # always preserves one fully-committed fallback even
                            # if the just-requested write never lands.
                            _prune_step_checkpoints(cfg.save, keep=2)
                        model_path = step_path
                if hit_budget:
                    logger.info(f"max_steps={cfg.max_steps} reached at epoch {epoch} step {i}; exiting")
                    sink.close()
                    wait_for_saves()
                    return model_path

                if cfg.ma_progress and (num_batches - i) % 100 == 0:
                    # Moving-average progress sampling every 100 batches
                    # (`flyp_loss.py:531-539`).
                    logger.info(f"Running progress evaluation for moving average with i={i}")
                    _, _, _, cur_stats = progress_eval(cfg, model, _host_variables(state), last_perform, epoch, logger)
                    for guid, value in cur_stats.items():
                        progress_ma.setdefault(guid, []).append(value)

            prev = lag.flush()
            if prev is not None:
                drain_metrics(prev)  # flush the last step's lagged metrics

            id_flyp_loss_avg = id_flyp_loss_sum / max(num_batches, 1)
            host_variables = _host_variables(state)

            # -- checkpoint (`flyp_loss.py:545-552`) ------------------------------
            if cfg.save is not None and not cfg.ma_progress:
                model_path = os.path.join(cfg.save, f"checkpoint_{epoch}")
                # Collective fetch AND collective save on ALL hosts (sharded
                # state spans processes under FSDP/TP, and orbax's save
                # barrier-syncs every process — a primary-only call deadlocks);
                # orbax writes from exactly one host.
                ckpt_state = _global_host_state(state)
                os.makedirs(cfg.save, exist_ok=True)
                cursor = CurriculumCursor(epoch, cur_guidance, cur_str_times, cur_guidance_id)
                # Async: the commit overlaps the eval suites below; both
                # return sites wait_for_saves() so nothing outlives the run.
                # Host-state snapshot semantics: in-epoch --progress
                # choices update last_perform at pass ends, all BEFORE this
                # save, so epoch-resumed progress selection is exact.  The
                # --progress_eval per-epoch dump runs AFTER this save
                # (reference artifact order, `flyp_loss.py:545-597`), so an
                # epoch-resume re-baselines that one dump's deltas — a
                # logging-only divergence, documented in PARITY div. 17.
                save_checkpoint(
                    model_path, ckpt_state, cursor, async_save=True,
                    host={
                        "last_perform": last_perform,
                        "explore_rng": explore_rng.bit_generator.state,
                        "loss_pairs": loss_pairs,
                        "progress_ma": {str(k): v for k, v in progress_ma.items()},
                    },
                )
                if primary:
                    logger.info("Saving model to " + str(model_path))
                    # The epoch checkpoint supersedes this epoch's step saves;
                    # keep 1 as the committed fallback while this write lands.
                    _prune_step_checkpoints(cfg.save, keep=1)

            # -- per-image best-guidance scan (`flyp_loss.py:556-578`) ------------
            if cfg.progress_train:
                logger.info("Progress evaluation on training data ...")
                dict_best_guid = progress_eval_train(cfg, model, host_variables, epoch, logger, progress_ma)
                dict_best_guid["Epoch"] = epoch
                if primary:
                    with open(os.path.join(log_dir, f"best_guid{epoch}.pkl"), "wb") as f:
                        pickle.dump(dict_best_guid, f)
                if cfg.cluster == "loss" and primary:
                    from sklearn.cluster import KMeans

                    arr = np.array([p[-1] for p in loss_pairs]).reshape(-1, 1)
                    km = KMeans(n_clusters=7, random_state=0, n_init=10).fit(arr)
                    new_pairs = [[p[0], p[1], int(l)] for p, l in zip(loss_pairs, km.labels_)]
                    with open(os.path.join(log_dir, f"group_guid{epoch}.pkl"), "wb") as f:
                        pickle.dump(new_pairs, f)
                wait_for_saves()
                return model_path  # upstream exits here (`flyp_loss.py:579`)

            # -- per-guidance progress dump (`flyp_loss.py:582-597`) --------------
            if cfg.progress_eval:
                logger.info("Progress evaluation ...")
                _, str_progress, last_perform, _ = progress_eval(
                    cfg, model, host_variables, last_perform, epoch, logger, progress_ma
                )
                str_progress["Epoch"] = epoch
                if primary:
                    pd.DataFrame.from_dict(str_progress, orient="index").to_csv(
                        os.path.join(log_dir, f"progress{epoch}.tsv"), sep="\t"
                    )
                    with open(os.path.join(log_dir, f"progress{epoch}.pkl"), "wb") as f:
                        pickle.dump([last_perform, progress_ma], f)

            # -- formal eval (`flyp_loss.py:600-668`) -----------------------------
            if cfg.eval_datasets:
                logger.info("Formal evaluation ...")
                head = build_zeroshot_head(cfg, model, host_variables)
                clf = Classifier(model, host_variables, head, batch_size=cfg.batch_size)
                evaluate(clf, cfg, epoch_stats, logger)
            else:
                # Pure contrastive pretraining (e.g. LAION tar shards) has no
                # class list to build a zero-shot head from.
                logger.info("No eval datasets; skipping zero-shot evaluation")

            ood_acc = _avg_ood_acc(epoch_stats)
            if cfg.eval_datasets and primary:
                _write_class_stats(epoch_stats, cfg.eval_datasets, log_dir, epoch)

            epoch_stats["Avg OOD Acc"] = round(ood_acc, 4)
            logger.info(f"Avg OOD Acc : {ood_acc:.4f}")
            logger.info(f"Avg ID FLYP Loss : {id_flyp_loss_avg:.4f}")
            epoch_stats["Avg ID FLYP Loss"] = round(id_flyp_loss_avg, 4)
            epoch_stats = {k: v for k, v in epoch_stats.items() if " Class" not in k}
            stats.append(epoch_stats)
            if primary:
                pd.DataFrame(stats).to_csv(os.path.join(log_dir, "stats.tsv"), sep="\t")
            sink.log(epoch_stats)

    finally:
        # The trace must flush even when the loop raises (non-finite-loss
        # guard, loader errors, a SIGINT during preemption) or returns
        # early -- a leaked active trace would also poison the next
        # flyp_train in this process ('trace already started').
        prof.close()
    sink.close()
    wait_for_saves()
    return model_path
