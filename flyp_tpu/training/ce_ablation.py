"""Cross-entropy ablation: classify with a language-derived head sampled
fresh each step (`/root/reference/src/models/ce_ablation.py`).

All |classes| x |templates| prompts are tokenized up front; each step samples
one template per class, encodes the C class texts and the image batch, and
takes CE over ``scale * img_f @ txt_f.T`` against the integer labels.  The
upstream file has a latent NameError (`ce_ablation.py:32` uses an unimported
``templates`` registry); the behavior implemented is the evident intent.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from flyp_tpu.data.registry import get_classnames_for, get_dataset_class
from flyp_tpu.data.transforms import train_transform
from flyp_tpu.evaluation.classifier import Classifier
from flyp_tpu.evaluation.evaluator import evaluate
from flyp_tpu.models.clip import l2_normalize
from flyp_tpu.models.factory import build_clip_model
from flyp_tpu.parallel.mesh import MeshConfig, batch_sharding, create_mesh_for_batch, replicate, replicated_sharding
from flyp_tpu.templates import get_template
from flyp_tpu.tokenizer import tokenize
from flyp_tpu.training.flyp import _avg_ood_acc, build_zeroshot_head
from flyp_tpu.training.schedules import make_scheduler
from flyp_tpu.utils.pipeline import OneStepLag
from flyp_tpu.training.train_state import TrainState, create_train_state, make_optimizer
from flyp_tpu.utils.checkpoint import save_checkpoint
from flyp_tpu.utils.metrics_sink import MetricsSink


def make_ce_train_step(model, optimizer, mesh=None, label_smoothing: float = 0.0):
    def train_step(state: TrainState, images, labels, class_texts):
        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats is not None:
                # ResNet towers: torch train-mode BatchNorm (batch statistics
                # in the forward, running-stat updates carried in the state) —
                # the same threading as the FLYP train step.
                variables["batch_stats"] = state.batch_stats
                img_f, updated = model.apply(
                    variables, images, method="encode_image", train=True, mutable=["batch_stats"]
                )
                new_stats = updated["batch_stats"]
            else:
                img_f = model.apply(variables, images, method="encode_image")
                new_stats = None
            img_f = l2_normalize(img_f)
            txt_f = l2_normalize(model.apply(variables, class_texts, method="encode_text"))
            scale = jnp.exp(params["logit_scale"])
            logits = (scale * img_f @ txt_f.T).astype(jnp.float32)
            num_classes = logits.shape[-1]
            onehot = jax.nn.one_hot(labels, num_classes)
            if label_smoothing > 0:
                onehot = onehot * (1 - label_smoothing) + label_smoothing / num_classes
            loss = -jnp.mean(jnp.sum(onehot * jax.nn.log_softmax(logits, axis=-1), axis=-1))
            return loss, new_stats

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        import optax

        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(state.step + 1, params, opt_state, new_stats)
        return new_state, {"loss": loss, "learning_rate": opt_state.hyperparams["learning_rate"]}

    if mesh is None:
        return jax.jit(train_step, donate_argnums=(0,))
    repl, batch = replicated_sharding(mesh), batch_sharding(mesh)
    return jax.jit(
        train_step,
        in_shardings=(repl, batch, batch, repl),
        out_shardings=(repl, {"loss": repl, "learning_rate": repl}),
        donate_argnums=(0,),
    )


def ce_ablation(cfg, logger, model=None, variables=None, print_every: int = 100):
    log_dir = cfg.log_dir or os.path.join("expt_logs", cfg.exp_name or "ce", cfg.run_key())
    os.makedirs(log_dir, exist_ok=True)
    from flyp_tpu.parallel.multihost import is_primary as _is_primary

    sink = MetricsSink(log_dir, enabled=not cfg.debug and _is_primary())

    if model is None:
        model, variables = build_clip_model(cfg)
    image_size = model.config.vision.image_size

    template = get_template(cfg.template)
    classnames = get_classnames_for(cfg.train_dataset, cfg)

    # Pre-tokenize all classes x templates -> [C, T, 77] (`ce_ablation.py:63-76`),
    # then shrink the context ONCE over the whole prompt pool (exact: causal
    # tower + EOT pooling) so every step's sampled [C, ctx] batch keeps one
    # static compiled shape.
    from flyp_tpu.tokenizer import shrink_context

    all_texts = np.stack([tokenize([t(c) for t in template]) for c in classnames])
    assert all_texts.shape[0] == len(classnames) and all_texts.shape[2] == 77
    C, T, ctx = all_texts.shape
    all_texts = shrink_context(all_texts.reshape(C * T, ctx)).reshape(C, T, -1)

    # cfg.batch_size is the GLOBAL batch: each process's train loader yields
    # its slice (the loader shards rows by process), assembled below via
    # global_batch_from_local — the same contract as the FLYP trainer.
    from flyp_tpu.parallel.multihost import (
        configure_input_sharding,
        global_batch_from_local,
        is_primary,
        local_batch_size,
    )

    # Mesh first: local_batch_size and the loader's process sharding read
    # the mesh-derived input grid configure_input_sharding pins (on TP
    # meshes whose model axis spans processes, every process loads the
    # full batch — see flyp.py / multihost.py).
    mesh = create_mesh_for_batch(MeshConfig(cfg.mesh_data, cfg.mesh_model), cfg.batch_size)
    configure_input_sharding(mesh)

    local_bs = local_batch_size(cfg.batch_size)
    dataset = get_dataset_class(cfg.train_dataset)(
        preprocess=train_transform(image_size), location=cfg.data_location,
        batch_size=local_bs, num_workers=cfg.workers,
    )
    train_loader = dataset.train_loader
    num_batches = len(train_loader)
    primary = is_primary()

    schedule = make_scheduler(cfg.scheduler, cfg.lr, cfg.warmup_length, cfg.epochs, num_batches, cfg.min_lr)
    optimizer = make_optimizer(schedule, cfg.wd, cfg.adam_moment_dtype)
    state = replicate(mesh, create_train_state(variables["params"], optimizer, variables.get("batch_stats")))
    step_fn = make_ce_train_step(model, optimizer, mesh=mesh, label_smoothing=cfg.ls)

    rng = np.random.default_rng(cfg.seed)
    stats = []
    model_path = None
    for epoch in range(cfg.epochs):
        logger.info(f"Epoch : {epoch}")
        epoch_stats = {"epoch": epoch}
        id_ce_loss_sum = 0.0
        train_loader.set_epoch(epoch)

        # One-step-lagged metrics drain (same rationale as the FLYP trainer:
        # the scalar fetch is the only per-step host sync; lagging it one
        # step keeps the device busy while the host logs).
        lag = OneStepLag()

        def drain_metrics(pend):
            nonlocal id_ce_loss_sum
            j, m = pend
            m = jax.device_get(m)
            loss_val = float(m["loss"])
            id_ce_loss_sum += loss_val
            sink.log({"Epoch": epoch, "ID CE Loss": loss_val, "Learning Rate": float(m["learning_rate"])})
            if j % print_every == 0:
                logger.info(
                    f"Train Epoch: {epoch} [{100 * j / num_batches:.0f}% {j}/{num_batches}]\t"
                    f"ID FLYP Loss: {loss_val:.4f}"
                )

        for i, batch in enumerate(train_loader):
            if cfg.test:
                break
            # One template per class per step (`ce_ablation.py:104-111`).
            s = rng.integers(0, all_texts.shape[1], size=all_texts.shape[0])
            current_texts = all_texts[np.arange(all_texts.shape[0]), s]

            n = batch["image"].shape[0]
            if n != local_bs:
                continue  # static shapes on TPU; ragged tail dropped
            assembled = global_batch_from_local(
                mesh,
                {"image": np.asarray(batch["image"]), "label": np.asarray(batch["label"], np.int32)},
            )
            state, metrics = step_fn(state, assembled["image"], assembled["label"], jnp.asarray(current_texts))
            prev = lag.push((i, metrics))
            if prev is not None:
                drain_metrics(prev)

        prev = lag.flush()
        if prev is not None:
            drain_metrics(prev)

        id_ce_loss_avg = id_ce_loss_sum / max(num_batches, 1)
        host_vars = {"params": jax.device_get(state.params)}
        if state.batch_stats is not None:
            host_vars["batch_stats"] = jax.device_get(state.batch_stats)

        head = build_zeroshot_head(cfg, model, host_vars)
        clf = Classifier(model, host_vars, head, batch_size=cfg.batch_size)
        evaluate(clf, cfg, epoch_stats, logger)

        if cfg.save is not None:
            model_path = os.path.join(cfg.save, f"checkpoint_{epoch}")
            # Collective: orbax barrier-syncs every process inside save (a
            # primary-only call deadlocks — see flyp.py / test_multiprocess).
            os.makedirs(cfg.save, exist_ok=True)
            save_checkpoint(model_path, jax.device_get(state))
            if primary:
                logger.info("Saving model to " + str(model_path))

        ood_acc = _avg_ood_acc(epoch_stats)
        epoch_stats["Avg OOD Acc"] = round(ood_acc, 4)
        logger.info(f"Avg OOD Acc : {ood_acc:.4f}")
        epoch_stats["Avg ID FLYP Loss"] = round(id_ce_loss_avg, 4)
        stats.append({k: v for k, v in epoch_stats.items() if " Class" not in k})
        if primary:
            pd.DataFrame(stats).to_csv(os.path.join(log_dir, "stats.tsv"), sep="\t")

    sink.close()
    return model_path
