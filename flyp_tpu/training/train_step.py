"""The jitted FLYP train step: forward both towers, global-batch contrastive
loss, AdamW update — one XLA program over the device mesh.

Sharding contract (GSPMD path, SURVEY.md §2.7): the batch arrays are sharded
over the mesh's ``data`` axis, params/opt-state replicated.  The loss is
written as global math, so XLA inserts the feature all-gather over ICI and
gradients flow to both towers on every shard — the train step *is* the
distributed program; there is no separate "distributed mode".

Matches the reference's update semantics (`/root/reference/src/models/
flyp_loss.py:493-511`): per-item loss -> mean -> backward -> AdamW step ->
scheduler step (folded into the injected schedule).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

from flyp_tpu.models.clip import CLIPModel
from flyp_tpu.ops.losses import clip_loss
from flyp_tpu.parallel.mesh import batch_sharding, replicated_sharding
from flyp_tpu.training.train_state import TrainState


def zero_visual(tree):
    """Zero the image-tower subtree, leave text/logit_scale intact."""
    return {k: (jax.tree_util.tree_map(jnp.zeros_like, v) if k == "visual" else v) for k, v in tree.items()}


def apply_gradients(
    state: TrainState,
    grads,
    optimizer,
    new_stats,
    *,
    freeze_encoder: bool,
    loss,
    per_item,
    log_grad_norm: bool,
):
    """The shared update tail (direct and GradCache steps): freeze-encoder
    masking, optimizer update, next :class:`TrainState`, standard metrics.

    ``freeze_encoder`` implements the reference's ``--freeze-encoder`` flag
    (`src/args.py:119-123`): the image tower trains no further.  The
    reference optimizer already filters to ``requires_grad`` params
    (`flyp_loss.py:368-371` — frozen params get NO Adam update and NO
    weight decay), so the equivalent here zeroes both the visual-tower
    gradients (keeping its Adam moments at exactly 0) and its final
    updates (discarding the decoupled weight-decay term).
    """
    if freeze_encoder:
        grads = zero_visual(grads)
    updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
    if freeze_encoder:
        updates = zero_visual(updates)
    params = optax.apply_updates(state.params, updates)
    new_state = TrainState(
        step=state.step + 1,
        params=params,
        opt_state=opt_state,
        batch_stats=new_stats,
    )
    metrics = {
        "loss": loss,
        "per_item_loss": per_item,
        "learning_rate": opt_state.hyperparams["learning_rate"],
    }
    if log_grad_norm:
        metrics["grad_norm"] = optax.global_norm(grads)
    return new_state, metrics


def jit_train_step(
    train_step: Callable,
    mesh,
    *,
    use_ground_labels: bool,
    donate: bool,
    log_grad_norm: bool,
    state_shardings=None,
) -> Callable:
    """The shared jit/sharding scaffold (direct and GradCache steps).

    With a mesh: state/metrics replicated, batch args sharded over the data
    axes; the unlabelled contrastive path keeps its per-item losses
    batch-sharded (the curriculum clustering consumes them host-side), the
    labelled supervised variants reduce to replicated scalars.

    ``state_shardings`` (a TrainState-shaped tree of NamedShardings, from a
    TP/FSDP-placed state) replaces the replicated default for the state
    argument AND output.  Pinning BOTH matters for exact resume: with
    inferred shardings, the step's outputs can drift to equivalent-but-
    differently-spelled placements, so a restored state (placed by
    shard_train_state*) compiles a SECOND executable whose reduction order
    differs at the ULP level — a resumed FSDP run then diverges ~1e-9/step
    from the uninterrupted one (caught by test_multiprocess.py's real
    2-process FSDP resume).  One pinned spelling -> one executable ->
    bitwise resume.
    """
    donate_args = (0,) if donate else ()
    if not use_ground_labels:
        # Fix the arity so jit sharding specs line up with the actual args.
        unlabelled = lambda state, images, tokens: train_step(state, images, tokens, None)
        if mesh is None:
            return jax.jit(unlabelled, donate_argnums=donate_args)
        repl = replicated_sharding(mesh)
        state_sh = repl if state_shardings is None else state_shardings
        batch = batch_sharding(mesh)
        metric_shardings = {"loss": repl, "per_item_loss": batch, "learning_rate": repl}
        if log_grad_norm:
            metric_shardings["grad_norm"] = repl
        return jax.jit(
            unlabelled,
            in_shardings=(state_sh, batch, batch),
            out_shardings=(state_sh, metric_shardings),
            donate_argnums=donate_args,
        )

    if mesh is None:
        return jax.jit(train_step, donate_argnums=donate_args)

    repl = replicated_sharding(mesh)
    state_sh = repl if state_shardings is None else state_shardings
    batch = batch_sharding(mesh)
    metric_shardings = {"loss": repl, "per_item_loss": repl, "learning_rate": repl}
    if log_grad_norm:
        metric_shardings["grad_norm"] = repl
    return jax.jit(
        train_step,
        in_shardings=(state_sh, batch, batch, batch),
        out_shardings=(state_sh, metric_shardings),
        donate_argnums=donate_args,
    )


def make_train_step(
    model: CLIPModel,
    optimizer: optax.GradientTransformation,
    mesh=None,
    *,
    ignore: bool = False,
    google_sup_loss: bool = False,
    use_ground_labels: bool = False,
    donate: bool = True,
    log_grad_norm: bool = False,
    freeze_encoder: bool = False,
    grad_cache_chunks: int = 1,
    state_shardings=None,
) -> Callable:
    """Build the compiled train step.

    Returns ``step_fn(state, images, tokens[, ground_labels]) ->
    (state, metrics)`` where metrics carries the mean loss, the per-item
    losses (curriculum clustering consumes them, `flyp_loss.py:502-506`) and
    the current learning rate.

    ``freeze_encoder``: see :func:`apply_gradients`.

    ``log_grad_norm`` adds the global gradient L2 norm to the metrics —
    the TPU-native stand-in for the reference's
    ``wandb.watch(model, log="gradients")`` (`flyp_loss.py:341`; per-param
    histograms need module hooks torch-style, but the global norm is the
    metric people actually alert on).  It fuses into the update's existing
    elementwise pass, so the step cost is unchanged.

    ``grad_cache_chunks > 1`` routes to the chunked (GradCache) step: the
    exact same big-batch contrastive objective computed through M
    microbatch-sized forward/backward passes, for effective batches that do
    not fit directly (see :mod:`flyp_tpu.training.grad_cache`).
    """
    if grad_cache_chunks < 1:
        raise ValueError(f"grad_cache_chunks must be >= 1, got {grad_cache_chunks}")
    if grad_cache_chunks > 1:
        from flyp_tpu.training.grad_cache import make_chunked_train_step

        return make_chunked_train_step(
            model, optimizer, mesh,
            chunks=grad_cache_chunks,
            ignore=ignore, google_sup_loss=google_sup_loss,
            use_ground_labels=use_ground_labels, donate=donate,
            log_grad_norm=log_grad_norm, freeze_encoder=freeze_encoder,
            state_shardings=state_shardings,
        )

    def train_step(state: TrainState, images, tokens, ground_labels=None):
        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats is not None:
                variables["batch_stats"] = state.batch_stats
                (img_f, txt_f, scale), updated = model.apply(
                    variables, images, tokens, train=True, mutable=["batch_stats"]
                )
                new_stats = updated["batch_stats"]
            else:
                # train=True selects the residual-saving kernel forward
                # (backward needs qkv/o); eval paths use the lighter one.
                img_f, txt_f, scale = model.apply(variables, images, tokens, train=True)
                new_stats = None
            per_item = clip_loss(
                img_f,
                txt_f,
                scale,
                ground_labels if use_ground_labels else None,
                ignore=ignore,
                google_sup_loss=google_sup_loss,
            )
            loss = jnp.mean(per_item)
            return loss, (per_item, new_stats)

        (loss, (per_item, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        return apply_gradients(
            state, grads, optimizer, new_stats,
            freeze_encoder=freeze_encoder, loss=loss, per_item=per_item,
            log_grad_norm=log_grad_norm,
        )

    return jit_train_step(
        train_step, mesh,
        use_ground_labels=use_ground_labels, donate=donate, log_grad_norm=log_grad_norm,
        state_shardings=state_shardings,
    )
