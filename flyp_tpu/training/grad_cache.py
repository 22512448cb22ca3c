"""Chunked contrastive train step: exact large-batch InfoNCE under a
microbatch-sized activation footprint (GradCache; Gao et al. 2021,
arXiv:2101.06983).

The reference can only grow the contrastive batch by adding GPUs
(`/root/reference/src/models/flyp_loss.py:335-336` wraps the model in
``nn.DataParallel``; the loss itself is the full ``B x B`` logit matrix of
`/root/reference/clip/loss.py:192-211`).  Plain gradient accumulation does
NOT reproduce a big contrastive batch — the InfoNCE logit matrix couples
every pair, so the mean of two 256-batch losses is a *different objective*
than one 512-batch loss.  This module gets the exact big-batch objective on
a fixed memory budget by exploiting the loss's bottleneck structure: the
towers meet only through the ``[B, D]`` feature matrices.

Three phases, one jitted program:

1. **Feature pass** — ``lax.scan`` over M microbatches; each forward's
   activations are freed when its scan iteration ends, so peak activation
   memory is one microbatch.  Only the ``[B, D]`` features survive.
2. **Loss pass** — ``value_and_grad`` of :func:`flyp_tpu.ops.losses.clip_loss`
   with respect to the gathered features and the logit scale.  The full
   ``B x B`` matrix exists here, but it is tiny next to tower activations.
3. **Gradient pass** — a second scan; each microbatch's forward is re-run
   under ``jax.vjp`` and pulled back with its slice of the feature
   cotangents (the scale cotangent is split 1/M per chunk so the chunk
   contributions sum exactly).  Parameter gradients accumulate in the scan
   carry.

Cost: the forward runs twice (once feature-only, once inside the vjp), so a
chunked step spends ~4/3 the FLOPs of a direct step.  Use it only when the
direct batch does not fit — e.g. ViT-L/14 at the paper's ImageNet batch of
512 on a single 16 GB chip (`README.md:34` recipe): measured on a v5e, the
direct bs512(+remat) program never even returns from the compiler, while
8x64 chunks run 2.59 s/step = 197.5 img/s — 81% of the direct bs64 step
rate (tools/grad_cache_bench.py; docs/BENCHMARKS.md).  On a mesh the
microbatches stay batch-sharded over the data axes, so the same step
scales the effective batch past per-chip HBM on any slice.

Semantics notes:

* The update is bit-for-bit the same *objective* as the direct step; the
  gradients agree to float tolerance (``tests/test_grad_cache.py`` asserts
  parity against :func:`make_train_step` for every loss variant).
* BatchNorm towers (RN50 family): batch statistics are computed per
  microbatch, exactly like the reference's per-GPU ``nn.DataParallel`` BN
  (`flyp_loss.py:335-336` — torch BN normalizes per replica).  Running
  stats chain across the microbatches within the step.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

from flyp_tpu.models.clip import CLIPModel
from flyp_tpu.ops.losses import clip_loss
from flyp_tpu.parallel.mesh import batch_axes
from flyp_tpu.training.train_state import TrainState
from flyp_tpu.training.train_step import apply_gradients, jit_train_step
from jax.sharding import NamedSharding, PartitionSpec as P


def make_chunked_train_step(
    model: CLIPModel,
    optimizer: optax.GradientTransformation,
    mesh=None,
    *,
    chunks: int,
    ignore: bool = False,
    google_sup_loss: bool = False,
    use_ground_labels: bool = False,
    donate: bool = True,
    log_grad_norm: bool = False,
    freeze_encoder: bool = False,
    state_shardings=None,
) -> Callable:
    """Build a chunked train step with :func:`make_train_step`'s interface.

    ``step_fn(state, images, tokens[, ground_labels]) -> (state, metrics)``;
    the batch dimension must divide evenly by ``chunks``.  Metrics carry the
    same keys as the direct step (mean loss, per-item losses, learning rate,
    optional grad norm) so the trainers consume either interchangeably.
    """
    if chunks < 1:
        raise ValueError(f"chunks must be >= 1, got {chunks}")

    def _split(x):
        b = x.shape[0]
        chunked = x.reshape((chunks, b // chunks) + x.shape[1:])
        if mesh is not None:
            spec = P(None, batch_axes(mesh), *([None] * (x.ndim - 1)))
            chunked = jax.lax.with_sharding_constraint(chunked, NamedSharding(mesh, spec))
        return chunked

    def train_step(state: TrainState, images, tokens, ground_labels=None):
        b = images.shape[0]
        if b % chunks:
            raise ValueError(f"batch {b} is not divisible by {chunks} grad-cache chunks")
        has_bn = state.batch_stats is not None

        imgs, toks = _split(images), _split(tokens)

        def forward(params, stats, im, tk):
            """One microbatch forward -> (img_f, txt_f, scale, new_stats)."""
            variables = {"params": params}
            if has_bn:
                variables["batch_stats"] = stats
                (f_i, f_t, scale), updated = model.apply(
                    variables, im, tk, train=True, mutable=["batch_stats"]
                )
                return f_i, f_t, scale, updated["batch_stats"]
            f_i, f_t, scale = model.apply(variables, im, tk, train=True)
            return f_i, f_t, scale, None

        # Phase 1: features only.  Activations die with each scan iteration;
        # running BN stats chain chunk-to-chunk (train-mode BN outputs use
        # *batch* statistics, so the chaining never changes the features).
        def feature_pass(stats, xs):
            im, tk = xs
            f_i, f_t, scale, new_stats = forward(state.params, stats, im, tk)
            return (new_stats if has_bn else stats), (f_i, f_t, scale)

        new_stats, (img_f, txt_f, scales) = jax.lax.scan(
            feature_pass, state.batch_stats, (imgs, toks)
        )
        if not has_bn:
            new_stats = None
        img_f = img_f.reshape(b, -1)
        txt_f = txt_f.reshape(b, -1)
        scale = scales[0]  # the logit scale is a parameter: equal every chunk

        # Phase 2: the full-batch contrastive loss on the [B, D] bottleneck.
        def loss_from_features(f_i, f_t, s):
            per_item = clip_loss(
                f_i, f_t, s,
                ground_labels if use_ground_labels else None,
                ignore=ignore, google_sup_loss=google_sup_loss,
            )
            return jnp.mean(per_item), per_item

        (loss, per_item), (g_img, g_txt, g_scale) = jax.value_and_grad(
            loss_from_features, argnums=(0, 1, 2), has_aux=True
        )(img_f, txt_f, scale)

        # Phase 3: pull the feature cotangents back through each microbatch
        # tower forward; parameter gradients accumulate in the carry.
        g_img_c = _split(g_img)
        g_txt_c = _split(g_txt)
        g_scale_c = g_scale / chunks  # chunk contributions must SUM to g_scale

        def grad_pass(grads_acc, xs):
            im, tk, gi, gt = xs
            # Incoming running stats never reach train-mode BN outputs, so
            # every chunk may linearize at state.batch_stats: the recomputed
            # features match phase 1's bit-for-bit.
            feats_only = lambda p: forward(p, state.batch_stats, im, tk)[:3]
            _, vjp_fn = jax.vjp(feats_only, state.params)
            (g_params,) = vjp_fn((gi, gt, g_scale_c))
            return jax.tree_util.tree_map(jnp.add, grads_acc, g_params), None

        zeros = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        grads, _ = jax.lax.scan(grad_pass, zeros, (imgs, toks, g_img_c, g_txt_c))

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
