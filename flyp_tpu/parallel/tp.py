"""Tensor-parallel parameter sharding over the mesh's ``model`` axis.

The reference never shards parameters (SURVEY.md §2.7: TP absent), but the
mesh makes it nearly free under GSPMD: annotate each weight with a
PartitionSpec and let XLA partition the matmuls and insert the collectives.
The rules follow the Megatron pattern for transformer blocks:

* QKV / MLP-in kernels split the *output* features (column parallel);
* attention-out / MLP-out kernels split the *input* features (row
  parallel), so each device holds complete head groups and XLA reduces the
  row-parallel products with one psum per block;
* embeddings, LayerNorms, projections, and scalars replicate.

Sharding propagates from the placed arguments (params, then optimizer
moments, which mirror the param tree), so the train step needs no
sharding-spec changes — ``jax.jit`` infers from the inputs.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from flyp_tpu.parallel.mesh import MODEL_AXIS


def _spec_for(path: str, shape) -> P:
    if path.endswith("attn/qkv_kernel"):
        # [3, D, D]: the last axis is head-major output features — sharding
        # it IS head-group TP; the fused attention-block kernel runs
        # per-shard with H/n local heads (ops/attention_block.py rules).
        return P(None, None, MODEL_AXIS)
    if path.endswith("attn/qkv_bias"):
        return P(None, MODEL_AXIS)  # [3, D], shards with the kernel
    if path.endswith("mlp/fc_kernel"):
        return P(None, MODEL_AXIS)  # column parallel
    if path.endswith("mlp/fc_bias"):
        return P(MODEL_AXIS)
    if path.endswith("attn/out_kernel") or path.endswith("mlp/proj_kernel"):
        return P(MODEL_AXIS, None)  # row parallel
    return P()  # replicate


def clip_param_specs(params: Any) -> Any:
    """PartitionSpec pytree matching a CLIP param tree."""

    def spec(path, leaf):
        key = "/".join(str(getattr(p, "key", p)) for p in path)
        return _spec_for(key, leaf.shape)

    return jax.tree_util.tree_map_with_path(spec, params)


def _divisible(spec: P, shape, mesh: Mesh) -> bool:
    for dim, axis in zip(shape, spec):
        if axis is not None and dim % mesh.shape[axis] != 0:
            return False
    return True


def shard_params(mesh: Mesh, params: Any) -> Any:
    """Place a param tree with TP shardings (replicating any tensor whose
    sharded dim does not divide the model-axis size)."""

    def place(path, leaf):
        key = "/".join(str(getattr(p, "key", p)) for p in path)
        spec = _spec_for(key, leaf.shape)
        if not _divisible(spec, leaf.shape, mesh):
            spec = P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def shard_train_state(mesh: Mesh, state) -> Any:
    """TP-shard a TrainState: params and the AdamW moments (which mirror the
    param tree) get TP specs; counts/hyperparams replicate."""
    import dataclasses

    from flyp_tpu.parallel.mesh import shard_opt_state

    params = shard_params(mesh, state.params)
    opt_state = shard_opt_state(mesh, state.opt_state, lambda tree: shard_params(mesh, tree))
    return dataclasses.replace(
        state,
        step=jax.device_put(state.step, NamedSharding(mesh, P())),
        params=params,
        opt_state=opt_state,
        batch_stats=(
            jax.tree_util.tree_map(lambda x: jax.device_put(x, NamedSharding(mesh, P())), state.batch_stats)
            if state.batch_stats is not None
            else None
        ),
    )
