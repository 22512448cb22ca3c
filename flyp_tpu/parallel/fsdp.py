"""FSDP/ZeRO-style parameter + optimizer-state sharding over the data axis.

The reference replicates parameters everywhere (SURVEY.md §2.7: FSDP
absent).  On TPU the mesh makes weight sharding nearly free under GSPMD:
annotate each parameter (and its AdamW moments, which mirror the param
tree) with a PartitionSpec over the ``data`` axis and let XLA insert the
all-gathers before use and reduce-scatters after the gradient step.  This
is the standard JAX FSDP recipe — no wrapper modules, no manual
collectives; combined with TP it gives a 2-D sharding.

Each tensor is sharded along its largest axis divisible by the data-axis
size; small tensors (LN scales, biases) replicate — gathering them costs
more than they save.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from flyp_tpu.parallel.mesh import DATA_AXIS

#: Parameters smaller than this replicate (gather latency > memory saved).
MIN_SHARD_ELEMENTS = 2 ** 15


def fsdp_spec(shape, data_size: int) -> P:
    """Shard the largest divisible dim over the data axis; else replicate."""
    if not shape:
        return P()
    n = 1
    for d in shape:
        n *= d
    if n < MIN_SHARD_ELEMENTS:
        return P(*([None] * len(shape)))
    # Largest dim divisible by the axis size wins; ties go to the first.
    best = None
    for i, d in enumerate(shape):
        if d % data_size == 0 and (best is None or d > shape[best]):
            best = i
    if best is None:
        return P(*([None] * len(shape)))
    spec = [None] * len(shape)
    spec[best] = DATA_AXIS
    return P(*spec)


def fsdp_param_specs(mesh: Mesh, params: Any) -> Any:
    data_size = mesh.shape[DATA_AXIS]
    return jax.tree_util.tree_map(lambda leaf: fsdp_spec(leaf.shape, data_size), params)


def _place(mesh: Mesh, tree: Any) -> Any:
    data_size = mesh.shape[DATA_AXIS]

    def put(leaf):
        return jax.device_put(leaf, NamedSharding(mesh, fsdp_spec(leaf.shape, data_size)))

    return jax.tree_util.tree_map(put, tree)


def shard_train_state_fsdp(mesh: Mesh, state) -> Any:
    """FSDP-shard a TrainState: params and AdamW moments sharded over the
    data axis, counts/hyperparams replicated."""
    import dataclasses

    from flyp_tpu.parallel.mesh import shard_opt_state

    params = _place(mesh, state.params)
    opt_state = shard_opt_state(mesh, state.opt_state, lambda tree: _place(mesh, tree))
    return dataclasses.replace(
        state,
        step=jax.device_put(state.step, NamedSharding(mesh, P())),
        params=params,
        opt_state=opt_state,
        batch_stats=(_place(mesh, state.batch_stats) if state.batch_stats is not None else None),
    )
