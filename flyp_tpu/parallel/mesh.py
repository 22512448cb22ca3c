"""Device-mesh construction and sharding helpers.

The reference's parallelism surface (SURVEY.md §2.7) — ``nn.DataParallel``
plus dormant ``torch.distributed`` all-gather — maps onto one abstraction
here: a ``jax.sharding.Mesh`` with a ``data`` axis (batch-sharded inputs,
replicated params; XLA all-reduces gradients over ICI under jit) and an
optional ``model`` axis for tensor-parallel param sharding of the larger
towers (ViT-L), which the reference never had but the mesh makes free.

Multi-slice deployments add a DCN-connected outer ``replica`` axis (slowest
varying in device order, the standard multi-slice layout): the batch shards
over (replica, data) jointly, params replicate across replicas (each slice
holds a full copy — DCN carries only the gradient all-reduce), and the
contrastive feature all-gather spans both axes of the GSPMD global-batch
loss.  For DCN-frugal deployments, ``--local_loss``-style slice-local
InfoNCE keeps the gather on ICI only.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
#: Outer data-parallel axis for multi-slice deployments (DCN-connected).
REPLICA_AXIS = "replica"


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    data: int = -1  # -1: all remaining devices
    model: int = 1
    replica: int = 1  # multi-slice outer data parallelism (DCN)


def batch_axes(mesh: Mesh):
    """Mesh axes the batch dimension shards over, outermost first."""
    if REPLICA_AXIS in mesh.axis_names:
        return (REPLICA_AXIS, DATA_AXIS)
    return (DATA_AXIS,)


def create_mesh(config: Optional[MeshConfig] = None, devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a (replica, model, data) mesh over the available devices.

    The data axis is innermost in device order so neighbouring devices (ICI
    links) carry the contrastive all-gather; the model axis groups devices
    that hold complementary parameter shards; the replica axis (multi-slice
    DP) is outermost so slice boundaries — the DCN hops — separate replicas.
    The replica axis is only materialized when ``config.replica > 1`` so
    single-slice meshes keep their 2-D shape (and their compiled programs).
    """
    config = config or MeshConfig()
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    model, replica = config.model, config.replica
    data = config.data if config.data != -1 else n // (model * replica)
    if data * model * replica != n:
        raise ValueError(f"mesh {replica}x{data}x{model} does not cover {n} devices")
    if replica > 1:
        arr = np.array(devices).reshape(replica, model, data)
        return Mesh(arr, (REPLICA_AXIS, MODEL_AXIS, DATA_AXIS))
    arr = np.array(devices).reshape(model, data)
    return Mesh(arr, (MODEL_AXIS, DATA_AXIS))


def create_mesh_for_batch(config: Optional[MeshConfig], batch_size: int) -> Mesh:
    """Like ``create_mesh`` but caps the data axis at the largest divisor of
    ``batch_size`` (a batch must split evenly across its sharded axes)."""
    config = config or MeshConfig()
    n = len(jax.devices())
    model, replica = config.model, config.replica
    if replica > 1 and batch_size % replica != 0:
        raise ValueError(
            f"batch_size {batch_size} is not divisible by the replica axis "
            f"({replica}); the batch cannot shard over a multi-slice mesh"
        )
    data = config.data if config.data != -1 else n // (model * replica)
    full_data = n // (model * replica)
    while data > 1 and batch_size % (data * replica) != 0:
        data -= 1
    # Capping the data axis must preserve the replica layout: slice the data
    # axis WITHIN each replica's device block rather than taking a flat
    # prefix of jax.devices() — a prefix would let one replica span the
    # slice boundary (the DCN hop) that the replica axis exists to separate.
    arr = np.array(jax.devices()[: replica * model * full_data]).reshape(replica, model, full_data)
    devices = arr[:, :, :data].reshape(-1)
    return create_mesh(MeshConfig(data=data, model=model, replica=replica), devices=devices)


def shard_batch(mesh: Mesh, tree):
    """Place host arrays onto the mesh with the leading axis sharded over the
    batch axes (replica and data jointly on multi-slice meshes)."""
    def _put(x):
        spec = P(batch_axes(mesh), *([None] * (np.ndim(x) - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(_put, tree)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params, opt state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def shard_opt_state(mesh: Mesh, opt_state, place_moments):
    """Walk an optax state tree, placing AdamW moments via ``place_moments``
    (param-style sharding) and replicating counts/hyperparams; unknown
    containers (NamedTuple chains, dicts) recurse.  Shared by
    ``parallel.fsdp`` and ``parallel.tp`` so the optax-structure handling
    cannot drift between the two."""
    import optax

    repl = NamedSharding(mesh, P())

    def walk(node):
        if isinstance(node, optax.ScaleByAdamState):
            return optax.ScaleByAdamState(
                count=jax.device_put(node.count, repl),
                mu=place_moments(node.mu),
                nu=place_moments(node.nu),
            )
        if isinstance(node, tuple) and type(node) is not tuple:  # other NamedTuple states
            return type(node)(*[walk(x) for x in node])
        if isinstance(node, (tuple, list)):
            return type(node)(walk(x) for x in node)
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        if hasattr(node, "shape"):
            return jax.device_put(node, repl)
        return node

    return walk(opt_state)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(batch_axes(mesh)))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
