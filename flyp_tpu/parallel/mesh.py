"""Device-mesh construction and sharding helpers.

The reference's parallelism surface (SURVEY.md §2.7) — ``nn.DataParallel``
plus dormant ``torch.distributed`` all-gather — maps onto one abstraction
here: a ``jax.sharding.Mesh`` with a ``data`` axis (batch-sharded inputs,
replicated params; XLA all-reduces gradients over ICI under jit) and an
optional ``model`` axis for tensor-parallel param sharding of the larger
towers (ViT-L), which the reference never had but the mesh makes free.

Multi-slice deployments add a DCN-connected outer data axis; the helpers are
axis-order aware so ICI carries the contrastive all-gather.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    data: int = -1  # -1: all remaining devices
    model: int = 1


def create_mesh(config: Optional[MeshConfig] = None, devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    The data axis is innermost in device order so neighbouring devices (ICI
    links) carry the contrastive all-gather; the model axis groups devices
    that hold complementary parameter shards.
    """
    config = config or MeshConfig()
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    model = config.model
    data = config.data if config.data != -1 else n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} does not cover {n} devices")
    arr = np.array(devices).reshape(model, data)
    return Mesh(arr, (MODEL_AXIS, DATA_AXIS))


def create_mesh_for_batch(config: Optional[MeshConfig], batch_size: int) -> Mesh:
    """Like ``create_mesh`` but caps the data axis at the largest divisor of
    ``batch_size`` (a batch must split evenly across the data axis)."""
    config = config or MeshConfig()
    n = len(jax.devices())
    model = config.model
    data = config.data if config.data != -1 else n // model
    while data > 1 and batch_size % data != 0:
        data -= 1
    return create_mesh(MeshConfig(data=data, model=model), devices=jax.devices()[: data * model])


def shard_batch(mesh: Mesh, tree):
    """Place host arrays onto the mesh with the leading axis sharded over data."""
    def _put(x):
        spec = P(DATA_AXIS, *([None] * (np.ndim(x) - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(_put, tree)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params, opt state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
