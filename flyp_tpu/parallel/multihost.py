"""Multi-host input plumbing.

On a multi-host slice each process loads its own slice of the global batch
(the tar/CSV loaders already shard by ``process_index`` — the
`wds.split_by_node` equivalent); this module assembles those host-local
arrays into global jax.Arrays laid out over the mesh, the
``jax.make_array_from_process_local_data`` pattern from SURVEY.md §2.7.

Single-host meshes (including the virtual CPU test mesh) take the fast
path through ``jax.device_put``.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from flyp_tpu.parallel.mesh import batch_axes


def process_count() -> int:
    return jax.process_count()


def resolve_process(
    index: int | None = None, count: int | None = None, shard_by_process: bool = True
) -> tuple[int, int]:
    """(rank, count) for input sharding: an explicit override (tests simulate
    ``count > 1`` on one host) wins, else the JAX runtime's process grid —
    but only when ``shard_by_process`` asks for sharding at all.  Eval
    loaders pass ``False`` so every host iterates the FULL test set (the
    evaluator has no cross-host metric reduction; replicated eval keeps the
    logged numbers whole-dataset and identical on every host).  Shared by
    the CSV-family loaders so their sharding resolution cannot drift
    apart.  ``shard_by_process=False`` wins over everything — including an
    explicit (index, count) override — so an eval loader can never be
    sharded by a stray override."""
    if not shard_by_process:
        return 0, 1
    if count is not None:
        return index or 0, count
    if index is not None:
        raise ValueError("process_index requires an explicit process_count")
    try:
        return jax.process_index(), jax.process_count()
    except Exception:  # pragma: no cover - jax runtime always initialized here
        return 0, 1


def process_index() -> int:
    return jax.process_index()


def is_primary() -> bool:
    """True on the process that owns DIRECT artifact writes (stats TSVs,
    metric sinks, pickle dumps, step-checkpoint pruning).  On multi-host
    runs every process computes identical epoch stats (eval loaders are
    replicated), so exactly one writer is both sufficient and required:
    concurrent TSV/JSONL writes to shared storage would race.  Orbax
    checkpoint saves are the exception — they are COLLECTIVE (all
    processes must call; orbax elects its own single writer internally),
    so never gate ``save_checkpoint`` on this."""
    try:
        return jax.process_index() == 0
    except Exception:  # pragma: no cover
        return True


def local_batch_size(global_batch_size: int) -> int:
    """Per-process share of the global batch.

    ``cfg.batch_size`` keeps the reference's meaning — the GLOBAL batch the
    loss sees (`/root/reference/src/models/flyp_loss.py:495-500` on one
    node) — so each host's loader must yield ``global/process_count`` rows
    for ``global_batch_from_local`` to assemble into exactly that global
    batch."""
    count = process_count()
    if global_batch_size % count:
        raise ValueError(
            f"global batch_size {global_batch_size} is not divisible by "
            f"process_count {count}; every host must contribute an equal slice"
        )
    return global_batch_size // count


def global_batch_from_local(mesh: Mesh, local_batch: Dict[str, Any]) -> Dict[str, Any]:
    """Assemble per-host batch dicts into mesh-sharded global arrays.

    Each host contributes ``local_batch`` rows; globally the leading axis is
    sharded over the ``data`` mesh axis.  Non-array entries pass through.
    """
    out: Dict[str, Any] = {}
    for key, value in local_batch.items():
        if not isinstance(value, np.ndarray) or value.dtype == object:
            out[key] = value
            continue
        # Shard over ALL batch axes (replica+data on multi-slice meshes):
        # claiming replication over `replica` while per-process loaders feed
        # different rows would mis-assemble the global batch.
        sharding = NamedSharding(mesh, P(batch_axes(mesh), *([None] * (value.ndim - 1))))
        if jax.process_count() == 1:
            out[key] = jax.device_put(value, sharding)
        else:  # pragma: no cover - needs a real multi-host slice
            out[key] = jax.make_array_from_process_local_data(sharding, value)
    return out
