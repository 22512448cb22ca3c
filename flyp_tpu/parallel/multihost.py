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


#: (rank, count) input-sharding grid pinned by configure_input_sharding().
_INPUT_GRID: tuple[int, int] | None = None


def _mesh_batch_grid(mesh: Mesh) -> tuple[int, int]:
    """Derive the INPUT-sharding grid from which batch shards each
    process's devices actually hold.

    Dividing the batch by ``jax.process_count()`` is only right when the
    batch-sharded mesh axes span the processes.  On a TP mesh
    ``(model=2, data=4)`` over 2 processes x 4 devices, the MODEL axis is
    what crosses the process boundary: every process's devices cover ALL
    data-axis shards, so every process must supply the FULL global batch
    (identical rows — guaranteed by the seeded loader order), or the two
    model shards silently train on different data halves (caught by
    test_multiprocess.py::test_tensor_parallel_two_process the first time
    the TP contract ran for real).

    Processes whose devices hold the same batch-shard set form one input
    group; groups are ranked by their first shard so group r supplies the
    rows ``make_array_from_process_local_data`` lays onto its devices.
    """
    axes = batch_axes(mesh)
    arr = np.asarray(mesh.devices)
    names = list(mesh.axis_names)
    batch_dims = [names.index(a) for a in axes]
    other_dims = [i for i in range(arr.ndim) if i not in batch_dims]
    blocks = arr.transpose(batch_dims + other_dims).reshape(
        int(np.prod([arr.shape[d] for d in batch_dims])), -1
    )
    held: Dict[int, set] = {}
    for b in range(blocks.shape[0]):
        for dev in blocks[b]:
            held.setdefault(dev.process_index, set()).add(b)
    groups: Dict[frozenset, list] = {}
    for p, bs in held.items():
        groups.setdefault(frozenset(bs), []).append(p)
    ranked = sorted(groups, key=min)
    n, k = blocks.shape[0], blocks.shape[0] // len(ranked)
    for r, sig in enumerate(ranked):
        if sig != frozenset(range(r * k, (r + 1) * k)):
            raise ValueError(
                f"mesh device layout assigns non-contiguous batch shards "
                f"{sorted(sig)} of {n} to one process group; input sharding "
                "cannot reconstruct the global batch from per-process slices"
            )
    me = jax.process_index()
    (rank,) = [r for r, sig in enumerate(ranked) if me in groups[sig]]
    return rank, len(ranked)


def configure_input_sharding(mesh: Mesh) -> tuple[int, int]:
    """Pin the input-sharding grid for ``mesh``; call after building the
    trainer's mesh and before building sharded train loaders.  Returns the
    (rank, count) grid.  Single-process runs do NOT pin (the live-grid
    fallthrough is already correct, and leaving no module state keeps
    simulated ``process_count`` overrides in tests honest)."""
    global _INPUT_GRID
    _INPUT_GRID = None if jax.process_count() == 1 else _mesh_batch_grid(mesh)
    return _INPUT_GRID if _INPUT_GRID is not None else (0, 1)


def input_shard_grid() -> tuple[int, int]:
    """The active (rank, count) grid for input sharding: the mesh-derived
    grid when a trainer pinned one, else the raw JAX process grid (correct
    for pure-DP meshes, where batch shards and processes coincide)."""
    if _INPUT_GRID is not None:
        return _INPUT_GRID
    try:
        return jax.process_index(), jax.process_count()
    except Exception:  # pragma: no cover - jax runtime always initialized here
        return 0, 1


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
    return input_shard_grid()


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
    node) — so each host's loader must yield ``global/count`` rows for
    ``global_batch_from_local`` to assemble into exactly that global
    batch, where ``count`` is the INPUT grid (mesh-derived: on TP meshes
    whose model axis spans processes, count < process_count and each
    process loads a bigger — possibly full — slice)."""
    _, count = input_shard_grid()
    if global_batch_size % count:
        raise ValueError(
            f"global batch_size {global_batch_size} is not divisible by "
            f"the input-shard count {count}; every input group must "
            "contribute an equal slice"
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
