"""Orbax checkpointing: params + optimizer state + curriculum cursor.

The reference saves per-epoch ``{epoch, cur_guidance, cur_str_times,
cur_guidance_id, model_state_dict}`` and *omits* optimizer state
(`flyp_loss.py:545-552`, the optimizer save is commented out), and its
auto-resume block is disabled (`:318-333`).  Here the full train state —
params, AdamW moments, step, batch stats, and the curriculum cursor — is
checkpointed, so resume is exact (SURVEY.md §5 "rebuild" item).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np


@dataclasses.dataclass
class CurriculumCursor:
    epoch: int = 0
    cur_guidance: Optional[int] = None
    cur_str_times: int = 1
    cur_guidance_id: int = 0

    def to_dict(self) -> Dict[str, Any]:
        # None encodes as -1: checkpoint leaves must be numeric arrays.
        d = dataclasses.asdict(self)
        d["cur_guidance"] = -1 if d["cur_guidance"] is None else d["cur_guidance"]
        return {k: np.int64(v) for k, v in d.items()}

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "CurriculumCursor":
        out = {k: int(v) for k, v in d.items()}
        if out["cur_guidance"] == -1:
            out["cur_guidance"] = None
        return cls(**out)


@dataclasses.dataclass
class StepCursor:
    """Mid-epoch position for preemption-safe resume (step checkpoints).

    The reference can only resume at epoch boundaries (and even that block
    is commented out, `flyp_loss.py:318-333`); on preemptible TPUs a step
    cursor is required.  Exactness rests on the loader's determinism: the
    epoch order is seeded and augmentation RNG is keyed by dataset index
    (data/loader.py), so "skip the first k batches of pass p" reproduces the
    exact remaining stream.
    """

    step_in_epoch: int = -1  # last completed step i within the epoch
    data_pass: int = 0  # the loader's shuffle-stream counter
    batch_in_pass: int = 0  # batches already consumed from the current pass
    id_flyp_loss_sum: float = 0.0  # epoch-partial loss sum (for stats.tsv)
    proportion: float = -1.0  # active loader's ori_proportion (-1: None)

    def to_dict(self) -> Dict[str, Any]:
        d = dataclasses.asdict(self)
        return {
            k: np.float64(v) if isinstance(v, float) else np.int64(v) for k, v in d.items()
        }

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "StepCursor":
        out: Dict[str, Any] = {}
        for f in dataclasses.fields(cls):
            v = d[f.name]
            out[f.name] = float(v) if f.type == "float" else int(v)
        return cls(**out)


def _encode_host_state(blob: Dict[str, Any]) -> np.ndarray:
    """JSON-encode trainer host state (last_perform, exploration RNG state,
    loss_pairs, progress moving averages) as a uint8 checkpoint leaf.

    JSON because the blob is heterogeneous small host data — string-keyed
    float dicts, a PCG64 bit-generator state whose 128-bit ints Python's
    json serializes losslessly — and a single opaque leaf keeps the orbax
    payload schema stable regardless of which trainer features are on."""
    s = json.dumps(blob, default=lambda o: o.item() if hasattr(o, "item") else float(o))
    return np.frombuffer(s.encode("utf-8"), dtype=np.uint8).copy()


def _decode_host_state(arr) -> Dict[str, Any]:
    return json.loads(np.asarray(arr).tobytes().decode("utf-8"))


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


_async_ckpt = None  # module singleton: owns the background commit thread


def _async_checkpointer():
    global _async_ckpt
    if _async_ckpt is None:
        import orbax.checkpoint as ocp

        _async_ckpt = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
    return _async_ckpt


def wait_for_saves() -> None:
    """Block until every async checkpoint commit has landed on disk.

    Call before process exit / before restoring a just-written path; orbax
    writes are atomic (tmp dir + rename on commit), so an interrupted async
    save never leaves a half-visible checkpoint."""
    if _async_ckpt is not None:
        _async_ckpt.wait_until_finished()


def save_checkpoint(
    path: str,
    state,
    cursor: Optional[CurriculumCursor] = None,
    async_save: bool = False,
    mid: Optional[StepCursor] = None,
    host: Optional[Dict[str, Any]] = None,
) -> str:
    """Save a TrainState (+cursor) to ``path`` (an absolute directory).

    ``async_save=True`` returns as soon as the host-side payload is staged
    and commits the write on a background thread — the trainer's per-epoch
    save then overlaps the eval suites that follow instead of stalling the
    epoch loop (the reference's torch.save blocks, `flyp_loss.py:545-552`).
    Multi-host runs fall back to the synchronous write, and the call is a
    COLLECTIVE there: orbax barrier-syncs every JAX process inside save (a
    primary-only call deadlocks the primary — executed proof in
    test_multiprocess.py), then writes from exactly one host.  Call it on
    ALL processes; gate only logging/pruning on ``is_primary``.

    ``mid`` marks a MID-EPOCH (step) checkpoint: the payload gains a "mid"
    leaf group and must be restored with ``restore_checkpoint(...,
    mid=True)``.  ``host`` adds trainer host state (progress curriculum's
    last_perform / exploration RNG / moving averages, clustering
    loss_pairs) as one JSON leaf; restore sniffs its presence from
    checkpoint metadata.  Epoch checkpoints keep the legacy payload shape,
    so old checkpoints stay restorable."""
    path = os.path.abspath(path)
    payload = {
        "step": state.step,
        "params": state.params,
        "opt_state": state.opt_state,
        "batch_stats": state.batch_stats if state.batch_stats is not None else {},
        "cursor": (cursor or CurriculumCursor()).to_dict(),
    }
    if mid is not None:
        payload["mid"] = mid.to_dict()
    if host is not None:
        payload["host_state"] = _encode_host_state(host)
    # np.asarray fetches device arrays to host HERE, so the background write
    # never races the training loop's donated device buffers.
    payload = jax.tree_util.tree_map(np.asarray, payload, is_leaf=lambda x: x is None)
    if async_save and jax.process_count() == 1:
        _async_checkpointer().save(path, payload, force=True)
    else:
        _checkpointer().save(path, payload, force=True)
    return path


def restore_checkpoint(path: str, state, mid: bool = False, host: bool = False):
    """Restore into the structure of ``state``.

    Returns ``(state, cursor)``, or ``(state, cursor, step_cursor)`` when
    ``mid=True`` (a step checkpoint written with ``mid=StepCursor(...)``).
    ``host=True`` appends the decoded host-state dict as a final element —
    or ``None`` when the checkpoint predates host-state saving (presence is
    sniffed from checkpoint metadata, so round-4 checkpoints restore
    unchanged)."""
    wait_for_saves()  # a just-async-written path must be committed first
    path = os.path.abspath(path)
    ckptr = _checkpointer()
    template = {
        "step": state.step,
        "params": state.params,
        "opt_state": state.opt_state,
        "batch_stats": state.batch_stats if state.batch_stats is not None else {},
        "cursor": CurriculumCursor().to_dict(),
    }
    if mid:
        template["mid"] = StepCursor().to_dict()
    host_meta = None
    if host:
        meta = ckptr.metadata(path).item_metadata.tree
        host_meta = meta.get("host_state") if isinstance(meta, dict) else None
        if host_meta is not None:
            template["host_state"] = np.zeros(tuple(host_meta.shape), np.uint8)
    restored = ckptr.restore(path, item=jax.tree_util.tree_map(np.asarray, template))
    cursor = CurriculumCursor.from_dict(restored["cursor"])
    new_state = dataclasses.replace(
        state,
        step=restored["step"],
        params=restored["params"],
        opt_state=jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(state.opt_state), jax.tree_util.tree_leaves(restored["opt_state"])
        ),
        batch_stats=restored["batch_stats"] if state.batch_stats is not None else None,
    )
    out = [new_state, cursor]
    if mid:
        out.append(StepCursor.from_dict(restored["mid"]))
    if host:
        out.append(_decode_host_state(restored["host_state"]) if host_meta is not None else None)
    return tuple(out)


def save_params(path: str, params) -> str:
    """Save a bare param pytree (classifier/zero-shot head export)."""
    path = os.path.abspath(path)
    _checkpointer().save(path, jax.tree_util.tree_map(np.asarray, params), force=True)
    return path


def restore_params(path: str, template) -> Any:
    path = os.path.abspath(path)
    return _checkpointer().restore(path, item=jax.tree_util.tree_map(np.asarray, template))
