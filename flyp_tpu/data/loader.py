"""Host-side batched loader with threaded decode and device prefetch.

Replaces torch ``DataLoader`` (worker processes) with a thread pool — PIL
decode, resize, and numpy normalization all release the GIL, so threads
saturate host cores without pickling overhead — plus an explicit
device-prefetch stage that keeps H2D copies ahead of the TPU step
(`host-overlap prefetch`, BASELINE.json north star).

Determinism: shuffling is seeded per epoch (``seed + epoch``), and each
sample draws its augmentation RNG from a per-epoch SeedSequence, so a run is
reproducible regardless of worker count — stronger than the reference, whose
worker scheduling changes augmentation streams.
"""

from __future__ import annotations

import collections
import concurrent.futures as cf
from typing import Any, Dict, Iterator

import numpy as np


def _collate(samples: list) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        if isinstance(vals[0], (str, bytes)):
            out[key] = vals  # file paths stay host-side lists
        elif isinstance(vals[0], np.ndarray) or np.isscalar(vals[0]) or hasattr(vals[0], "dtype"):
            out[key] = np.stack(vals)
        else:
            out[key] = vals
    return out


class DataLoader:
    """Iterable over batches of collated numpy dicts.

    ``dataset`` must implement ``__len__`` and ``get(idx, rng)`` (or
    ``__getitem__``).  Call ``set_epoch`` before each epoch to advance the
    shuffle/augmentation streams.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = True,
        num_workers: int = 8,
        seed: int = 0,
        prefetch_batches: int = 4,
        process_index: int | None = None,
        process_count: int | None = None,
        shard_by_process: bool = True,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.prefetch_batches = prefetch_batches
        self.epoch = 0
        self.start_batch = 0
        # Multi-host sharding (`wds.split_by_node` semantics, laion.py:464):
        # every process computes the SAME seeded global order, then takes its
        # batch-block stride of it, so coverage is disjoint and exhaustive
        # per epoch AND the assembled global batches match a single-process
        # run bitwise (see _epoch_order).
        # Defaults come from the JAX runtime at iteration time; EVAL loaders
        # pass shard_by_process=False so every host scores the full test set
        # (there is no cross-host metric reduction in the evaluator).
        self.process_index = process_index
        self.process_count = process_count
        self.shard_by_process = shard_by_process

    def _proc(self) -> tuple[int, int]:
        from flyp_tpu.parallel.multihost import resolve_process

        return resolve_process(self.process_index, self.process_count, self.shard_by_process)

    def set_epoch(self, epoch: int, start_batch: int = 0) -> None:
        """Advance the shuffle stream; ``start_batch`` fast-forwards the next
        iteration past its first k batches WITHOUT decoding them (the epoch
        order is seeded, so batch k is the same bytes whether or not 0..k-1
        were materialized) — the mid-epoch resume hook (utils/checkpoint.py
        StepCursor).  Reset to 0 by any later plain ``set_epoch`` call."""
        self.epoch = epoch
        self.start_batch = start_batch

    def __len__(self) -> int:
        _, count = self._proc()
        # EQUAL floor share on every process: collective train steps require
        # every host to run the same number of batches per epoch (a ceil
        # share would hang the slice on the last step and skew the LR
        # schedule horizon).  Up to count-1 trailing rows of the seeded
        # global order are dropped per epoch, like grain's drop_remainder.
        n = len(self.dataset) // count
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _epoch_order(self) -> np.ndarray:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng(self.seed + self.epoch).shuffle(order)
        rank, count = self._proc()
        if count > 1:
            if self.drop_last:
                # Batch-block striding: global step k's assembled batch is
                # order[k*count*B : (k+1)*count*B] — the SAME contiguous
                # slice of the seeded global order a single-process loader
                # would yield.  Device-order assembly (process p's rows land
                # at global rows [p*B, (p+1)*B)) then makes the global batch
                # stream process-layout-INVARIANT: N-process and 1-process
                # runs see bitwise-identical global batches, so a run can
                # resume on a different host count without changing its data
                # trajectory (asserted for real in test_multiprocess.py).
                # Element striding (order[rank::count], wds.split_by_node's
                # layout) would permute rows within each global batch.
                block = count * self.batch_size
                usable = block * (len(order) // block)
                order = (
                    order[:usable]
                    .reshape(-1, count, self.batch_size)[:, rank, :]
                    .reshape(-1)
                )
            else:
                order = order[: count * (len(order) // count)][rank::count]
        return order

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        order = self._epoch_order()
        n_batches = len(self)
        ss = np.random.SeedSequence([self.seed, self.epoch])
        # Augmentation seeds are keyed by DATASET index (not position in the
        # epoch order), so a sample's augmentation stream is identical under
        # any process/worker layout.
        sample_seeds = ss.generate_state(len(self.dataset), dtype=np.uint64)

        get = getattr(self.dataset, "get", None)

        def fetch(i: int):
            idx = int(order[i])
            if get is not None:
                return get(idx, np.random.default_rng(sample_seeds[idx]))
            return self.dataset[idx]

        pool = cf.ThreadPoolExecutor(max_workers=self.num_workers)
        try:
            window = self.prefetch_batches * self.batch_size
            futures: collections.deque = collections.deque()
            total = n_batches * self.batch_size if self.drop_last else len(order)
            submitted = 0

            def top_up():
                nonlocal submitted
                while submitted < total and len(futures) < window:
                    futures.append(pool.submit(fetch, submitted))
                    submitted += 1

            skip = min(self.start_batch, n_batches) * self.batch_size
            submitted = done = skip
            top_up()
            while done < total:
                batch = []
                take = min(self.batch_size, total - done)
                for _ in range(take):
                    batch.append(futures.popleft().result())
                    top_up()
                done += take
                yield _collate(batch)
        finally:
            # cancel_futures: consumers that abandon the iterator mid-epoch
            # (fisher's max_batches cut, the few-shot balanced-batch scan)
            # must not block on a full prefetch window of queued decodes.
            pool.shutdown(wait=True, cancel_futures=True)


def prefetch_to_device(iterator, mesh=None, size: int = 2, image_dtype=None):
    """Move batches to device ahead of consumption.

    With a mesh, each host's batch is its process-local SLICE of the global
    batch and is assembled via ``global_batch_from_local`` (the
    ``jax.make_array_from_process_local_data`` pattern — a plain
    ``device_put`` with a cross-process sharding would assume every host
    holds the SAME array and silently mix row-slices of different logical
    batches); the global leading axis shards over the mesh's batch axes.
    Non-array entries (paths) pass through host-side.  ``image_dtype``
    (e.g. ``ml_dtypes.bfloat16``) casts float image tensors on the host
    first — halving H2D bytes for bf16 training.
    """
    import jax

    if mesh is not None:
        from flyp_tpu.parallel.multihost import global_batch_from_local

    def to_device(batch):
        out = {}
        staged = {}
        for k, v in batch.items():
            if isinstance(v, np.ndarray) and v.dtype.kind not in "USO":
                if image_dtype is not None and np.issubdtype(v.dtype, np.floating):
                    v = v.astype(image_dtype)
                if k == "tokens":
                    # Exact context shrinking (causal tower + EOT pooling):
                    # slice padded captions to the batch's bucketed max EOT
                    # before the H2D copy — typically 77 -> 32, ~2.4x less
                    # text-tower work with bit-identical features.
                    from flyp_tpu.tokenizer import shrink_context

                    v = shrink_context(v)
                    if jax.process_count() > 1:  # pragma: no cover - real slice only
                        # Hosts hold different rows, so local buckets can
                        # disagree; the global batch needs ONE width.  Sync
                        # to the max bucket and re-pad (zero is the pad id —
                        # EOT-argmax pooling ignores the tail, bit-exact).
                        from jax.experimental import multihost_utils

                        width = int(multihost_utils.process_allgather(np.int32(v.shape[1])).max())
                        if width > v.shape[1]:
                            v = np.pad(v, ((0, 0), (0, width - v.shape[1])))
                staged[k] = v
            else:
                out[k] = v
        if mesh is not None:
            out.update(global_batch_from_local(mesh, staged))
        else:
            out.update({k: jax.device_put(v) for k, v in staged.items()})
        return out

    queue: collections.deque = collections.deque()
    it = iter(iterator)
    try:
        for _ in range(size):
            queue.append(to_device(next(it)))
    except StopIteration:
        pass
    while queue:
        nxt = queue.popleft()
        try:
            queue.append(to_device(next(it)))
        except StopIteration:
            pass
        yield nxt
