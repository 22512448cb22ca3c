"""Grain pipeline variant of the CSV contrastive loader.

Third host-input backend next to the thread pool (``loader.py``) and
tf.data (``tfdata.py``): Google's Grain gives deterministic, checkpointable
multiprocess input on TPU hosts — the closest analogue to the reference's
torch ``DataLoader(num_workers=...)`` worker processes
(`/root/reference/src/datasets/laion.py:586-594`), but with reproducible
per-record RNG and `ShardByJaxProcess` multihost sharding built in.

Selected with ``--data_backend grain``.  The loader surface matches the
threaded ``DataLoader``: iterable of dict batches, ``__len__``,
``set_epoch`` (re-seeds the shuffle, as torch's sampler does implicitly).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from flyp_tpu.data.csv_dataset import CsvContrastiveDataset
from flyp_tpu.data.transforms import eval_transform, train_transform


class _Source:
    """grain RandomAccessDataSource over a CsvContrastiveDataset: each
    record's augmentation RNG is derived from (seed, index) so any worker
    layout reproduces the same sample."""

    def __init__(self, dataset: CsvContrastiveDataset, seed: int):
        self._dataset = dataset
        self._seed = seed

    def __len__(self) -> int:
        return len(self._dataset)

    def __getitem__(self, idx: int) -> dict:
        rng = np.random.default_rng(np.random.SeedSequence([self._seed, int(idx)]))
        return self._dataset.get(int(idx), rng)


class GrainLoader:
    """DataLoader-shaped wrapper around grain.DataLoader."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool,
        drop_last: bool,
        num_workers: int,
        seed: int = 0,
        shard_by_process: bool = True,
        process_index: int | None = None,
        process_count: int | None = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = num_workers
        self.seed = seed
        self.shard_by_process = shard_by_process
        # Explicit overrides (tests simulate process_count>1 on one host);
        # None defers to ShardByJaxProcess at iteration time.
        self.process_index = process_index
        self.process_count = process_count
        self._epoch = 0
        self._start_batch = 0

    def set_epoch(self, epoch: int, start_batch: int = 0) -> None:
        """Advance the shuffle stream; ``start_batch`` fast-forwards the
        next iteration past its first k batches — the mid-epoch resume hook
        (same contract as ``loader.DataLoader.set_epoch``).  Grain's
        sampler order and per-record RNG are fully determined by
        ``(seed, epoch, index)``, so skipping reproduces the exact
        remaining stream.  Unlike the threads backend the skip DECODES the
        consumed prefix once at resume (grain's iterator state lives inside
        grain; replaying k batches keeps the one StepCursor resume path for
        every backend) — a one-time cost per preemption."""
        self._epoch = int(epoch)
        self._start_batch = int(start_batch)

    def __len__(self) -> int:
        import grain

        shard = self._shard_options()
        n = len(self.dataset) // shard.shard_count
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _shard_options(self):
        import grain

        # shard_by_process=False wins over everything, including explicit
        # overrides — same precedence as multihost.resolve_process (a
        # replicated eval loader must never be sharded by a stray override).
        if not self.shard_by_process:
            return grain.sharding.NoSharding()
        if self.process_count is not None:
            return grain.sharding.ShardOptions(
                shard_index=self.process_index or 0,
                shard_count=self.process_count,
                drop_remainder=True,
            )
        # Multihost: shard by the mesh-derived INPUT grid (== the JAX
        # process grid on pure-DP meshes; coarser on TP meshes whose model
        # axis spans processes — see multihost.input_shard_grid).
        from flyp_tpu.parallel.multihost import input_shard_grid

        rank, count = input_shard_grid()
        return grain.sharding.ShardOptions(
            shard_index=rank, shard_count=count, drop_remainder=True
        )

    def __iter__(self):
        import grain

        sampler = grain.samplers.IndexSampler(
            num_records=len(self.dataset),
            shuffle=self.shuffle,
            seed=self.seed + self._epoch,
            num_epochs=1,
            shard_options=self._shard_options(),
        )
        loader = grain.DataLoader(
            data_source=_Source(self.dataset, self.seed + self._epoch),
            sampler=sampler,
            operations=[grain.transforms.Batch(self.batch_size, drop_remainder=self.drop_last)],
            worker_count=self.num_workers,
        )
        it = iter(loader)
        if self._start_batch:
            import itertools

            it = itertools.islice(it, self._start_batch, None)
        return it


def get_grain_csv_loader(
    cfg,
    is_train: bool,
    image_size: int = 224,
    guidance: Optional[int] = None,
    list_selection: Optional[Sequence[int]] = None,
    ori_proportion: Optional[float] = None,
    return_guidance: bool = False,
    return_img_id: bool = False,
    shard_by_process: bool = True,
):
    """Grain-backed equivalent of ``csv_data.get_csv_loader`` (train side),
    incl. its ``shard_by_process`` opt-out for replicated train consumers."""
    input_filename = cfg.ft_data if is_train else cfg.ft_data_test
    assert input_filename, "ft_data / ft_data_test must be set"
    label_key = "label" if (not is_train or cfg.get_labeled_csv) else None

    transform = train_transform(image_size) if is_train else eval_transform(image_size)
    dataset = CsvContrastiveDataset(
        input_filename,
        transform,
        img_key=cfg.csv_img_key,
        caption_key=cfg.csv_caption_key,
        sep=cfg.csv_separator,
        label_key=label_key,
        guidance=guidance,
        datalimit=cfg.datalimit if is_train else -1,
        list_selection=list_selection,
        ori_proportion=ori_proportion,
        return_guidance=return_guidance,
        return_img_id=return_img_id,
        seed=cfg.seed,
    )
    from flyp_tpu.parallel.multihost import local_batch_size

    sharded = is_train and shard_by_process
    loader = GrainLoader(
        dataset,
        # Global batch sliced per process for sharded train loaders (see
        # csv_data.get_csv_loader); replicated loaders keep the full batch.
        batch_size=local_batch_size(cfg.batch_size) if sharded else cfg.batch_size,
        shuffle=is_train,
        drop_last=is_train,
        num_workers=cfg.workers,
        seed=cfg.seed,
        # Eval is replicated across hosts (see DataLoader.shard_by_process).
        shard_by_process=sharded,
    )
    if is_train:
        return loader
    # Same eval shape as get_csv_loader: the harness consumes .test_loader.
    from flyp_tpu.data.csv_data import CsvEvalData

    return CsvEvalData(dataset, loader)
