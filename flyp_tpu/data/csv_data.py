"""Trainer-facing CSV data plumbing (`/root/reference/src/datasets/laion.py:
545-641`): build train/eval loaders from ``cfg.ft_data`` / ``cfg.ft_data_test``
with curriculum parameters threaded through."""

from __future__ import annotations

from typing import Optional, Sequence

from flyp_tpu.data.csv_dataset import CsvContrastiveDataset
from flyp_tpu.data.loader import DataLoader
from flyp_tpu.data.transforms import eval_transform, train_transform


class CsvEvalData:
    """Wraps the eval CSV as a dataset object with a ``test_loader``, the
    shape the evaluation harness consumes."""

    def __init__(self, dataset: CsvContrastiveDataset, loader: DataLoader):
        self.dataset = dataset
        self.test_loader = loader


def get_csv_loader(
    cfg,
    is_train: bool,
    image_size: int = 224,
    guidance: Optional[int] = None,
    list_selection: Optional[Sequence[int]] = None,
    ori_proportion: Optional[float] = None,
    return_guidance: bool = False,
    return_img_id: bool = False,
    only_img_id: bool = False,
    preprocess=None,
    shard_by_process: bool = True,
):
    """``shard_by_process=False`` requests a REPLICATED loader even for
    train: consumers that never assemble a global batch (the few-shot
    balanced-batch scan, the progress-validation beam trainer) must see
    identical full batches on every host."""
    input_filename = cfg.ft_data if is_train else cfg.ft_data_test
    assert input_filename, "ft_data / ft_data_test must be set"

    # Train rows are unlabeled unless --get_labeled_csv; eval rows always
    # carry labels (`laion.py:559-566`).
    label_key = "label" if (not is_train or cfg.get_labeled_csv) else None

    transform = preprocess
    if transform is None and getattr(cfg, "data_backend", "") == "native":
        # C++ decode+transform (GIL-free; see flyp_tpu/data/native_decode.py).
        from flyp_tpu.data import native_decode

        if native_decode.available():
            transform = (
                native_decode.native_train_transform(image_size)
                if is_train
                else native_decode.native_eval_transform(image_size)
            )
    if transform is None:
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
        only_img_id=only_img_id,
        seed=cfg.seed,
    )
    from flyp_tpu.parallel.multihost import local_batch_size

    sharded = is_train and shard_by_process
    loader = DataLoader(
        dataset,
        # cfg.batch_size is the GLOBAL batch (reference semantics): sharded
        # train loaders each yield their process's slice, which
        # prefetch_to_device assembles via global_batch_from_local.
        # Replicated loaders (eval, and opt-out train consumers) keep the
        # full batch everywhere.
        batch_size=local_batch_size(cfg.batch_size) if sharded else cfg.batch_size,
        shuffle=is_train,
        # The torch loader uses drop_last=False even in training
        # (`laion.py:592`); the TPU step needs static shapes, so trailing
        # ragged train batches are dropped instead (eval keeps them — eval
        # pads to a fixed shape downstream).
        drop_last=is_train,
        num_workers=cfg.workers,
        seed=cfg.seed,
        # Train: disjoint per-host shards feed global_batch_from_local.
        # Eval: replicated — every host scores the full set (no cross-host
        # metric reduction exists downstream).
        shard_by_process=sharded,
    )
    if is_train:
        return loader
    return CsvEvalData(dataset, loader)
