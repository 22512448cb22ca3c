"""tf.data input pipeline: multi-threaded C++ decode feeding the TPU.

The threaded PIL loader (`data/loader.py`) is the portable default; this
pipeline is the production path named by the project north star — file
reads, JPEG/PNG decode, RandomResizedCrop, and normalization all run in
TensorFlow's C++ ops across host cores, with autotuned parallelism and
device prefetch.  Captions are tokenized once up front (the BPE is pure
Python) and joined to the image pipeline as a constant tensor.

Semantics match `data/transforms.py` / the reference preprocessing:
RandomResizedCrop(scale 0.9-1.0, ratio 3/4-4/3, bicubic) for training,
resize-shortest + center crop for eval, CLIP mean/std normalization.
TensorFlow is used host-side only — no TF ops enter the jitted step.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np

from flyp_tpu.data.transforms import CLIP_MEAN, CLIP_STD
from flyp_tpu.tokenizer import tokenize


def _tf():
    import tensorflow as tf

    tf.config.set_visible_devices([], "GPU")
    tf.config.set_visible_devices([], "TPU")
    return tf


class TFDataCsvLoader:
    """Contrastive (image, caption-tokens) batches from a TSV via tf.data.

    Mirrors ``CsvContrastiveDataset`` + ``DataLoader`` for the plain
    training path (guidance filtering etc. happen in pandas before the
    pipeline is built).
    """

    def __init__(
        self,
        dataframe,
        image_size: int = 224,
        batch_size: int = 256,
        train: bool = True,
        seed: int = 0,
        drop_last: bool = True,
        shuffle_buffer: int = 50_000,
        process_index: int | None = None,
        process_count: int | None = None,
        shard_by_process: bool = True,
    ):
        self.paths = dataframe["filepath"].astype(str).tolist()
        self.tokens = tokenize([str(t) for t in dataframe["title"]])
        self.image_size = image_size
        self.batch_size = batch_size
        self.train = train
        self.seed = seed
        self.drop_last = drop_last
        self.shuffle_buffer = min(shuffle_buffer, len(self.paths))
        self.epoch = 0
        # Multi-host sharding: the dataset shards AFTER the (identically
        # seeded) shuffle, so each JAX process decodes a disjoint stride of
        # the epoch (`wds.split_by_node` semantics, laion.py:464).
        self.process_index = process_index
        self.process_count = process_count
        # Eval pipelines pass False: every host scores the full test set.
        self.shard_by_process = shard_by_process

    def _proc(self) -> tuple:
        from flyp_tpu.parallel.multihost import resolve_process

        return resolve_process(self.process_index, self.process_count, self.shard_by_process)

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __len__(self) -> int:
        _, count = self._proc()
        # Equal floor share per process — see DataLoader.__len__ (collective
        # steps need identical per-host batch counts).
        n = len(self.paths) // count
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _build(self):
        tf = _tf()
        size = self.image_size
        mean = tf.constant(CLIP_MEAN, tf.float32)
        std = tf.constant(CLIP_STD, tf.float32)
        train = self.train
        seed = self.seed + self.epoch

        def load(path, tokens):
            raw = tf.io.read_file(path)
            img = tf.io.decode_image(raw, channels=3, expand_animations=False)
            img.set_shape([None, None, 3])
            if train:
                # RandomResizedCrop(0.9-1.0 area, 3/4-4/3 aspect).
                shape = tf.shape(img)
                bbox = tf.image.sample_distorted_bounding_box(
                    shape,
                    bounding_boxes=tf.zeros([0, 0, 4]),
                    area_range=(0.9, 1.0),
                    aspect_ratio_range=(3.0 / 4.0, 4.0 / 3.0),
                    max_attempts=10,
                    use_image_if_no_bounding_boxes=True,
                    seed=seed,
                )
                offset, extent, _ = bbox
                img = tf.slice(img, offset, extent)
                img = tf.image.resize(img, (size, size), method="bicubic", antialias=True)
            else:
                shape = tf.cast(tf.shape(img)[:2], tf.float32)
                scale = size / tf.reduce_min(shape)
                new_hw = tf.cast(tf.round(shape * scale), tf.int32)
                img = tf.image.resize(img, new_hw, method="bicubic", antialias=True)
                img = tf.image.resize_with_crop_or_pad(img, size, size)
            img = tf.cast(img, tf.float32) / 255.0
            img = (img - mean) / std
            return tf.cast(img, tf.bfloat16), tokens

        ds = tf.data.Dataset.from_tensor_slices((tf.constant(self.paths), tf.constant(self.tokens)))
        if self.train:
            ds = ds.shuffle(self.shuffle_buffer, seed=seed, reshuffle_each_iteration=False)
        rank, count = self._proc()
        if count > 1:
            # Same seed on every host -> identical global order; truncate to
            # an equal floor share (tf.data's shard() gives ceil shares to
            # low ranks, which desynchronizes collective steps), then the
            # strided shard gives disjoint coverage.  Sharding BEFORE map
            # avoids decoding other hosts' rows.
            ds = ds.take(count * (len(self.paths) // count))
            ds = ds.shard(count, rank)
        ds = ds.map(load, num_parallel_calls=tf.data.AUTOTUNE)
        ds = ds.batch(self.batch_size, drop_remainder=self.drop_last)
        ds = ds.prefetch(tf.data.AUTOTUNE)
        return ds

    def __iter__(self) -> Iterator[dict]:
        import ml_dtypes

        for images, tokens in self._build().as_numpy_iterator():
            yield {
                "image": images.view(ml_dtypes.bfloat16) if images.dtype == np.uint16 else images,
                "tokens": tokens.astype(np.int32),
            }


def get_tfdata_csv_loader(
    cfg, is_train: bool, image_size: int = 224, guidance=None, ori_proportion=None,
    list_selection=None, shard_by_process: bool = True,
):
    """cfg-level constructor matching ``get_csv_loader``'s filtering (incl.
    ``list_selection`` class restriction and its ``shard_by_process``
    opt-out for replicated train consumers)."""
    import pandas as pd

    df = pd.read_csv(cfg.ft_data if is_train else cfg.ft_data_test, sep=cfg.csv_separator)
    df_ori = df[df["guidance"] == 100] if ori_proportion is not None else None
    if guidance is not None:
        df = df[df["guidance"] == guidance]
        if cfg.datalimit != -1 and len(df) > cfg.datalimit:
            df = df.sample(n=cfg.datalimit, random_state=cfg.seed, ignore_index=True)
    if ori_proportion is not None:
        num_ori = min(len(df_ori), int(len(df) / (1.0 - ori_proportion) * ori_proportion))
        df = pd.concat([df, df_ori.sample(n=num_ori, random_state=cfg.seed, ignore_index=True)])
    if list_selection is not None:
        # cont_finetune class restriction (csv_dataset.py applies the same
        # isin filter); dropping it silently would train on all classes.
        df = df[df["label"].isin(list_selection)]
    from flyp_tpu.parallel.multihost import local_batch_size

    sharded = is_train and shard_by_process
    return TFDataCsvLoader(
        df, image_size=image_size,
        # Global batch sliced per process for sharded train loaders (see
        # csv_data.get_csv_loader); replicated loaders keep the full batch.
        batch_size=local_batch_size(cfg.batch_size) if sharded else cfg.batch_size,
        train=is_train, seed=cfg.seed,
        # Eval keeps the ragged final batch (the reference scores every test
        # row); train drops it for static step shapes.
        drop_last=is_train,
        shard_by_process=sharded,
    )
