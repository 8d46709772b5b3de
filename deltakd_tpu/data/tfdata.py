"""High-throughput host input pipeline on tf.data (optional).

The default loader decodes with PIL in a thread pool — fine for CIFAR-scale
arrays, but ImageNet-scale training at ~1800 img/s/chip needs a native
parallel decode path. This loader keeps the exact same epoch/sharding
semantics (it reuses ``sampler.epoch_indices`` for index selection, so
ordering matches the python loader batch-for-batch) and hands the decode +
raw-canvas standardization to tf.data's C++ runtime. All augmentation still
happens on the TPU (data/augment.py); TF only produces raw uint8 batches.

Enabled with ``--data-loader tfdata``; requires tensorflow (CPU) at runtime
and falls back loudly when missing.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np

from deltakd_tpu.data.sampler import epoch_indices


class TFDataLoader:
    """tf.data-backed Loader with the same interface as data.pipeline.Loader."""

    def __init__(self, source, *, batch_size: int, is_train: bool,
                 world: int = 1, rank: int = 0, repeated_aug: bool = False,
                 seed: int = 0, prefetch: int = 4):
        import tensorflow as tf  # noqa: F401  (fail early when unavailable)

        tf.config.set_visible_devices([], "GPU")
        if not hasattr(source, "samples"):
            raise ValueError(
                "tfdata loader requires a file-backed source (ImageFolder "
                "layout); array-backed datasets (CIFAR/synthetic) are already "
                "fast on the python loader")
        self.source = source
        self.paths = np.asarray([p for p, _ in source.samples])
        self.labels = np.asarray([l for _, l in source.samples], np.int32)
        self.raw_size = source.raw_size
        self.batch_size = batch_size
        self.is_train = is_train
        self.world = world
        self.rank = rank
        self.repeated_aug = repeated_aug
        self.seed = seed
        self.prefetch = prefetch
        self.drop_last = is_train

    def steps_per_epoch(self, epoch: int = 0) -> int:
        n = len(epoch_indices(epoch, len(self.paths), is_train=self.is_train,
                              world=self.world, rank=self.rank,
                              repeated_aug=self.repeated_aug, seed=self.seed))
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __len__(self) -> int:
        return self.steps_per_epoch(0)

    def _decode_fn(self):
        import tensorflow as tf

        raw = self.raw_size

        def decode(path, label):
            data = tf.io.read_file(path)
            img = tf.io.decode_image(data, channels=3, expand_animations=False)
            shape = tf.shape(img)
            h, w = shape[0], shape[1]
            scale = tf.cast(raw, tf.float32) / tf.cast(tf.minimum(h, w), tf.float32)
            nh = tf.cast(tf.round(tf.cast(h, tf.float32) * scale), tf.int32)
            nw = tf.cast(tf.round(tf.cast(w, tf.float32) * scale), tf.int32)
            img = tf.image.resize(img, (nh, nw), method="bilinear")
            top = (nh - raw) // 2
            left = (nw - raw) // 2
            img = tf.image.crop_to_bounding_box(img, top, left, raw, raw)
            return tf.cast(tf.round(img), tf.uint8), label

        return decode

    def epoch(self, epoch: int) -> Iterator[Tuple[np.ndarray, np.ndarray, int]]:
        import tensorflow as tf

        indices = epoch_indices(epoch, len(self.paths), is_train=self.is_train,
                                world=self.world, rank=self.rank,
                                repeated_aug=self.repeated_aug, seed=self.seed)
        n_steps = self.steps_per_epoch(epoch)
        n_used = n_steps * self.batch_size
        if len(indices) < n_used:  # eval tail padding by wraparound
            indices = np.concatenate([indices, indices[: n_used - len(indices)]])
        n_valid_last = (len(epoch_indices(epoch, len(self.paths),
                                          is_train=self.is_train,
                                          world=self.world, rank=self.rank,
                                          repeated_aug=self.repeated_aug,
                                          seed=self.seed))
                        - (n_steps - 1) * self.batch_size)
        indices = indices[:n_used]

        ds = tf.data.Dataset.from_tensor_slices(
            (self.paths[indices], self.labels[indices]))
        ds = ds.map(self._decode_fn(), num_parallel_calls=tf.data.AUTOTUNE,
                    deterministic=True)
        ds = ds.batch(self.batch_size, drop_remainder=True)
        ds = ds.prefetch(self.prefetch)

        for step, (images, labels) in enumerate(ds.as_numpy_iterator()):
            n_valid = (self.batch_size if step < n_steps - 1
                       else min(n_valid_last, self.batch_size))
            yield images, labels, n_valid


def make_loader(cfg, source, *, is_train: bool, batch_size: int, world: int,
                rank: int, repeated_aug: bool = False, seed: int = 0):
    """Loader factory honoring --data-loader."""
    from deltakd_tpu.data.pipeline import Loader

    if getattr(cfg, "data_loader", "python") == "tfdata":
        if hasattr(source, "samples"):
            return TFDataLoader(source, batch_size=batch_size, is_train=is_train,
                                world=world, rank=rank, repeated_aug=repeated_aug,
                                seed=seed)
        import warnings

        warnings.warn(
            "--data-loader tfdata requested but the dataset is array-backed "
            "(CIFAR/synthetic) — falling back to the python loader, which is "
            "already zero-decode for in-memory arrays", stacklevel=2)
    return Loader(source, batch_size=batch_size, is_train=is_train,
                  world=world, rank=rank, repeated_aug=repeated_aug, seed=seed)
