"""Epoch-seeded, process-sharded index sampling.

Host-side counterpart of the reference's DistributedSampler / RASampler usage
(reference dataset/datasets.py:126-223). Pure numpy over index arrays — the
actual pixels never touch the host pipeline beyond a gather.

Note on reference bug B1 (SURVEY.md §2.9): the reference's single-process
path accidentally overwrites its RandomSampler with a SequentialSampler and
never shuffles; here single-process training shuffles like any other world
size (world=1 is just the degenerate shard).
"""

from __future__ import annotations

import numpy as np


def shard_indices(epoch: int, n: int, *, world: int = 1, rank: int = 0,
                  shuffle: bool = True, seed: int = 0) -> np.ndarray:
    """DistributedSampler semantics: pad to a multiple of world, round-robin
    shard by rank, deterministic per-epoch shuffle."""
    if shuffle:
        g = np.random.default_rng(seed + epoch)
        indices = g.permutation(n)
    else:
        indices = np.arange(n)
    num_samples = -(-n // world)
    total = num_samples * world
    if total > n:
        indices = np.concatenate([indices, indices[: total - n]])
    return indices[rank:total:world]


def repeated_aug_indices(epoch: int, n: int, *, world: int = 1, rank: int = 0,
                         num_repeats: int = 3, seed: int = 0) -> np.ndarray:
    """DeiT RASampler (reference dataset/datasets.py:174-223): every index
    repeated ``num_repeats`` times, sharded round-robin, truncated to
    floor(n // 256 * 256 / world) selected samples per process."""
    g = np.random.default_rng(seed + epoch)
    indices = g.permutation(n)
    indices = np.repeat(indices, num_repeats)
    num_samples = -(-n * num_repeats // world)
    total = num_samples * world
    if total > len(indices):
        indices = np.concatenate([indices, indices[: total - len(indices)]])
    shard = indices[rank:total:world]
    assert len(shard) == num_samples
    num_selected = int(n // 256 * 256 / world)
    return shard[:num_selected]


def epoch_indices(epoch: int, n: int, *, is_train: bool, world: int, rank: int,
                  repeated_aug: bool, seed: int = 0) -> np.ndarray:
    if is_train and repeated_aug and world > 1:
        # RASampler is only engaged for distributed training in the reference
        # (datasets.py:129-137); we keep that gating.
        return repeated_aug_indices(epoch, n, world=world, rank=rank, seed=seed)
    return shard_indices(epoch, n, world=world, rank=rank, shuffle=is_train,
                         seed=seed)
