"""Length-aware batching with TPU static-shape discipline.

The reference batches by token count with dynamic per-batch padding
(``BaseDataset.ordered_indices`` at ``NeuralSeq/tasks/base_task.py:60``,
``batch_by_size`` at ``NeuralSeq/utils/__init__.py:89``) — every batch gets a
different padded length, which on TPU would trigger a recompile per batch.

TPU re-design: the same shuffle-then-stable-sort + token-budget grouping, but
each batch is then padded UP to a small ladder of (batch, length) buckets so
the trainer compiles a handful of programs total. ``EndlessSampler`` replaces
``EndlessDistributedSampler`` (``tasks/vocoder/dataset_utils.py``) with
epoch-seeded shuffling and per-host sharding for multi-host input pipelines.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Iterator, Sequence

import numpy as np


def ordered_indices(
    sizes: Sequence[int], shuffle: bool = True, sort_by_len: bool = True,
    seed: int | None = None,
) -> np.ndarray:
    """Random permutation then mergesort by size — equal-length items keep
    the random order (base_task.py:60-69)."""
    sizes = np.asarray(sizes)
    if not shuffle:
        return np.arange(len(sizes))
    rng = np.random.default_rng(seed)
    idx = rng.permutation(len(sizes))
    if sort_by_len:
        idx = idx[np.argsort(sizes[idx], kind="mergesort")]
    return idx


def batch_by_size(
    indices: Sequence[int],
    num_tokens_fn: Callable[[int], int],
    max_tokens: int | None = None,
    max_sentences: int | None = None,
    required_batch_size_multiple: int = 1,
) -> list[list[int]]:
    """Token-budget batching with the reference's exact split rule
    (utils/__init__.py:89-143): a batch closes when adding one more item
    would exceed ``max_tokens`` (at the running max item length) or
    ``max_sentences``; the closed batch is trimmed to a multiple of
    ``required_batch_size_multiple`` and the tail rolls forward."""
    import sys

    max_tokens = max_tokens if max_tokens is not None else sys.maxsize
    max_sentences = max_sentences if max_sentences is not None else sys.maxsize
    bsz_mult = required_batch_size_multiple

    batches: list[list[int]] = []
    batch: list[int] = []
    sample_lens: list[int] = []
    sample_len = 0
    for idx in indices:
        idx = int(idx)
        n = num_tokens_fn(idx)
        sample_lens.append(n)
        sample_len = max(sample_len, n)
        if sample_len > max_tokens:
            raise ValueError(
                f"item {idx} has {sample_len} tokens > max_tokens={max_tokens}")
        projected = (len(batch) + 1) * sample_len
        full = len(batch) > 0 and (
            len(batch) == max_sentences or projected > max_tokens)
        if full:
            mod_len = max(bsz_mult * (len(batch) // bsz_mult),
                          len(batch) % bsz_mult)
            batches.append(batch[:mod_len])
            batch = batch[mod_len:]
            sample_lens = sample_lens[mod_len:]
            sample_len = max(sample_lens) if sample_lens else 0
        batch.append(idx)
    if batch:
        batches.append(batch)
    return batches


@dataclasses.dataclass(frozen=True)
class BucketSpec:
    """Static-shape ladder for (batch, length). Lengths round up to the next
    rung; batch pads up to the batch bucket with zero-weight dummy rows."""

    length_buckets: tuple[int, ...]
    batch_buckets: tuple[int, ...]

    def round_len(self, n: int) -> int:
        for b in self.length_buckets:
            if n <= b:
                return b
        return self.length_buckets[-1]

    def round_batch(self, n: int) -> int:
        for b in self.batch_buckets:
            if n <= b:
                return b
        return self.batch_buckets[-1]

    @staticmethod
    def dyadic(max_len: int, max_batch: int, min_len: int = 128,
               min_batch: int = 1) -> "BucketSpec":
        """``min_batch`` should be (a multiple of) the mesh ``data``-axis
        size so every batch bucket shards evenly; short batches pad up with
        zero-weight rows."""
        lens = [min_len]
        while lens[-1] < max_len:
            lens.append(min(lens[-1] * 2, max_len))
        bs = [min_batch]
        while bs[-1] < max_batch:
            bs.append(min(bs[-1] * 2, max_batch))
        return BucketSpec(tuple(lens), tuple(bs))


class EndlessSampler:
    """Infinite epoch-seeded shuffled index stream, sharded per host.

    Replaces ``EndlessDistributedSampler`` — each host sees a disjoint
    1/``num_shards`` slice of every epoch's permutation; the permutation is
    identical across hosts because it is keyed only by (seed, epoch).
    """

    def __init__(self, n: int, seed: int = 0, shard: int = 0,
                 num_shards: int = 1, shuffle: bool = True):
        if not 0 <= shard < num_shards:
            raise ValueError(f"shard {shard} out of range [0, {num_shards})")
        self.n, self.seed, self.shuffle = n, seed, shuffle
        self.shard, self.num_shards = shard, num_shards

    def epoch_indices(self, epoch: int) -> np.ndarray:
        if self.shuffle:
            idx = np.random.default_rng((self.seed, epoch)).permutation(self.n)
        else:
            idx = np.arange(self.n)
        return idx[self.shard::self.num_shards]

    def __iter__(self) -> Iterator[int]:
        epoch = 0
        while True:
            for i in self.epoch_indices(epoch):
                yield int(i)
            epoch += 1


def collate_1d(values: list[np.ndarray], pad: float = 0.0,
               max_len: int | None = None, shift_right: bool = False,
               shift_id: int = 1) -> np.ndarray:
    """Stack variable-length 1-D arrays into [B, L] (utils/__init__.py:44)."""
    L = max_len if max_len is not None else max(len(v) for v in values)
    out = np.full((len(values), L), pad, dtype=np.asarray(values[0]).dtype)
    for i, v in enumerate(values):
        v = np.asarray(v)[:L]
        if shift_right:
            out[i, 1:len(v)] = v[:-1]
            out[i, 0] = shift_id
        else:
            out[i, :len(v)] = v
    return out


def collate_2d(values: list[np.ndarray], pad: float = 0.0,
               max_len: int | None = None) -> np.ndarray:
    """Stack variable-length [T_i, D] arrays into [B, L, D]."""
    L = max_len if max_len is not None else max(v.shape[0] for v in values)
    D = np.asarray(values[0]).shape[1]
    out = np.full((len(values), L, D), pad, dtype=np.asarray(values[0]).dtype)
    for i, v in enumerate(values):
        v = np.asarray(v)[:L]
        out[i, :v.shape[0]] = v
    return out
