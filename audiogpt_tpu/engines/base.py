"""Inference engine substrate.

The reference wraps each model in an ad-hoc tool class that does eager torch
calls with dynamic shapes (``audio-chatgpt.py`` L5 layer). On TPU, dynamic
shapes mean recompiles, so every engine here funnels inputs through a
:class:`Bucketer` — a small set of static shapes (powers-of-two ladder) that
each compile exactly once and then serve any request by pad-and-slice.

Engines are immutable: config + params are fixed at construction (this is
what fixes the reference's global-hparams reentrancy bug,
``audio-chatgpt.py:286-291``), and ``warmup()`` AOT-compiles the buckets.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Sequence

import jax
import numpy as np


class Bucketer:
    """Static-shape ladder: round a dynamic length up to the nearest bucket."""

    def __init__(self, buckets: Sequence[int]):
        if not buckets:
            raise ValueError("need at least one bucket")
        self.buckets = tuple(sorted(buckets))

    def bucket(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        return self.buckets[-1]

    def pad_to_bucket(self, x: np.ndarray, axis: int = -1, value: float = 0.0):
        """Pad ``x`` along ``axis`` to its bucket; returns (padded, true_len)."""
        n = x.shape[axis]
        b = self.bucket(n)
        if n > b:
            raise ValueError(f"length {n} exceeds largest bucket {b}")
        if n == b:
            return x, n
        width = [(0, 0)] * x.ndim
        width[axis if axis >= 0 else x.ndim + axis] = (0, b - n)
        return np.pad(x, width, constant_values=value), n

    @staticmethod
    def ladder(lo: int, hi: int, factor: float = 2.0) -> tuple[int, ...]:
        out = [lo]
        while out[-1] < hi:
            out.append(min(int(out[-1] * factor), hi))
        return tuple(out)


class Engine:
    """Base: holds a jitted callable and per-bucket compile cache."""

    name: str = "engine"

    def __init__(self):
        self._timings: dict[str, float] = {}

    def warmup(self) -> None:
        """AOT-compile all buckets (override). Default: no-op."""

    @staticmethod
    def host_sync(out) -> None:
        """Block until ``out`` has genuinely finished on device by pulling
        one scalar per leaf to the host. ``jax.block_until_ready`` returns
        BEFORE execution (and compilation) finishes on the axon TPU tunnel —
        a warmup that only block_until_ready's leaves its compiles in
        flight, and the first real request stalls behind them (measured:
        188 s first-coalesced-batch exec with cold compiles, 1.6 s with
        persistent-cache hits; 0.5 s once warmup host-syncs)."""
        for leaf in jax.tree_util.tree_leaves(out):
            if hasattr(leaf, "ndim"):
                float(leaf[(0,) * leaf.ndim])  # float() forces the transfer

    # number of sub-canvas slice widths in the download ladder (S/2, S/4, S/8)
    DOWNLOAD_LEVELS = 3

    @classmethod
    def download_rows(cls, arr, ends: Sequence[int]) -> np.ndarray:
        """Device→host download of ``arr[:, :max(ends)]`` through a BOUNDED
        ladder of slice widths (canvas S, S/2, S/4, S/8).

        A per-request ``np.asarray(arr[r, :end])`` compiles a NEW
        shape-specialized slice program for every distinct ``(row, end)``
        pair — unbounded program churn at serve time, and on a degraded
        compile service each first-use costs minutes (measured 593 s for
        one such slice on the axon tunnel). Rounding the slice width up to
        a dyadic ladder keeps the download-bytes win (≤2× the valid bytes
        above S/8 granularity) while the program set stays small enough to
        AOT-warm at startup; callers trim rows host-side."""
        S = arr.shape[-1]
        end_max = max(1, min(S, max(ends)))
        width = S
        for k in range(cls.DOWNLOAD_LEVELS, 0, -1):
            w = S >> k
            if w >= end_max:
                width = w
                break
        if width >= S:
            return np.asarray(arr)            # pure transfer, no program
        return np.asarray(arr[:, :width])     # one of ≤3 slices per canvas

    def _timed(self, key: str, fn: Callable[[], Any]) -> Any:
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        self._timings[key] = time.perf_counter() - t0
        return out

    @property
    def timings(self) -> dict[str, float]:
        """Per-call wall times (the reference's `Timer` util equivalent,
        NeuralSeq/utils/__init__.py:222, always-on)."""
        return dict(self._timings)
