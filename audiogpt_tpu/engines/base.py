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
