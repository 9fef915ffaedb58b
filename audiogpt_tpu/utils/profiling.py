"""Tracing / profiling utilities.

The reference has only a cumulative wall-clock ``Timer``
(``NeuralSeq/utils/__init__.py:222-238``) gated by ``profile_infer``. TPU
plan per SURVEY.md §5: first-class ``jax.profiler`` traces + per-tool RTF
counters.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Iterator


class Timer:
    """Cumulative named wall-clock meters (reference Timer semantics,
    always-on, no global flag)."""

    totals: dict[str, float] = defaultdict(float)
    counts: dict[str, int] = defaultdict(int)

    def __init__(self, name: str, print_time: bool = False):
        self.name = name
        self.print_time = print_time

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        Timer.totals[self.name] += dt
        Timer.counts[self.name] += 1
        if self.print_time:
            print(self.name, round(Timer.totals[self.name], 4))

    @classmethod
    def report(cls) -> dict[str, dict[str, float]]:
        return {k: {"total_s": cls.totals[k], "calls": cls.counts[k],
                    "mean_s": cls.totals[k] / max(cls.counts[k], 1)}
                for k in cls.totals}

    @classmethod
    def reset(cls):
        cls.totals.clear()
        cls.counts.clear()


class RTFMeter:
    """Real-time-factor counter: feed (wall_seconds, audio_seconds) pairs.

    Thread-safe: the serving layer updates meters from concurrent HTTP
    handler threads (ADVICE r1)."""

    def __init__(self):
        import threading

        self.wall = 0.0
        self.audio = 0.0
        self.calls = 0
        self._lock = threading.Lock()

    def update(self, wall_s: float, audio_s: float):
        with self._lock:
            self.wall += wall_s
            self.audio += audio_s
            self.calls += 1

    @property
    def rtf(self) -> float:
        return self.wall / max(self.audio, 1e-9)

    @contextlib.contextmanager
    def measure(self, audio_s: float) -> Iterator[None]:
        t0 = time.perf_counter()
        yield
        self.update(time.perf_counter() - t0, audio_s)


@contextlib.contextmanager
def device_trace(log_dir: str) -> Iterator[None]:
    """Capture an XLA device trace viewable in TensorBoard/Perfetto
    (``jax.profiler.start_trace``)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def start_profiler_server(port: int = 9999) -> None:
    """Expose the live profiling endpoint for ``tensorboard --logdir`` /
    remote capture."""
    import jax

    jax.profiler.start_server(port)
