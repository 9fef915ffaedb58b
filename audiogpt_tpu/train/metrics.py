"""Training metrics + observability.

Reference: ``AvgrageMeter`` (``NeuralSeq/utils/__init__.py:28``), TensorBoard
via rank-0-only ``TensorBoardLogger`` (``tasks/base_task.py:237``,
``pl_utils.py:934``). Here: the same epoch meters, a machine-readable JSONL
stream (one line per log event — greppable, no TB dependency), and an
optional TensorBoard writer when torch's is importable. Multi-host: only
process 0 writes (replaces rank-0 checks).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Mapping

import jax
import numpy as np


class AvgMeter:
    def __init__(self):
        self.reset()

    def reset(self):
        self.avg, self.sum, self.cnt = 0.0, 0.0, 0

    def update(self, val: float, n: int = 1):
        if not np.isfinite(val):
            return  # reference skips NaN losses in meters (base_task.py:137)
        self.sum += val * n
        self.cnt += n
        self.avg = self.sum / max(self.cnt, 1)


class MeterBank:
    def __init__(self):
        self._meters: dict[str, AvgMeter] = {}

    def update(self, metrics: Mapping[str, Any], n: int = 1):
        for k, v in metrics.items():
            v = float(np.asarray(v))
            self._meters.setdefault(k, AvgMeter()).update(v, n)

    def averages(self) -> dict[str, float]:
        return {k: m.avg for k, m in self._meters.items()}

    def reset(self):
        for m in self._meters.values():
            m.reset()


class MetricsLogger:
    """JSONL + optional TensorBoard, process-0 only."""

    def __init__(self, work_dir: str, use_tensorboard: bool = True):
        self.work_dir = work_dir
        self.is_main = jax.process_index() == 0
        self._f = None
        self._tb = None
        if not self.is_main:
            return
        os.makedirs(work_dir, exist_ok=True)
        self._f = open(os.path.join(work_dir, "metrics.jsonl"), "a")
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(os.path.join(work_dir, "tb"))
            except Exception:
                self._tb = None

    def log(self, step: int, metrics: Mapping[str, Any], prefix: str = "tr"):
        if not self.is_main:
            return
        scalars = {k: float(np.asarray(v)) for k, v in metrics.items()}
        self._f.write(json.dumps(
            {"step": step, "t": time.time(), "prefix": prefix, **scalars}) + "\n")
        self._f.flush()
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(f"{prefix}/{k}", v, step)

    def log_mel_figure(self, step: int, name: str, mel: np.ndarray,
                       gt: np.ndarray | None = None):
        """Validation mel plot (``save_valid_result`` →
        ``utils/plot.spec_to_figure`` in the reference): PNG under
        ``work_dir/figures/`` and, when available, a TensorBoard figure.
        ``mel``/``gt``: [frames, n_mels]."""
        if not self.is_main:
            return
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        mel = np.asarray(mel)
        if gt is not None:
            gt = np.asarray(gt)
            vmin = min(mel.min(), gt.min())
            gap = np.full((2, mel.shape[1]), vmin)
            # gt on top, prediction below — the reference stacks them in one
            # image with a shared color scale
            data = np.concatenate([gt, gap, mel], axis=0)
        else:
            data = mel
        fig = plt.figure(figsize=(12, 6))
        plt.imshow(data.T, origin="lower", aspect="auto", interpolation="none")
        plt.colorbar()
        plt.title(f"{name} @ {step}" + (" (top: gt, bottom: pred)"
                                        if gt is not None else ""))
        fig_dir = os.path.join(self.work_dir, "figures")
        os.makedirs(fig_dir, exist_ok=True)
        fig.savefig(os.path.join(fig_dir, f"{name}_{step}.png"), dpi=80)
        if self._tb is not None:
            self._tb.add_figure(f"val/{name}", fig, step)
        plt.close(fig)

    def close(self):
        if self._f:
            self._f.close()
        if self._tb:
            self._tb.close()
