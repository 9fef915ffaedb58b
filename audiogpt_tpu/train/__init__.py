"""Training runtime: SPMD trainer, optimizers, checkpoints, metrics, recipes.

Replaces the reference's forked pytorch-lightning stack
(``NeuralSeq/utils/pl_utils.py``, ``tasks/base_task.py`` — SURVEY.md §2.3)
with one-process-per-host pjit training over a device mesh.
"""

from audiogpt_tpu.train.checkpoint import CheckpointStore
from audiogpt_tpu.train.metrics import AvgMeter, MeterBank, MetricsLogger
from audiogpt_tpu.train.optim import OptimConfig, make_optimizer, warmup_rsqrt_schedule
from audiogpt_tpu.train.trainer import Trainer, TrainerConfig

__all__ = ["CheckpointStore", "AvgMeter", "MeterBank", "MetricsLogger",
           "OptimConfig", "make_optimizer", "warmup_rsqrt_schedule",
           "Trainer", "TrainerConfig"]
