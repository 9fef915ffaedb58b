"""Training recipes (the reference's ``tasks/`` layer, SURVEY.md §2.3)."""

from audiogpt_tpu.train.tasks.fs2 import FS2Task, FS2TaskConfig
from audiogpt_tpu.train.tasks.diffusion import DiffSingerTask, DiffSingerTaskConfig
from audiogpt_tpu.train.tasks.vocoder_gan import VocoderGANTask, VocoderGANTaskConfig

__all__ = ["FS2Task", "FS2TaskConfig", "DiffSingerTask", "DiffSingerTaskConfig",
           "VocoderGANTask", "VocoderGANTaskConfig"]
