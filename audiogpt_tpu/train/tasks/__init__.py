"""Training recipes (the reference's ``tasks/`` layer, SURVEY.md §2.3)."""

from audiogpt_tpu.train.tasks.fs2 import FS2Task, FS2TaskConfig
from audiogpt_tpu.train.tasks.diffusion import DiffSingerTask, DiffSingerTaskConfig
from audiogpt_tpu.train.tasks.vocoder_gan import VocoderGANTask, VocoderGANTaskConfig
from audiogpt_tpu.train.tasks.tts_adv import (AdvTTSTask, AdvTTSTaskConfig,
    PortaSpeechAdvTask, PortaSpeechAdvTaskConfig)
from audiogpt_tpu.train.tasks.vae import VAETask, VAETaskConfig
from audiogpt_tpu.train.tasks.visinger import VISingerTask, VISingerTaskConfig
from audiogpt_tpu.train.tasks.pe import PETask, PETaskConfig
from audiogpt_tpu.train.tasks.generspeech import GenerSpeechTask, GenerSpeechTaskConfig
from audiogpt_tpu.train.tasks.ldm import LDMTask, LDMTaskConfig
from audiogpt_tpu.train.tasks.sed import SEDTask, SEDTaskConfig
from audiogpt_tpu.train.tasks.caption import CaptionTask, CaptionTaskConfig
from audiogpt_tpu.train.tasks.separation import SeparationTask, SeparationTaskConfig
from audiogpt_tpu.train.tasks.portaspeech import PortaSpeechTask, PortaSpeechTaskConfig
from audiogpt_tpu.train.tasks.clap import CLAPTask, CLAPTaskConfig
from audiogpt_tpu.train.tasks.audio2motion import (
    Audio2MotionTask, Audio2MotionTaskConfig,
)

__all__ = ["FS2Task", "FS2TaskConfig", "DiffSingerTask", "DiffSingerTaskConfig",
           "VocoderGANTask", "VocoderGANTaskConfig", "AdvTTSTask",
           "AdvTTSTaskConfig", "VAETask", "VAETaskConfig", "VISingerTask",
           "VISingerTaskConfig", "PETask", "PETaskConfig",
           "GenerSpeechTask", "GenerSpeechTaskConfig", "LDMTask", "LDMTaskConfig", "SEDTask", "SEDTaskConfig", "CaptionTask", "CaptionTaskConfig",
           "SeparationTask", "SeparationTaskConfig",
           "PortaSpeechTask", "PortaSpeechTaskConfig",
           "PortaSpeechAdvTask", "PortaSpeechAdvTaskConfig",
           "CLAPTask", "CLAPTaskConfig",
           "Audio2MotionTask", "Audio2MotionTaskConfig"]
