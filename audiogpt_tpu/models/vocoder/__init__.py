from audiogpt_tpu.models.vocoder.hifigan import HifiGANGenerator, HifiGANConfig  # noqa: F401
from audiogpt_tpu.models.vocoder.bigvgan import BigVGANGenerator, BigVGANConfig  # noqa: F401
