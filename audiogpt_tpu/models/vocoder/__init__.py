from audiogpt_tpu.models.vocoder.hifigan import HifiGANGenerator, HifiGANConfig  # noqa: F401
from audiogpt_tpu.models.vocoder.bigvgan import BigVGANGenerator, BigVGANConfig  # noqa: F401
from audiogpt_tpu.models.vocoder.pwg import (  # noqa: F401
    MelGANConfig, MelGANGenerator, PWGConfig, PWGGenerator)
from audiogpt_tpu.models.vocoder.discriminators import (  # noqa: F401
    DiscriminatorConfig, HifiGANDiscriminator)
