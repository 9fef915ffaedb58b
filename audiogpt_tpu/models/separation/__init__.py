from audiogpt_tpu.models.separation.convtasnet import (  # noqa: F401
    ConvTasNet,
    ConvTasNetConfig,
)
