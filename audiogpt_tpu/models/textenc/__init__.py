from audiogpt_tpu.models.textenc.bert import BertConfig, BertEncoder  # noqa: F401
from audiogpt_tpu.models.textenc.clap import (  # noqa: F401
    CLAPTextConfig,
    CLAPTextEncoder,
    Projection,
)
from audiogpt_tpu.models.textenc.t5 import (  # noqa: F401
    T5Conditioner,
    T5Config,
    T5Encoder,
)
