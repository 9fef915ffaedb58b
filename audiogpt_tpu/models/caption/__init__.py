from audiogpt_tpu.models.caption.cnn14 import Cnn14Encoder, Cnn14Config  # noqa: F401
from audiogpt_tpu.models.caption.captioner import (  # noqa: F401
    CaptionModel,
    CaptionConfig,
    caption_greedy_decode,
)
from audiogpt_tpu.models.caption.blip import (  # noqa: F401
    BlipCaptioner,
    BlipConfig,
    greedy_caption,
)
