from audiogpt_tpu.models.tts.fastspeech2 import (  # noqa: F401
    FastSpeech2,
    FastSpeech2Config,
    length_regulator,
    f0_to_coarse,
    norm_f0,
    denorm_f0,
)
from audiogpt_tpu.models.tts.portaspeech import (  # noqa: F401
    PortaSpeech,
    PortaSpeechConfig,
)
