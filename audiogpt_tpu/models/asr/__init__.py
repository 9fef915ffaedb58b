from audiogpt_tpu.models.asr.whisper import (  # noqa: F401
    WhisperConfig,
    WhisperEncoder,
    WhisperDecoder,
    WhisperModel,
    whisper_log_mel,
    greedy_decode,
    decode,
)
