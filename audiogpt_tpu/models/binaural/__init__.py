from audiogpt_tpu.models.binaural.binaural import (  # noqa: F401
    BinauralNetwork,
    BinauralConfig,
    binauralize_chunked,
)
