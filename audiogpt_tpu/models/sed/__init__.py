from audiogpt_tpu.models.sed.panns_sed import (  # noqa: F401
    SEDModel,
    SEDConfig,
    audioset_labels,
    detect_events,
)
