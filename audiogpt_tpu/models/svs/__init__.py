from audiogpt_tpu.models.svs.diffsinger import (  # noqa: F401
    DiffNet,
    DiffNetConfig,
    DiffSinger,
    DiffSingerConfig,
)
