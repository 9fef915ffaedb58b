from audiogpt_tpu.engines.base import Engine, Bucketer  # noqa: F401
