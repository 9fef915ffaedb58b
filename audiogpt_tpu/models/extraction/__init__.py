from audiogpt_tpu.models.extraction.lassnet import LASSNet, LASSNetConfig  # noqa: F401
