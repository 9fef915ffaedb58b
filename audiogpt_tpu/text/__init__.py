from audiogpt_tpu.text.encoder import TokenTextEncoder, PAD, EOS, UNK, SEG  # noqa: F401
from audiogpt_tpu.text.frontend import EnglishFrontend  # noqa: F401
