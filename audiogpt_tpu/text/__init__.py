from audiogpt_tpu.text.encoder import TokenTextEncoder, PAD, EOS, UNK, SEG  # noqa: F401
from audiogpt_tpu.text.frontend import EnglishFrontend  # noqa: F401
from audiogpt_tpu.text.bpe import (ByteBPE, ClipTokenizer,  # noqa: F401
                                   WhisperDetokenizer, load_bpe_dir,
                                   load_clip_bpe)


def default_arpabet_vocab() -> list[str]:
    """Built-in ARPAbet phone set covering the rule-based G2P's output
    space: stressed vowels + consonants + word separator, punctuation and
    BOS/EOS specials (shared by the TTS/style-transfer engines)."""
    vowels = ["AA", "AE", "AH", "AO", "AW", "AY", "EH", "ER",
              "EY", "IH", "IY", "OW", "OY", "UH", "UW"]
    return sorted(
        [v + s for v in vowels for s in "012"]
        + ["B", "CH", "D", "DH", "F", "G", "HH", "JH", "K", "L",
           "M", "N", "NG", "P", "R", "S", "SH", "T", "TH", "V",
           "W", "Y", "Z", "ZH"]
        + ["|", "<BOS>", "<EOS>", "!", ",", ".", "?", ";", ":"])
