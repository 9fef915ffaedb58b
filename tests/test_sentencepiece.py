"""SentencePiece unigram codec (text/sentencepiece.py) — proto roundtrip +
Viterbi parity vs HF ``tokenizers.models.Unigram`` (the fast-tokenizer
implementation of the same algorithm) + T5 conditioner integration."""

import numpy as np
import pytest

from audiogpt_tpu.text.sentencepiece import (CONTROL, NORMAL, UNKNOWN,
                                             SentencePieceUnigram,
                                             parse_sp_model, write_sp_model)

# a tiny but real unigram vocab: specials + word/subword pieces with scores
PIECES = [
    ("<pad>", 0.0, CONTROL), ("</s>", 0.0, CONTROL), ("<unk>", 0.0, UNKNOWN),
    ("▁", -2.7, NORMAL), ("▁the", -1.2, NORMAL), ("▁quick", -3.0, NORMAL),
    ("▁t", -2.5, NORMAL), ("he", -2.0, NORMAL), ("t", -4.0, NORMAL),
    ("h", -4.1, NORMAL), ("e", -3.9, NORMAL), ("q", -4.5, NORMAL),
    ("u", -4.2, NORMAL), ("i", -4.0, NORMAL), ("c", -4.3, NORMAL),
    ("k", -4.4, NORMAL), ("▁brown", -3.1, NORMAL), ("b", -4.6, NORMAL),
    ("r", -4.1, NORMAL), ("o", -4.0, NORMAL), ("w", -4.5, NORMAL),
    ("n", -3.8, NORMAL), ("▁fo", -3.3, NORMAL), ("x", -4.8, NORMAL),
    ("f", -4.4, NORMAL), ("▁ox", -3.6, NORMAL), ("s", -3.9, NORMAL),
]

TEXTS = ["the quick brown fox", "the theft", "he thinks", "fox ox",
         "brownie", "q", "unknown Ω char",
         # consecutive OOV chars fuse into ONE unk (sentencepiece/HF
         # semantics — one unk per char would diverge from T5Tokenizer)
         "ΩΩ twice", "the ΩΩΩ fox", "éé mix Ωé"]


def test_proto_roundtrip(tmp_path):
    blob = write_sp_model(PIECES)
    assert parse_sp_model(blob) == [(p, pytest.approx(s), t)
                                    for p, s, t in PIECES]
    p = tmp_path / "spiece.model"
    p.write_bytes(blob)
    sp = SentencePieceUnigram(str(p))
    assert sp.vocab_size == len(PIECES)
    assert sp.unk_id == 2
    assert sp.index["▁the"] == 4


def test_viterbi_matches_hf_unigram():
    from tokenizers import Tokenizer, models
    from tokenizers.pre_tokenizers import Metaspace

    hf = Tokenizer(models.Unigram([(p, s) for p, s, _ in PIECES], unk_id=2,
                                  byte_fallback=False))
    hf.pre_tokenizer = Metaspace()
    sp = SentencePieceUnigram(write_sp_model(PIECES))
    for t in TEXTS:
        got = sp.encode_pieces(t)
        ref = hf.encode(t).tokens
        # HF maps unknown chars to the unk surface; compare piece-by-piece
        # with unks normalized
        got = ["<unk>" if g not in sp.index else g for g in got]
        ref = ["<unk>" if r not in sp.index else r for r in ref]
        assert got == ref, f"{t!r}: {got} != {ref}"


def test_encode_decode_roundtrip():
    sp = SentencePieceUnigram(write_sp_model(PIECES))
    ids = sp.encode("the quick brown fox")
    assert sp.decode(ids) == "the quick brown fox"
    assert sp.decode(sp.encode("he")) == "he"


def test_t5_conditioner_standalone():
    from audiogpt_tpu.models.textenc.t5 import T5Config, T5Conditioner

    sp = SentencePieceUnigram(write_sp_model(PIECES))
    cond = T5Conditioner(
        T5Config(vocab_size=64, d_model=16, d_ff=32, num_layers=1,
                 num_heads=2, d_kv=8),
        tokenizer=sp, max_length=16)
    out = np.asarray(cond.encode(["the quick brown fox", "he"]))
    assert out.shape == (2, 16, 16)
    # different texts → different conditioning
    assert np.abs(out[0] - out[1]).max() > 1e-4
