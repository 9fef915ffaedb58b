"""Text frontend tests: encoder contract, normalization, G2P sanity."""

import numpy as np

from audiogpt_tpu.text import EnglishFrontend, TokenTextEncoder
from audiogpt_tpu.text.en_g2p import EnG2P, rule_g2p
from audiogpt_tpu.text.norm_en import normalize_numbers, number_to_words, ordinal_to_words


class TestTokenTextEncoder:
    def test_reserved_ids(self):
        enc = TokenTextEncoder(["AA1", "B"])
        assert enc.pad() == 0 and enc.eos() == 1 and enc.unk() == 2
        assert enc.encode("AA1 B") == [3, 4]
        assert enc.encode("ZZZ") == [2]  # OOV → UNK

    def test_decode_strip(self):
        enc = TokenTextEncoder(["x"])
        ids = enc.encode("x x") + [0, 0]
        assert enc.decode(ids, strip_padding=True) == "x x"

    def test_save_load_roundtrip(self, tmp_path):
        enc = TokenTextEncoder(["AA1", "| ".strip(), "S"])
        p = str(tmp_path / "phone_set.json")
        enc.save(p)
        enc2 = TokenTextEncoder.from_file(p)
        assert len(enc2) == len(enc)
        assert enc2.encode("AA1 S") == enc.encode("AA1 S")


class TestNormalization:
    def test_numbers(self):
        assert number_to_words(0) == "zero"
        assert number_to_words(42) == "forty two"
        assert number_to_words(1234) == "one thousand two hundred thirty four"
        assert number_to_words(1000000) == "one million"

    def test_ordinals(self):
        assert ordinal_to_words(1) == "first"
        assert ordinal_to_words(3) == "third"
        assert ordinal_to_words(20) == "twentieth"
        assert ordinal_to_words(21) == "twenty first"

    def test_normalize_text(self):
        assert normalize_numbers("I have 2 cats") == "I have two cats"
        assert "three point one four" in normalize_numbers("pi is 3.14")
        assert "five dollars" in normalize_numbers("$5")
        assert "first" in normalize_numbers("the 1st time")


class TestG2P:
    def test_lexicon_words(self):
        g = EnG2P()
        assert g.word_phones("the") == ["DH", "AH0"]
        assert g.word_phones("hello") == ["HH", "AH0", "L", "OW1"]

    def test_rule_based_plausible(self):
        # unknown words must yield non-empty ARPAbet-ish phones
        for w in ["flumph", "blicket", "snarfle", "greeble"]:
            phs = rule_g2p(w)
            assert len(phs) >= 2, (w, phs)
            assert all(p.rstrip("012").isalpha() for p in phs)

    def test_sentence_has_word_separators(self):
        g = EnG2P()
        phs = g("the cat")
        assert " " in phs
        assert phs.index(" ") > 0

    def test_cmudict_loading(self, tmp_path):
        p = tmp_path / "cmudict"
        p.write_text(";;; comment\nZORBLE  Z AO1 R B AH0 L\n")
        g = EnG2P(str(p))
        assert g.word_phones("zorble") == ["Z", "AO1", "R", "B", "AH0", "L"]


class TestFrontend:
    def test_pipeline(self):
        fe = EnglishFrontend()
        pt = fe("Hello world, 2 cats!")
        assert pt.text.startswith("hello world")
        assert "<BOS>" == pt.phones[0] and "<EOS>" == pt.phones[-1]
        assert "|" in pt.phones  # word boundaries
        assert len(pt.phones) == len(pt.ph2word)
        assert max(pt.ph2word) == len(pt.words) + 1 or max(pt.ph2word) == len(pt.words)

    def test_encode_ids(self):
        fe = EnglishFrontend()
        pt = fe("sing a song")
        enc = EnglishFrontend.build_phone_vocab(pt.phones)
        fe2 = EnglishFrontend(phone_encoder=enc)
        ids = fe2.encode("sing a song")
        assert len(ids) == len(pt.phones)
        assert all(i > 0 for i in ids)  # nothing mapped to PAD

    def test_punctuation_kept_as_phone(self):
        fe = EnglishFrontend()
        pt = fe("stop.")
        assert "." in pt.phones
