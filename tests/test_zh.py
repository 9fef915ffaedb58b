"""Chinese frontend tests: number normalization + pinyin phonemization."""

from audiogpt_tpu.text.zh import (
    PinyinLexicon, ZhFrontend, digits_to_hanzi, normalize_zh, num_to_hanzi,
    split_pinyin,
)


class TestNumbers:
    def test_cardinals(self):
        assert num_to_hanzi(0) == "零"
        assert num_to_hanzi(5) == "五"
        assert num_to_hanzi(10) == "十"
        assert num_to_hanzi(14) == "十四"
        assert num_to_hanzi(20) == "二十"
        assert num_to_hanzi(105) == "一百零五"
        assert num_to_hanzi(250) == "二百五十"
        assert num_to_hanzi(1000) == "一千"
        assert num_to_hanzi(10000) == "一万"
        assert num_to_hanzi(10500) == "一万零五百"
        assert num_to_hanzi(123456789) == "一亿二千三百四十五万六千七百八十九"

    def test_digits(self):
        assert digits_to_hanzi("2024") == "二零二四"

    def test_normalize(self):
        assert normalize_zh("有50%的人") == "有百分之五十的人"
        assert normalize_zh("3.14是") == "三点一四是"
        assert normalize_zh("2024年") == "二零二四年"
        assert normalize_zh("共25个") == "共二十五个"


class TestPinyin:
    def test_split(self):
        assert split_pinyin("xiao3") == ["x", "iao3"]
        assert split_pinyin("zhong1") == ["zh", "ong1"]
        assert split_pinyin("ai4") == ["ai4"]
        assert split_pinyin("er2") == ["er2"]

    def test_lexicon_override(self, tmp_path):
        p = tmp_path / "lex.tsv"
        p.write_text("叵\tpo3\n", encoding="utf-8")
        lex = PinyinLexicon(str(p))
        assert lex("叵") == "po3"
        assert lex("你") == "ni3"  # builtin preserved


class TestFrontend:
    def test_hanzi(self):
        fe = ZhFrontend()
        phones = fe("你好")
        assert phones == ["n", "i3", "|", "h", "ao3"]

    def test_mixed_pinyin_and_punct(self):
        fe = ZhFrontend()
        phones = fe("ni3 hao3。")
        assert phones == ["n", "i3", "|", "h", "ao3", "|", "."]

    def test_numbers_flow_through(self):
        fe = ZhFrontend()
        phones = fe("5个")
        # 5 → 五 (wu3), 个 → ge4
        assert phones == ["w", "u3", "|", "g", "e4"]

    def test_unknown_char(self):
        fe = ZhFrontend()
        assert "<UNK>" in fe("你魃")


def test_zh_tts_frontend_binarizes(tmp_path):
    """ZhTTSFrontend plugs into the TTSBinarizer unchanged: hanzi corpus →
    records with tokens / word fields."""
    import numpy as np
    from audiogpt_tpu.data import TTSBinarizer, load_split
    from audiogpt_tpu.data.binarizer import BinarizeConfig, Item
    from audiogpt_tpu.text.zh import ZhTTSFrontend

    fe = ZhTTSFrontend()
    pt = fe("你好，世界123")
    assert pt.words and len(pt.ph2word) == len(pt.phones)
    assert max(pt.ph2word) == len(pt.words)
    assert "|" in pt.phones

    rng = np.random.default_rng(0)
    items = [Item(name=f"z{i}", wav=rng.normal(size=11025).astype(np.float32) * 0.1,
                  text=t)
             for i, t in enumerate(["你好世界", "今天天气好", "我们走吧",
                                    "谢谢你们"] * 2)]
    cfg = BinarizeConfig(with_f0=False, with_words=True)
    counts = TTSBinarizer(cfg, frontend=fe).binarize(items, str(tmp_path))
    assert counts["train"] >= 4
    rec = load_split(str(tmp_path), "train")[0]
    assert len(rec["tokens"]) == len(rec["ph2word"])
    assert "word_tokens" in rec
