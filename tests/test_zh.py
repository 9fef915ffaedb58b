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
