"""Text frontend tests: normalizers, segmentation, pinyin split, tokens.txt.

The reference tokenizer/normalizer modules cannot even be imported without
piper_phonemize/cn2an/inflect, so these are behavior tests; the segmentation
example comes from the reference docstring (tokenizer.py:399-401).
"""

import numpy as np
import pytest

from zipvoice_tpu.text.normalizer import ChineseTextNormalizer, EnglishTextNormalizer
from zipvoice_tpu.text.numbers import (
    int_to_chinese,
    number_to_ordinal_words,
    number_to_words,
    number_to_words_year,
)
from zipvoice_tpu.text.tokenizer import (
    DialogTokenizer,
    EmiliaTokenizer,
    SimpleTokenizer,
    is_valid_tone3_pinyin,
    split_pinyin,
    write_token_file,
)


def test_number_to_words():
    assert number_to_words(0) == "zero"
    assert number_to_words(7) == "seven"
    assert number_to_words(21) == "twenty-one"
    assert number_to_words(105) == "one hundred five"
    assert number_to_words(1234567) == (
        "one million, two hundred thirty-four thousand, five hundred sixty-seven"
    )
    assert number_to_words_year(1905) == "nineteen oh five"
    assert number_to_words_year(2024) == "twenty twenty-four"
    assert number_to_ordinal_words(3) == "third"
    assert number_to_ordinal_words(20) == "twentieth"
    assert number_to_ordinal_words(25) == "twenty-fifth"


def test_english_normalizer():
    import re

    n = EnglishTextNormalizer()

    def norm(s):
        return re.sub(r"\s+", " ", n.normalize(s)).strip()

    assert norm("Mr. Smith") == "mister. Smith"
    assert "nineteen ninety-nine" in norm("in 1999")
    assert "two thousand" in norm("year 2000")
    assert "two thousand five" in norm("year 2005")
    assert "five dollars" in norm("$5")
    # like the reference, dollar counts are re-expanded by the number pass
    assert "one dollar, fifty cents" in norm("$1.50")
    assert "fifty percent" in norm("50%")
    assert "three point fourteen" in norm("3.14")  # digit groups expand whole, as in ref
    assert "one half" in norm("1/2")
    assert "three" in norm("3 cats")
    assert "first" in norm("1st place")
    # comma-grouped numbers
    assert "one thousand" in norm("1,000 items")


def test_chinese_normalizer():
    n = ChineseTextNormalizer()
    assert int_to_chinese(0) == "零"
    assert int_to_chinese(15) == "十五"
    assert int_to_chinese(123) == "一百二十三"
    assert int_to_chinese(10500) == "一万零五百"
    assert int_to_chinese(90) == "九十"
    assert n.normalize("超过90的人") == "超过九十的人"
    assert n.normalize("1.5倍") == "一点五倍"


def test_pinyin_split():
    assert split_pinyin("zhong1") == ["zh0", "ong1"]
    assert split_pinyin("le5") == ["l0", "e5"]
    assert split_pinyin("an4") == ["an4"]
    assert split_pinyin("yuan2") == ["y0", "uan2"]
    assert split_pinyin("chi3") == ["ch0", "i3"]
    assert is_valid_tone3_pinyin("zhong1")
    assert not is_valid_tone3_pinyin("hello")
    assert not is_valid_tone3_pinyin("1")


def test_segmentation_reference_example():
    tok = EmiliaTokenizer()
    segs = tok.get_segment("我们是小米人,是吗? Yes I think so!霍...啦啦啦")
    assert segs == [
        ("我们是小米人,是吗? ", "zh"),
        ("Yes I think so!", "en"),
        ("霍...啦啦啦", "zh"),
    ]


def test_segmentation_pinyin_and_tags():
    tok = EmiliaTokenizer()
    segs = tok.get_segment("超过90%的人<le5>说[S1]hello")
    kinds = [k for _, k in segs]
    assert ("<le5>", "pinyin") in segs
    assert ("[S1]", "tag") in segs
    assert kinds[0] == "zh"
    # pinyin escape tokenization
    assert tok.tokenize_pinyin("<le5>") == ["l0", "e5"]
    assert tok.tokenize_pinyin("<junk>") == []


def test_punctuation_mapping():
    tok = EmiliaTokenizer()
    assert tok.map_punctuations("你好，世界。") == "你好,世界."
    assert tok.map_punctuations("wait...") == "wait…"


def test_simple_tokenizer_and_token_file(tmp_path):
    token2id = {"_": 0, "a": 1, "b": 2, "c": 3, " ": 4}
    path = tmp_path / "tokens.txt"
    write_token_file(token2id, str(path))
    tok = SimpleTokenizer(str(path))
    assert tok.pad_id == 0
    assert tok.vocab_size == 5
    ids = tok.texts_to_token_ids(["ab cz"])  # z is OOV -> skipped
    assert ids == [[1, 2, 4, 3]]


def test_dialog_tokenizer_preprocess(tmp_path):
    token2id = {"_": 0, "[S1]": 1, "[S2]": 2, "a": 3}
    path = tmp_path / "tokens.txt"
    write_token_file(token2id, str(path))
    tok = DialogTokenizer(str(path))
    assert tok.spk_a_id == 1 and tok.spk_b_id == 2
    assert tok.preprocess_text("hi [S1] there [S2]x") == "hi[S1]there[S2]x"


def test_emilia_tag_tokens(tmp_path):
    # tags pass through as single tokens even without G2P backends
    token2id = {"_": 0, "[S1]": 1, "[S2]": 2}
    path = tmp_path / "tokens.txt"
    write_token_file(token2id, str(path))
    tok = DialogTokenizer(str(path))
    tokens = tok.texts_to_tokens(["[S1][S2]"])
    assert tokens == [["[S1]", "[S2]"]]
    assert tok.texts_to_token_ids(["[S1][S2]"]) == [[1, 2]]
