"""Built-in per-language normalizers + frontend integration."""

import pytest

from chattts_tpu.norm import Normalizer
from chattts_tpu.utils.normalizers import (
    _int_to_words,
    _int_to_zh,
    normalizer_en,
    normalizer_zh,
)


@pytest.mark.parametrize("n,words", [
    (0, "zero"), (7, "seven"), (15, "fifteen"), (42, "forty two"),
    (100, "one hundred"), (215, "two hundred fifteen"),
    (1000, "one thousand"), (1234, "one thousand two hundred thirty four"),
    (1000000, "one million"),
])
def test_int_to_words(n, words):
    assert _int_to_words(n) == words


def test_en_normalizer_numbers():
    en = normalizer_en()
    assert en("I have 3 cats") == "I have three cats"
    assert "percent" in en("50% done")
    assert "dollars" in en("$5 please")
    assert en("born in 1984") == "born in nineteen eighty four"
    assert "42" not in en("item 42")


@pytest.mark.parametrize("n,zh", [
    (0, "零"), (7, "七"), (10, "十"), (14, "十四"), (42, "四十二"),
    (100, "一百"), (105, "一百零五"), (1234, "一千二百三十四"),
    (10000, "一万"), (100000001, "一亿零一"),
])
def test_int_to_zh(n, zh):
    assert _int_to_zh(n) == zh


def test_zh_normalizer():
    zh = normalizer_zh()
    assert zh("我有3只猫") == "我有三只猫"
    assert zh("50%") == "百分之五十"


def test_homophone_replacement_vendored_map():
    """The vendored upstream homophones_map.json loads by default and
    replaces rare zh characters with common homophones (reference
    norm.py:76-92, res/homophones_map.json)."""
    norm = Normalizer()
    assert len(norm.homophones_map) > 16000
    # real pairs from the upstream map
    out = norm("粡聲", do_text_normalization=False,
               do_homophone_replacement=True)
    assert "同" in out and "生" in out
    kept = norm("粡", do_text_normalization=False,
                do_homophone_replacement=False)
    assert "粡" in kept


def test_frontend_integration():
    norm = Normalizer()
    assert norm.register("en", normalizer_en())
    out = norm("I have 3 cats [uv_break] and 2 dogs", lang="en")
    assert "three" in out and "two" in out
    assert "[uv_break]" in out  # tags protected from normalization
    norm.unregister("en")
