"""Dictionary word break for Thai/Lao/Khmer runs (ICUTokenizer analog)."""

from __future__ import annotations

import pytest

from apache___solr_spark.analysis.dictbreak import (
    BreakDictionary,
    dictionary_break_tokens,
    make_sea_analyzer,
)

# A miniature Thai lexicon (the mechanism is dictionary-agnostic; ICU's
# CLDR dictionary would load the same way).
THAI = BreakDictionary(
    ["สวัสดี", "ครับ", "ภาษา", "ไทย", "คน", "ดี", "มาก", "ภา"]
)


def test_segment_greedy_longest():
    assert THAI.segment("สวัสดีครับ") == ["สวัสดี", "ครับ"]
    assert THAI.segment("ภาษาไทย") == ["ภาษา", "ไทย"]


def test_segment_prefers_coverage_over_greed():
    # Greedy would take "ภา" + unsegmentable tail; DP finds "ภาษา"+"ไทย".
    d = BreakDictionary(["ภา", "ภาษา", "ไทย"])
    assert d.segment("ภาษาไทย") == ["ภาษา", "ไทย"]


def test_oov_chars_fall_through_as_singles():
    # ฤ is not in the lexicon: it survives as a single-char token.
    got = THAI.segment("ฤสวัสดี")
    assert got == ["ฤ", "สวัสดี"]


def test_mixed_script_token_splits_at_boundary():
    got = dictionary_break_tokens(["ภาษาไทยkid123"], THAI)
    assert got == ["ภาษา", "ไทย", "kid123"]


def test_latin_tokens_untouched():
    toks = ["hello", "world", "a1"]
    assert dictionary_break_tokens(toks, THAI) == toks


def test_analyzer_composition():
    analyze_sea = make_sea_analyzer(
        ["สวัสดี", "ครับ", "ภาษา", "ไทย"]
    )
    assert analyze_sea("hello สวัสดีครับ ภาษาไทย") == [
        "hello", "สวัสดี", "ครับ", "ภาษา", "ไทย",
    ]
    assert analyze_sea(None) == []


def test_empty_dictionary_rejected():
    with pytest.raises(ValueError):
        BreakDictionary([])


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-q"]))
