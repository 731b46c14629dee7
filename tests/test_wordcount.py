"""Port of the reference's word-count unit cases (M17):
/root/reference/tests/integration_enhanced_ocr_tests.rs:42-144 and
src/ocr/enhanced.rs:1487-1558 semantics."""

import pyarrow as pa

from readur_ray.functions.wordcount import (
    count_words_array,
    count_words_in_text,
    count_words_safely,
)


def test_normal_spacing():
    assert count_words_safely("the quick brown fox") == 4


def test_multiline():
    assert count_words_safely("line one\nline two\n\nline three") == 6


def test_empty_and_whitespace():
    assert count_words_safely("") == 0
    assert count_words_safely("   \n\t  ") == 0


def test_continuous_camel_case():
    # camelCase transitions + 1
    assert count_words_in_text("helloWorldFooBar") == 4


def test_continuous_letter_digit_transitions():
    # letter->digit, digit->letter = 2 transitions -> 3 words
    assert count_words_in_text("abcdef123defghijkl") == 3


def test_continuous_no_transitions_falls_back_to_div5():
    text = "abcdefghijklmnopqrst"  # 20 alnum, no transitions
    assert count_words_in_text(text) == 4


def test_short_single_word_not_continuous():
    # exactly 1 token but <= 15 bytes -> plain whitespace count
    assert count_words_in_text("hello") == 1


def test_pure_punctuation_zero():
    assert count_words_in_text("!!!???...---###$$$%%%") == 0


def test_big_text_sampling_extrapolation():
    # >1MB: count first 100KB, extrapolate, cap at 10M
    word = "alpha "
    text = word * 200_000  # 1.2MB
    n = count_words_safely(text)
    sample_words = 100_000 // len(word)  # words fully inside first 100KB
    expected_lo = int(sample_words * (len(text) / 100_000)) - 100
    assert abs(n - 200_000) < 5000
    assert n >= expected_lo


def test_cap_at_10m():
    assert count_words_safely("a " * 15_000_000) == 10_000_000


def test_array_matches_scalar():
    cases = [
        "the quick brown fox",
        "helloWorldFooBar",
        "abcdefghijklmnopqrst",
        "",
        "   ",
        "one",
        "!!!???...---###$$$%%%",
        "café — naïve 模型 test",
        "x" * 40,
    ]
    out = count_words_array(pa.array(cases, pa.string())).to_pylist()
    assert out == [count_words_safely(c) for c in cases]
