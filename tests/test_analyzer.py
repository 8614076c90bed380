"""Golden-token analyzer tests — mirrors TestStandardAnalyzer /
BaseTokenStreamTestCase.assertTokenStreamContents (FIXTURES.md §2)."""

import numpy as np
import pandas as pd

from lucene_solr_1_spark.kernels.analyzer import (
    ENGLISH,
    ENGLISH_STOP_WORDS,
    STANDARD,
    AnalyzerConfig,
    analyze_series,
    flatten_tokens,
    tokenize_one,
)


def assert_tokens(text, expected_terms, expected_pos=None, cfg=STANDARD):
    terms, pos = tokenize_one(text, cfg)
    assert terms == expected_terms, (text, terms)
    if expected_pos is not None:
        assert pos == expected_pos, (text, pos)


def test_golden_standard():
    # ref: TestStandardAnalyzer.java:110-119 style goldens
    assert_tokens("testing 1234", ["testing", "1234"], [0, 1])
    assert_tokens("B2B", ["b2b"], [0])
    assert_tokens("some-dashed-phrase", ["some", "dashed", "phrase"], [0, 1, 2])
    assert_tokens("foo_bar baz2 2.5", ["foo_bar", "baz2", "2.5"], [0, 1, 2])
    # StandardAnalyzer default = NO stopwords (StandardAnalyzer.java:51-53)
    assert_tokens("don't stop", ["don't", "stop"], [0, 1])
    assert_tokens("The quick-Brown fox", ["the", "quick", "brown", "fox"])


def test_golden_english_stop():
    # stop removal preserves position increments
    assert_tokens("The quick-Brown fox", ["quick", "brown", "fox"], [1, 2, 3], cfg=ENGLISH)
    assert_tokens("don't stop", ["don't", "stop"], [0, 1], cfg=ENGLISH)
    assert_tokens("the and of", [], [], cfg=ENGLISH)


def test_english_stop_set_is_reference_33():
    assert len(ENGLISH_STOP_WORDS) == 33
    for w in ("the", "a", "into", "such", "will"):
        assert w in ENGLISH_STOP_WORDS
    assert "stop" not in ENGLISH_STOP_WORDS


def test_overlong_token_dropped_but_consumes_position():
    # StandardTokenizer.java:154-164
    long_tok = "x" * 300
    terms, pos = tokenize_one(f"alpha {long_tok} beta")
    assert terms == ["alpha", "beta"]
    assert pos == [0, 2]


def test_empty_and_none():
    assert tokenize_one("") == ([], [])
    s = analyze_series(pd.Series([None, "", "a b"]))
    assert list(s) == [[], [], ["a", "b"]]


def test_unicode_identifiers():
    terms, _ = tokenize_one("naïve café_var δelta")
    assert terms == ["naïve", "café_var", "δelta"]


def test_series_matches_scalar_path():
    texts = pd.Series(
        ["testing 1234", "The quick-Brown fox", "don't stop", "", "x" * 300 + " ok"]
    )
    for cfg in (STANDARD, ENGLISH):
        got = analyze_series(texts, cfg)
        want = [tokenize_one(t, cfg)[0] for t in texts]
        assert list(got) == want


def test_flatten_tokens():
    texts = pd.Series(["a b a", "", "the fox", None])
    terms, row_idx, pos, doc_len = flatten_tokens(texts, ENGLISH)
    # With english stop ('a'/'the' stopped): doc0 "a b a" -> ["b"], doc2 "the fox" -> ["fox"]
    assert list(terms) == ["b", "fox"]
    np.testing.assert_array_equal(row_idx, [0, 2])
    np.testing.assert_array_equal(pos, [1, 1])
    np.testing.assert_array_equal(doc_len, [1, 0, 1, 0])
    # standard config keeps everything
    terms2, row2, pos2, dl2 = flatten_tokens(texts, STANDARD)
    assert list(terms2) == ["a", "b", "a", "the", "fox"]
    np.testing.assert_array_equal(dl2, [3, 0, 2, 0])
    np.testing.assert_array_equal(pos2, [0, 1, 2, 0, 1])
