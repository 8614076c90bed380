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


def test_ascii_fold_tokens():
    """ASCIIFoldingFilter subset: accents fold, multi-char expansions
    (ß→ss, æ→ae) match the reference's mappings; ASCII is untouched."""
    from lucene_solr_1_spark.kernels.analyzer import STANDARD_FOLD

    terms, pos = tokenize_one("Café RÉSUMÉ naïve Straße Æther plain", STANDARD_FOLD)
    assert terms == ["cafe", "resume", "naive", "strasse", "aether", "plain"]
    assert pos == [0, 1, 2, 3, 4, 5]


def test_ascii_fold_series_matches_scalar():
    from lucene_solr_1_spark.kernels.analyzer import STANDARD_FOLD, flatten_tokens

    texts = pd.Series(["Héllo wörld", "œuvre ĳs", "no accents", ""])
    got = analyze_series(texts, STANDARD_FOLD)
    want = [tokenize_one(t, STANDARD_FOLD)[0] for t in texts]
    assert list(got) == want
    terms, row_idx, _, doc_len = flatten_tokens(texts, STANDARD_FOLD)
    assert list(terms) == [t for toks in want for t in toks]


def test_ascii_fold_index_and_query_side(spark, tmp_path_factory):
    """An index built with standard_fold matches both the folded and the
    accented spelling of a query term (query terms re-analyze through
    the manifest's persisted analyzer)."""
    import pandas as pd_

    from lucene_solr_1_spark.index.builder import build_index
    from lucene_solr_1_spark.search.query import Term
    from lucene_solr_1_spark.search.searcher import LuceneSparkSearcher
    from lucene_solr_1_spark.kernels.analyzer import STANDARD_FOLD

    pdf = pd_.DataFrame({
        "repo": ["r"] * 4,
        "path": [f"f{i}" for i in range(4)],
        "commit": ["c"] * 4,
        "lang": ["txt"] * 4,
        "content": [
            "die Straße nach Köln",
            "the strasse spelled plain",
            "unrelated document text",
            "café culture résumé",
        ],
    })
    d = str(tmp_path_factory.mktemp("idx_fold"))
    build_index(spark, spark.createDataFrame(pdf), d, num_segments=2,
                cfg=STANDARD_FOLD)
    s = LuceneSparkSearcher(spark, d)
    folded = s.search(Term("strasse"), k=10, with_stored=False)
    accented = s.search(Term("straße"), k=10, with_stored=False)
    assert sorted(folded["global_doc_id"]) == sorted(accented["global_doc_id"])
    assert len(folded) == 2  # both spellings of doc0/doc1
    cafe = s.search(Term("café"), k=10, with_stored=False)
    assert len(cafe) == 1


def test_shingle_filter_order_and_sizes():
    from lucene_solr_1_spark.kernels.analyzer import shingle_tokens

    toks = ["please", "divide", "this", "sentence"]
    # ShingleFilter's documented bigram example (outputUnigrams=true)
    assert shingle_tokens(toks, 2, 2) == [
        "please", "please divide",
        "divide", "divide this",
        "this", "this sentence",
        "sentence",
    ]
    # bigrams + trigrams, no unigrams
    assert shingle_tokens(toks, 2, 3, output_unigrams=False) == [
        "please divide", "please divide this",
        "divide this", "divide this sentence",
        "this sentence",
    ]


def test_shingle_series_composes_with_analyzer():
    from lucene_solr_1_spark.kernels.analyzer import ENGLISH, shingle_series

    out = shingle_series(pd.Series(["The quick fox"]), ENGLISH, 2, 2).iloc[0]
    # 'the' is stopped before shingling (filter order: stop -> shingle)
    assert out == ["quick", "quick fox", "fox"]

def test_stem_keep_series_matches_scalar():
    """stem_keep_original must land in ALL THREE paths: tokenize_one,
    analyze_series, flatten_tokens — analyze_series (the shingle/ngram
    feed) must emit BOTH the original and the stacked stem."""
    from lucene_solr_1_spark.kernels.analyzer import STEM_KEEP

    texts = pd.Series(
        ["running dogs jumped", "run dog", "", "testing tested tests", None]
    )
    got = analyze_series(texts, STEM_KEEP)
    want = [tokenize_one(t, STEM_KEEP)[0] for t in texts.fillna("")]
    assert list(got) == want
    # the original form is actually present alongside the stem
    assert "running" in want[0] and "run" in want[0]
