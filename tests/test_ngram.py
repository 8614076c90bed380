"""(Edge)NGramTokenFilter golden tokens, mirroring the reference's
TestNGramTokenFilter / TestEdgeNGramTokenFilter basics (emission order:
per start offset, gram sizes min..max; edge grams front-anchored), plus
an e2e composition: an edge-ngrammed field answers prefix queries with a
plain TermQuery."""

import pandas as pd
import pytest

from lucene_solr_1_spark.kernels.analyzer import (
    STANDARD, edge_ngram_tokens, ngram_series, ngram_tokens,
)


def test_ngram_bigrams_golden():
    assert ngram_tokens(["abcde"], 2, 2) == ["ab", "bc", "cd", "de"]


def test_ngram_unibigrams_golden():
    # per-position interleaving (NGramTokenFilter.java:118-140 loop order)
    assert ngram_tokens(["abcde"], 1, 2) == [
        "a", "ab", "b", "bc", "c", "cd", "d", "de", "e",
    ]


def test_ngram_oversized_and_preserve():
    assert ngram_tokens(["abcde"], 6, 7) == []
    assert ngram_tokens(["abcde"], 6, 7, preserve_original=True) == ["abcde"]
    # longer than max: original appended AFTER the grams (:110-117)
    assert ngram_tokens(["abcd"], 2, 2, preserve_original=True) == [
        "ab", "bc", "cd", "abcd",
    ]


def test_edge_ngram_golden():
    assert edge_ngram_tokens(["abcde"], 1, 3) == ["a", "ab", "abc"]
    assert edge_ngram_tokens(["abcde"], 4, 6) == ["abcd", "abcde"]
    assert edge_ngram_tokens(["ab"], 3, 4) == []
    assert edge_ngram_tokens(["ab"], 3, 4, preserve_original=True) == ["ab"]
    assert edge_ngram_tokens(["abcde"], 1, 2, preserve_original=True) == [
        "a", "ab", "abcde",
    ]


def test_ngram_invalid_sizes():
    with pytest.raises(ValueError):
        ngram_tokens(["x"], 0, 2)
    with pytest.raises(ValueError):
        edge_ngram_tokens(["x"], 3, 2)


def test_ngram_series_composes_after_analysis():
    s = ngram_series(pd.Series(["The Query"]), STANDARD, 2, 2, edge=True)
    # lowercased then edge-bigrams per token
    assert s.iloc[0] == ["th", "qu"]


def test_edge_ngram_field_prefix_search(spark, tmp_path):
    """Composition e2e: index the edge-ngrammed content; a plain Term
    query on a PREFIX matches — the index-time alternative to
    WildcardQuery (what Solr's EdgeNGramFilterFactory fields are for)."""
    from lucene_solr_1_spark.index.builder import build_index
    from lucene_solr_1_spark.search.query import Term
    from lucene_solr_1_spark.search.searcher import LuceneSparkSearcher

    rows = [
        ("r/0", "p/0", "c0", "en", "quartz crystal"),
        ("r/0", "p/1", "c1", "en", "quarterly report"),
        ("r/0", "p/2", "c2", "en", "crystal ball"),
    ]
    pdf = pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])
    pdf["content"] = ngram_series(
        pdf["content"], STANDARD, 1, 10, edge=True
    ).map(" ".join)
    d = str(tmp_path / "ngidx")
    build_index(spark, spark.createDataFrame(pdf), d, num_segments=1)
    s = LuceneSparkSearcher(spark, d)
    hits = s.search(Term("quart"), k=10, with_stored=True)
    assert sorted(hits["path"]) == ["p/0", "p/1"]
    hits2 = s.search(Term("crys"), k=10, with_stored=True)
    assert sorted(hits2["path"]) == ["p/0", "p/2"]
