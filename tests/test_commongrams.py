"""CommonGramsFilter + CommonGramsQueryFilter (kernels/commongrams.py +
the COMMON_GRAMS_EN analyzer) — goldens mirror
analysis/common/src/test/.../commongrams/CommonGramsFilterTest.java
(the full s/n two- and three-token query-filter matrix)."""

import sys
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from lucene_solr_1_spark.kernels.analyzer import (  # noqa: E402
    COMMON_GRAMS_EN,
    AnalyzerConfig,
    analyze_series,
    flatten_tokens,
    tokenize_one,
)
from lucene_solr_1_spark.kernels.commongrams import (  # noqa: E402
    common_grams_query,
    common_grams_stream,
)

COMMON = frozenset({"of", "the", "s"})


def test_index_stream_golden():
    # CommonGramsFilter javadoc example: unigrams stay, grams overlay
    t, p = common_grams_stream(["the", "quick", "brown", "fox"], COMMON)
    assert t == ["the", "the_quick", "quick", "brown", "fox"]
    assert p == [0, 0, 1, 2, 3]
    # grams form wherever EITHER member is common
    t, p = common_grams_stream(["fox", "of", "the", "year"], COMMON)
    assert t == ["fox", "fox_of", "of", "of_the", "the", "the_year", "year"]
    assert p == [0, 0, 1, 1, 2, 2, 3]


@pytest.mark.parametrize("text,want", [
    ("brown fox", ["brown", "fox"]),
    ("the fox", ["the_fox"]),
    ("fox of", ["fox_of"]),
    ("of the", ["of_the"]),
    ("the", ["the"]),
    ("foo", ["foo"]),
    ("quick brown fox", ["quick", "brown", "fox"]),
    ("quick brown the", ["quick", "brown_the"]),
    ("quick the brown", ["quick_the", "the_brown"]),
    ("fox of the", ["fox_of", "of_the"]),
    ("the quick brown", ["the_quick", "quick", "brown"]),
    ("the fox of", ["the_fox", "fox_of"]),
    ("of the fox", ["of_the", "the_fox"]),
    ("of the of", ["of_the", "the_of"]),
])
def test_query_filter_reference_matrix(text, want):
    """testCommonGramsQueryFilter: the full s/n combination matrix."""
    assert common_grams_query(text.split(), COMMON) == want


def test_scalar_matches_vectorized():
    import random

    rng = random.Random(23)
    frag = ["the", "a", "fast", "sort", "query", "merge", "data", "x1"]
    docs = [" ".join(rng.choice(frag) for _ in range(rng.randint(0, 9)))
            for _ in range(200)]
    s = pd.Series(docs)
    terms, rows, pos, dl = flatten_tokens(s, COMMON_GRAMS_EN)
    st, sr, sp = [], [], []
    sdl = np.zeros(len(s), dtype=np.int64)
    for i, text in enumerate(docs):
        tt, pp = tokenize_one(text, COMMON_GRAMS_EN)
        st.extend(tt)
        sr.extend([i] * len(tt))
        sp.extend(pp)
        sdl[i] = len(tt)
    assert list(terms) == st
    assert list(rows) == sr
    assert list(pos) == sp
    assert list(dl) == list(sdl)
    assert [x for lst in analyze_series(s, COMMON_GRAMS_EN) for x in lst] == st


def test_config_exclusivity():
    with pytest.raises(ValueError):
        AnalyzerConfig(common_grams=frozenset({"the"}),
                       stop_words=frozenset({"the"}))
    with pytest.raises(ValueError):
        AnalyzerConfig(common_grams=frozenset({"the"}), stem=True)


def test_query_side_rewrites():
    from lucene_solr_1_spark.search.query import (
        Phrase,
        Term,
        analyze_query_terms,
    )

    kf = frozenset({"repo", "path", "commit", "lang"})
    q = analyze_query_terms(Phrase(("the", "fast")), COMMON_GRAMS_EN, kf)
    assert q == Term("the_fast", field="content")
    q = analyze_query_terms(Phrase(("the", "fast", "sort")),
                            COMMON_GRAMS_EN, kf)
    assert q == Phrase(("the_fast", "fast", "sort"), field="content")
    # plain Terms pass through (single-token stream emits the unigram)
    q = analyze_query_terms(Term("the"), COMMON_GRAMS_EN, kf)
    assert q == Term("the", field="content")


def test_index_and_search(spark, tmp_path_factory):
    from lucene_solr_1_spark.index.builder import build_index
    from lucene_solr_1_spark.search.query import Phrase, Term
    from lucene_solr_1_spark.search.searcher import LuceneSparkSearcher

    rows = [
        ("r", "p0", "c", "en", "run the fast sort now"),
        ("r", "p1", "c", "en", "the slow sort is fast enough"),
        ("r", "p2", "c", "en", "a fast car"),
        ("r", "p3", "c", "en", "nothing here"),
    ]
    pdf = pd.DataFrame(rows,
                       columns=["repo", "path", "commit", "lang", "content"])
    d = str(tmp_path_factory.mktemp("idx_cg"))
    m = build_index(spark, spark.createDataFrame(pdf), d, num_segments=2,
                    cfg=COMMON_GRAMS_EN)
    assert m["analyzer"] == "common_grams_en"
    s = LuceneSparkSearcher(spark, d)
    # phrase-with-stopword -> single gram term: only the literal bigram
    hits = s.search(Phrase(("the", "fast")), k=10)
    assert set(hits["path"]) == {"p0"}
    # three-token phrase: gram + unigram positions line up
    hits = s.search(Phrase(("the", "fast", "sort")), k=10)
    assert set(hits["path"]) == {"p0"}
    # unigrams still indexed: plain term search unaffected
    hits = s.search(Term("fast"), k=10)
    assert set(hits["path"]) == {"p0", "p1", "p2"}
    # rewritten plan is a TERM query (the performance point): WAND prunes
    a = s.search(Phrase(("the", "fast")), k=5, use_wand=True,
                 with_stored=False)
    b = s.search(Phrase(("the", "fast")), k=5, use_wand=False,
                 with_stored=False)
    assert a.equals(b)
