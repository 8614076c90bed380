"""DictionaryCompoundWordTokenFilter (kernels/compound.py + the COMPOUND
analyzer) — mirrors analysis/common/src/test/.../compound/
TestCompoundWordTokenFilter.java posture: the original token always
survives, subwords stack at its position, gated by min/max subword and
min word sizes, with an onlyLongestMatch variant. The decompose contract
is additionally pinned by a brute-force independent enumeration."""

import sys
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from lucene_solr_1_spark.kernels.analyzer import (  # noqa: E402
    COMPOUND,
    COMPOUND_DICT,
    AnalyzerConfig,
    analyze_series,
    flatten_tokens,
    tokenize_one,
)
from lucene_solr_1_spark.kernels.compound import (  # noqa: E402
    decompose,
    subwords_for_array,
)

GERMANIC = frozenset(
    {"rind", "fleisch", "draht", "schere", "gesetz", "aufgabe",
     "überwachung", "basket", "ball", "kurv"}
)


def brute_decompose(token, dictionary, min_word=5, min_sub=2, max_sub=15,
                    only_longest=False):
    """Independent enumeration of the reference loop
    (DictionaryCompoundWordTokenFilter.java:73-100)."""
    if len(token) < min_word:
        return []
    out = []
    for i in range(len(token)):
        hits = [token[i:i + j] for j in range(min_sub, max_sub + 1)
                if i + j <= len(token) and token[i:i + j] in dictionary]
        if only_longest:
            hits = [max(hits, key=len)] if hits else []
        out.extend(hits)
    return out


def test_goldens():
    # TestCompoundWordTokenFilter.testDumbCompoundWordsSE posture
    assert decompose("basketballkurv", GERMANIC) == [
        "basket", "ball", "kurv"
    ]
    # the min-word gate: short tokens never decompose
    assert decompose("ball", GERMANIC) == []
    # a dictionary hit equal to the whole token IS emitted (reference
    # behavior: decompose() scans every start offset including 0..len)
    assert decompose("gesetz", GERMANIC) == ["gesetz"]
    # overlapping hits all emit in (start, length) order
    d = frozenset({"ba", "basket", "etb", "ball"})
    assert decompose("basketball", d) == ["ba", "basket", "etb", "ba", "ball"]
    # onlyLongestMatch keeps one hit per start offset
    assert decompose("basketball", d, only_longest=True) == [
        "basket", "etb", "ball"
    ]
    # max_sub bound
    assert decompose("basketball", frozenset({"basketball"}), max_sub=9) == []
    assert decompose("basketball", frozenset({"basketball"}), max_sub=10) == [
        "basketball"
    ]


def test_brute_force_fuzz():
    import random

    rng = random.Random(7)
    alphabet = "abcd"
    for _ in range(300):
        token = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 12)))
        words = {
            "".join(rng.choice(alphabet) for _ in range(rng.randint(2, 5)))
            for _ in range(rng.randint(1, 8))
        }
        d = frozenset(words)
        for ol in (False, True):
            assert decompose(token, d, only_longest=ol) == brute_decompose(
                token, d, only_longest=ol
            ), (token, sorted(d), ol)


def test_chain_goldens():
    t, p = tokenize_one("customer data", COMPOUND)
    assert t == ["customer", "custom", "tom", "data"]
    assert p == [0, 0, 0, 1]  # subwords stack at the original's position
    t, p = tokenize_one("the window stream", COMPOUND)
    # 'stream' is in the dictionary: the whole-token hit re-emits it
    assert t == ["the", "window", "wind", "stream", "stream"]
    assert p == [0, 1, 1, 2, 2]


def test_scalar_matches_vectorized():
    import random

    rng = random.Random(13)
    frag = ["customer", "custom", "window", "stream", "table", "column",
            "data", "the", "key", "wind"]
    docs = [" ".join(rng.choice(frag) for _ in range(rng.randint(0, 8)))
            for _ in range(150)]
    s = pd.Series(docs)
    terms, rows, pos, dl = flatten_tokens(s, COMPOUND)
    st, sr, sp = [], [], []
    sdl = np.zeros(len(s), dtype=np.int64)
    for i, text in enumerate(docs):
        tt, pp = tokenize_one(text, COMPOUND)
        st.extend(tt)
        sr.extend([i] * len(tt))
        sp.extend(pp)
        sdl[i] = len(tt)
    assert list(terms) == st
    assert list(rows) == sr
    assert list(pos) == sp
    assert list(dl) == list(sdl)
    assert [x for lst in analyze_series(s, COMPOUND) for x in lst] == st
    # the per-unique array helper agrees with per-token decompose
    arr = np.asarray(st, dtype=object)
    assert subwords_for_array(arr, COMPOUND_DICT) == [
        decompose(t, COMPOUND_DICT) for t in st
    ]


def test_config_exclusivity():
    with pytest.raises(ValueError):
        AnalyzerConfig(compound_dict=frozenset({"x"}), stem=True)
    with pytest.raises(ValueError):
        AnalyzerConfig(compound_dict=frozenset({"x"}), german=True)
    # stop words DO compose (the reference chain is stop -> compound)
    AnalyzerConfig(compound_dict=frozenset({"x"}),
                   stop_words=frozenset({"the"}))


def test_query_side_and_recall(spark, tmp_path_factory):
    from lucene_solr_1_spark.index.builder import build_index
    from lucene_solr_1_spark.search.query import (
        MultiPhrase,
        Phrase,
        Synonym,
        Term,
    )
    from lucene_solr_1_spark.search.searcher import LuceneSparkSearcher

    rows = [
        ("r", "p0", "c", "x", "customer data layout"),
        ("r", "p1", "c", "x", "a custom layout"),
        ("r", "p2", "c", "x", "fast window stream"),
        ("r", "p3", "c", "x", "nothing relevant here"),
    ]
    pdf = pd.DataFrame(rows,
                       columns=["repo", "path", "commit", "lang", "content"])
    d = str(tmp_path_factory.mktemp("idx_cw"))
    m = build_index(spark, spark.createDataFrame(pdf), d, num_segments=2,
                    cfg=COMPOUND)
    assert m["analyzer"] == "compound"
    s = LuceneSparkSearcher(spark, d)
    # Term re-analysis: compound query word -> SynonymQuery of members
    analyzed = s._analyze_query(Term("customer"))
    assert analyzed == Synonym(("customer", "custom", "tom"), field="content")
    # recall both directions: the compound doc matches a subword query,
    # and the compound query matches the subword doc
    hits = s.search(Term("custom"), k=10)
    assert set(hits["path"]) == {"p0", "p1"}
    hits = s.search(Term("customer"), k=10)
    assert set(hits["path"]) == {"p0", "p1"}
    # whole-token dictionary hit must not double-count the query side
    assert s._analyze_query(Term("stream")) == Term("stream", field="content")
    # subword injection keeps phrase positions intact...
    hits = s.search(Phrase(("customer", "data")), k=10)
    assert set(hits["path"]) == {"p0"}
    # ...and a phrase over a decomposable word becomes a MultiPhrase
    analyzed = s._analyze_query(Phrase(("fast", "window")))
    assert analyzed == MultiPhrase(
        (("fast",), ("window", "wind")), slop=0, field="content"
    )
    hits = s.search(Phrase(("fast", "window")), k=10)
    assert set(hits["path"]) == {"p2"}
    # WAND == exhaustive on the synonym plan
    a = s.search(Term("customer"), k=5, use_wand=True, with_stored=False)
    b = s.search(Term("customer"), k=5, use_wand=False, with_stored=False)
    assert a.equals(b)
