"""Interval-source combinators (or / containing / notContaining /
atLeast / n-ary unordered / multi-term sources) vs an independent
per-doc brute-force reference: child minimal sets are computed
recursively, combined by enumerating every one-per-source combination,
and re-minimalized — exactly the algebra the reference iterators
realize lazily (sandbox/.../intervals/DisjunctionIntervalsSource.java,
FilteringConjunctionIntervalsSource.java,
DifferenceIntervalsSource.java, MinimumShouldMatchIntervalsSource.java,
MultiTermIntervalsSource.java)."""

import itertools

import numpy as np
import pandas as pd
import pytest

from lucene_solr_1_spark.index.builder import build_index
from lucene_solr_1_spark.kernels.analyzer import tokenize_one
from lucene_solr_1_spark.search.query import (
    IAtLeast, IContaining, INotContaining, IntervalsQuery, IOr, IOrdered,
    IPrefix, ITerm, IUnordered, IWildcard, interval_min_extent,
)
from lucene_solr_1_spark.search.searcher import LuceneSparkSearcher


@pytest.fixture(scope="module")
def searcher(spark, tiny_corpus_pdf, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx_ivc"))
    build_index(spark, spark.createDataFrame(tiny_corpus_pdf), d, num_segments=3)
    return LuceneSparkSearcher(spark, d)


@pytest.fixture(scope="module")
def corpus_tokens(tiny_corpus_pdf):
    pdf = tiny_corpus_pdf.sort_values(["repo", "path", "commit"]).reset_index(
        drop=True
    )
    return [tokenize_one(t)[0] for t in pdf["content"]]


def _minimal(cands):
    return sorted(
        (s, e) for (s, e) in cands
        if not any(s2 >= s and e2 <= e and (s2, e2) != (s, e) for (s2, e2) in cands)
    )


def _bf_src(toks, src):
    """Minimal interval set of a source tree over one doc's tokens."""
    if isinstance(src, ITerm):
        return [(i, i) for i, t in enumerate(toks) if t == src.text]
    if isinstance(src, IOr):
        return _minimal({iv for s in src.sources for iv in _bf_src(toks, s)})
    if isinstance(src, IOrdered):
        kids = [_bf_src(toks, s) for s in src.sources]
        cands = {
            (combo[0][0], combo[-1][1])
            for combo in itertools.product(*kids)
            if all(a[1] < b[0] for a, b in zip(combo, combo[1:]))
        }
        return _minimal(cands)
    if isinstance(src, IUnordered):
        kids = [_bf_src(toks, s) for s in src.sources]
        cands = {
            (min(c[0] for c in combo), max(c[1] for c in combo))
            for combo in itertools.product(*kids)
        }
        return _minimal(cands)
    if isinstance(src, IContaining):
        big, small = _bf_src(toks, src.big), _bf_src(toks, src.small)
        return [b for b in big if any(b[0] <= s and e <= b[1] for s, e in small)]
    if isinstance(src, INotContaining):
        big = _bf_src(toks, src.minuend)
        small = _bf_src(toks, src.subtrahend)
        return [b for b in big if not any(b[0] <= s and e <= b[1] for s, e in small)]
    if isinstance(src, IAtLeast):
        kids = [_bf_src(toks, s) for s in src.sources]
        cands = {
            (min(c[0] for c in pick), max(c[1] for c in pick))
            for combo in itertools.combinations(range(len(kids)), src.min_should_match)
            for pick in itertools.product(*(kids[i] for i in combo))
        }
        return _minimal(cands)
    raise TypeError(src)


def _bf_score(toks, src, max_gaps=None, pivot=1.0):
    minimal = _bf_src(toks, src)
    mex = interval_min_extent(src)
    if max_gaps is not None:
        minimal = [(s, e) for s, e in minimal if (e - s + 1) - mex <= max_gaps]
    if not minimal:
        return None
    freq = np.float32(0.0)
    for s, e in minimal:
        freq = np.float32(freq + np.float32(1.0 / max((e - s + 1) - mex + 1, 1)))
    p = np.float32(pivot)
    sc = float(np.float32(1.0) * (np.float32(1.0) - p / (p + freq)))
    return sc if sc > 0 else None


def _check(searcher, corpus_tokens, src, max_gaps=None, expect_hits=True):
    hits = searcher.search(
        IntervalsQuery(source=src, max_gaps=max_gaps), k=10_000,
        with_stored=False,
    )
    ref = {
        gid: sc
        for gid, toks in enumerate(corpus_tokens)
        for sc in [_bf_score(toks, src, max_gaps)]
        if sc is not None
    }
    if expect_hits:
        assert ref, (src, max_gaps)  # the directed case must not be vacuous
    got = dict(zip(hits["global_doc_id"], hits["score"]))
    assert set(got) == set(ref), (src, max_gaps)
    for gid, sc in ref.items():
        assert abs(got[gid] - sc) < 5e-7, (gid, got[gid], sc)


T = ITerm


def test_or_of_terms(searcher, corpus_tokens):
    _check(searcher, corpus_tokens, IOr((T("return"), T("class"))))


def test_ordered_over_or(searcher, corpus_tokens):
    _check(
        searcher, corpus_tokens,
        IOrdered((T("public"), IOr((T("static"), T("return"))))),
    )


def test_unordered_three_sources(searcher, corpus_tokens):
    _check(
        searcher, corpus_tokens,
        IUnordered((T("public"), T("static"), T("return"))),
    )


def test_containing(searcher, corpus_tokens):
    _check(
        searcher, corpus_tokens,
        IContaining(IUnordered((T("return"), T("class"))), T("int")),
    )


def test_not_containing(searcher, corpus_tokens):
    _check(
        searcher, corpus_tokens,
        INotContaining(IUnordered((T("return"), T("class"))), T("int")),
    )


def test_at_least_two_of_three(searcher, corpus_tokens):
    _check(
        searcher, corpus_tokens,
        IAtLeast((T("public"), T("static"), T("return")), 2),
    )


def test_at_least_one_is_or(searcher, corpus_tokens):
    _check(
        searcher, corpus_tokens,
        IAtLeast((T("return"), T("class")), 1),
    )


def test_nested_with_maxgaps(searcher, corpus_tokens):
    _check(
        searcher, corpus_tokens,
        IUnordered((IOr((T("return"), T("class"))), T("public"))),
        max_gaps=4,
    )


def test_legacy_shape_equals_source_tree(searcher):
    """The flat (terms, ordered) constructor and the explicit tree
    compile to the same plan and score identically."""
    a = searcher.search(
        IntervalsQuery(("public", "static"), ordered=True), k=100,
        with_stored=False,
    )
    b = searcher.search(
        IntervalsQuery(source=IOrdered((T("public"), T("static")))), k=100,
        with_stored=False,
    )
    assert a["global_doc_id"].tolist() == b["global_doc_id"].tolist()
    np.testing.assert_array_equal(
        a["score"].to_numpy(np.float32), b["score"].to_numpy(np.float32)
    )


def test_prefix_source_expands(searcher, corpus_tokens):
    """IPrefix rewrites to IOr over the live dictionary
    (MultiTermIntervalsSource) — equivalent to the hand-built IOr."""
    vocab = sorted({t for toks in corpus_tokens for t in toks
                    if t.startswith("s")})
    assert len(vocab) > 1
    a = searcher.search(
        IntervalsQuery(source=IOrdered((T("public"), IPrefix("s")))),
        k=10_000, with_stored=False,
    )
    b = searcher.search(
        IntervalsQuery(
            source=IOrdered((T("public"), IOr(tuple(T(v) for v in vocab))))
        ),
        k=10_000, with_stored=False,
    )
    assert a["global_doc_id"].tolist() == b["global_doc_id"].tolist()
    np.testing.assert_array_equal(
        a["score"].to_numpy(np.float32), b["score"].to_numpy(np.float32)
    )


def test_wildcard_source_expands(searcher, corpus_tokens):
    vocab = sorted({t for toks in corpus_tokens for t in toks
                    if len(t) == 6 and t.startswith("ret")})
    a = searcher.search(
        IntervalsQuery(source=IUnordered((T("public"), IWildcard("ret???")))),
        k=10_000, with_stored=False,
    )
    b = searcher.search(
        IntervalsQuery(
            source=IUnordered((T("public"), IOr(tuple(T(v) for v in vocab))))
        ),
        k=10_000, with_stored=False,
    )
    assert a["global_doc_id"].tolist() == b["global_doc_id"].tolist()


def test_prefix_expansion_cap_raises(searcher):
    with pytest.raises(ValueError, match="too many terms"):
        searcher.search(
            IntervalsQuery(
                source=IOrdered((T("public"), IPrefix("", max_expansions=3)))
            ),
            k=5, with_stored=False,
        )


def test_relational_combinators_bruteforce(spark):
    """The relational window formulations (sql/intervals.py: ordered-or,
    containing, notContaining, atLeast) produce EXACTLY the brute-force
    minimal interval sets over the documents table — the third agreeing
    expression next to the kernel combinators and the DuckDB twins."""
    import math
    import re

    from lucene_solr_1_spark.kernels.analyzer import SQL_TOKEN_PATTERN
    from lucene_solr_1_spark.sql import intervals as IV
    from lucene_solr_1_spark.sql.relational import load_documents

    sf = "/root/testdata/sf0.001"
    tokre = re.compile(SQL_TOKEN_PATTERN)
    d = load_documents(spark, sf).toPandas()

    def r4(x):
        return math.floor(x * 1e4 + 0.5) / 1e4

    cases = [
        (
            IV.interval_ordered_or_spark(
                spark, sf, "fast", ("sort", "merge"), k=10_000
            ),
            IOrdered((T("fast"), IOr((T("sort"), T("merge"))))),
        ),
        (
            IV.interval_containing_spark(
                spark, sf, "query", "merge", "fast", k=10_000
            ),
            IContaining(IUnordered((T("query"), T("merge"))), T("fast")),
        ),
        (
            IV.interval_containing_spark(
                spark, sf, "query", "merge", "fast", k=10_000, negate=True
            ),
            INotContaining(IUnordered((T("query"), T("merge"))), T("fast")),
        ),
        (
            IV.interval_atleast_spark(
                spark, sf, ("query", "sort", "fast"), k=10_000
            ),
            IAtLeast((T("query"), T("sort"), T("fast")), 2),
        ),
    ]
    for got_df, src in cases:
        got = got_df.toPandas()
        ref = {}
        for _, row in d.iterrows():
            toks = tokre.findall(row["text"].lower())
            ivs = _bf_src(toks, src)
            if ivs:
                freq = sum(1.0 / max(e - s, 1) for s, e in ivs)
                ref[row["doc_id"]] = (
                    len(ivs), r4(freq), r4(1.0 - 1.0 / (1.0 + freq))
                )
        assert len(got) == len(ref), src
        for _, row in got.iterrows():
            n, fr, sc = ref[row["doc_id"]]
            assert row["n_intervals"] == n, (src, row["doc_id"])
            assert abs(row["freq"] - fr) < 1e-9
            assert abs(row["score"] - sc) < 1e-9


def test_fuzz_random_trees(spark, tmp_path_factory):
    """Seeded fuzz: random token streams from a 6-term vocab, random
    source trees of depth <= 3 — kernel == brute force on every doc."""
    rng = np.random.default_rng(41)
    vocab = np.array(list("abcdef"))
    rows = []
    for i in range(48):
        n = int(rng.integers(0, 28))
        content = " ".join(rng.choice(vocab, size=n))
        rows.append(("org/r-%d" % (i % 4), "f_%02d.txt" % i, "c%02d" % i,
                     "txt", content))
    pdf = pd.DataFrame(
        rows, columns=["repo", "path", "commit", "lang", "content"]
    )
    d = str(tmp_path_factory.mktemp("idx_ivfuzz"))
    build_index(spark, spark.createDataFrame(pdf), d, num_segments=3)
    s = LuceneSparkSearcher(spark, d)
    toks = [
        tokenize_one(t)[0]
        for t in pdf.sort_values(["repo", "path", "commit"])["content"]
    ]

    def rand_src(depth):
        kinds = ["term"] if depth == 0 else [
            "term", "or", "ordered", "unordered", "containing",
            "not_containing", "at_least",
        ]
        k = kinds[int(rng.integers(len(kinds)))]
        if k == "term":
            return T(str(rng.choice(vocab)))
        if k in ("or", "ordered", "unordered"):
            n = int(rng.integers(2, 4))
            cls = {"or": IOr, "ordered": IOrdered, "unordered": IUnordered}[k]
            return cls(tuple(rand_src(depth - 1) for _ in range(n)))
        if k == "containing":
            return IContaining(rand_src(depth - 1), rand_src(depth - 1))
        if k == "not_containing":
            return INotContaining(rand_src(depth - 1), rand_src(depth - 1))
        n = int(rng.integers(2, 4))
        return IAtLeast(
            tuple(rand_src(depth - 1) for _ in range(n)),
            int(rng.integers(1, n + 1)),
        )

    n_checked = 0
    for trial in range(60):
        src = rand_src(int(rng.integers(1, 4)))
        mg = None if rng.random() < 0.5 else int(rng.integers(0, 6))
        # use the in-process path for speed; it shares the kernel with
        # the distributed path (pinned by test_intervals_local_mode)
        hits = s.search_local(IntervalsQuery(source=src, max_gaps=mg), k=1000)
        ref = {
            gid: sc
            for gid, tk in enumerate(toks)
            for sc in [_bf_score(tk, src, mg)]
            if sc is not None
        }
        got = dict(zip(hits["global_doc_id"], hits["score"]))
        assert set(got) == set(ref), (trial, src, mg)
        for gid, sc in ref.items():
            assert abs(got[gid] - sc) < 5e-7, (trial, src, gid)
        n_checked += len(ref)
    assert n_checked > 200  # the fuzz actually exercised matches
