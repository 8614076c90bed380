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
    IAtLeast, IContainedBy, IContaining, IExtend, IFixField, IMaxGaps,
    IMaxWidth, INonOverlapping, INotContainedBy, INotContaining,
    IntervalsQuery, IOffset, IOr, IOrdered, IOverlapping, IPhrase,
    IPrefix, ITerm, IUnordered, IWildcard, interval_after,
    interval_before, interval_min_extent, interval_not_within,
    interval_within,
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
    if isinstance(src, IPhrase):
        kids = [_bf_src(toks, s) for s in src.sources]
        cands = {
            (combo[0][0], combo[-1][1])
            for combo in itertools.product(*kids)
            if all(b[0] == a[1] + 1 for a, b in zip(combo, combo[1:]))
        }
        return _minimal(cands)
    if isinstance(src, IMaxWidth):
        return [iv for iv in _bf_src(toks, src.source)
                if iv[1] - iv[0] + 1 <= src.width]
    if isinstance(src, IMaxGaps):
        mex = interval_min_extent(src.source)
        return [iv for iv in _bf_src(toks, src.source)
                if (iv[1] - iv[0] + 1) - mex <= src.gaps]
    if isinstance(src, IExtend):
        return _minimal({
            (max(s - src.before, 0), e + src.after)
            for s, e in _bf_src(toks, src.source)
        })
    if isinstance(src, IOffset):
        return _minimal({
            ((max(s - 1, 0),) * 2 if src.before else (e + 1, e + 1))
            for s, e in _bf_src(toks, src.source)
        })
    if isinstance(src, IContainedBy):
        small = _bf_src(toks, src.small)
        big = _bf_raw(toks, src.big)  # filter side: RAW mapped stream
        return [sm for sm in small
                if any(b[0] <= sm[0] and sm[1] <= b[1] for b in big)]
    if isinstance(src, INotContainedBy):
        small = _bf_src(toks, src.small)
        big = _bf_raw(toks, src.big)
        return [sm for sm in small
                if not any(b[0] <= sm[0] and sm[1] <= b[1] for b in big)]
    if isinstance(src, IOverlapping):
        srcs = _bf_src(toks, src.source)
        refs = _bf_raw(toks, src.reference)
        return [s for s in srcs
                if any(r[0] <= s[1] and s[0] <= r[1] for r in refs)]
    if isinstance(src, INonOverlapping):
        srcs = _bf_src(toks, src.minuend)
        refs = _bf_raw(toks, src.subtrahend)
        return [s for s in srcs
                if not any(r[0] <= s[1] and s[0] <= r[1] for r in refs)]
    if isinstance(src, IFixField):
        return _bf_src(toks, src.source)  # single-field brute corpus
    raise TypeError(src)


def _bf_raw(toks, src):
    """Filter-side set: extend/offset map WITHOUT re-minimalizing
    (ExtendedIntervalsSource maps 1:1 — the exists-tests must see every
    envelope); any other node contributes its minimal set."""
    if isinstance(src, IExtend):
        return sorted({
            (max(s - src.before, 0), e + src.after)
            for s, e in _bf_raw(toks, src.source)
        })
    if isinstance(src, IOffset):
        return sorted({
            ((max(s - 1, 0),) * 2 if src.before else (e + 1, e + 1))
            for s, e in _bf_raw(toks, src.source)
        })
    return _bf_src(toks, src)


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


def test_phrase_block_adjacency(searcher, corpus_tokens):
    _check(searcher, corpus_tokens, IPhrase((T("public"), T("static"))))


def test_phrase_with_extend_gap(searcher, corpus_tokens):
    """The Intervals.extend docstring example: 'a b [up to 2 arbitrary
    terms] c' as phrase(a, extend(b, 0, 2), c)."""
    _check(
        searcher, corpus_tokens,
        IPhrase((T("public"), IExtend(T("static"), 0, 2), T("return"))),
        expect_hits=False,  # corpus-dependent; brute force decides
    )
    # and a 2-ary shape guaranteed to hit
    _check(
        searcher, corpus_tokens,
        IPhrase((T("return"), IExtend(T("int"), 0, 1))),
        expect_hits=False,
    )


def test_maxwidth_filter(searcher, corpus_tokens):
    _check(
        searcher, corpus_tokens,
        IMaxWidth(IUnordered((T("return"), T("class"))), 6),
    )


def test_maxgaps_combinator(searcher, corpus_tokens):
    _check(
        searcher, corpus_tokens,
        IMaxGaps(IOrdered((T("public"), T("return"))), 3),
    )


def test_contained_by(searcher, corpus_tokens):
    _check(
        searcher, corpus_tokens,
        IContainedBy(T("int"), IUnordered((T("return"), T("class")))),
    )


def test_not_contained_by(searcher, corpus_tokens):
    _check(
        searcher, corpus_tokens,
        INotContainedBy(T("int"), IUnordered((T("return"), T("class")))),
    )


def test_overlapping(searcher, corpus_tokens):
    _check(
        searcher, corpus_tokens,
        IOverlapping(
            IUnordered((T("return"), T("class"))),
            IOrdered((T("public"), T("static"))),
        ),
        expect_hits=False,
    )


def test_non_overlapping(searcher, corpus_tokens):
    _check(
        searcher, corpus_tokens,
        INonOverlapping(
            IUnordered((T("return"), T("class"))),
            IOrdered((T("public"), T("static"))),
        ),
        expect_hits=False,
    )


def test_within_sugar(searcher, corpus_tokens):
    src = interval_within(T("return"), 2, T("class"))
    _check(searcher, corpus_tokens, src)
    # independent semantics: a return within <=2 positions of a class
    for toks in corpus_tokens[:16]:
        got = {iv[0] for iv in _bf_src(toks, src)}
        want = {
            i for i, t in enumerate(toks) if t == "return"
            and any(
                tj == "class" and abs(j - i) <= 2
                for j, tj in enumerate(toks)
            )
        }
        assert got == want


def test_before_after_sugar(searcher, corpus_tokens):
    b = interval_before(T("return"), T("class"))
    a = interval_after(T("return"), T("class"))
    _check(searcher, corpus_tokens, b)
    _check(searcher, corpus_tokens, a)
    # independent semantics on a directed stream
    toks = ["return", "x", "class", "return", "class", "return"]
    got_b = {iv[0] for iv in _bf_src(toks, b)}
    # 'before': return ends at or before max(0, class.start - 1)
    assert got_b == {0, 3}
    got_a = {iv[0] for iv in _bf_src(toks, a)}
    assert got_a == {3, 5}


def test_not_within_sugar(searcher, corpus_tokens):
    _check(
        searcher, corpus_tokens,
        interval_not_within(T("return"), 1, T("class")),
    )


def test_fixfield_same_field_noop(searcher):
    a = searcher.search(
        IntervalsQuery(source=IOrdered((T("public"), T("static")))),
        k=100, with_stored=False,
    )
    b = searcher.search(
        IntervalsQuery(
            source=IFixField("content", IOrdered((T("public"), T("static"))))
        ),
        k=100, with_stored=False,
    )
    assert a["global_doc_id"].tolist() == b["global_doc_id"].tolist()
    np.testing.assert_array_equal(
        a["score"].to_numpy(np.float32), b["score"].to_numpy(np.float32)
    )


def test_fixfield_dispatches_other_field():
    from lucene_solr_1_spark.search.query import (
        IntervalsQuery as IQ, query_terms,
    )

    q = IQ(source=IUnordered((
        T("return"), IFixField("path", ITerm("main")),
    )))
    assert query_terms(q) == {("content", "return"), ("path", "main")}


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
            "not_containing", "at_least", "phrase", "max_width",
            "max_gaps", "extend", "contained_by", "not_contained_by",
            "overlapping", "non_overlapping", "within", "not_within",
            "before", "after",
        ]
        k = kinds[int(rng.integers(len(kinds)))]
        if k == "term":
            return T(str(rng.choice(vocab)))
        if k in ("or", "ordered", "unordered", "phrase"):
            n = int(rng.integers(2, 4))
            cls = {"or": IOr, "ordered": IOrdered,
                   "unordered": IUnordered, "phrase": IPhrase}[k]
            return cls(tuple(rand_src(depth - 1) for _ in range(n)))
        if k == "containing":
            return IContaining(rand_src(depth - 1), rand_src(depth - 1))
        if k == "not_containing":
            return INotContaining(rand_src(depth - 1), rand_src(depth - 1))
        if k == "max_width":
            return IMaxWidth(rand_src(depth - 1), int(rng.integers(1, 9)))
        if k == "max_gaps":
            return IMaxGaps(rand_src(depth - 1), int(rng.integers(0, 5)))
        if k == "extend":
            return IExtend(rand_src(depth - 1), int(rng.integers(0, 3)),
                           int(rng.integers(0, 3)))
        if k == "contained_by":
            return IContainedBy(rand_src(depth - 1), rand_src(depth - 1))
        if k == "not_contained_by":
            return INotContainedBy(rand_src(depth - 1), rand_src(depth - 1))
        if k == "overlapping":
            return IOverlapping(rand_src(depth - 1), rand_src(depth - 1))
        if k == "non_overlapping":
            return INonOverlapping(rand_src(depth - 1), rand_src(depth - 1))
        if k == "within":
            return interval_within(rand_src(depth - 1),
                                   int(rng.integers(0, 4)),
                                   rand_src(depth - 1))
        if k == "not_within":
            return interval_not_within(rand_src(depth - 1),
                                       int(rng.integers(0, 4)),
                                       rand_src(depth - 1))
        if k == "before":
            return interval_before(rand_src(depth - 1), rand_src(depth - 1))
        if k == "after":
            return interval_after(rand_src(depth - 1), rand_src(depth - 1))
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
