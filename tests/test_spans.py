"""Span-family tests (search/spans/ analog): SpanTerm / SpanOr / SpanNot /
SpanFirst / SpanNear composition, validated against an INDEPENDENT
reference evaluator over raw token lists (positions from tokenize_one,
no index structures). Scores use the pinned float32 bm25 primitives so
ranking ties resolve identically to the engine."""

import numpy as np
import pandas as pd
import pytest

from lucene_solr_1_spark.index.builder import build_index
from lucene_solr_1_spark.kernels.analyzer import tokenize_one
from lucene_solr_1_spark.search.query import (
    SpanContaining, SpanFirst, SpanNear, SpanNot, SpanOr, SpanPositionRange,
    SpanTerm, SpanWithin,
)
from lucene_solr_1_spark.search.searcher import LuceneSparkSearcher

from .oracle import OracleIndex

VOCAB = ["red", "green", "blue", "black", "white"]


def _corpus(n_docs: int = 40, n_tokens: int = 30) -> pd.DataFrame:
    rng = np.random.default_rng(11)
    rows = []
    for i in range(n_docs):
        toks = rng.choice(VOCAB, size=n_tokens, p=[0.3, 0.25, 0.2, 0.15, 0.1])
        rows.append((f"r/{i % 4}", f"p/{i:04d}", f"c{i:06x}", "en", " ".join(toks)))
    return pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])


@pytest.fixture(scope="module")
def span_setup(spark, tmp_path_factory):
    pdf = _corpus()
    d = str(tmp_path_factory.mktemp("idx_spans"))
    build_index(spark, spark.createDataFrame(pdf), d, num_segments=3)
    return LuceneSparkSearcher(spark, d), OracleIndex(pdf)


# ---- independent reference evaluator over raw tokens ----------------------

def ref_spans(q, tokens):
    """Span list (start, end) of a span query in one doc — mirrors the
    DOCUMENTED contract but reads raw token positions directly."""
    if isinstance(q, str):
        return [(p, p + 1) for p, t in enumerate(tokens) if t == q]
    if isinstance(q, SpanTerm):
        return [(p, p + 1) for p, t in enumerate(tokens) if t == q.text]
    if isinstance(q, SpanOr):
        out = []
        for c in q.clauses:
            out.extend(ref_spans(c, tokens))
        return sorted(out)
    if isinstance(q, SpanNot):
        inc = ref_spans(q.include, tokens)
        exc = ref_spans(q.exclude, tokens)
        return [
            (s, e) for s, e in inc
            if not any(es < e and ee > s for es, ee in exc)
        ]
    if isinstance(q, SpanFirst):
        return [(s, e) for s, e in ref_spans(q.match, tokens) if e <= q.end]
    if isinstance(q, SpanPositionRange):
        return [(s, e) for s, e in ref_spans(q.match, tokens)
                if s >= q.start and e <= q.end]
    if isinstance(q, SpanContaining):
        big = ref_spans(q.big, tokens)
        little = ref_spans(q.little, tokens)
        return [(s, e) for s, e in big
                if any(ls >= s and le <= e for ls, le in little)]
    if isinstance(q, SpanWithin):
        big = ref_spans(q.big, tokens)
        little = ref_spans(q.little, tokens)
        return [(s, e) for s, e in little
                if any(bs <= s and be >= e for bs, be in big)]
    if isinstance(q, SpanNear):
        lists = [ref_spans(c, tokens) for c in q.terms]
        if any(not l for l in lists):
            return []
        n = len(lists)
        idx = [0] * n
        out = []
        while all(idx[i] < len(lists[i]) for i in range(n)):
            if q.in_order:
                dead = False
                for i in range(1, n):
                    while (
                        idx[i] < len(lists[i])
                        and lists[i][idx[i]][0] < lists[i - 1][idx[i - 1]][1]
                    ):
                        idx[i] += 1
                    if idx[i] >= len(lists[i]):
                        dead = True
                        break
                if dead:
                    break
            cur = [lists[i][idx[i]] for i in range(n)]
            min_s = min(c[0] for c in cur)
            max_e = max(c[1] for c in cur)
            if (max_e - min_s) - sum(c[1] - c[0] for c in cur) <= q.slop:
                out.append((min_s, max_e))
                idx = [x + 1 for x in idx]
            else:
                idx[min(range(n), key=lambda i: cur[i][0])] += 1
        return out
    raise TypeError(q)


def _leaf_terms(q):
    if isinstance(q, str):
        return [q]
    if isinstance(q, SpanTerm):
        return [q.text]
    if isinstance(q, SpanOr):
        return [t for c in q.clauses for t in _leaf_terms(c)]
    if isinstance(q, SpanNear):
        return [t for c in q.terms for t in _leaf_terms(c)]
    if isinstance(q, SpanNot):
        return _leaf_terms(q.include) + _leaf_terms(q.exclude)
    if isinstance(q, (SpanFirst, SpanPositionRange)):
        return _leaf_terms(q.match)
    if isinstance(q, (SpanContaining, SpanWithin)):
        return _leaf_terms(q.big) + _leaf_terms(q.little)
    raise TypeError(q)


def _expected(oracle: OracleIndex, q) -> dict:
    from lucene_solr_1_spark.kernels import bm25
    from lucene_solr_1_spark.kernels.smallfloat import int_to_byte4

    n = oracle.n_docs
    cache = bm25.norm_cache(bm25.avg_field_length(oracle.sum_ttf, n))
    leaves = sorted(set(_leaf_terms(q)))
    idfs = [bm25.idf(oracle.df[t], n) for t in leaves if oracle.df.get(t)]
    w = bm25.term_weight(bm25.synonym_idf(idfs)) if idfs else np.float32(0.0)
    out = {}
    for doc_id, text in enumerate(oracle.pdf["content"]):
        toks, _ = tokenize_one(text)
        freq = len(ref_spans(q, toks))
        if freq > 0:
            nb = int_to_byte4(np.asarray([len(toks)]))
            out[doc_id] = float(
                bm25.score(np.asarray([freq], dtype=np.float64), nb, w, cache)[0]
            )
    return out


QUERIES = [
    SpanOr(("red", "blue")),
    SpanNot(SpanTerm("red"), SpanNear(("green", "blue"), slop=1)),
    SpanFirst(SpanTerm("green"), 5),
    SpanNear((SpanOr(("red", "green")), "blue"), slop=2),
    SpanNear((SpanOr(("red", "green")), "blue"), slop=1, in_order=True),
    SpanNear((SpanNear(("red", "green"), slop=0, in_order=True), "blue"), slop=3),
    SpanNot(SpanNear(("red", "blue"), slop=2), SpanTerm("green")),
    SpanFirst(SpanNear(("red", "green"), slop=2), 10),
    SpanPositionRange(SpanTerm("green"), 3, 12),
    SpanPositionRange(SpanNear(("red", "green"), slop=2), 2, 14),
    # SpanContaining / SpanWithin (SpanContainingQuery/SpanWithinQuery):
    # near-windows containing a specific term, and terms inside a window
    SpanContaining(SpanNear(("red", "blue"), slop=3), SpanTerm("green")),
    SpanWithin(SpanNear(("red", "blue"), slop=3), SpanTerm("green")),
    SpanContaining(
        SpanNear(("red", "green"), slop=4),
        SpanNear(("green", "blue"), slop=0, in_order=True),
    ),
    SpanWithin(SpanNear(("red", "white"), slop=5), SpanOr(("green", "blue"))),
]


@pytest.mark.parametrize("q", QUERIES, ids=[repr(q)[:60] for q in QUERIES])
def test_span_query_matches_reference(span_setup, q):
    searcher, oracle = span_setup
    want = oracle.top_k(_expected(oracle, q), 50)
    hits = searcher.search(q, k=50, with_stored=False)
    got = list(zip(hits["global_doc_id"].tolist(), hits["score"].tolist()))
    assert [d for d, _ in got] == [d for d, _ in want], q
    np.testing.assert_array_equal(
        np.asarray([s for _, s in got], dtype=np.float32),
        np.asarray([s for _, s in want], dtype=np.float32),
    )


def test_batched_stream_equals_scalar():
    """_seg_span_stream (vectorized-across-docs engine path) emits exactly
    the per-doc span lists of the scalar contract reference _doc_spans,
    in the same per-doc order, on randomized corpora and random span
    trees — pins the r3 span vectorization."""
    from lucene_solr_1_spark.search.kernel import _doc_spans, _seg_span_stream

    class StubSeg:
        """Minimal positions() provider over raw token lists."""

        def __init__(self, docs_tokens: dict):
            self._p = {}
            terms = {t for toks in docs_tokens.values() for t in toks}
            for t in terms:
                docs, freqs, starts, pos = [], [], [], []
                for d in sorted(docs_tokens):
                    pp = [i for i, x in enumerate(docs_tokens[d]) if x == t]
                    if pp:
                        docs.append(d)
                        freqs.append(len(pp))
                        starts.append(len(pos))
                        pos.extend(pp)
                self._p[("content", t)] = (
                    np.array(docs, dtype=np.int64),
                    np.array(freqs, dtype=np.int64),
                    np.array(starts, dtype=np.int64),
                    np.array(pos, dtype=np.int64),
                )

        def positions(self, key):
            return self._p.get(key)

    rng = np.random.default_rng(5)
    vocab = ["a", "b", "c"]

    def rand_span(depth=0):
        kinds = (["term", "or", "near", "not", "first", "containing", "within"]
                 if depth < 2 else ["term"])
        k = rng.choice(kinds)
        if k == "term":
            return {"kind": "term", "field": "content",
                    "term": str(rng.choice(vocab))}
        if k == "or":
            return {"kind": "or",
                    "children": [rand_span(depth + 1)
                                 for _ in range(rng.integers(2, 4))]}
        if k == "near":
            return {"kind": "near",
                    "children": [rand_span(depth + 1)
                                 for _ in range(rng.integers(2, 4))],
                    "slop": int(rng.integers(0, 4)),
                    "in_order": bool(rng.integers(0, 2))}
        if k == "not":
            return {"kind": "not", "include": rand_span(depth + 1),
                    "exclude": rand_span(depth + 1)}
        if k in ("containing", "within"):
            return {"kind": k, "big": rand_span(depth + 1),
                    "little": rand_span(depth + 1)}
        return {"kind": "first", "match": rand_span(depth + 1),
                "end": int(rng.integers(1, 15))}

    for trial in range(80):
        n_docs = int(rng.integers(1, 15))
        docs_tokens = {
            d: [str(t) for t in rng.choice(vocab, size=rng.integers(1, 25))]
            for d in range(n_docs)
        }
        seg = StubSeg(docs_tokens)
        span = rand_span()
        cand = np.arange(n_docs, dtype=np.int64)
        di, s, e = _seg_span_stream(span, seg, cand)
        got = {d: [] for d in range(n_docs)}
        for i in range(len(di)):
            got[int(cand[di[i]])].append((int(s[i]), int(e[i])))
        for d in range(n_docs):
            want = _doc_spans(span, seg, d)
            assert got[d] == [(int(a), int(b)) for a, b in want], (
                trial, span, d, got[d], want
            )


def test_span_leaf_sugar_equivalence(span_setup):
    """Bare-string clauses are SpanTerm sugar."""
    searcher, _ = span_setup
    a = searcher.search(SpanNear(("red", "blue"), slop=2), k=20, with_stored=False)
    b = searcher.search(
        SpanNear((SpanTerm("red"), SpanTerm("blue")), slop=2), k=20, with_stored=False
    )
    pd.testing.assert_frame_equal(a, b)


# ---- SpanMultiTermQueryWrapper (spans/SpanMultiTermQueryWrapper.java) -----


def test_span_multiterm_expands_to_spanor(span_setup):
    """SpanNear over a wrapped Prefix must equal the hand-expanded SpanOr
    (the wrapper's SpanRewriteMethod contract)."""
    from lucene_solr_1_spark.search.query import Prefix, SpanMultiTerm

    searcher, _ = span_setup
    wrapped = SpanNear((SpanMultiTerm(Prefix("b")), "red"),
                       slop=1, in_order=True)
    manual = SpanNear(
        (SpanOr((SpanTerm("black"), SpanTerm("blue"))), "red"),
        slop=1, in_order=True,
    )
    a = searcher.search(wrapped, k=30, with_stored=False)
    b = searcher.search(manual, k=30, with_stored=False)
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0


def test_span_multiterm_wildcard_and_nesting(span_setup):
    """Wildcard wrapper nested under SpanFirst; and a fuzzy wrapper."""
    from lucene_solr_1_spark.search.query import (
        Fuzzy, SpanMultiTerm, Wildcard,
    )

    searcher, _ = span_setup
    a = searcher.search(
        SpanFirst(SpanMultiTerm(Wildcard("bl*")), end=3),
        k=30, with_stored=False,
    )
    b = searcher.search(
        SpanFirst(SpanOr((SpanTerm("black"), SpanTerm("blue"))), end=3),
        k=30, with_stored=False,
    )
    pd.testing.assert_frame_equal(a, b)
    # fuzzy wrapper: 'gren'~1 expands to green (the only in-window term)
    a = searcher.search(
        SpanNear((SpanMultiTerm(Fuzzy("gren", max_edits=1)), "red"),
                 slop=0, in_order=True),
        k=30, with_stored=False,
    )
    b = searcher.search(SpanNear(("green", "red"), slop=0, in_order=True),
                        k=30, with_stored=False)
    pd.testing.assert_frame_equal(a, b)


def test_span_multiterm_empty_expansion(span_setup):
    """No dictionary match: the clause produces no spans — a required
    NEAR clause kills the query, an excluded clause is a no-op."""
    from lucene_solr_1_spark.search.query import Prefix, SpanMultiTerm

    searcher, _ = span_setup
    hits = searcher.search(
        SpanNear((SpanMultiTerm(Prefix("zz")), "red"), slop=3),
        k=10, with_stored=False,
    )
    assert len(hits) == 0
    a = searcher.search(
        SpanNot(SpanTerm("red"), SpanMultiTerm(Prefix("zz"))),
        k=30, with_stored=False,
    )
    b = searcher.search(SpanTerm("red"), k=30, with_stored=False)
    pd.testing.assert_frame_equal(a, b)


def test_span_mtq_near_greedy_equals_pair_count(span_setup):
    """Pins the DuckDB twin's claim (kernel_span_mtq_near_duck): for the
    two-clause ordered slop-0 shape with clause-disjoint tokens, the
    greedy non-overlapping matcher collects EXACTLY the adjacent
    (expansion, follow) pairs."""
    _, oracle = span_setup
    pdf = _corpus()
    exp = {"black", "blue"}
    q = SpanNear((SpanOr((SpanTerm("black"), SpanTerm("blue"))), "red"),
                 slop=0, in_order=True)
    for text in pdf["content"]:
        toks = text.split()
        greedy = len(ref_spans(q, toks))
        pairs = sum(
            1 for p in range(len(toks) - 1)
            if toks[p] in exp and toks[p + 1] == "red"
        )
        assert greedy == pairs, text
