"""Kernel-path IntervalQuery: batched minimal-interval evaluation vs an
independent per-doc brute-force reference (enumerate every qualifying
interval, keep the non-nested set, accumulate float32 freq, saturation
score). Mirrors the reference iterators' contracts
(sandbox/.../intervals/IntervalFunction.java, IntervalScorer.java)."""

import numpy as np
import pytest

from lucene_solr_1_spark.index.builder import build_index
from lucene_solr_1_spark.kernels.analyzer import tokenize_one
from lucene_solr_1_spark.search.query import Bool, IntervalsQuery, Occur, Term
from lucene_solr_1_spark.search.searcher import LuceneSparkSearcher


@pytest.fixture(scope="module")
def searcher(spark, tiny_corpus_pdf, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx_iv"))
    build_index(spark, spark.createDataFrame(tiny_corpus_pdf), d, num_segments=3)
    return LuceneSparkSearcher(spark, d)


@pytest.fixture(scope="module")
def corpus_tokens(tiny_corpus_pdf):
    pdf = tiny_corpus_pdf.sort_values(["repo", "path", "commit"]).reset_index(
        drop=True
    )
    return [tokenize_one(t)[0] for t in pdf["content"]]


def _brute(toks, terms, ordered, max_gaps):
    """All qualifying intervals -> minimal set -> (f32 freq, f32 score)."""
    occ = [[i for i, t in enumerate(toks) if t == q] for q in terms]
    if any(not o for o in occ):
        return None
    cands = set()
    if ordered:
        import itertools

        for combo in itertools.product(*occ):
            if all(a < b for a, b in zip(combo, combo[1:])):
                cands.add((combo[0], combo[-1]))
    else:
        for a in occ[0]:
            for b in occ[1]:
                if a != b:
                    cands.add((min(a, b), max(a, b)))
    minimal = sorted(
        (s, e) for (s, e) in cands
        if not any(s2 >= s and e2 <= e and (s2, e2) != (s, e) for (s2, e2) in cands)
    )
    n = len(terms)
    if max_gaps is not None:
        minimal = [(s, e) for (s, e) in minimal if (e - s + 1) - n <= max_gaps]
    if not minimal:
        return None
    freq = np.float32(0.0)
    for s, e in minimal:
        freq = np.float32(freq + np.float32(1.0 / max((e - s + 1) - n + 1, 1)))
    p = np.float32(1.0)
    return float(np.float32(1.0) * (np.float32(1.0) - p / (p + freq)))


def _check(searcher, corpus_tokens, terms, ordered, max_gaps=None):
    hits = searcher.search(
        IntervalsQuery(tuple(terms), ordered=ordered, max_gaps=max_gaps),
        k=10_000, with_stored=False,
    )
    ref = {
        gid: sc
        for gid, toks in enumerate(corpus_tokens)
        for sc in [_brute(toks, terms, ordered, max_gaps)]
        if sc is not None and sc > 0
    }
    got = dict(zip(hits["global_doc_id"], hits["score"]))
    assert set(got) == set(ref), (terms, ordered, max_gaps)
    for gid, sc in ref.items():
        assert abs(got[gid] - sc) < 5e-7, (gid, got[gid], sc)


def test_unordered_pair(searcher, corpus_tokens):
    _check(searcher, corpus_tokens, ("return", "class"), ordered=False)


def test_ordered_pair(searcher, corpus_tokens):
    _check(searcher, corpus_tokens, ("public", "static"), ordered=True)


def test_ordered_three_terms(searcher, corpus_tokens):
    _check(searcher, corpus_tokens, ("public", "static", "return"), ordered=True)


def test_ordered_maxgaps(searcher, corpus_tokens):
    _check(searcher, corpus_tokens, ("return", "int"), ordered=True, max_gaps=2)


def test_unordered_maxgaps(searcher, corpus_tokens):
    _check(searcher, corpus_tokens, ("return", "class"), ordered=False, max_gaps=1)


def test_intervals_compose_in_bool(searcher):
    """Intervals node inside a Bool with a FILTER — routes exhaustive,
    composes like any scored clause."""
    q = Bool.of(
        (Occur.MUST, IntervalsQuery(("return", "class"), ordered=False)),
        (Occur.FILTER, Term("python", field="lang")),
    )
    hits = searcher.search(q, k=50, with_stored=True)
    assert (hits["lang"] == "python").all()
    base = searcher.search(
        IntervalsQuery(("return", "class"), ordered=False), k=10_000,
        with_stored=True,
    )
    want = base[base["lang"] == "python"]
    assert sorted(hits["global_doc_id"]) == sorted(want["global_doc_id"])


def test_intervals_local_mode_matches(searcher):
    q = IntervalsQuery(("return", "class"), ordered=False)
    dist = searcher.search(q, k=20, with_stored=False)
    loc = searcher.search_local(q, k=20)
    assert dist["global_doc_id"].tolist() == loc["global_doc_id"].tolist()
    np.testing.assert_array_equal(
        dist["score"].to_numpy(np.float32), loc["score"].to_numpy(np.float32)
    )


def test_unordered_rejects_three(searcher):
    with pytest.raises(ValueError):
        searcher.search(
            IntervalsQuery(("a", "b", "c"), ordered=False), k=5,
            with_stored=False,
        )
