"""Multi-dimensional range fields (document/RangeFieldQuery.java:62-213,
LongRange.java:183-208): per-relation match sets vs an independent
per-doc brute force over the stored [dl, n_chars] range, composition as
FILTER with scored clauses, multi-dim AND semantics, and the
crosses = intersects && !within identity."""

import numpy as np
import pytest

from lucene_solr_1_spark.index.builder import build_index
from lucene_solr_1_spark.kernels.analyzer import tokenize_one
from lucene_solr_1_spark.search.query import (
    Bool, MatchAll, Occur, RangeField, Term,
)
from lucene_solr_1_spark.search.searcher import LuceneSparkSearcher


@pytest.fixture(scope="module")
def searcher(spark, tiny_corpus_pdf, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx_rf"))
    build_index(spark, spark.createDataFrame(tiny_corpus_pdf), d, num_segments=3)
    return LuceneSparkSearcher(spark, d)


@pytest.fixture(scope="module")
def doc_ranges(tiny_corpus_pdf):
    """global_doc_id -> (dl, n_chars), the stored per-doc range."""
    pdf = tiny_corpus_pdf.sort_values(["repo", "path", "commit"]).reset_index(
        drop=True
    )
    return {
        gid: (len(tokenize_one(t)[0]), len(t))
        for gid, t in enumerate(pdf["content"])
    }


def _ref_match(rel, f, q):
    (fmin, fmax), (qlo, qhi) = f, q
    if rel == "intersects":
        return fmin <= qhi and fmax >= qlo
    if rel == "within":
        return fmin >= qlo and fmax <= qhi
    if rel == "contains":
        return fmin <= qlo and fmax >= qhi
    # crosses: intersects and not within (RangeFieldQuery.java:192-193)
    return _ref_match("intersects", f, q) and not _ref_match("within", f, q)


def _search_ids(searcher, rel, lo, hi):
    q = Bool.of(
        (Occur.MUST, MatchAll()),
        (Occur.FILTER, RangeField(
            dims=(("dl", "n_chars"),), lower=(lo,), upper=(hi,), relation=rel,
        )),
    )
    return set(searcher.search(q, k=10_000, with_stored=False)["global_doc_id"])


@pytest.mark.parametrize("rel,lo,hi", [
    ("intersects", 60, 700),
    ("within", 60, 700),
    ("contains", 60, 400),  # needs docs with dl <= 60 <= 400 <= n_chars
    ("crosses", 60, 700),
])
def test_relations_match_bruteforce(searcher, doc_ranges, rel, lo, hi):
    got = _search_ids(searcher, rel, lo, hi)
    want = {
        gid for gid, f in doc_ranges.items() if _ref_match(rel, f, (lo, hi))
    }
    assert got == want, rel
    assert want  # the directed bounds must not be vacuous
    if rel in ("within", "crosses"):
        assert want != set(doc_ranges)  # ...nor all-matching


def test_crosses_identity(searcher, doc_ranges):
    lo, hi = 60, 700
    inter = _search_ids(searcher, "intersects", lo, hi)
    within = _search_ids(searcher, "within", lo, hi)
    crosses = _search_ids(searcher, "crosses", lo, hi)
    assert crosses == inter - within


def test_multi_dim_ands(searcher, doc_ranges):
    """Two dimensions (degenerate point ranges) AND per-dim relations —
    equivalent to intersecting the per-dim single queries."""
    q2 = Bool.of(
        (Occur.MUST, MatchAll()),
        (Occur.FILTER, RangeField(
            dims=(("dl", "dl"), ("n_chars", "n_chars")),
            lower=(40, 200), upper=(90, 600), relation="within",
        )),
    )
    got = set(searcher.search(q2, k=10_000, with_stored=False)["global_doc_id"])
    want = {
        gid for gid, (dl, nc) in doc_ranges.items()
        if 40 <= dl <= 90 and 200 <= nc <= 600
    }
    assert got == want and want


def test_composes_with_scored_clause(searcher, doc_ranges):
    q = Bool.of(
        (Occur.MUST, Term("return")),
        (Occur.FILTER, RangeField(
            dims=(("dl", "n_chars"),), lower=(60,), upper=(700,),
            relation="within",
        )),
    )
    hits = searcher.search(q, k=10_000, with_stored=False)
    base = searcher.search(Term("return"), k=10_000, with_stored=False)
    allowed = {
        gid for gid, f in doc_ranges.items()
        if _ref_match("within", f, (60, 700))
    }
    want = [g for g in base["global_doc_id"] if g in allowed]
    assert sorted(hits["global_doc_id"]) == sorted(want)
    # FILTER never changes scores
    bs = dict(zip(base["global_doc_id"], base["score"]))
    for g, sc in zip(hits["global_doc_id"], hits["score"]):
        assert sc == bs[g]


def test_local_mode_matches(searcher):
    q = Bool.of(
        (Occur.MUST, Term("return")),
        (Occur.FILTER, RangeField(
            dims=(("dl", "n_chars"),), lower=(60,), upper=(700,),
            relation="crosses",
        )),
    )
    dist = searcher.search(q, k=20, with_stored=False)
    loc = searcher.search_local(q, k=20)
    assert dist["global_doc_id"].tolist() == loc["global_doc_id"].tolist()
    np.testing.assert_array_equal(
        dist["score"].to_numpy(np.float32), loc["score"].to_numpy(np.float32)
    )


def test_validation():
    with pytest.raises(ValueError, match="1..4 dimensions"):
        RangeField(dims=(), lower=(), upper=())
    with pytest.raises(ValueError, match="one bound per dimension"):
        RangeField(dims=(("dl", "n_chars"),), lower=(1, 2), upper=(3,))
    with pytest.raises(ValueError, match="unknown range relation"):
        RangeField(dims=(("dl", "n_chars"),), lower=(1,), upper=(2,),
                   relation="overlaps")


def test_unknown_column_rejected(searcher):
    q = Bool.of(
        (Occur.MUST, MatchAll()),
        (Occur.FILTER, RangeField(
            dims=(("dl", "norm"),), lower=(1,), upper=(2,),
        )),
    )
    with pytest.raises(ValueError, match="unknown numeric doc-values"):
        searcher.search(q, k=5, with_stored=False)
