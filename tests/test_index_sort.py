"""Index sorting (IndexWriterConfig.setIndexSort, index/IndexSorter.java)
and early-terminated field-sorted search (TopFieldCollector's
canEarlyTerminate path).

Contracts pinned:
- every segment's local docID order follows (sort value, doc key);
- a fresh build is ALSO globally sorted (range partitioning on the key);
- appends keep the per-segment guarantee (Lucene's contract);
- search_sorted == brute-force field sort of the full match set, with
  relation GREATER_THAN_OR_EQUAL_TO;
- the default (unsorted) build path is byte-identical to before — the
  (repo, path, commit) global docID invariant is untouched.
"""

import numpy as np
import pandas as pd
import pytest

from lucene_solr_1_spark.index.builder import add_documents, build_index
from lucene_solr_1_spark.search.query import Bool, MatchAll, Occur, Term
from lucene_solr_1_spark.search.searcher import LuceneSparkSearcher


@pytest.fixture(scope="module")
def sorted_searcher(spark, tiny_corpus_pdf, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx_sorted"))
    build_index(
        spark, spark.createDataFrame(tiny_corpus_pdf), d, num_segments=4,
        index_sort="n_chars", index_sort_desc=False,
    )
    return LuceneSparkSearcher(spark, d)


def _stored_lengths(searcher):
    """(global_doc_id -> n_chars, content) from the docmap."""
    pdf = searcher._norms.select(
        "segment_id", "doc_id", "n_chars", "content"
    ).toPandas()
    pdf["global_doc_id"] = pdf["segment_id"].map(searcher.doc_base) + pdf["doc_id"]
    return pdf.sort_values("global_doc_id").reset_index(drop=True)


def test_segments_internally_sorted(sorted_searcher):
    pdf = _stored_lengths(sorted_searcher)
    for _, g in pdf.groupby("segment_id"):
        v = g.sort_values("doc_id")["n_chars"].to_numpy()
        assert (np.diff(v) >= 0).all()


def test_fresh_build_globally_sorted(sorted_searcher):
    v = _stored_lengths(sorted_searcher)["n_chars"].to_numpy()
    assert (np.diff(v) >= 0).all()


def test_manifest_persists_index_sort(sorted_searcher):
    assert sorted_searcher.manifest["index_sort"] == {
        "field": "n_chars", "desc": False,
    }


def test_search_sorted_matches_bruteforce(sorted_searcher):
    hits = sorted_searcher.search_sorted(Term("return"), k=7)
    # brute force: full match set, sorted by (n_chars, global_doc_id)
    full = sorted_searcher.search(Term("return"), k=10_000, with_stored=True)
    ref = full.sort_values(
        ["n_chars", "global_doc_id"], kind="mergesort"
    ).head(7)
    assert hits["global_doc_id"].tolist() == ref["global_doc_id"].tolist()
    assert hits["n_chars"].tolist() == ref["n_chars"].tolist()
    assert hits.attrs["relation"] == "GREATER_THAN_OR_EQUAL_TO"
    assert hits.attrs["total_hits"] >= len(hits)


def test_search_sorted_bool_query(sorted_searcher):
    q = Bool.of((Occur.MUST, Term("return")), (Occur.MUST_NOT, Term("class")))
    hits = sorted_searcher.search_sorted(q, k=5)
    full = sorted_searcher.search(q, k=10_000, with_stored=True)
    ref = full.sort_values(["n_chars", "global_doc_id"], kind="mergesort").head(5)
    assert hits["global_doc_id"].tolist() == ref["global_doc_id"].tolist()


def test_search_sorted_matchall(sorted_searcher):
    hits = sorted_searcher.search_sorted(MatchAll(), k=5)
    pdf = _stored_lengths(sorted_searcher)
    want = pdf.sort_values(["n_chars", "global_doc_id"]).head(5)
    assert hits["global_doc_id"].tolist() == want["global_doc_id"].tolist()


def test_search_sorted_survives_append(spark, tiny_corpus_pdf, tmp_path_factory):
    """Appends keep per-segment sort; the value merge stays exact even
    though GLOBAL docID order no longer equals value order."""
    d = str(tmp_path_factory.mktemp("idx_sorted_app"))
    half = len(tiny_corpus_pdf) // 2
    build_index(
        spark, spark.createDataFrame(tiny_corpus_pdf.iloc[:half]), d,
        num_segments=2, index_sort="n_chars",
    )
    add_documents(
        spark, spark.createDataFrame(tiny_corpus_pdf.iloc[half:]), d,
        num_segments=2,
    )
    s = LuceneSparkSearcher(spark, d)
    assert s.manifest["index_sort"]["field"] == "n_chars"  # sticky
    pdf = _stored_lengths(s)
    for _, g in pdf.groupby("segment_id"):
        v = g.sort_values("doc_id")["n_chars"].to_numpy()
        assert (np.diff(v) >= 0).all()
    hits = s.search_sorted(Term("return"), k=6)
    full = s.search(Term("return"), k=10_000, with_stored=True)
    ref = full.sort_values(["n_chars", "global_doc_id"], kind="mergesort").head(6)
    assert hits["global_doc_id"].tolist() == ref["global_doc_id"].tolist()


def test_sorted_desc(spark, tiny_corpus_pdf, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx_sorted_desc"))
    build_index(
        spark, spark.createDataFrame(tiny_corpus_pdf), d, num_segments=3,
        index_sort="n_chars", index_sort_desc=True,
    )
    s = LuceneSparkSearcher(spark, d)
    pdf = _stored_lengths(s)
    for _, g in pdf.groupby("segment_id"):
        v = g.sort_values("doc_id")["n_chars"].to_numpy()
        assert (np.diff(v) <= 0).all()
    hits = s.search_sorted(Term("return"), k=5)
    full = s.search(Term("return"), k=10_000, with_stored=True)
    ref = full.sort_values(
        ["n_chars", "global_doc_id"], ascending=[False, True], kind="mergesort"
    ).head(5)
    assert hits["global_doc_id"].tolist() == ref["global_doc_id"].tolist()


def test_unsorted_search_unaffected(spark, tiny_corpus_pdf, tmp_path_factory):
    """search_sorted refuses on an unsorted index; default docID order
    is still the (repo, path, commit) doc-key order."""
    d = str(tmp_path_factory.mktemp("idx_unsorted"))
    build_index(spark, spark.createDataFrame(tiny_corpus_pdf), d, num_segments=3)
    s = LuceneSparkSearcher(spark, d)
    with pytest.raises(ValueError):
        s.search_sorted(Term("return"), k=5)
    ref = tiny_corpus_pdf.sort_values(["repo", "path", "commit"]).reset_index(
        drop=True
    )
    got = s._norms.select("segment_id", "doc_id", "path").toPandas()
    got["gid"] = got["segment_id"].map(s.doc_base) + got["doc_id"]
    got = got.sort_values("gid")
    assert got["path"].tolist() == ref["path"].tolist()
