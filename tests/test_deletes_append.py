"""Deletes (live-docs tombstones) and incremental append (NRT analog):
reference semantics from index/ReadersAndUpdates.java (deletes mask results
but stats stay until merge) and DirectoryReader.openIfChanged (appended
segments visible on re-open, old docIDs stable)."""

import numpy as np
import pandas as pd
import pytest

from lucene_solr_1_spark.corpus import make_corpus_pandas
from lucene_solr_1_spark.index import deletes as dels
from lucene_solr_1_spark.index.builder import add_documents, build_index
from lucene_solr_1_spark.index.merge import merge_down
from lucene_solr_1_spark.search.query import Occur, Bool, Term
from lucene_solr_1_spark.search.searcher import LuceneSparkSearcher


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx_del"))
    pdf = make_corpus_pandas(64)
    build_index(spark, spark.createDataFrame(pdf), d, num_segments=4)
    return d


def test_delete_by_term_masks_hits(spark, idx, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx_del2"))
    pdf = make_corpus_pandas(64)
    build_index(spark, spark.createDataFrame(pdf), d, num_segments=4)
    s0 = LuceneSparkSearcher(spark, d)
    before = s0.search(Term("tail_marker"), k=10, with_stored=False)
    assert len(before) == 1
    doc_count_before = s0.doc_count

    dels.delete_by_term(spark, d, "tail_marker")
    s1 = LuceneSparkSearcher(spark, d)
    after = s1.search(Term("tail_marker"), k=10, with_stored=False)
    assert len(after) == 0
    assert after.attrs["total_hits"] == 0
    # stats unchanged until merge (Lucene: deletes don't touch docFreq/N)
    assert s1.doc_count == doc_count_before
    assert dels.live_doc_count(d) == doc_count_before - 1
    # unrelated queries unaffected except the masked doc
    hits = s1.search(Term("return"), k=64, with_stored=False)
    b_hits = s0.search(Term("return"), k=64, with_stored=False)
    # the deleted doc contained 'return' 200 times → it led the ranking before
    assert len(hits) == len(b_hits) - 1


def test_tombstones_survive_merge(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx_del3"))
    pdf = make_corpus_pandas(200)
    build_index(spark, spark.createDataFrame(pdf), d, num_segments=16)
    dels.delete_by_term(spark, d, "tail_marker")
    before = LuceneSparkSearcher(spark, d).search(
        Term("return"), k=20, with_stored=False
    )
    merge_down(spark, d, target_segments=4)
    s = LuceneSparkSearcher(spark, d)
    assert len(s.search(Term("tail_marker"), k=5, with_stored=False)) == 0
    after = s.search(Term("return"), k=20, with_stored=False)
    np.testing.assert_array_equal(
        before["global_doc_id"].to_numpy(), after["global_doc_id"].to_numpy()
    )
    np.testing.assert_array_equal(
        before["score"].to_numpy(), after["score"].to_numpy()
    )


def test_incremental_append_matches_full_build(spark, tmp_path_factory):
    """append(first 48 + next 16) ranks identically to a full 64-doc build
    (global stats refresh on re-open)."""
    pdf = make_corpus_pandas(64)
    d_full = str(tmp_path_factory.mktemp("idx_full"))
    build_index(spark, spark.createDataFrame(pdf), d_full, num_segments=4)

    d_inc = str(tmp_path_factory.mktemp("idx_inc"))
    build_index(spark, spark.createDataFrame(pdf.iloc[:48]), d_inc, num_segments=4)
    m = add_documents(spark, spark.createDataFrame(pdf.iloc[48:]), d_inc, num_segments=2)
    assert m["doc_count"] == 64
    assert len(m["segments"]) == 6

    q = Bool.of((Occur.SHOULD, Term("return")), (Occur.SHOULD, Term("int")))
    full = LuceneSparkSearcher(spark, d_full).search(q, k=15)
    inc = LuceneSparkSearcher(spark, d_inc).search(q, k=15)
    # docIDs differ (different segment layout) — compare by stored key + score
    kf = [f"{r.repo}|{r.path}|{r.commit}" for r in full.itertuples(index=False)]
    ki = [f"{r.repo}|{r.path}|{r.commit}" for r in inc.itertuples(index=False)]
    assert kf == ki
    np.testing.assert_allclose(
        full["score"].to_numpy(), inc["score"].to_numpy(), rtol=1e-6
    )


def test_append_then_delete_then_search(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx_mix"))
    pdf = make_corpus_pandas(64)
    build_index(spark, spark.createDataFrame(pdf.iloc[:32]), d, num_segments=2)
    add_documents(spark, spark.createDataFrame(pdf.iloc[32:]), d, num_segments=2)
    dels.delete_by_term(spark, d, "tail_marker")
    s = LuceneSparkSearcher(spark, d)
    assert s.doc_count == 64
    assert len(s.search(Term("tail_marker"), k=5, with_stored=False)) == 0
    assert len(s.search(Term("return"), k=10, with_stored=False)) == 10


def test_reclaim_deletes_at_merge(spark, tmp_path_factory):
    """merge(reclaim_deletes=True) physically drops tombstoned docs:
    doc_count shrinks, tombstones vanish, CheckIndex passes, and the
    surviving ranking (by stored key) is unchanged."""
    from lucene_solr_1_spark.index.check import check_index

    d = str(tmp_path_factory.mktemp("idx_reclaim"))
    pdf = make_corpus_pandas(200)
    build_index(spark, spark.createDataFrame(pdf), d, num_segments=16)
    dels.delete_by_term(spark, d, "tail_marker")
    s0 = LuceneSparkSearcher(spark, d)
    before = s0.search(Term("return"), k=30, with_stored=True)
    keys_before = [f"{r.repo}|{r.path}|{r.commit}" for r in before.itertuples(index=False)]
    live_before = dels.live_doc_count(d)
    assert live_before < s0.doc_count

    # merge fully so the tombstoned segment is guaranteed to participate
    merge_down(spark, d, target_segments=1, reclaim_deletes=True)
    s1 = LuceneSparkSearcher(spark, d)
    # stats now reflect the live set only
    assert s1.doc_count == live_before
    assert sum(len(v) for v in s1.tombstones.values()) == 0
    assert check_index(spark, d)["errors"] == []
    # deleted doc gone; surviving ranking preserved by key
    assert len(s1.search(Term("tail_marker"), k=5, with_stored=False)) == 0
    after = s1.search(Term("return"), k=30, with_stored=True)
    keys_after = [f"{r.repo}|{r.path}|{r.commit}" for r in after.itertuples(index=False)]
    assert keys_before == keys_after


def test_delete_by_query(spark, small_corpus_pdf, tmp_path_factory):
    """deleteDocuments(Query): the full match set of an arbitrary query
    tree is tombstoned; other docs stay live; reclaim merge compacts."""
    from lucene_solr_1_spark.index.deletes import delete_by_query, live_doc_count
    from lucene_solr_1_spark.index.merge import merge_down
    from lucene_solr_1_spark.search.parser import parse
    from lucene_solr_1_spark.search.searcher import LuceneSparkSearcher

    d = str(tmp_path_factory.mktemp("idx_dbq"))
    m0 = build_index(spark, spark.createDataFrame(small_corpus_pdf), d,
                     num_segments=4)
    s0 = LuceneSparkSearcher(spark, d)
    q = parse("return AND class AND static")
    n_match = len(s0.search(q, k=m0["doc_count"], with_stored=False))
    assert n_match > 0
    n_other = len(s0.search(parse("id_0001"), k=10, with_stored=False))

    delete_by_query(spark, d, q)
    assert live_doc_count(d) == m0["doc_count"] - n_match
    s1 = LuceneSparkSearcher(spark, d)
    assert len(s1.search(q, k=50, with_stored=False)) == 0
    # a doc outside the match set is untouched
    assert len(s1.search(parse("id_0001"), k=10, with_stored=False)) == n_other

    merge_down(spark, d, target_segments=1, reclaim_deletes=True)
    s2 = LuceneSparkSearcher(spark, d)
    assert s2.manifest["doc_count"] == m0["doc_count"] - n_match
    assert len(s2.search(q, k=50, with_stored=False)) == 0
