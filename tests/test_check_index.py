"""CheckIndex analog: a sound index verifies clean; corruption is caught
(index/CheckIndex.java, BaseTestCheckIndex model)."""

import os

import pyarrow.parquet as pq
import pyarrow as pa

from lucene_solr_1_spark.corpus import make_corpus_pandas
from lucene_solr_1_spark.index import manifest as mf
from lucene_solr_1_spark.index.builder import build_index
from lucene_solr_1_spark.index.check import check_index
from lucene_solr_1_spark.index.merge import merge_down


def test_clean_index_passes(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("chk"))
    build_index(spark, spark.createDataFrame(make_corpus_pandas(64)), d, num_segments=4)
    rep = check_index(spark, d)
    assert rep["errors"] == []
    assert rep["segments"] == 4
    assert rep["terms_checked"] > 0


def test_merged_index_passes(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("chk2"))
    build_index(spark, spark.createDataFrame(make_corpus_pandas(128)), d, num_segments=8)
    merge_down(spark, d, target_segments=2)
    rep = check_index(spark, d)
    assert rep["errors"] == []


def test_corruption_detected(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("chk3"))
    m = build_index(spark, spark.createDataFrame(make_corpus_pandas(64)), d, num_segments=2)
    # corrupt one segment's postings: overwrite a ttf value
    sid = m["segments"][0]["segment_id"]
    p = os.path.join(mf.segment_dir(d, sid), "postings.parquet")
    t = pq.read_table(p).to_pandas()
    t.loc[0, "ttf"] = t.loc[0, "ttf"] + 7
    pq.write_table(pa.Table.from_pandas(t, preserve_index=False), p)
    rep = check_index(spark, d)
    assert rep["errors"], "corruption must be reported"


def test_exorcise_drops_broken_segments(spark, small_corpus_pdf, tmp_path_factory):
    """CheckIndex -exorcise: unreadable or inconsistent segments are
    dropped from the manifest; the survivors stay searchable with
    re-aggregated global stats."""
    import os

    from lucene_solr_1_spark.index import manifest as mf
    from lucene_solr_1_spark.index.builder import _POSTINGS_FILE, build_index
    from lucene_solr_1_spark.index.check import check_index, exorcise
    from lucene_solr_1_spark.search.query import Term
    from lucene_solr_1_spark.search.searcher import LuceneSparkSearcher

    d = str(tmp_path_factory.mktemp("idx_ex"))
    m0 = build_index(spark, spark.createDataFrame(small_corpus_pdf), d,
                     num_segments=4)
    # clean index: exorcise is a no-op (no new generation)
    r = exorcise(spark, d)
    assert r["dropped"] == []
    assert r["manifest"]["generation"] == m0["generation"]

    # corrupt one segment's postings parquet (truncate to garbage)
    victim = sorted(m0["segments"], key=lambda s: s["partition_id"])[1]
    pfile = os.path.join(
        mf.segment_dir(d, victim["segment_id"]), _POSTINGS_FILE
    )
    target = pfile if os.path.isfile(pfile) else os.path.join(
        pfile, sorted(f for f in os.listdir(pfile) if f.endswith(".parquet"))[0]
    )
    with open(target, "wb") as f:
        f.write(b"not a parquet file")

    r = exorcise(spark, d)
    assert [sid for sid, _ in r["dropped"]] == [victim["segment_id"]]
    m1 = r["manifest"]
    assert len(m1["segments"]) == 3
    assert m1["doc_count"] == m0["doc_count"] - victim["doc_count"]
    assert check_index(spark, d)["errors"] == []
    s = LuceneSparkSearcher(spark, d)
    hits = s.search(Term("return"), k=10, with_stored=False)
    assert len(hits) == 10


def test_exorcise_preserves_tombstones(spark, small_corpus_pdf, tmp_path_factory):
    """Deletes + exorcise: tombstone_files is NOT manifest-sticky, so the
    exorcise recommit must carry it explicitly — prior deletes must NOT
    resurrect in the surviving segments."""
    import os

    from lucene_solr_1_spark.index import manifest as mf
    from lucene_solr_1_spark.index.builder import _POSTINGS_FILE, build_index
    from lucene_solr_1_spark.index.check import exorcise
    from lucene_solr_1_spark.index.deletes import delete_by_term
    from lucene_solr_1_spark.search.query import Term
    from lucene_solr_1_spark.search.searcher import LuceneSparkSearcher

    d = str(tmp_path_factory.mktemp("idx_ex_del"))
    pdf = small_corpus_pdf.copy()
    pdf.loc[pdf.index[0], "content"] = pdf.loc[pdf.index[0], "content"] + " zzdoomed"
    m0 = build_index(spark, spark.createDataFrame(pdf), d, num_segments=4)
    delete_by_term(spark, d, "zzdoomed")
    s = LuceneSparkSearcher(spark, d)
    assert len(s.search(Term("zzdoomed"), k=5, with_stored=False)) == 0

    # corrupt a segment that does NOT hold the deleted doc, then exorcise
    victim = sorted(m0["segments"], key=lambda x: x["partition_id"])[-1]
    pfile = os.path.join(mf.segment_dir(d, victim["segment_id"]), _POSTINGS_FILE)
    target = pfile if os.path.isfile(pfile) else os.path.join(
        pfile, sorted(f for f in os.listdir(pfile) if f.endswith(".parquet"))[0]
    )
    with open(target, "wb") as f:
        f.write(b"garbage")
    r = exorcise(spark, d)
    assert r["dropped"], "corrupt segment must drop"
    assert r["manifest"].get("tombstone_files"), "deletes must survive exorcise"
    s = LuceneSparkSearcher(spark, d)
    assert len(s.search(Term("zzdoomed"), k=5, with_stored=False)) == 0
