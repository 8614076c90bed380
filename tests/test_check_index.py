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
