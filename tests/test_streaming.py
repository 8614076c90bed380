"""Structured Streaming NRT ingestion: files arrive → segments appended →
re-opened searcher sees old + new (SearcherManager/openIfChanged analog)."""

import os

import pytest

from lucene_solr_1_spark.corpus import make_corpus_pandas
from lucene_solr_1_spark.search.query import Term
from lucene_solr_1_spark.search.searcher import LuceneSparkSearcher
from lucene_solr_1_spark.streaming import start_indexing_stream, stream_corpus_source


def _drop_parquet(spark, pdf, path):
    spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(path)


def test_streaming_ingest_incremental(spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("stream_src"))
    idx = str(tmp_path_factory.mktemp("stream_idx"))
    ckpt = str(tmp_path_factory.mktemp("stream_ckpt"))
    pdf = make_corpus_pandas(96)

    # batch 1: first 64 docs arrive
    _drop_parquet(spark, pdf.iloc[:64], src)
    q = start_indexing_stream(
        stream_corpus_source(spark, src), idx, ckpt, num_segments=2
    )
    q.awaitTermination(240)
    s1 = LuceneSparkSearcher(spark, idx)
    assert s1.doc_count == 64
    hits1 = s1.search(Term("return"), k=5, with_stored=False)
    assert len(hits1) == 5

    # batch 2: 32 more docs stream in; re-open picks them up
    _drop_parquet(spark, pdf.iloc[64:], src)
    q = start_indexing_stream(
        stream_corpus_source(spark, src), idx, ckpt, num_segments=2
    )
    q.awaitTermination(240)
    s2 = LuceneSparkSearcher(spark, idx)
    assert s2.doc_count == 96
    # old segments (and their doc bases) untouched by the append
    old = {sid: b for sid, b in s1.doc_base.items()}
    for sid, base in old.items():
        assert s2.doc_base.get(sid) == base


def test_windowed_counts_stream_matches_batch(spark, tmp_path_factory):
    """Streaming watermarked window agg == batch twin on the same events.
    (Append mode emits only watermark-finalized windows; with availableNow
    over a finite file source, all but the tail window finalize.)"""
    import pandas as pd
    from lucene_solr_1_spark.streaming import analytics as A

    sf = "/root/testdata/sf0.001"
    src = str(tmp_path_factory.mktemp("ev_src"))
    ckpt = str(tmp_path_factory.mktemp("ev_ckpt"))
    out = str(tmp_path_factory.mktemp("ev_out"))
    # copy events into the stream source dir
    spark.read.parquet(f"{sf}/events.parquet").coalesce(2).write.mode(
        "append"
    ).parquet(src)

    q = A.windowed_counts_stream(spark, src, ckpt, out)
    q.awaitTermination(240)
    got = (
        spark.read.parquet(out)
        .toPandas()
        .sort_values(["window_start", "event_type"])
        .reset_index(drop=True)
    )
    batch = A.windowed_counts_spark(spark, sf).toPandas()
    # the streaming run may withhold the final (unfinalized) windows
    merged = batch.merge(
        got, on=["window_start", "event_type"], suffixes=("_b", "_s")
    )
    assert len(got) > 0
    assert len(merged) == len(got)  # every emitted window exists in batch
    assert (merged["n_b"] == merged["n_s"]).all()
    assert (abs(merged["sum_value_b"] - merged["sum_value_s"]) < 1e-9).all()
    # coverage: all but at most the tail windows were finalized+emitted
    assert len(got) >= len(batch) - len(batch["event_type"].unique()) * 4
