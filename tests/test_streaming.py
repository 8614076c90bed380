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


def test_sessionization_stream_matches_batch(spark, tmp_path_factory):
    """Built-in session_window streaming == batch on finalized sessions,
    AND the custom applyInPandasWithState state machine emits exactly
    batch sessions (each user's tail session may stay open in state)."""
    import pandas as pd
    from lucene_solr_1_spark.streaming import sessions as S

    sf = "/root/testdata/sf0.001"
    src = str(tmp_path_factory.mktemp("se_src"))
    spark.read.parquet(f"{sf}/events.parquet").coalesce(2).write.mode(
        "append"
    ).parquet(src)
    batch = S.sessionize_spark(spark, sf).toPandas()
    assert len(batch) > 0

    def _check(start_fn, tag):
        ckpt = str(tmp_path_factory.mktemp(f"se_ckpt_{tag}"))
        out = str(tmp_path_factory.mktemp(f"se_out_{tag}"))
        q = start_fn(spark, src, ckpt, out)
        q.awaitTermination(240)
        got = (
            spark.read.parquet(out)
            .toPandas()
            .sort_values(["user_id", "session_start"])
            .reset_index(drop=True)
        )
        assert len(got) > 0, tag
        merged = batch.merge(
            got, on=["user_id", "session_start"], suffixes=("_b", "_s")
        )
        # every emitted session exists in batch with identical aggregates
        assert len(merged) == len(got), tag
        assert (merged["n_events_b"] == merged["n_events_s"]).all(), tag
        assert (
            abs(merged["sum_value_b"] - merged["sum_value_s"]) < 1e-9
        ).all(), tag
        assert (merged["session_end_b"] == merged["session_end_s"]).all(), tag
        # coverage: at most one open (unemitted) session per user
        n_users = batch["user_id"].nunique()
        assert len(got) >= len(batch) - n_users, tag

    _check(S.sessionize_stream, "builtin")
    _check(S.sessionize_stateful_stream, "stateful")


def test_stateful_sessions_late_events_across_batches(spark, tmp_path_factory):
    """ADVICE r2: a late (within-watermark) event arriving in a LATER
    micro-batch but timestamped inside the open session's span must MERGE
    (min/max), not drag last_us backwards and split the session. Two
    files + maxFilesPerTrigger=1 force two micro-batches with
    out-of-order event time across them."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout
    from lucene_solr_1_spark.streaming import sessions as S

    base = pd.Timestamp("2026-01-01 10:00:00")
    mins = lambda m: base + pd.Timedelta(minutes=m)  # noqa: E731
    # batch file 1: events at t=0, 10, 20 (one open session for user 1)
    f1 = pd.DataFrame(
        {
            "event_id": [1, 2, 3],
            "ts": [mins(0), mins(10), mins(20)],
            "user_id": [1, 1, 1],
            "event_type": ["a"] * 3,
            "value": [1.0, 1.0, 1.0],
            "props": [""] * 3,
        }
    )
    # batch file 2: a LATE event at t=5 (inside the open span) plus a
    # fresh event at t=25 keeping the session alive, then t=200 to close
    # it via gap and advance the watermark far enough to emit
    f2 = pd.DataFrame(
        {
            "event_id": [4, 5, 6],
            "ts": [mins(5), mins(25), mins(200)],
            "user_id": [1, 1, 1],
            "event_type": ["a"] * 3,
            "value": [1.0, 1.0, 1.0],
            "props": [""] * 3,
        }
    )
    src = str(tmp_path_factory.mktemp("late_src"))
    ckpt = str(tmp_path_factory.mktemp("late_ckpt"))
    out = str(tmp_path_factory.mktemp("late_out"))
    import time as _time

    spark.createDataFrame(f1).coalesce(1).write.mode("append").parquet(src)
    _time.sleep(1.1)  # file-source orders batches by mod time: f1 first
    spark.createDataFrame(f2).coalesce(1).write.mode("append").parquet(src)

    events = (
        spark.readStream.schema(S._EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withWatermark("ts", S.WATERMARK)
    )
    sessions = events.groupBy("user_id").applyInPandasWithState(
        S._sessionize_state_func,
        outputStructType=S._SESSION_DDL,
        stateStructType=S._STATE_DDL,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    q = (
        sessions.writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start(out)
    )
    q.awaitTermination(240)
    got = spark.read.parquet(out).toPandas().sort_values("session_start")
    # the merged session [0..25]+gap holds ALL FIVE events incl. the late
    # t=5 one — under the old in-order assumption the late event dragged
    # last_us back to t=5 and t=25 still merged, but n/e span broke on
    # longer reorderings; the invariant pinned here matches session_window
    first = got.iloc[0]
    assert first["n_events"] == 5
    assert first["session_start"] == mins(0)
    assert first["session_end"] == mins(25) + pd.Timedelta(seconds=S.GAP_SECONDS)


def test_stateful_sessions_straggler_merges_like_session_window(
    spark, tmp_path_factory
):
    """r3: stragglers older than EVERY open session's gap reach must be
    held (watermark-gated) and merged with each other, exactly like the
    built-in session_window — the r2 design emitted each straggler
    immediately as its own single-event session, splitting [45,55] into
    two. Two files + maxFilesPerTrigger=1 put the stragglers in a later
    micro-batch than the session they predate."""
    import pandas as pd
    import time as _time
    from pyspark.sql.streaming.state import GroupStateTimeout
    from lucene_solr_1_spark.streaming import sessions as S

    base = pd.Timestamp("2026-01-01 10:00:00")
    mins = lambda m: base + pd.Timedelta(minutes=m)  # noqa: E731
    # batch 1: one open session [100, 110]; watermark after it = mins(40)
    f1 = pd.DataFrame(
        {
            "event_id": [1, 2],
            "ts": [mins(100), mins(110)],
            "user_id": [1, 1],
            "event_type": ["a"] * 2,
            "value": [1.0, 1.0],
            "props": [""] * 2,
        }
    )
    # batch 2: within-watermark stragglers at 45 and 55 — older than
    # start(100)-GAP(30), 10 min apart so they form ONE session — plus
    # an event at 300 to advance the watermark past both sessions' ends
    f2 = pd.DataFrame(
        {
            "event_id": [3, 4, 5],
            "ts": [mins(45), mins(55), mins(300)],
            "user_id": [1, 1, 1],
            "event_type": ["a"] * 3,
            "value": [1.0, 1.0, 1.0],
            "props": [""] * 3,
        }
    )
    src = str(tmp_path_factory.mktemp("strag_src"))
    ckpt = str(tmp_path_factory.mktemp("strag_ckpt"))
    out = str(tmp_path_factory.mktemp("strag_out"))
    spark.createDataFrame(f1).coalesce(1).write.mode("append").parquet(src)
    _time.sleep(1.1)
    spark.createDataFrame(f2).coalesce(1).write.mode("append").parquet(src)

    events = (
        spark.readStream.schema(S._EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withWatermark("ts", S.WATERMARK)
    )
    sessions = events.groupBy("user_id").applyInPandasWithState(
        S._sessionize_state_func,
        outputStructType=S._SESSION_DDL,
        stateStructType=S._STATE_DDL,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    q = (
        sessions.writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start(out)
    )
    q.awaitTermination(240)
    got = (
        spark.read.parquet(out)
        .toPandas()
        .sort_values("session_start")
        .reset_index(drop=True)
    )
    gap = pd.Timedelta(seconds=S.GAP_SECONDS)
    # exactly two emitted sessions: the merged straggler pair + the
    # original; the t=300 tail stays open in state
    assert len(got) == 2
    assert got.loc[0, "session_start"] == mins(45)
    assert got.loc[0, "session_end"] == mins(55) + gap
    assert got.loc[0, "n_events"] == 2
    assert got.loc[1, "session_start"] == mins(100)
    assert got.loc[1, "session_end"] == mins(110) + gap
    assert got.loc[1, "n_events"] == 2


def test_streaming_exact_dedup_across_batches(spark, tmp_path_factory):
    """Dedup-at-ingest: a content hash first seen in batch 1 must NOT be
    re-emitted when a duplicate arrives in batch 2; within a batch the
    min-doc_id copy wins; result set == the batch twin's representative
    set over the full input."""
    import time as _time

    import pandas as pd
    from lucene_solr_1_spark.streaming import dedup_stream as DS

    sf = "/root/testdata/sf0.001"
    full = spark.read.parquet(f"{sf}/documents.parquet").toPandas()
    half = len(full) // 2
    src = str(tmp_path_factory.mktemp("dd_src"))
    ckpt = str(tmp_path_factory.mktemp("dd_ckpt"))
    out = str(tmp_path_factory.mktemp("dd_out"))
    spark.createDataFrame(full.iloc[:half]).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    _time.sleep(1.1)
    spark.createDataFrame(full.iloc[half:]).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    # force two micro-batches so dupes straddle the batch boundary
    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql import functions as F

    docs = (
        spark.readStream.schema(DS._DOC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withColumn("text_hash", F.md5("text"))
    )
    q = (
        docs.groupBy("text_hash")
        .applyInPandasWithState(
            DS._dedup_state_func,
            outputStructType=DS._OUT_DDL,
            stateStructType="emitted boolean",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start(out)
    )
    q.awaitTermination(240)
    got = spark.read.parquet(out).toPandas()
    # batch twin: min doc_id per content hash over the FULL input
    import hashlib

    full["h"] = full["text"].map(lambda t: hashlib.md5(t.encode()).hexdigest())
    want = full.groupby("h")["doc_id"].min()
    assert len(got) == len(want)  # one emission per distinct content
    assert got["text_hash"].is_unique
    got_map = got.set_index("text_hash")["doc_id"]
    # every hash emitted exactly once with a valid representative: the
    # batch min UNLESS the min arrived in a later batch than the first
    # emission (first-arrival-wins stream semantics) — in that case the
    # emitted doc is the min of the EARLIEST batch containing the hash
    b1 = full.iloc[:half].groupby("h")["doc_id"].min()
    for h, doc in got_map.items():
        expect = b1[h] if h in b1.index else want[h]
        assert doc == expect, h


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
