"""Streaming exact-dedup at ingest: emit each document the FIRST time
its content hash is seen, across micro-batches — the dedup-at-ingest
step of a continuously-fed training-data pipeline (the streaming twin of
pipeline/dedup.dedup_exact; reference parity: index-time dedup /
DuplicateFilter keep-first semantics).

Shape: `applyInPandasWithState` keyed by md5(text) — state is one
boolean per distinct content hash ("already emitted"), so state size is
O(distinct contents) regardless of stream length, and the shuffle key is
the uniform content hash (no skew by construction). Within a batch the
min-doc_id row wins (deterministic, matching the batch twin's
min(doc_id) representative).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

_DOC_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)
_OUT_DDL = "doc_id bigint, text_hash string, source string"


def _dedup_state_func(key, pdf_iter, state):
    """Emit the min-doc_id row for this content hash IFF the hash has
    never been emitted before (state.exists <=> emitted)."""
    rows = [p for p in pdf_iter if len(p)]
    if not state.exists and rows:
        df = pd.concat(rows)
        first = df.loc[df["doc_id"].idxmin()]
        state.update((True,))
        yield pd.DataFrame(
            [(int(first["doc_id"]), key[0], first["source"])],
            columns=["doc_id", "text_hash", "source"],
        )


def dedup_exact_stream(
    spark: SparkSession, source_dir: str, checkpoint_dir: str, out_dir: str
):
    """Start the streaming dedup over a parquet file source; append mode
    emits first-arrivals only."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    docs = spark.readStream.schema(_DOC_SCHEMA).parquet(source_dir)
    keyed = docs.withColumn("text_hash", F.md5("text"))
    out = keyed.groupBy("text_hash").applyInPandasWithState(
        _dedup_state_func,
        outputStructType=_OUT_DDL,
        stateStructType="emitted boolean",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return (
        out.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start(out_dir)
    )
