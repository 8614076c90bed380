"""Structured Streaming ingestion — continuous NRT indexing.

The reference has no event-time streaming engine; its closest concept is
near-real-time refresh (index/DirectoryReader.java openIfChanged,
search/SearcherManager.java): writers keep appending segments, readers
re-open to see them. The Spark-native rendering: a streaming source of
corpus rows → `foreachBatch` → `add_documents` (new segment partitions +
atomic manifest generation per micro-batch). Exactly-once at the index
level comes from the combination of Spark's checkpointed batch IDs and the
builder's per-partition fingerprint checkpoints: a replayed batch finds
its segments' meta.json markers and reuses them instead of re-indexing.

Scale notes: each micro-batch is an independent shuffle-free segment
build; merge pressure from many small streamed segments is handled by the
standard tiered merge (merge.py merge_down) run periodically — same
division of labor as Lucene's ConcurrentMergeScheduler behind an NRT
writer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..corpus import CORPUS_DDL
from ..index.builder import add_documents


def stream_corpus_source(spark: SparkSession, source_dir: str) -> DataFrame:
    """File-based streaming source of corpus rows (new parquet files under
    `source_dir` are discovered per trigger)."""
    return spark.readStream.schema(CORPUS_DDL).parquet(source_dir)


def start_indexing_stream(
    stream_df: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    num_segments: int = 2,
    available_now: bool = True,
):
    """Start the indexing sink; returns the StreamingQuery.

    `available_now=True` drains everything currently available then stops
    (batch-incremental refresh); False runs continuously per trigger.
    """

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        add_documents(
            batch_df.sparkSession, batch_df, index_dir, num_segments=num_segments
        )

    writer = stream_df.writeStream.foreachBatch(_sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
