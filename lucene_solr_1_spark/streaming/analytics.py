"""Event-stream analytics: watermarked tumbling-window aggregation.

The reference has no event-time engine (SURVEY.md §1.5) — this is the
Spark-native capability a log/metrics consumer of the engine would expect:
`readStream` → `withWatermark` → `window()` aggregation, with a batch twin
of the SAME aggregation spec so the streaming result is oracle-checkable
(both against each other and against the DuckDB SQL in the driver gate).

Scale notes: tumbling windows shuffle on (window, event_type) — bounded
cardinality keys, no skew; the watermark bounds state so the stateful
aggregation runs forever on unbounded input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

WINDOW = "10 minutes"
WATERMARK = "30 minutes"


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _agg(df: DataFrame) -> DataFrame:
    return (
        df.groupBy(F.window("ts", WINDOW).alias("w"), "event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def windowed_counts_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the streaming aggregation (same window spec)."""
    return _agg(load_events(spark, sf_dir)).orderBy("window_start", "event_type")


def windowed_counts_duck() -> str:
    return """
SELECT time_bucket(INTERVAL 10 MINUTE, ts) AS window_start,
       event_type,
       count(*)::BIGINT AS n,
       round(sum(value), 4) AS sum_value
FROM events GROUP BY 1, 2 ORDER BY 1, 2
""".strip()


def windowed_counts_stream(
    spark: SparkSession, source_dir: str, checkpoint_dir: str, out_dir: str
):
    """Streaming form: file source → watermark → windowed agg → parquet
    sink (append mode finalizes a window once the watermark passes it).
    Returns the started StreamingQuery (availableNow drain)."""
    events = (
        spark.readStream.schema(
            "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double, props string"
        )
        .parquet(source_dir)
        .withWatermark("ts", WATERMARK)
    )
    return (
        _agg(events)
        .writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start(out_dir)
    )
