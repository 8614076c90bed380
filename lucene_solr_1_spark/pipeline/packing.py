"""Sequence packing — the concat-and-chunk step every LLM training
pipeline runs after curation: document token streams are concatenated in
a deterministic order and cut into fixed-length training sequences (the
GPT-style packing where documents may straddle sequence boundaries).

Spark shape for 100 TB: a GLOBAL concatenation order would serialize the
cumsum, so the stream is sharded by a deterministic hash bucket
(doc_id % n_buckets) and packing runs INDEPENDENTLY per bucket — exactly
how production packers shard (sequences never cross shard boundaries;
each bucket's running offset is a window cumsum over that bucket only,
so the only shuffle is one hash partition on the uniform bucket key).
Every quantity is integer arithmetic over the token COUNT — the token
streams themselves never move; the output is the doc -> (bucket, global
stream offset, first/last sequence) placement map the tokenizer job
consumes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..sql.relational import duck_tokens_expr, load_documents, spark_tokens_expr


def pack_sequences_spark(
    spark: SparkSession,
    sf_dir: str,
    seq_len: int = 512,
    n_buckets: int = 8,
) -> DataFrame:
    """Placement map: one row per doc with its bucket, offset in the
    bucket's concatenated token stream, and the first/last seq_len-sized
    training sequence it lands in (straddling docs span several).
    Deterministic: bucket = doc_id % n_buckets, order by doc_id inside
    the bucket — reshuffle-proof like quota_split's hash assignment."""
    docs = load_documents(spark, sf_dir).select(
        F.col("doc_id").cast("bigint"),
        F.size(F.expr(spark_tokens_expr())).cast("bigint").alias("n_tokens"),
    )
    w = Window.partitionBy("bucket").orderBy("doc_id")
    placed = (
        docs.withColumn("bucket", (F.col("doc_id") % n_buckets).cast("bigint"))
        .withColumn(
            "stream_offset",
            F.coalesce(F.sum("n_tokens").over(w) - F.col("n_tokens"), F.lit(0)),
        )
        .withColumn("first_seq", (F.col("stream_offset") / seq_len).cast("bigint"))
        .withColumn(
            "last_seq",
            F.when(F.col("n_tokens") > 0,
                   ((F.col("stream_offset") + F.col("n_tokens") - 1) / seq_len))
            .otherwise(F.col("stream_offset") / seq_len)
            .cast("bigint"),
        )
    )
    return placed.select(
        "doc_id", "bucket", "stream_offset", "n_tokens", "first_seq", "last_seq"
    ).orderBy("doc_id")


def pack_sequences_duck(seq_len: int = 512, n_buckets: int = 8) -> str:
    te = duck_tokens_expr()
    return f"""
WITH d AS (
  SELECT doc_id::BIGINT AS doc_id,
         (doc_id % {n_buckets})::BIGINT AS bucket,
         len({te})::BIGINT AS n_tokens
  FROM documents
),
placed AS (
  SELECT doc_id, bucket, n_tokens,
         (sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id)
          - n_tokens)::BIGINT AS stream_offset
  FROM d
)
SELECT doc_id, bucket, stream_offset, n_tokens,
       (stream_offset // {seq_len})::BIGINT AS first_seq,
       CASE WHEN n_tokens > 0
            THEN ((stream_offset + n_tokens - 1) // {seq_len})::BIGINT
            ELSE (stream_offset // {seq_len})::BIGINT END AS last_seq
FROM placed
ORDER BY doc_id
""".strip()


def packing_stats_spark(
    spark: SparkSession, sf_dir: str, seq_len: int = 512, n_buckets: int = 8
) -> DataFrame:
    """Per-bucket packing yield: full sequences produced and the tail
    waste the final partial sequence drops — the utilization metric a
    packing job reports (full_seqs * seq_len / total_tokens)."""
    placed = pack_sequences_spark(spark, sf_dir, seq_len, n_buckets)
    return (
        placed.groupBy("bucket")
        .agg(F.sum("n_tokens").alias("total_tokens"))
        .select(
            "bucket",
            "total_tokens",
            (F.col("total_tokens") / seq_len).cast("bigint").alias("full_seqs"),
            (F.col("total_tokens") % seq_len).cast("bigint").alias("tail_tokens"),
        )
        .orderBy("bucket")
    )


def packing_stats_duck(seq_len: int = 512, n_buckets: int = 8) -> str:
    te = duck_tokens_expr()
    return f"""
WITH d AS (
  SELECT (doc_id % {n_buckets})::BIGINT AS bucket,
         len({te})::BIGINT AS n_tokens
  FROM documents
)
SELECT bucket, sum(n_tokens)::BIGINT AS total_tokens,
       (sum(n_tokens) // {seq_len})::BIGINT AS full_seqs,
       (sum(n_tokens) % {seq_len})::BIGINT AS tail_tokens
FROM d GROUP BY 1 ORDER BY bucket
""".strip()
