"""Text analysis operators: token counting, language ID heuristic,
quality scoring, document fingerprinting — all pure built-in expressions
(JVM-side, whole-stage codegen), each with a DuckDB oracle twin."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sql.relational import duck_tokens_expr, load_documents, spark_tokens_expr

_EN_STOP = (
    "the", "a", "and", "of", "to", "in", "is", "it", "that", "this",
)
_STOP_SQL = ", ".join(f"'{w}'" for w in _EN_STOP)


# BPE-style pre-tokenization units (GPT-2 pattern simplified to drop the
# lookahead neither Java regex nor RE2 needs here): optional leading
# space + a letter run / digit run / punctuation run. Unit count is the
# standard cheap LLM-token-budget estimator.
_BPE_UNIT_PATTERN = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def token_count_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_documents(spark, sf_dir)
    return docs.select(
        F.col("doc_id").cast("bigint"),
        F.size(F.expr(spark_tokens_expr())).cast("bigint").alias("n_tokens"),
        F.size(F.expr(r"regexp_extract_all(text, '\\S+', 0)"))
        .cast("bigint")
        .alias("n_ws_tokens"),
        # Spark SQL string literals unescape backslashes: '\s' becomes 's',
        # silently changing the char class — double them for the literal
        # (DuckDB literals keep the single backslash)
        F.size(
            F.expr(
                "regexp_extract_all(text, '"
                + _BPE_UNIT_PATTERN.replace("\\", "\\\\")
                + "', 0)"
            )
        ).cast("bigint").alias("n_bpe_units"),
    ).orderBy("doc_id")


def token_count_duck() -> str:
    return f"""
SELECT doc_id::BIGINT AS doc_id,
       len({duck_tokens_expr()})::BIGINT AS n_tokens,
       len(regexp_extract_all(text, '\\S+'))::BIGINT AS n_ws_tokens,
       len(regexp_extract_all(text, '{_BPE_UNIT_PATTERN}'))::BIGINT AS n_bpe_units
FROM documents ORDER BY 1
""".strip()


def lang_id_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-ratio language ID heuristic (n-gram LID stand-in)."""
    docs = load_documents(spark, sf_dir).withColumn("toks", F.expr(spark_tokens_expr()))
    toks = docs.select("doc_id", F.explode("toks").alias("t"))
    agg = toks.groupBy("doc_id").agg(
        (
            F.sum(F.when(F.col("t").isin(list(_EN_STOP)), 1).otherwise(0))
            / F.count("*")
        ).alias("stop_ratio")
    )
    return (
        agg.select(
            F.col("doc_id").cast("bigint"),
            F.round("stop_ratio", 4).alias("stop_ratio"),
            F.when(F.col("stop_ratio") >= 0.03, "en").otherwise("xx").alias("pred_lang"),
        )
        .orderBy("doc_id")
    )


def lang_id_duck() -> str:
    return f"""
WITH tok AS (SELECT doc_id, unnest({duck_tokens_expr()}) AS t FROM documents),
agg AS (
  SELECT doc_id,
         sum(CASE WHEN t IN ({_STOP_SQL}) THEN 1 ELSE 0 END)::DOUBLE / count(*) AS stop_ratio
  FROM tok GROUP BY 1
)
SELECT doc_id::BIGINT AS doc_id, round(stop_ratio, 4) AS stop_ratio,
       CASE WHEN stop_ratio >= 0.03 THEN 'en' ELSE 'xx' END AS pred_lang
FROM agg ORDER BY 1
""".strip()


def quality_score_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length/alpha-ratio/mean-token-length quality heuristic."""
    docs = load_documents(spark, sf_dir).withColumn("toks", F.expr(spark_tokens_expr()))
    out = docs.select(
        F.col("doc_id").cast("bigint"),
        F.size("toks").cast("double").alias("n_tokens"),
        (F.length("text") / F.greatest(F.size("toks"), F.lit(1))).alias("mean_tok_span"),
    ).withColumn(
        "quality",
        F.round(
            F.least(F.col("n_tokens") / 50.0, F.lit(1.0))
            * F.least(F.lit(8.0) / F.greatest(F.col("mean_tok_span"), F.lit(1.0)), F.lit(1.0)),
            4,
        ),
    )
    return out.select(
        "doc_id", F.round("mean_tok_span", 4).alias("mean_tok_span"), "quality"
    ).orderBy("doc_id")


def quality_score_duck() -> str:
    te = duck_tokens_expr()
    return f"""
WITH b AS (
  SELECT doc_id, len({te})::DOUBLE AS n_tokens,
         length(text)::DOUBLE / greatest(len({te}), 1) AS mean_tok_span
  FROM documents
)
SELECT doc_id::BIGINT AS doc_id,
       round(mean_tok_span, 4) AS mean_tok_span,
       round(least(n_tokens / 50.0, 1.0) * least(8.0 / greatest(mean_tok_span, 1.0), 1.0), 4) AS quality
FROM b ORDER BY 1
""".strip()


def fingerprint_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized-content fingerprint: md5 of lowercased whitespace-collapsed
    text (rolling-hash stand-in; dedup key for near-identical formatting)."""
    docs = load_documents(spark, sf_dir)
    return docs.select(
        F.col("doc_id").cast("bigint"),
        F.md5(F.regexp_replace(F.lower("text"), r"\s+", " ")).alias("fingerprint"),
    ).orderBy("doc_id")


def fingerprint_duck() -> str:
    return (
        "SELECT doc_id::BIGINT AS doc_id, "
        "md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS fingerprint "
        "FROM documents ORDER BY 1"
    )
