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


def code_stats_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-quality filtering signals (the StarCoder/SantaCoder-style
    rules a source-code training pipeline gates on): line-shape stats
    (count, mean/max length — screens minified/generated blobs),
    alphanumeric fraction (screens binary/data blobs), comment-line
    count (# or // prefixed). Pure codegen expressions over one scan —
    no UDF, no shuffle; at 100 TB this is a map-only pass."""
    docs = load_documents(spark, sf_dir)
    lines = F.split(F.col("text"), "\n")
    lens = F.expr("transform(split(text, '\\n'), l -> length(l))")
    return docs.select(
        F.col("doc_id").cast("bigint"),
        F.size(lines).cast("bigint").alias("n_lines"),
        F.expr(
            "aggregate(transform(split(text, '\\n'), l -> length(l)), "
            "0L, (a, x) -> a + x)"
        ).alias("_sum_len"),
        F.array_max(lens).cast("bigint").alias("max_line_len"),
        F.size(F.expr(r"filter(split(text, '\\n'), l -> l rlike '^\\\\s*(#|//)')"))
        .cast("bigint")
        .alias("comment_lines"),
        (
            F.length(F.regexp_replace("text", "[^A-Za-z0-9]", ""))
            / F.greatest(F.length("text"), F.lit(1))
        ).alias("_alpha"),
    ).select(
        "doc_id",
        "n_lines",
        F.round(F.col("_sum_len") / F.col("n_lines"), 4).alias("avg_line_len"),
        "max_line_len",
        "comment_lines",
        F.round("_alpha", 4).alias("alpha_frac"),
    ).orderBy("doc_id")


def code_stats_duck() -> str:
    return r"""
WITH l AS (
  SELECT doc_id, text, string_split(text, chr(10)) AS lines FROM documents
)
SELECT doc_id::BIGINT AS doc_id,
       len(lines)::BIGINT AS n_lines,
       round(list_sum(list_transform(lines, x -> length(x)))::DOUBLE
             / len(lines), 4) AS avg_line_len,
       list_max(list_transform(lines, x -> length(x)))::BIGINT AS max_line_len,
       len(list_filter(lines, x -> regexp_matches(x, '^\s*(#|//)')))::BIGINT
         AS comment_lines,
       round(length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g'))::DOUBLE
             / greatest(length(text), 1), 4) AS alpha_frac
FROM l ORDER BY 1
""".strip()
