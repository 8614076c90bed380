"""Repetition statistics and PII scrubbing — the Gopher/C4-style
cleaning operators of a training-data pipeline.

`repetition_stats`: per-document n-gram repetition measures in the style
of the Gopher quality rules (Rae et al. 2021, "Scaling Language Models",
table A1): the character fraction covered by the single most frequent
2-gram (`top2_frac`) and the character fraction covered by the
*repeated* occurrences of duplicated 5-grams (`dup5_frac`). Exact spec
(deterministic, engine-independent):

  tok_chars  = sum(len(token)) over the analyzer token stream
  charmass(g)= count(g) where g is an n-gram, times (len(g) - (n-1))
               (the gram's token characters; the n-1 joining spaces are
               excluded)
  top2_frac  = max over 2-grams of charmass / tok_chars
  dup5_frac  = sum over 5-grams with count > 1 of
               (count-1) * (len(g) - 4) / tok_chars   (all-but-first
               occurrences, mirroring Gopher's duplicate-char fraction)

Documents shorter than the gram length contribute 0.0 fractions.

`pii_scrub`: C4-style PII redaction (emails / NANP-style phone numbers /
IPv4 addresses replaced by typed placeholders) as pure `regexp_replace`
chains — whole-stage codegen, no Python in the loop. The shipped corpus
contains no PII, so the oracle entry runs over a deterministic
planted-PII view (docs get synthetic PII derived from doc_id — computed
identically in Spark and DuckDB, the same planted-twin technique as
dedup_embedding_lsh_verified). The regex subset used is valid and
identical under Java regex (Spark) and RE2 (DuckDB).

Scale notes: repetition_stats is one explode + two groupBys keyed by
(doc_id[, gram]) — doc-local keys, map-side partial aggregation, no
skew (a gram key never spans documents). pii_scrub is a pure per-row
projection: no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sql.relational import duck_tokens_expr, load_documents, spark_tokens_expr


def _grams_expr(n: int) -> str:
    """Array of space-joined n-grams over the token stream, with the
    token array bound via the single-element-transform trick so project
    collapse can't inline the regexp per element (see dedup._shingle_expr)."""
    return (
        f"transform(array({spark_tokens_expr()}), t -> "
        f"CASE WHEN size(t) >= {n} THEN transform(sequence(0, size(t) - {n}), "
        f"i -> concat_ws(' ', slice(t, i + 1, {n}))) ELSE array() END)[0]"
    )


_TOK_CHARS_EXPR = (
    f"length(array_join({spark_tokens_expr()}, ''))"
)


def repetition_stats_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_documents(spark, sf_dir).select(
        F.col("doc_id").cast("bigint"),
        F.expr(_TOK_CHARS_EXPR).cast("bigint").alias("tok_chars"),
        F.expr(_grams_expr(2)).alias("g2"),
        F.expr(_grams_expr(5)).alias("g5"),
    )

    def frac(gcol: str, n: int, dup: bool) -> DataFrame:
        cnt = (
            docs.select("doc_id", "tok_chars", F.explode(gcol).alias("g"))
            .groupBy("doc_id", "tok_chars", "g")
            .agg(F.count("*").alias("cnt"))
            .withColumn("gramchars", F.length("g") - F.lit(n - 1))
        )
        if dup:
            num = F.sum(
                F.when(F.col("cnt") > 1, (F.col("cnt") - 1) * F.col("gramchars"))
                .otherwise(F.lit(0))
            )
        else:
            num = F.max(F.col("cnt") * F.col("gramchars"))
        return cnt.groupBy("doc_id", "tok_chars").agg(num.alias("num"))

    top2 = frac("g2", 2, dup=False).select(
        "doc_id",
        F.round(F.col("num") / F.col("tok_chars"), 4).alias("top2_frac"),
    )
    dup5 = frac("g5", 5, dup=True).select(
        "doc_id",
        F.round(F.col("num") / F.col("tok_chars"), 4).alias("dup5_frac"),
    )
    base = docs.select("doc_id")
    return (
        base.join(top2, "doc_id", "left")
        .join(dup5, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("top2_frac", F.lit(0.0)).alias("top2_frac"),
            F.coalesce("dup5_frac", F.lit(0.0)).alias("dup5_frac"),
        )
        .orderBy("doc_id")
    )


def repetition_stats_duck() -> str:
    te = duck_tokens_expr()
    return f"""
WITH pos AS (
  SELECT doc_id, unnest({te}) AS t, generate_subscripts({te}, 1) AS pos
  FROM documents
),
chars AS (SELECT doc_id, sum(length(t))::BIGINT AS tok_chars FROM pos GROUP BY 1),
g2 AS (
  SELECT doc_id, t || ' ' || lead(t, 1) OVER w AS g
  FROM pos WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
  QUALIFY lead(t, 1) OVER w IS NOT NULL
),
g5 AS (
  SELECT doc_id,
         t || ' ' || lead(t, 1) OVER w || ' ' || lead(t, 2) OVER w
           || ' ' || lead(t, 3) OVER w || ' ' || lead(t, 4) OVER w AS g
  FROM pos WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
  QUALIFY lead(t, 4) OVER w IS NOT NULL
),
top2 AS (
  SELECT doc_id, max(cnt * gramchars) AS num
  FROM (SELECT doc_id, count(*) AS cnt, length(g) - 1 AS gramchars
        FROM g2 GROUP BY doc_id, g)
  GROUP BY 1
),
dup5 AS (
  SELECT doc_id,
         sum(CASE WHEN cnt > 1 THEN (cnt - 1) * gramchars ELSE 0 END) AS num
  FROM (SELECT doc_id, count(*) AS cnt, length(g) - 4 AS gramchars
        FROM g5 GROUP BY doc_id, g)
  GROUP BY 1
)
SELECT d.doc_id::BIGINT AS doc_id,
       coalesce(round(top2.num / c.tok_chars, 4), 0.0) AS top2_frac,
       coalesce(round(dup5.num / c.tok_chars, 4), 0.0) AS dup5_frac
FROM documents d
JOIN chars c USING (doc_id)
LEFT JOIN top2 ON top2.doc_id = d.doc_id
LEFT JOIN dup5 ON dup5.doc_id = d.doc_id
ORDER BY 1
""".strip()


# --- PII scrubbing ------------------------------------------------------------

# Patterns restricted to the Java-regex ∩ RE2 common subset (no lookaround,
# no backrefs): identical match semantics in Spark and DuckDB.
EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z][a-z]+"
PHONE_RE = r"\+1-555-[0-9][0-9][0-9][0-9]"
IP_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"


def _planted_pii_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic planted-PII view: every doc_id % 3 == 0 gains an
    email, % 4 == 0 a phone, % 5 == 0 an IPv4 — derived from doc_id so
    Spark and DuckDB build byte-identical inputs."""
    docs = load_documents(spark, sf_dir)
    return docs.select(
        F.col("doc_id").cast("bigint"),
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(
                    F.lit(" user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 4 == 0,
                F.concat(
                    F.lit(" call +1-555-"),
                    F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 5 == 0,
                F.concat(
                    F.lit(" host 10.0."),
                    (F.col("doc_id") % 256).cast("string"),
                    F.lit(".1"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )


_DUCK_PLANTED = """
planted AS (
  SELECT doc_id::BIGINT AS doc_id,
         text
         || CASE WHEN doc_id % 3 = 0
                 THEN ' user' || doc_id::VARCHAR || '@example.com' ELSE '' END
         || CASE WHEN doc_id % 4 = 0
                 THEN ' call +1-555-' || lpad((doc_id % 10000)::VARCHAR, 4, '0')
                 ELSE '' END
         || CASE WHEN doc_id % 5 = 0
                 THEN ' host 10.0.' || (doc_id % 256)::VARCHAR || '.1' ELSE '' END
         AS text
  FROM documents
)
""".strip()


def pii_scrub_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redact emails/phones/IPs with typed placeholders; report per-doc
    redaction counts plus the md5 of the scrubbed text (the hash makes
    the full scrubbed output value-checkable without shipping it)."""
    docs = _planted_pii_spark(spark, sf_dir)
    scrubbed = (
        docs.withColumn("n_emails", F.regexp_count("text", F.lit(EMAIL_RE)))
        .withColumn("n_phones", F.regexp_count("text", F.lit(PHONE_RE)))
        .withColumn("n_ips", F.regexp_count("text", F.lit(IP_RE)))
        .withColumn("t1", F.regexp_replace("text", EMAIL_RE, "<EMAIL>"))
        .withColumn("t2", F.regexp_replace("t1", PHONE_RE, "<PHONE>"))
        .withColumn("t3", F.regexp_replace("t2", IP_RE, "<IP>"))
    )
    return scrubbed.select(
        "doc_id",
        F.col("n_emails").cast("bigint").alias("n_emails"),
        F.col("n_phones").cast("bigint").alias("n_phones"),
        F.col("n_ips").cast("bigint").alias("n_ips"),
        F.md5("t3").alias("scrubbed_md5"),
    ).orderBy("doc_id")


def pii_scrub_duck() -> str:
    return f"""
WITH {_DUCK_PLANTED}
SELECT doc_id,
       len(regexp_extract_all(text, '{EMAIL_RE}'))::BIGINT AS n_emails,
       len(regexp_extract_all(text, '{PHONE_RE}'))::BIGINT AS n_phones,
       len(regexp_extract_all(text, '{IP_RE}'))::BIGINT AS n_ips,
       md5(regexp_replace(regexp_replace(regexp_replace(text,
           '{EMAIL_RE}', '<EMAIL>', 'g'),
           '{PHONE_RE}', '<PHONE>', 'g'),
           '{IP_RE}', '<IP>', 'g')) AS scrubbed_md5
FROM planted ORDER BY 1
""".strip()
