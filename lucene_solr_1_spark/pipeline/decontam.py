"""Benchmark decontamination + unigram-LM perplexity scoring.

Two training-data curation operators every large-scale pipeline runs
before pre-training:

- `decontam_spark`: n-gram-overlap contamination check — the GPT-3 /
  PaLM "13-gram dedup against benchmarks" pattern. A (small) benchmark
  corpus is reduced to its distinct token n-grams; every candidate doc
  is scored by the fraction of ITS distinct n-grams that appear in the
  benchmark set, and flagged above a threshold. At 100 TB the benchmark
  side is tiny (benchmarks are MBs), so it BROADCASTS; the candidate
  side streams through one left-semi hash join + one map-side-combined
  groupBy(doc_id) — no shuffle of raw text, no skew (n-gram keys only
  route the broadcast probe).

- `unigram_logppl_spark`: per-doc cross-entropy under a corpus unigram
  LM — the CCNet-style perplexity-bucketing signal with the KenLM 5-gram
  replaced by an honest unigram model computable in pure SQL. The model
  is the top-V vocabulary by corpus frequency (ties broken by token so
  both engines derive the SAME vocab); out-of-vocabulary tokens score
  like count-1 events. The vocab frame is top-V-small and broadcasts;
  the scoring pass is one explode + broadcast join + groupBy(doc_id)
  with map-side partial aggregation.

Both have DuckDB twins generated from the same constants (the shared
TOKEN_PATTERN tokenizer); ratios are rounded to 4 decimals on both
sides like the relational BM25 twins (double partial-sum order is
engine-dependent at ~1e-15 relative error — rounding absorbs it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sql.relational import duck_tokens_expr, load_documents, spark_tokens_expr

N_GRAM = 5          # overlap n-gram width (13 in GPT-3; 5 fits test docs)
BENCH_MOD = 29      # benchmark corpus = docs with doc_id % BENCH_MOD == 0
DEFAULT_THRESHOLD = 0.10
DEFAULT_VOCAB = 30  # top-V unigram vocabulary (small to exercise OOV)


def _ngram_expr(n: int) -> str:
    """Token n-grams as one array expression. The token array is bound
    via a single-element transform (see pipeline/dedup.py _shingle_expr:
    without it Catalyst inlines the regexp into every element access)."""
    parts = ", ".join(f"t[i+{j}]" for j in range(n))
    return (
        f"transform(array({spark_tokens_expr()}), t -> "
        f"CASE WHEN size(t) >= {n} THEN transform(sequence(0, size(t) - {n}), "
        f"i -> concat_ws(' ', {parts})) ELSE array() END)[0]"
    )


def decontam_spark(
    spark: SparkSession, sf_dir: str,
    n: int = N_GRAM, bench_mod: int = BENCH_MOD,
    threshold: float = DEFAULT_THRESHOLD,
) -> DataFrame:
    """(doc_id, n_ngrams, n_matched, contamination, flagged) for every
    NON-benchmark doc; contamination = |distinct n-grams ∩ benchmark| /
    |distinct n-grams| (0.0 for docs shorter than n tokens)."""
    docs = load_documents(spark, sf_dir)
    grams = (
        docs.select("doc_id", F.expr(_ngram_expr(n)).alias("ngs"))
        .select("doc_id", F.explode("ngs").alias("ng"))
        .distinct()
    )
    bench = (
        grams.where(F.col("doc_id") % bench_mod == 0).select("ng").distinct()
    )
    ev = grams.where(F.col("doc_id") % bench_mod != 0)
    hits = (
        ev.join(F.broadcast(bench), "ng", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_matched"))
    )
    totals = ev.groupBy("doc_id").agg(F.count("*").alias("n_ngrams"))
    base = docs.where(F.col("doc_id") % bench_mod != 0).select("doc_id")
    out = (
        base.join(totals, "doc_id", "left")
        .join(hits, "doc_id", "left")
        .na.fill({"n_ngrams": 0, "n_matched": 0})
    )
    ratio = F.when(
        F.col("n_ngrams") > 0, F.col("n_matched") / F.col("n_ngrams")
    ).otherwise(F.lit(0.0))
    return out.select(
        F.col("doc_id").cast("bigint"),
        F.col("n_ngrams").cast("bigint"),
        F.col("n_matched").cast("bigint"),
        F.round(ratio, 4).alias("contamination"),
        (ratio >= threshold).alias("flagged"),
    ).orderBy("doc_id")


def decontam_duck(
    n: int = N_GRAM, bench_mod: int = BENCH_MOD,
    threshold: float = DEFAULT_THRESHOLD,
) -> str:
    return f"""
WITH d AS (SELECT doc_id, {duck_tokens_expr()} AS ts FROM documents),
g AS (
  SELECT DISTINCT doc_id, list_aggregate(ts[i.i:i.i+{n - 1}], 'string_agg', ' ') AS ng
  FROM d, unnest(generate_series(1, len(ts) - {n - 1})) AS i(i)
  WHERE len(ts) >= {n}
),
bench AS (SELECT DISTINCT ng FROM g WHERE doc_id % {bench_mod} = 0),
st AS (
  SELECT doc_id, count(*) AS n_ngrams,
         count(*) FILTER (ng IN (SELECT ng FROM bench)) AS n_matched
  FROM g WHERE doc_id % {bench_mod} != 0 GROUP BY 1
)
SELECT d.doc_id::BIGINT AS doc_id,
       coalesce(st.n_ngrams, 0)::BIGINT AS n_ngrams,
       coalesce(st.n_matched, 0)::BIGINT AS n_matched,
       round(coalesce(st.n_matched / st.n_ngrams::DOUBLE, 0.0), 4) AS contamination,
       coalesce(st.n_matched / st.n_ngrams::DOUBLE, 0.0) >= {threshold} AS flagged
FROM d LEFT JOIN st USING (doc_id)
WHERE d.doc_id % {bench_mod} != 0 ORDER BY doc_id
""".strip()


def unigram_logppl_spark(
    spark: SparkSession, sf_dir: str, vocab_size: int = DEFAULT_VOCAB,
) -> DataFrame:
    """(doc_id, n_tokens, logppl): logppl = -mean ln p(token) under the
    corpus top-V unigram model; p = count/total in-vocab, 1/total OOV.
    Vocab selection ties break by token text so Spark and DuckDB derive
    identical models."""
    docs = load_documents(spark, sf_dir)
    toks = docs.select(
        "doc_id", F.explode(F.expr(spark_tokens_expr())).alias("t")
    )
    freq = toks.groupBy("t").agg(F.count("*").alias("c"))
    total = freq.agg(F.sum("c").alias("total"))
    vocab = (
        freq.orderBy(F.col("c").desc(), F.col("t")).limit(vocab_size)
    )
    scored = (
        toks.join(F.broadcast(vocab), "t", "left")
        .crossJoin(F.broadcast(total))
        .withColumn(
            "logp",
            F.log(F.coalesce(F.col("c"), F.lit(1)) / F.col("total")),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.round(-F.avg("logp"), 4).alias("logppl"),
        )
        .select(F.col("doc_id").cast("bigint"), "n_tokens", "logppl")
        .orderBy("doc_id")
    )


def unigram_logppl_duck(vocab_size: int = DEFAULT_VOCAB) -> str:
    return f"""
WITH tok AS (
  SELECT doc_id, unnest({duck_tokens_expr()}) AS t FROM documents
),
freq AS (SELECT t, count(*) AS c FROM tok GROUP BY 1),
tot AS (SELECT sum(c) AS total FROM freq),
vocab AS (
  SELECT t, c FROM freq ORDER BY c DESC, t LIMIT {vocab_size}
),
scored AS (
  SELECT tok.doc_id, ln(coalesce(v.c, 1) / tot.total::DOUBLE) AS logp
  FROM tok LEFT JOIN vocab v USING (t) CROSS JOIN tot
)
SELECT doc_id::BIGINT AS doc_id, count(*)::BIGINT AS n_tokens,
       round(-avg(logp), 4) AS logppl
FROM scored GROUP BY 1 ORDER BY 1
""".strip()
