"""Deduplication operators — each has a DuckDB oracle twin.

Portable hashing: h(s) = first 15 hex chars of md5(s) parsed as int64
(same value in Spark via conv() and DuckDB via '0x' cast), so signatures
agree bit-for-bit across engines.

Scale notes: exact dedup and MinHash banding are groupBy/join on hash
keys — uniform by construction, no skew. The pairwise-Jaccard join is
candidate-limited via the shingle join (never a cross join); at 100 TB the
MinHash-band candidates feed the Jaccard verifier rather than all pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sql.relational import duck_tokens_expr, load_documents, spark_tokens_expr

N_HASHES = 8
BAND_SIZE = 2  # 4 bands of 2 — LSH banding


def _spark_h(col_expr: str, seed: str) -> str:
    return f"CAST(conv(substr(md5(concat('{seed}', '|', {col_expr})), 1, 15), 16, 10) AS BIGINT)"


def _duck_h(col_expr: str, seed: str) -> str:
    return f"CAST(('0x' || substr(md5('{seed}' || '|' || {col_expr}), 1, 15)) AS BIGINT)"


# --- exact dedup ------------------------------------------------------------

def dedup_exact_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_documents(spark, sf_dir)
    return (
        docs.groupBy(F.md5("text").alias("text_hash"))
        .agg(
            F.count("*").cast("bigint").alias("n_copies"),
            F.min("doc_id").cast("bigint").alias("keep_doc_id"),
        )
        .orderBy("text_hash")
    )


def dedup_exact_duck() -> str:
    return (
        "SELECT md5(text) AS text_hash, count(*)::BIGINT AS n_copies, "
        "min(doc_id)::BIGINT AS keep_doc_id FROM documents GROUP BY 1 ORDER BY 1"
    )


# --- 3-gram shingles (shared by Jaccard + MinHash) ---------------------------

def _shingle_expr() -> str:
    """3-gram shingles as one array expression. The token array is bound
    to a lambda variable via a wrapping single-element transform — without
    this, Catalyst's project collapse inlines the regexp_extract_all into
    EVERY t[i] access inside the inner lambda, turning shingling into
    O(tokens²) regex evaluations (measured 18 s → 3.8 s at sf0.1)."""
    return (
        f"transform(array({spark_tokens_expr()}), t -> "
        "CASE WHEN size(t) >= 3 THEN transform(sequence(0, size(t) - 3), "
        "i -> concat_ws(' ', t[i], t[i+1], t[i+2])) ELSE array() END)[0]"
    )


def _shingled_docs(spark, sf_dir) -> DataFrame:
    """(doc_id, shingles: array<string>) — built entirely with array
    functions in one narrow projection: no explode, no window sort, no
    shuffle. The old lead()-window formulation sorted every token row;
    this is the same result at zero shuffle cost."""
    return load_documents(spark, sf_dir).select(
        "doc_id", F.expr(_shingle_expr()).alias("shingles")
    )


def _shingles_spark(spark, sf_dir) -> DataFrame:
    return (
        _shingled_docs(spark, sf_dir)
        .select("doc_id", F.explode("shingles").alias("shingle"))
        .distinct()
    )


_DUCK_SHINGLES = f"""
pos AS (
  SELECT doc_id, unnest({duck_tokens_expr()}) AS t,
         generate_subscripts({duck_tokens_expr()}, 1) AS pos
  FROM documents
),
sh AS (
  SELECT DISTINCT doc_id,
         t || ' ' || lead(t, 1) OVER w || ' ' || lead(t, 2) OVER w AS shingle
  FROM pos WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
  QUALIFY lead(t, 2) OVER w IS NOT NULL
)
""".strip()


# --- n-gram Jaccard near-dup --------------------------------------------------

def dedup_jaccard_spark(spark, sf_dir, threshold: float = 0.4) -> DataFrame:
    sh = _shingles_spark(spark, sf_dir)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").cast("double").alias("c"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb"), "doc_b")
        .withColumn("jaccard", F.col("c") / (F.col("na") + F.col("nb") - F.col("c")))
        .where(F.col("jaccard") >= threshold)
        .select(
            F.col("doc_a").cast("bigint"),
            F.col("doc_b").cast("bigint"),
            F.round("jaccard", 4).alias("jaccard"),
        )
        .orderBy("doc_a", "doc_b")
    )
    return out


def dedup_jaccard_duck(threshold: float = 0.4) -> str:
    return f"""
WITH {_DUCK_SHINGLES},
sizes AS (SELECT doc_id, count(*)::DOUBLE AS n FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::DOUBLE AS c
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a::BIGINT AS doc_a, doc_b::BIGINT AS doc_b,
       round(c / (sa.n + sb.n - c), 4) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE c / (sa.n + sb.n - c) >= {threshold}
ORDER BY 1, 2
""".strip()


# --- MinHash + LSH banding ----------------------------------------------------

def minhash_bands_spark(spark, sf_dir) -> DataFrame:
    """Candidate near-dup pairs: docs sharing any LSH band of their MinHash
    signature (shingle → minhash → band → bucket-join).

    Physical shape: the whole signature is computed in ONE narrow
    projection (array_min over transform — per-row, no explode/shuffle);
    bands explode to 4 rows/doc; pairs come from collect_list per bucket —
    a single shuffle on the band key, never a self-join that would
    recompute the signature DAG per side. Bucket sizes are bounded by the
    banding construction, so the in-bucket pair expansion cannot blow up."""
    def _min_h(s: int) -> str:
        return f"cast(array_min(transform(sh, x -> {_spark_h('x', f's{s}')})) as string)"

    band_keys = ", ".join(
        "concat_ws(':', "
        + ", ".join(_min_h(s) for s in range(b0, b0 + BAND_SIZE))
        + ")"
        for b0 in range(0, N_HASHES, BAND_SIZE)
    )
    # one lambda binding: shingles (and so the tokenizer regexp) evaluate
    # once per row; all N_HASHES minhashes + band keys derive from `sh`
    bands_expr = (
        f"transform(array({_shingle_expr()}), sh -> "
        f"CASE WHEN size(sh) > 0 THEN array({band_keys}) ELSE array() END)[0]"
    )
    bands = load_documents(spark, sf_dir).select(
        "doc_id", F.posexplode(F.expr(bands_expr)).alias("band", "key")
    )
    buckets = (
        bands.groupBy("band", "key")
        .agg(F.collect_list("doc_id").alias("ids"))
        .where(F.size("ids") >= 2)
    )
    return (
        buckets.select(F.explode("ids").alias("doc_a"), "ids")
        .select("doc_a", F.explode("ids").alias("doc_b"))
        .where(F.col("doc_a") < F.col("doc_b"))
        .select(F.col("doc_a").cast("bigint"), F.col("doc_b").cast("bigint"))
        .distinct()
        .orderBy("doc_a", "doc_b")
    )


def minhash_bands_duck() -> str:
    mins = ", ".join(
        f"min({_duck_h('shingle', f's{s}')}) AS m{s}" for s in range(N_HASHES)
    )
    band_selects = " UNION ALL ".join(
        f"SELECT doc_id, {b0 // BAND_SIZE} AS band, "
        f"m{b0}::VARCHAR || ':' || m{b0 + 1}::VARCHAR AS key FROM sig"
        for b0 in range(0, N_HASHES, BAND_SIZE)
    )
    return f"""
WITH {_DUCK_SHINGLES},
sig AS (SELECT doc_id, {mins} FROM sh GROUP BY 1),
bands AS ({band_selects})
SELECT DISTINCT a.doc_id::BIGINT AS doc_a, b.doc_id::BIGINT AS doc_b
FROM bands a JOIN bands b
  ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
ORDER BY 1, 2
""".strip()


# --- SimHash -------------------------------------------------------------------

N_SIMHASH_BITS = 16


def simhash_spark(spark, sf_dir) -> DataFrame:
    docs = load_documents(spark, sf_dir).withColumn("toks", F.expr(spark_tokens_expr()))
    toks = docs.select("doc_id", F.explode("toks").alias("term")).distinct()
    toks = toks.withColumn("h", F.expr(_spark_h("term", "sim")))
    bit_sum = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(1) == 1, 1).otherwise(-1)
        ).alias(f"s{b}")
        for b in range(N_SIMHASH_BITS)
    ]
    agg = toks.groupBy("doc_id").agg(*bit_sum)
    expr = None
    for b in range(N_SIMHASH_BITS):
        term = F.when(F.col(f"s{b}") > 0, 2**b).otherwise(0)
        expr = term if expr is None else expr + term
    return agg.select(
        F.col("doc_id").cast("bigint"), expr.cast("bigint").alias("simhash")
    ).orderBy("doc_id")


def simhash_duck() -> str:
    h = _duck_h("term", "sim")
    sums = ", ".join(
        f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS s{b}"
        for b in range(N_SIMHASH_BITS)
    )
    sel = " + ".join(
        f"(CASE WHEN s{b} > 0 THEN {2**b} ELSE 0 END)" for b in range(N_SIMHASH_BITS)
    )
    return f"""
WITH tok AS (
  SELECT DISTINCT doc_id, unnest({duck_tokens_expr()}) AS term FROM documents
),
hashed AS (SELECT doc_id, {h} AS h FROM tok),
agg AS (SELECT doc_id, {sums} FROM hashed GROUP BY 1)
SELECT doc_id::BIGINT AS doc_id, ({sel})::BIGINT AS simhash FROM agg ORDER BY 1
""".strip()
