"""Deduplication operators — each has a DuckDB oracle twin.

Portable hashing: h(s) = first 15 hex chars of md5(s) parsed as int64
(same value in Spark via conv() and DuckDB via '0x' cast), so signatures
agree bit-for-bit across engines. MinHash uses ONE base hash per shingle
plus N_HASHES affine permutations h_i(x) = (a_i*x + b_i) mod p (the
standard universal-hash family) — md5 runs once per shingle, not once per
(shingle, hash), so widening the signature to 128 hashes costs integer
ops, not 128 digest passes.

Scale notes: exact dedup and MinHash banding are groupBy/join on hash
keys — uniform by construction, no skew. The pairwise-Jaccard self-join
drops shingles with document frequency above MAX_SHINGLE_DF before
joining: a boilerplate shingle shared by 10^6 docs ("all rights
reserved") would otherwise create a quadratic join bucket while carrying
no discriminative signal. The banding→verify composition
(minhash_verified_*) is the 100 TB path: exact Jaccard is computed ONLY
on band-candidate pairs, never all pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sql.relational import duck_tokens_expr, load_documents, spark_tokens_expr

# --- sketch parameters (shared by Spark operators and DuckDB twins) ---------
N_HASHES = 128
BAND_SIZE = 8            # 16 bands of 8 — LSH banding (s-curve @ j~0.7)
N_BANDS = N_HASHES // BAND_SIZE
MINHASH_PRIME = (1 << 31) - 1
N_SIMHASH_BITS = 60      # base hash is 60 bits (15 hex chars of md5)
MAX_SHINGLE_DF = 100     # df-cap: hotter shingles are non-discriminative


def _affine(i: int) -> tuple[int, int]:
    """Deterministic (a_i, b_i) for permutation i — plain LCG arithmetic,
    no RNG state, identical in both engines' generated SQL. a odd and
    < 2^30 so a*h + b stays under 2^61 (no BIGINT overflow in DuckDB)."""
    a = ((1103515245 * (i + 1) + 12345) % (1 << 30)) | 1
    b = (69069 * (i + 7) + 362437) % (1 << 30)
    return a, b


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

# df-capped shingles: used by the pairwise-Jaccard join (skew guard).
_DUCK_SHINGLES_CAPPED = f"""
{_DUCK_SHINGLES},
shc AS (
  SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= {MAX_SHINGLE_DF}
),
shf AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN shc USING (shingle))
""".strip()


# --- n-gram Jaccard near-dup --------------------------------------------------

def dedup_jaccard_spark(spark, sf_dir, threshold: float = 0.4) -> DataFrame:
    """Pairwise Jaccard over df-capped shingles. Dropping shingles with
    df > MAX_SHINGLE_DF bounds every join bucket at MAX_SHINGLE_DF² pairs
    — without the cap one boilerplate shingle makes the hottest bucket
    quadratic in corpus size. Jaccard is computed over the capped shingle
    space on BOTH sides of the ratio (a true Jaccard of filtered sets)."""
    sh0 = _shingles_spark(spark, sf_dir)
    rare = (
        sh0.groupBy("shingle")
        .agg(F.count("*").alias("sdf"))
        .where(F.col("sdf") <= MAX_SHINGLE_DF)
        .select("shingle")
    )
    sh = sh0.join(rare, "shingle")
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
WITH {_DUCK_SHINGLES_CAPPED},
sizes AS (SELECT doc_id, count(*)::DOUBLE AS n FROM shf GROUP BY 1),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::DOUBLE AS c
  FROM shf a JOIN shf b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
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
    """Candidate near-dup pairs: docs sharing any LSH band of their
    128-hash MinHash signature (shingle → base hash → 128 affine
    permutations → 16 band keys → bucket-join).

    Physical shape: the whole signature derives from ONE base-hash array
    per row (md5 once per shingle; permutations are integer ops inside
    whole-stage codegen); bands explode to N_BANDS rows/doc; pairs come
    from collect_list per bucket — a single shuffle on the band key,
    never a self-join that would recompute the signature DAG per side."""
    def _min_h(i: int) -> str:
        a, b = _affine(i)
        return (
            f"cast(array_min(transform(hs, h -> ({a}L * h + {b}L) % {MINHASH_PRIME}L)) as string)"
        )

    band_keys = ", ".join(
        "concat_ws(':', "
        + ", ".join(_min_h(i) for i in range(b0, b0 + BAND_SIZE))
        + ")"
        for b0 in range(0, N_HASHES, BAND_SIZE)
    )
    # nested lambda bindings: shingles evaluate once per row, then the
    # base-hash array `hs` evaluates once; all N_HASHES minhashes + band
    # keys derive from `hs` (base hash folded to < 2^30 so the affine
    # multiply cannot overflow BIGINT)
    bands_expr = (
        f"transform(array({_shingle_expr()}), sh -> "
        f"CASE WHEN size(sh) > 0 THEN "
        f"transform(array(transform(sh, x -> {_spark_h('x', 'mh')} % 1073741824L)), "
        f"hs -> array({band_keys}))[0] "
        f"ELSE array() END)[0]"
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


_DUCK_MINHASH_BANDS = None


def _duck_minhash_bands_cte() -> str:
    """sig/bands CTEs shared by the banding and banding→verify twins."""
    base = f"{_duck_h('shingle', 'mh')} % 1073741824"
    mins = ", ".join(
        f"min(({_affine(i)[0]} * h + {_affine(i)[1]}) % {MINHASH_PRIME}) AS m{i}"
        for i in range(N_HASHES)
    )
    band_selects = " UNION ALL ".join(
        "SELECT doc_id, "
        + f"{b0 // BAND_SIZE} AS band, "
        + " || ':' || ".join(f"m{i}::VARCHAR" for i in range(b0, b0 + BAND_SIZE))
        + " AS key FROM sig"
        for b0 in range(0, N_HASHES, BAND_SIZE)
    )
    return f"""
hashed AS (SELECT doc_id, {base} AS h FROM sh),
sig AS (SELECT doc_id, {mins} FROM hashed GROUP BY 1),
bands AS ({band_selects}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
)
""".strip()


def minhash_bands_duck() -> str:
    return f"""
WITH {_DUCK_SHINGLES},
{_duck_minhash_bands_cte()}
SELECT doc_a::BIGINT AS doc_a, doc_b::BIGINT AS doc_b FROM cand ORDER BY 1, 2
""".strip()


# --- MinHash candidates → exact Jaccard verify (the 100 TB composition) ------

def minhash_verified_spark(spark, sf_dir, threshold: float = 0.4) -> DataFrame:
    """Banding candidates verified with exact Jaccard — the at-scale
    dedup shape: the quadratic verify runs ONLY on pairs that share a
    band (≈ near-dups), never on the full cross product or a raw
    shingle self-join."""
    cand = minhash_bands_spark(spark, sf_dir).select("doc_a", "doc_b")
    sh = _shingles_spark(spark, sf_dir)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    sha = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    shb = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        cand.join(sha, "doc_a")
        .join(shb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
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


def minhash_verified_duck(threshold: float = 0.4) -> str:
    return f"""
WITH {_DUCK_SHINGLES},
{_duck_minhash_bands_cte()},
sizes AS (SELECT doc_id, count(*)::DOUBLE AS n FROM sh GROUP BY 1),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*)::DOUBLE AS cnt
  FROM cand c
  JOIN sh a ON a.doc_id = c.doc_a
  JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
  GROUP BY 1, 2
)
SELECT doc_a::BIGINT AS doc_a, doc_b::BIGINT AS doc_b,
       round(cnt / (sa.n + sb.n - cnt), 4) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE cnt / (sa.n + sb.n - cnt) >= {threshold}
ORDER BY 1, 2
""".strip()


# --- SimHash -------------------------------------------------------------------

def simhash_spark(spark, sf_dir) -> DataFrame:
    """60-bit SimHash (full width of the 15-hex-char base hash): per-bit
    vote sums over the doc's distinct terms, vectorized shift/mask aggs
    inside whole-stage codegen. 16 bits was a toy width — at 10^9 docs
    everything collides; 60 bits keeps random collisions ~0."""
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
        term = F.when(F.col(f"s{b}") > 0, F.lit(2**b).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
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


# --- near-dup clustering: connected components → representatives ------------

def dedup_cluster_representatives_spark(
    spark: SparkSession, sf_dir: str, threshold: float = 0.4,
    max_iter: int = 20,
) -> DataFrame:
    """The dedup DECISION step: connected components over the verified
    near-dup pair graph, one representative (min doc_id) per cluster.
    Every document gets a row — singletons are their own representative —
    so downstream curation is a simple `doc_id = rep_id` filter.

    Algorithm: min-label propagation — each round every node takes the
    min label among itself and its neighbors; converges in O(component
    diameter) rounds (near-dup clusters are tiny, so 2-3 rounds in
    practice, `max_iter` a safety bound). This is the standard iterative
    CC for data-parallel engines (Hash-to-Min family): each round is ONE
    shuffle on doc key, state is one row per doc, and lineage is cut
    with localCheckpoint so the plan stays constant-size per round.
    Reference parity: index-time dedup / DuplicateFilter keep-one-copy
    semantics, generalized to near-duplicates."""
    edges = minhash_verified_spark(spark, sf_dir, threshold).select("doc_a", "doc_b")
    und = edges.union(
        edges.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    )
    labels = load_documents(spark, sf_dir).select(
        F.col("doc_id"), F.col("doc_id").alias("lbl")
    ).localCheckpoint(eager=True)
    und = und.localCheckpoint(eager=True)  # compute the pair graph once
    for _ in range(max_iter):
        msgs = und.join(
            labels.withColumnRenamed("doc_id", "doc_a"), "doc_a"
        ).select(F.col("doc_b").alias("doc_id"), "lbl")
        new = (
            labels.unionByName(msgs)
            .groupBy("doc_id")
            .agg(F.min("lbl").alias("lbl"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new.alias("n")
            .join(labels.alias("o"), "doc_id")
            .where(F.col("n.lbl") != F.col("o.lbl"))
            .count()
        )
        labels = new
        if changed == 0:
            break
    return labels.select(
        F.col("doc_id").cast("bigint"), F.col("lbl").cast("bigint").alias("rep_id")
    ).orderBy("doc_id")


def dedup_cluster_representatives_duck(threshold: float = 0.4) -> str:
    """Recursive-CTE twin: min over every node reachable in the
    undirected near-dup graph == the component minimum."""
    inner = minhash_verified_duck(threshold)
    return f"""
WITH RECURSIVE pairs AS (
  SELECT doc_a, doc_b FROM ({inner})
),
und AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION ALL
  SELECT doc_b, doc_a FROM pairs
),
reach(doc, anc) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT r.doc, u.b FROM reach r JOIN und u ON u.a = r.anc
)
SELECT doc::BIGINT AS doc_id, min(anc)::BIGINT AS rep_id
FROM reach GROUP BY 1 ORDER BY 1
""".strip()


# --- SimHash near-dup pairs: banded hamming search ---------------------------

N_SIMHASH_BANDS = 4
SIMHASH_BAND_BITS = 15  # 4 x 15 = the full 60-bit signature


def simhash_neardup_spark(
    spark: SparkSession, sf_dir: str, max_hamming: int = 3
) -> DataFrame:
    """SimHash near-duplicate PAIRS at scale (the classic web-dedup
    composition): band the 60-bit signature into 4 x 15-bit pieces —
    by pigeonhole, any pair within hamming distance 3 agrees on at least
    one band — join on band equality (one shuffle on band keys, never
    all-pairs), then verify bit_count(xor) <= max_hamming exactly.
    Recall is EXACT for max_hamming <= N_SIMHASH_BANDS - 1.

    Scale note: bucket population ~ n_docs / 2^band_bits, so 15-bit
    bands are calibrated for ~10^7-10^8 docs; at 10^9+ widen the
    fingerprint (e.g. 128-bit base hash -> 4 x 32-bit bands) so band
    keys stay selective — the pigeonhole guarantee needs bands =
    max_hamming + 1 regardless of key width."""
    sh = simhash_spark(spark, sf_dir)
    mask = (1 << SIMHASH_BAND_BITS) - 1
    band_exprs = [
        (
            F.shiftright(F.col("simhash"), b * SIMHASH_BAND_BITS).bitwiseAND(mask)
            + F.lit(b << SIMHASH_BAND_BITS)
        ).cast("bigint")
        for b in range(N_SIMHASH_BANDS)
    ]
    banded = sh.select(
        "doc_id", "simhash", F.explode(F.array(*band_exprs)).alias("bk")
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, (F.col("a.bk") == F.col("b.bk"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).cast("bigint").alias("hamming"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
        .where(F.col("hamming") <= max_hamming)
        .orderBy("doc_a", "doc_b")
    )


def simhash_neardup_duck(max_hamming: int = 3) -> str:
    inner = simhash_duck()
    mask = (1 << SIMHASH_BAND_BITS) - 1
    bands = ", ".join(
        f"((simhash >> {b * SIMHASH_BAND_BITS}) & {mask}) + {b << SIMHASH_BAND_BITS}"
        for b in range(N_SIMHASH_BANDS)
    )
    return f"""
WITH sh AS ({inner}),
banded AS (
  SELECT doc_id, simhash, unnest([{bands}]) AS bk FROM sh
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
  FROM banded a JOIN banded b ON a.bk = b.bk AND a.doc_id < b.doc_id
)
SELECT doc_a::BIGINT AS doc_a, doc_b::BIGINT AS doc_b, hamming
FROM cand WHERE hamming <= {max_hamming}
ORDER BY 1, 2
""".strip()


# --- C4-style chunk-level exact dedup ----------------------------------------

CHUNK_W = 8  # tokens per dedup unit (C4 used three-sentence spans)


def dedup_chunks_spark(spark, sf_dir, w: int = CHUNK_W) -> DataFrame:
    """C4-style span-level exact dedup (Raffel et al. 2020 §2.2 "we
    discard all but one of any three-sentence span occurring more than
    once"): the token stream is cut into fixed w-token chunks, every
    chunk occurrence after the GLOBAL first (order: doc_id asc, chunk
    position asc) is dropped — including repeats inside one document —
    and each doc reports its surviving text fingerprint.

    Scale shape: chunking happens with array functions inside the scan
    stage (the lambda-binding trick from _shingle_expr — no explode
    before the chunk level, no per-token rows); the only shuffle is the
    first-occurrence window keyed by chunk hash (uniform md5 keys, the
    same distribution exact dedup shuffles on), then one groupBy(doc_id)
    to reassemble. Output: (doc_id, n_chunks, n_kept, clean_hash) where
    clean_hash = md5 of the kept chunks joined in position order."""
    chunk_expr = (
        f"transform(array({spark_tokens_expr()}), t -> "
        f"CASE WHEN size(t) > 0 THEN transform(sequence(0, (size(t)-1) div {w}), "
        f"i -> concat_ws(' ', slice(t, i*{w} + 1, {w}))) "
        "ELSE array() END)[0]"
    )
    from pyspark.sql import Window

    chunks = (
        load_documents(spark, sf_dir)
        .select("doc_id", F.posexplode(F.expr(chunk_expr)).alias("pos", "chunk"))
        .withColumn("h", F.md5("chunk"))
    )
    wnd = Window.partitionBy("h").orderBy(F.asc("doc_id"), F.asc("pos"))
    flagged = chunks.withColumn("keep", F.row_number().over(wnd) == 1)
    # collect_list drops nulls, so only kept (pos, chunk) structs survive;
    # array_sort orders by pos (first struct field) — position order back
    return flagged.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_chunks"),
        F.sum(F.col("keep").cast("long")).cast("bigint").alias("n_kept"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(F.col("keep"), F.struct("pos", "chunk"))
                        )
                    ),
                    lambda x: x["chunk"],
                ),
                " ",
            )
        ).alias("clean_hash"),
    )


def dedup_chunks_duck(w: int = CHUNK_W) -> str:
    te = duck_tokens_expr()
    return f"""
WITH pos AS (
  SELECT doc_id, unnest({te}) AS t, generate_subscripts({te}, 1) AS p
  FROM documents
),
ch AS (
  SELECT doc_id, (p - 1) // {w} AS pos,
         string_agg(t, ' ' ORDER BY p) AS chunk
  FROM pos GROUP BY doc_id, (p - 1) // {w}
),
fl AS (
  SELECT doc_id, pos, chunk,
         row_number() OVER (PARTITION BY md5(chunk)
                            ORDER BY doc_id, pos) = 1 AS keep
  FROM ch
)
SELECT doc_id, count(*)::BIGINT AS n_chunks,
       sum(CASE WHEN keep THEN 1 ELSE 0 END)::BIGINT AS n_kept,
       md5(coalesce(
         string_agg(chunk, ' ' ORDER BY pos) FILTER (WHERE keep), ''
       )) AS clean_hash
FROM fl GROUP BY doc_id
""".strip()
