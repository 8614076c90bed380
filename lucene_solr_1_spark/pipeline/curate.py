"""End-to-end training-data curation: the composition every large-scale
pipeline runs before tokenization — language filter + quality floor +
near-duplicate removal (keep each cluster's representative) — built from
the oracle-checked operators in textstats/dedup and expressed as ONE
declarative plan.

Scale shape: the three per-doc signal frames (pred_lang, quality,
rep_id) each key on doc_id; Catalyst co-plans the joins on the same key
so the composition is a constant number of doc_id-shuffles regardless
of corpus size, and the near-dup decision arrives pre-reduced as one
row per doc (dedup_cluster_representatives), never as a pair list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sql.relational import load_documents
from . import dedup, textstats


def curated_docs_spark(
    spark: SparkSession,
    sf_dir: str,
    lang: str = "en",
    min_quality: float = 0.5,
    dedup_threshold: float = 0.4,
) -> DataFrame:
    """Documents that survive curation: predicted language == `lang`,
    quality >= `min_quality`, and doc is its near-dup cluster's
    representative (min doc_id keeps exactly one copy per cluster)."""
    lid = textstats.lang_id_spark(spark, sf_dir).select("doc_id", "pred_lang")
    q = textstats.quality_score_spark(spark, sf_dir).select("doc_id", "quality")
    reps = dedup.dedup_cluster_representatives_spark(
        spark, sf_dir, dedup_threshold
    )
    docs = load_documents(spark, sf_dir).select("doc_id")
    return (
        docs.join(lid, "doc_id")
        .join(q, "doc_id")
        .join(reps, "doc_id")
        .where(
            (F.col("pred_lang") == lang)
            & (F.col("quality") >= min_quality)
            & (F.col("doc_id") == F.col("rep_id"))
        )
        .select(F.col("doc_id").cast("bigint"), "quality")
        .orderBy("doc_id")
    )


def quota_split_spark(
    spark, sf_dir, per_source_cap: int = 10, val_mod: int = 20
) -> DataFrame:
    """Data-mixing step of a training pipeline: cap documents PER SOURCE
    (quality-ranked — domain quota sampling, prevents one crawl domain
    from dominating the mix) and assign a DETERMINISTIC train/val split
    by content hash (doc_id-stable, reshuffle-proof: the split survives
    any repartition or re-run because it's a pure function of the row).

    Scale shape: the quota is a per-source window rank (shuffle on
    source; source cardinality is high and the cap bounds per-group
    output) and the split is a hash expression inside codegen."""
    from pyspark.sql import Window

    from .dedup import _spark_h
    from .textstats import quality_score_spark

    q = quality_score_spark(spark, sf_dir).select("doc_id", "quality")
    docs = load_documents(spark, sf_dir).select("doc_id", "source", "text")
    w = Window.partitionBy("source").orderBy(F.desc("quality"), F.asc("doc_id"))
    return (
        docs.join(q, "doc_id")
        .withColumn("rk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rk") <= per_source_cap)
        .withColumn(
            "split",
            F.when(
                F.pmod(F.expr(_spark_h("text", "split")), F.lit(val_mod)) == 0,
                "val",
            ).otherwise("train"),
        )
        .select("doc_id", "source", "quality", "rk", "split")
        .orderBy("doc_id")
    )


def quota_split_duck(per_source_cap: int = 10, val_mod: int = 20) -> str:
    from .dedup import _duck_h
    from .textstats import quality_score_duck

    q = quality_score_duck()
    h = _duck_h("d.text", "split")
    return f"""
WITH qual AS ({q}),
ranked AS (
  SELECT d.doc_id, d.source, qual.quality, ({h}) AS th,
         row_number() OVER (PARTITION BY d.source
                            ORDER BY qual.quality DESC, d.doc_id)::BIGINT AS rk
  FROM documents d JOIN qual ON qual.doc_id = d.doc_id
)
SELECT doc_id::BIGINT AS doc_id, source, quality, rk,
       CASE WHEN th % {val_mod} = 0 THEN 'val' ELSE 'train' END AS split
FROM ranked WHERE rk <= {per_source_cap}
ORDER BY doc_id
""".strip()


def curated_docs_duck(
    lang: str = "en", min_quality: float = 0.5, dedup_threshold: float = 0.4
) -> str:
    lid = textstats.lang_id_duck()
    q = textstats.quality_score_duck()
    reps = dedup.dedup_cluster_representatives_duck(dedup_threshold)
    return f"""
WITH lid AS ({lid}),
qual AS ({q}),
reps AS ({reps})
SELECT d.doc_id::BIGINT AS doc_id, qual.quality
FROM documents d
JOIN lid ON lid.doc_id = d.doc_id
JOIN qual ON qual.doc_id = d.doc_id
JOIN reps ON reps.doc_id = d.doc_id
WHERE lid.pred_lang = '{lang}'
  AND qual.quality >= {min_quality}
  AND d.doc_id = reps.rep_id
ORDER BY 1
""".strip()


def mixture_upsample_spark(
    spark, sf_dir, even_weight: float = 2.5, odd_weight: float = 0.5
) -> DataFrame:
    """Domain-mixture epoch upsampling — the data-mixing step where each
    source gets a TARGET weight (epochs over the corpus: DoReMi/Pile/
    LLaMA-style "wikipedia x2.5, crawl x0.5" mixtures). Per doc with
    weight w: floor(w) guaranteed epochs plus one more with probability
    frac(w), decided by a DETERMINISTIC content-stable hash (reshuffle-
    proof, same property as quota_split's split). Output is the
    PLACEMENT MAP (doc_id, source, epoch) — one row per scheduled
    repetition; token payloads never move, downstream joins by doc_id.

    Scale shape: weight + repetition count are pure codegen expressions;
    the explode multiplies rows by at most ceil(max weight) — no shuffle,
    no skew (hash is uniform)."""
    from .dedup import _spark_h

    docs = load_documents(spark, sf_dir).select("doc_id", "source")
    w = F.when(
        F.substring("source", 4, 10).cast("int") % 2 == 0,
        F.lit(float(even_weight)),
    ).otherwise(F.lit(float(odd_weight)))
    u = (F.pmod(F.expr(_spark_h("cast(doc_id as string)", "mix")), F.lit(1_000_000))
         / 1_000_000.0)
    rep = (F.floor(w) + F.when(u < w - F.floor(w), 1).otherwise(0)).cast("int")
    return (
        docs.withColumn("rep", rep)
        .where(F.col("rep") > 0)
        .withColumn("epoch", F.explode(F.sequence(F.lit(0), F.col("rep") - 1)))
        .select(
            F.col("doc_id").cast("bigint"),
            "source",
            F.col("epoch").cast("bigint"),
        )
        .orderBy("doc_id", "epoch")
    )


def mixture_upsample_duck(even_weight: float = 2.5, odd_weight: float = 0.5) -> str:
    from .dedup import _duck_h

    h = _duck_h("cast(doc_id as varchar)", "mix")
    return f"""
WITH base AS (
  SELECT doc_id, source,
         CASE WHEN CAST(substring(source, 4, 10) AS INT) % 2 = 0
              THEN {even_weight} ELSE {odd_weight} END AS w,
         (({h}) % 1000000) / 1000000.0 AS u
  FROM documents
),
rep AS (
  SELECT doc_id, source,
         CAST(floor(w) + CASE WHEN u < w - floor(w) THEN 1 ELSE 0 END AS INT) AS rep
  FROM base
)
SELECT doc_id::BIGINT AS doc_id, source,
       unnest(generate_series(0, rep - 1))::BIGINT AS epoch
FROM rep WHERE rep > 0
ORDER BY doc_id, epoch
""".strip()
