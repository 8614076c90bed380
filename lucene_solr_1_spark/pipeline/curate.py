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
