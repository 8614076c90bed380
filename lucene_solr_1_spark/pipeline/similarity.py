"""Similarity search over an embedding column (array<float>).

- brute-force cosine top-k: pure built-in functions (zip_with/aggregate in
  double precision) — the exact baseline, oracle-checked against DuckDB.
- IVF (inverted-file) ANN: deterministic hash-sharded coarse centroids,
  probe nearest cells only — the 100 TB scale path (cells are Spark
  partitions; only ~n_probe/n_cells of the data is scanned per query).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F


def load_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


_DOT = (
    "aggregate(zip_with(cast(a.embedding as array<double>), "
    "cast(b.embedding as array<double>), (x, y) -> x * y), 0D, (acc, v) -> acc + v)"
)
_NORM = "sqrt(aggregate(transform(cast({c}.embedding as array<double>), x -> x * x), 0D, (acc, v) -> acc + v))"


def cosine_topk_spark(
    spark: SparkSession, sf_dir: str, query_vec_id: int = 0, k: int = 20
) -> DataFrame:
    e = load_embeddings(spark, sf_dir)
    q = e.where(F.col("vec_id") == query_vec_id).alias("a")
    c = e.where(F.col("vec_id") != query_vec_id).alias("b")
    out = (
        c.join(F.broadcast(q))
        .withColumn(
            "cos",
            F.expr(_DOT)
            / (F.expr(_NORM.format(c="a")) * F.expr(_NORM.format(c="b"))),
        )
        .orderBy(F.round(F.col("cos"), 6).desc(), F.col("b.vec_id"))
        .limit(k)
        .select(
            F.col("b.vec_id").cast("bigint").alias("vec_id"),
            F.round("cos", 4).alias("cos"),
        )
    )
    return out


def cosine_topk_duck(query_vec_id: int = 0, k: int = 20) -> str:
    return f"""
WITH q AS (
  SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = {query_vec_id}
),
sc AS (
  SELECT e.vec_id,
         list_dot_product(e.embedding::DOUBLE[], q.qv)
           / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
              * sqrt(list_dot_product(q.qv, q.qv))) AS cos
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id <> {query_vec_id}
)
SELECT vec_id::BIGINT AS vec_id, round(cos, 4) AS cos FROM sc
ORDER BY round(cos, 6) DESC, vec_id LIMIT {k}
""".strip()


# --- IVF ANN (scale path; verified against brute force in pytest) -----------

def _centroids(vecs: np.ndarray, n_cells: int, iters: int = 5) -> np.ndarray:
    """Deterministic Lloyd k-means: init = evenly-strided rows."""
    idx = np.linspace(0, len(vecs) - 1, n_cells).astype(int)
    cents = vecs[idx].copy()
    for _ in range(iters):
        d = vecs @ cents.T
        na = np.linalg.norm(vecs, axis=1, keepdims=True)
        nb = np.linalg.norm(cents, axis=1, keepdims=True).T
        assign = np.argmax(d / (na * nb + 1e-12), axis=1)
        for c in range(n_cells):
            m = assign == c
            if m.any():
                cents[c] = vecs[m].mean(axis=0)
    return cents


def ivf_topk_spark(
    spark: SparkSession,
    sf_dir: str,
    query_vec_id: int = 0,
    k: int = 20,
    n_cells: int = 8,
    n_probe: int = 3,
) -> DataFrame:
    """ANN: assign vectors to coarse cells, scan only the n_probe cells
    nearest the query. Centroids are trained on a bounded sample collected
    to the driver (at 100 TB: sample fraction, not full collect); the cell
    scan is a Catalyst filter + the same vectorized cosine."""
    e = load_embeddings(spark, sf_dir)
    sample = np.array(
        e.select("embedding").limit(4096).toPandas()["embedding"].tolist(),
        dtype=np.float64,
    )
    cents = _centroids(sample, n_cells)
    bc = spark.sparkContext.broadcast(cents)

    @F.pandas_udf("int")
    def cell_of(emb: pd.Series) -> pd.Series:
        m = np.array(emb.tolist(), dtype=np.float64)
        c = bc.value
        sims = (m @ c.T) / (
            np.linalg.norm(m, axis=1, keepdims=True)
            * np.linalg.norm(c, axis=1, keepdims=True).T
            + 1e-12
        )
        return pd.Series(np.argmax(sims, axis=1).astype(np.int32))

    assigned = e.withColumn("cell", cell_of("embedding"))
    qrow = e.where(F.col("vec_id") == query_vec_id).toPandas()
    qv = np.array(qrow["embedding"].iloc[0], dtype=np.float64)
    qsims = (cents @ qv) / (
        np.linalg.norm(cents, axis=1) * np.linalg.norm(qv) + 1e-12
    )
    probe = np.argsort(-qsims)[:n_probe].tolist()
    cand = assigned.where(F.col("cell").isin(probe)).alias("b")
    q = e.where(F.col("vec_id") == query_vec_id).alias("a")
    return (
        cand.join(F.broadcast(q))
        .where(F.col("b.vec_id") != query_vec_id)
        .withColumn(
            "cos",
            F.expr(_DOT)
            / (F.expr(_NORM.format(c="a")) * F.expr(_NORM.format(c="b"))),
        )
        .orderBy(F.round(F.col("cos"), 6).desc(), F.col("b.vec_id"))
        .limit(k)
        .select(
            F.col("b.vec_id").cast("bigint").alias("vec_id"),
            F.round("cos", 4).alias("cos"),
        )
    )
