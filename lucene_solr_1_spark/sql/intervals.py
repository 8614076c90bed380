"""Interval queries — the reference sandbox intervals module
(sandbox/src/java/org/apache/lucene/search/intervals/) re-expressed
declaratively for the two-source shapes whose minimal-interval algebra
reduces to window functions.

Semantics implemented (IntervalFunction.java, IntervalScorer.java):

* minimal intervals — an interval is emitted only if no other interval
  of the same source nests inside it (Vigna's minimal-interval
  semantics; the iterators in IntervalFunction.java produce exactly
  these lazily). For TWO term sources this set has a closed form over
  the merged, position-sorted occurrence stream:
    - unordered(a, b): every ADJACENT pair of different-label
      occurrences — (prev, cur) with label(prev) != label(cur);
    - ordered(a, b): every b-occurrence paired with the LAST a before
      it, kept only when no other b lies between them
      (prev_b < prev_a), i.e. b is the first b after that a.
* freq — IntervalScorer.java:62-70: freq = Σ 1 / max(length − minExtent
  + 1, 1) over minimal intervals, length = end − start + 1, and
  minExtent = 2 for a two-term source, so each interval contributes
  1 / max(end − start, 1).
* score — IntervalScoreFunction.SaturationFunction:
  weight · (1 − pivot / (pivot + freq)); computed in double on this
  relational path (round(4) absorbs engine ULP differences exactly like
  every other relational oracle pair).
* maxgaps filter (FilteredIntervalsSource / Intervals.maxgaps):
  gaps = length − minExtent; intervals with gaps > max_gaps are dropped
  BEFORE freq accumulation.

Scale shape: one tokenize+posexplode scan filtered to the two query
terms (the per-term predicate prunes inside the scan stage), windows
partitioned BY DOCUMENT (never a global window), one groupBy(doc_id)
aggregate, bounded TakeOrderedAndProject for the top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .relational import duck_tokens_expr, load_documents, spark_tokens_expr

DEFAULT_PIVOT = 1.0


def _pair_tokens(spark, sf_dir, t1: str, t2: str) -> DataFrame:
    docs = load_documents(spark, sf_dir).withColumn("toks", F.expr(spark_tokens_expr()))
    return docs.select(
        "doc_id", F.posexplode("toks").alias("pos", "term")
    ).where(F.col("term").isin([t1, t2]))


def _score_agg(intervals: DataFrame, weight: float, pivot: float,
               max_gaps: int | None, k: int) -> DataFrame:
    """(doc_id, start, end) minimal intervals → per-doc freq + saturation
    score, top-k. Shared by the ordered and unordered operators."""
    if max_gaps is not None:
        # gaps = length - minExtent = (end - start + 1) - 2
        intervals = intervals.where(
            (F.col("end") - F.col("start") - 1) <= max_gaps
        )
    agg = intervals.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_intervals"),
        F.sum(
            1.0 / F.greatest(F.col("end") - F.col("start"), F.lit(1))
        ).alias("freq"),
    )
    return (
        agg.withColumn(
            "score",
            F.round(weight * (1.0 - pivot / (pivot + F.col("freq"))), 4),
        )
        .orderBy(F.round(F.col("freq"), 6).desc(), F.col("doc_id"))
        .limit(k)
        .select("doc_id", "n_intervals", F.round("freq", 4).alias("freq"), "score")
    )


def interval_unordered_spark(
    spark, sf_dir, t1: str, t2: str, k: int = 10,
    max_gaps: int | None = None, weight: float = 1.0,
    pivot: float = DEFAULT_PIVOT,
) -> DataFrame:
    """Intervals.unordered(t1, t2) as an IntervalQuery: minimal
    unordered intervals are the adjacent different-label pairs of the
    merged occurrence stream."""
    from pyspark.sql import Window

    tok = _pair_tokens(spark, sf_dir, t1, t2)
    w = Window.partitionBy("doc_id").orderBy("pos")
    pairs = (
        tok.withColumn("prev_pos", F.lag("pos").over(w))
        .withColumn("prev_term", F.lag("term").over(w))
        .where(
            F.col("prev_term").isNotNull() & (F.col("prev_term") != F.col("term"))
        )
        .select("doc_id", F.col("prev_pos").alias("start"), F.col("pos").alias("end"))
    )
    return _score_agg(pairs, weight, pivot, max_gaps, k)


def interval_ordered_spark(
    spark, sf_dir, t1: str, t2: str, k: int = 10,
    max_gaps: int | None = None, weight: float = 1.0,
    pivot: float = DEFAULT_PIVOT,
) -> DataFrame:
    """Intervals.ordered(t1, t2): each t2 occurrence pairs with the last
    t1 before it; kept only when no other t2 lies between (the
    OrderedIntervalIterator's minimal set)."""
    from pyspark.sql import Window

    tok = _pair_tokens(spark, sf_dir, t1, t2)
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pairs = (
        tok.withColumn(
            "prev_a", F.max(F.when(F.col("term") == t1, F.col("pos"))).over(w)
        )
        .withColumn(
            "prev_b", F.max(F.when(F.col("term") == t2, F.col("pos"))).over(w)
        )
        .where(
            (F.col("term") == t2)
            & F.col("prev_a").isNotNull()
            & (F.col("prev_b").isNull() | (F.col("prev_b") < F.col("prev_a")))
        )
        .select("doc_id", F.col("prev_a").alias("start"), F.col("pos").alias("end"))
    )
    return _score_agg(pairs, weight, pivot, max_gaps, k)


def _duck_pair_cte(t1: str, t2: str) -> str:
    te = duck_tokens_expr()
    return f"""
tok0 AS (
  SELECT doc_id, unnest({te}) AS term, generate_subscripts({te}, 1) - 1 AS pos
  FROM documents
),
tok AS (SELECT * FROM tok0 WHERE term IN ('{t1}', '{t2}'))
""".strip()


def _duck_score_select(
    weight: float, pivot: float, max_gaps: int | None, k: int
) -> str:
    gap_pred = (
        f"WHERE (\"end\" - start - 1) <= {max_gaps}" if max_gaps is not None else ""
    )
    return f"""
flt AS (SELECT * FROM pairs {gap_pred}),
agg AS (
  SELECT doc_id, count(*)::BIGINT AS n_intervals,
         sum(1.0 / greatest("end" - start, 1)) AS freq
  FROM flt GROUP BY doc_id
)
SELECT doc_id, n_intervals, round(freq, 4) AS freq,
       round({weight} * (1.0 - {pivot} / ({pivot} + freq)), 4) AS score
FROM agg
ORDER BY round(freq, 6) DESC, doc_id LIMIT {k}
""".strip()


def interval_unordered_duck(
    t1: str, t2: str, k: int = 10, max_gaps: int | None = None,
    weight: float = 1.0, pivot: float = DEFAULT_PIVOT,
) -> str:
    return f"""
WITH {_duck_pair_cte(t1, t2)},
pairs AS (
  SELECT doc_id,
         lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS start,
         pos AS "end"
  FROM (
    SELECT doc_id, pos, term,
           lag(term) OVER (PARTITION BY doc_id ORDER BY pos) AS prev_term
    FROM tok
  )
  QUALIFY prev_term IS NOT NULL AND prev_term <> term
),
{_duck_score_select(weight, pivot, max_gaps, k)}
""".strip()


def interval_ordered_duck(
    t1: str, t2: str, k: int = 10, max_gaps: int | None = None,
    weight: float = 1.0, pivot: float = DEFAULT_PIVOT,
) -> str:
    return f"""
WITH {_duck_pair_cte(t1, t2)},
lab AS (
  SELECT doc_id, pos, term,
         max(CASE WHEN term = '{t1}' THEN pos END)
           OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_a,
         max(CASE WHEN term = '{t2}' THEN pos END)
           OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_b
  FROM tok
),
pairs AS (
  SELECT doc_id, prev_a AS start, pos AS "end"
  FROM lab
  WHERE term = '{t2}' AND prev_a IS NOT NULL
    AND (prev_b IS NULL OR prev_b < prev_a)
),
{_duck_score_select(weight, pivot, max_gaps, k)}
""".strip()
