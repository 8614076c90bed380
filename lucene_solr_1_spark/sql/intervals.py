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
               max_gaps: int | None, k: int,
               min_extent: int = 2) -> DataFrame:
    """(doc_id, start, end) minimal intervals → per-doc freq + saturation
    score, top-k. Shared by all the interval operators; min_extent is
    the root source's IntervalsSource.minExtent (2 for the two-term
    conjunction shapes, 1 for single-term-output filters)."""
    if max_gaps is not None:
        # gaps = length - minExtent
        intervals = intervals.where(
            (F.col("end") - F.col("start") + 1 - min_extent) <= max_gaps
        )
    agg = intervals.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_intervals"),
        F.sum(
            1.0 / F.greatest(
                F.col("end") - F.col("start") + F.lit(2 - min_extent),
                F.lit(1),
            )
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


def interval_ordered_or_spark(
    spark, sf_dir, t1: str, alts: tuple, k: int = 10,
    max_gaps: int | None = None, weight: float = 1.0,
    pivot: float = DEFAULT_PIVOT,
) -> DataFrame:
    """Intervals.ordered(t1, Intervals.or(*alts))
    (DisjunctionIntervalsSource under OrderedIntervalIterator): the
    or-source's minimal intervals are every occurrence of any
    alternative, so the ordered-pair closed form holds with label B =
    the alternative set — each B occurrence pairs with the last t1
    before it, kept when it is the FIRST B after that t1. minExtent =
    1 + min(1, ...) = 2, same as the plain pair."""
    from pyspark.sql import Window

    terms = [t1, *alts]
    docs = load_documents(spark, sf_dir).withColumn(
        "toks", F.expr(spark_tokens_expr())
    )
    tok = docs.select(
        "doc_id", F.posexplode("toks").alias("pos", "term")
    ).where(F.col("term").isin(terms))
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_b = F.col("term").isin(list(alts))
    pairs = (
        tok.withColumn(
            "prev_a", F.max(F.when(F.col("term") == t1, F.col("pos"))).over(w)
        )
        .withColumn("prev_b", F.max(F.when(is_b, F.col("pos"))).over(w))
        .where(
            is_b
            & F.col("prev_a").isNotNull()
            & (F.col("prev_b").isNull() | (F.col("prev_b") < F.col("prev_a")))
        )
        .select("doc_id", F.col("prev_a").alias("start"), F.col("pos").alias("end"))
    )
    return _score_agg(pairs, weight, pivot, max_gaps, k)


def _unordered_pairs(tok: DataFrame, t1: str, t2: str) -> DataFrame:
    """Minimal unordered(t1, t2) intervals: adjacent different-label
    pairs of the merged per-doc occurrence stream."""
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("pos")
    sub = tok.where(F.col("term").isin([t1, t2]))
    return (
        sub.withColumn("prev_pos", F.lag("pos").over(w))
        .withColumn("prev_term", F.lag("term").over(w))
        .where(
            F.col("prev_term").isNotNull() & (F.col("prev_term") != F.col("term"))
        )
        .select("doc_id", F.col("prev_pos").alias("start"), F.col("pos").alias("end"))
    )


def interval_containing_spark(
    spark, sf_dir, t1: str, t2: str, small: str, k: int = 10,
    negate: bool = False, max_gaps: int | None = None,
    weight: float = 1.0, pivot: float = DEFAULT_PIVOT,
) -> DataFrame:
    """Intervals.containing(unordered(t1, t2), small) — or notContaining
    with negate=True (FilteringConjunctionIntervalsSource /
    DifferenceIntervalsSource): keep the big minimal intervals that do
    (don't) have a `small` occurrence nested inside. Realized without a
    range join: union the intervals (anchored at start) with the small
    occurrences into one per-doc stream; `next_small` = the first small
    position at-or-after each interval's start (a suffix-min window,
    interval rows ordered before same-position small rows so a small AT
    the start stays in frame); contained iff next_small <= end.
    minExtent = minExtent(big) = 2 either way."""
    from pyspark.sql import Window

    docs = load_documents(spark, sf_dir).withColumn(
        "toks", F.expr(spark_tokens_expr())
    )
    tok = docs.select(
        "doc_id", F.posexplode("toks").alias("pos", "term")
    ).where(F.col("term").isin([t1, t2, small]))
    pairs = _unordered_pairs(tok, t1, t2)
    sm = tok.where(F.col("term") == small).select(
        "doc_id", F.col("pos"), F.lit(1).alias("is_small"),
        F.lit(None).cast("int").alias("end"),
    )
    ev = pairs.select(
        "doc_id", F.col("start").alias("pos"), F.lit(0).alias("is_small"),
        "end",
    ).unionByName(sm)
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos", "is_small")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    withnext = ev.withColumn(
        "next_small",
        F.min(F.when(F.col("is_small") == 1, F.col("pos"))).over(w),
    ).where(F.col("is_small") == 0)
    if negate:
        kept = withnext.where(
            F.col("next_small").isNull() | (F.col("next_small") > F.col("end"))
        )
    else:
        kept = withnext.where(F.col("next_small") <= F.col("end"))
    ivs = kept.select("doc_id", F.col("pos").alias("start"), "end")
    return _score_agg(ivs, weight, pivot, max_gaps, k)


def interval_atleast_spark(
    spark, sf_dir, terms: tuple, k: int = 10,
    max_gaps: int | None = None, weight: float = 1.0,
    pivot: float = DEFAULT_PIVOT,
) -> DataFrame:
    """Intervals.atLeast(2, *terms) over three term sources
    (MinimumShouldMatchIntervalsSource): the minimal spans covering >= 2
    of the sources are the minimalized union of the three pairwise
    unordered minimal sets. Minimalization over the union: smallest end
    per (doc, start), then keep intervals whose end is strictly below
    every later-start end (one suffix-min window)."""
    from pyspark.sql import Window

    a, b, c = terms
    docs = load_documents(spark, sf_dir).withColumn(
        "toks", F.expr(spark_tokens_expr())
    )
    tok = docs.select(
        "doc_id", F.posexplode("toks").alias("pos", "term")
    ).where(F.col("term").isin(list(terms)))
    cands = (
        _unordered_pairs(tok, a, b)
        .unionByName(_unordered_pairs(tok, a, c))
        .unionByName(_unordered_pairs(tok, b, c))
    )
    per_start = cands.groupBy("doc_id", "start").agg(F.min("end").alias("end"))
    w = (
        Window.partitionBy("doc_id")
        .orderBy("start")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    ivs = (
        per_start.withColumn("suff_min", F.min("end").over(w))
        .where(F.col("suff_min").isNull() | (F.col("suff_min") > F.col("end")))
        .select("doc_id", "start", "end")
    )
    return _score_agg(ivs, weight, pivot, max_gaps, k)


def interval_phrase_spark(
    spark, sf_dir, t1: str, t2: str, k: int = 10,
    weight: float = 1.0, pivot: float = DEFAULT_PIVOT,
) -> DataFrame:
    """Intervals.phrase(t1, t2) (ConjunctionIntervalsSource + BLOCK):
    exact adjacency — every t2 occurrence directly following a t1.
    Closed form: equi-join t1 positions with t2 positions at pos+1
    (both sides pruned inside the scan); all blocks are width 2 and
    mutually non-nested, so the set is already minimal."""
    docs = load_documents(spark, sf_dir).withColumn(
        "toks", F.expr(spark_tokens_expr())
    )
    tok = docs.select(
        "doc_id", F.posexplode("toks").alias("pos", "term")
    ).where(F.col("term").isin([t1, t2]))
    a = tok.where(F.col("term") == t1).select(
        F.col("doc_id").alias("a_doc"), F.col("pos").alias("start")
    )
    b = tok.where(F.col("term") == t2).select(
        F.col("doc_id").alias("b_doc"), F.col("pos").alias("end")
    )
    pairs = a.join(
        b,
        (F.col("a_doc") == F.col("b_doc"))
        & (F.col("end") == F.col("start") + 1),
    ).select(F.col("a_doc").alias("doc_id"), "start", "end")
    return _score_agg(pairs, weight, pivot, None, k)


def interval_before_spark(
    spark, sf_dir, t1: str, t2: str, k: int = 10,
    weight: float = 1.0, pivot: float = DEFAULT_PIVOT,
) -> DataFrame:
    """Intervals.before(t1, t2): t1 occurrences that end before a t2
    interval starts — containedBy(t1, extend(offset(t2, before), MAX,
    0)), whose per-doc envelope is [0, max(0, max(t2.pos) − 1)]. One
    groupBy(doc) max + a broadcastable join; minExtent = 1 (the kept
    source side)."""
    docs = load_documents(spark, sf_dir).withColumn(
        "toks", F.expr(spark_tokens_expr())
    )
    tok = docs.select(
        "doc_id", F.posexplode("toks").alias("pos", "term")
    ).where(F.col("term").isin([t1, t2]))
    bound = (
        tok.where(F.col("term") == t2)
        .groupBy("doc_id")
        .agg(F.greatest(F.max("pos") - 1, F.lit(0)).alias("cutoff"))
    )
    pairs = (
        tok.where(F.col("term") == t1)
        .join(bound, "doc_id")
        .where(F.col("pos") <= F.col("cutoff"))
        .select("doc_id", F.col("pos").alias("start"), F.col("pos").alias("end"))
    )
    return _score_agg(pairs, weight, pivot, None, k, min_extent=1)


def interval_maxwidth_spark(
    spark, sf_dir, t1: str, t2: str, width: int, k: int = 10,
    weight: float = 1.0, pivot: float = DEFAULT_PIVOT,
) -> DataFrame:
    """Intervals.maxwidth(width, unordered(t1, t2))
    (FilteredIntervalsSource): the unordered pair minimal set filtered
    to end − start + 1 <= width."""
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
        .where(F.col("end") - F.col("start") + 1 <= width)
    )
    return _score_agg(pairs, weight, pivot, None, k)


def interval_phrase_duck(
    t1: str, t2: str, k: int = 10, weight: float = 1.0,
    pivot: float = DEFAULT_PIVOT,
) -> str:
    return f"""
WITH {_duck_pair_cte(t1, t2)},
pairs AS (
  SELECT a.doc_id, a.pos AS start, b.pos AS "end"
  FROM (SELECT doc_id, pos FROM tok WHERE term = '{t1}') a
  JOIN (SELECT doc_id, pos FROM tok WHERE term = '{t2}') b
    ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
),
{_duck_score_select(weight, pivot, None, k)}
""".strip()


def interval_before_duck(
    t1: str, t2: str, k: int = 10, weight: float = 1.0,
    pivot: float = DEFAULT_PIVOT,
) -> str:
    return f"""
WITH {_duck_pair_cte(t1, t2)},
bound AS (
  SELECT doc_id, greatest(max(pos) - 1, 0) AS cutoff
  FROM tok WHERE term = '{t2}' GROUP BY doc_id
),
pairs AS (
  SELECT t.doc_id, t.pos AS start, t.pos AS "end"
  FROM tok t JOIN bound b ON b.doc_id = t.doc_id
  WHERE t.term = '{t1}' AND t.pos <= b.cutoff
),
{_duck_score_select(weight, pivot, None, k, min_extent=1)}
""".strip()


def interval_maxwidth_duck(
    t1: str, t2: str, width: int, k: int = 10, weight: float = 1.0,
    pivot: float = DEFAULT_PIVOT,
) -> str:
    return f"""
WITH {_duck_pair_cte(t1, t2)},
pairs AS (
  SELECT doc_id, start, "end" FROM (
    SELECT doc_id,
           lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS start,
           pos AS "end",
           lag(term) OVER (PARTITION BY doc_id ORDER BY pos) AS prev_term,
           term
    FROM tok
  )
  WHERE prev_term IS NOT NULL AND prev_term <> term
    AND "end" - start + 1 <= {width}
),
{_duck_score_select(weight, pivot, None, k)}
""".strip()


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
    weight: float, pivot: float, max_gaps: int | None, k: int,
    min_extent: int = 2,
) -> str:
    gap_pred = (
        f"WHERE (\"end\" - start + 1 - {min_extent}) <= {max_gaps}"
        if max_gaps is not None else ""
    )
    return f"""
flt AS (SELECT * FROM pairs {gap_pred}),
agg AS (
  SELECT doc_id, count(*)::BIGINT AS n_intervals,
         sum(1.0 / greatest("end" - start + {2 - min_extent}, 1)) AS freq
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


def _duck_set_cte(terms) -> str:
    te = duck_tokens_expr()
    inlist = ", ".join(f"'{t}'" for t in terms)
    return f"""
tok0 AS (
  SELECT doc_id, unnest({te}) AS term, generate_subscripts({te}, 1) - 1 AS pos
  FROM documents
),
tok AS (SELECT * FROM tok0 WHERE term IN ({inlist}))
""".strip()


def interval_ordered_or_duck(
    t1: str, alts: tuple, k: int = 10, max_gaps: int | None = None,
    weight: float = 1.0, pivot: float = DEFAULT_PIVOT,
) -> str:
    """Twin of interval_ordered_or_spark: ordered(t1, or(*alts))."""
    b_list = ", ".join(f"'{a}'" for a in alts)
    return f"""
WITH {_duck_set_cte((t1, *alts))},
lab AS (
  SELECT doc_id, pos, term,
         max(CASE WHEN term = '{t1}' THEN pos END)
           OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_a,
         max(CASE WHEN term IN ({b_list}) THEN pos END)
           OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_b
  FROM tok
),
pairs AS (
  SELECT doc_id, prev_a AS start, pos AS "end"
  FROM lab
  WHERE term IN ({b_list}) AND prev_a IS NOT NULL
    AND (prev_b IS NULL OR prev_b < prev_a)
),
{_duck_score_select(weight, pivot, max_gaps, k)}
""".strip()


_DUCK_UNORD_PAIRS = """
{name} AS (
  SELECT doc_id,
         lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS start,
         pos AS "end"
  FROM (
    SELECT doc_id, pos, term,
           lag(term) OVER (PARTITION BY doc_id ORDER BY pos) AS prev_term
    FROM tok WHERE term IN ('{a}', '{b}')
  )
  QUALIFY prev_term IS NOT NULL AND prev_term <> term
)
""".strip()


def interval_containing_duck(
    t1: str, t2: str, small: str, k: int = 10, negate: bool = False,
    max_gaps: int | None = None, weight: float = 1.0,
    pivot: float = DEFAULT_PIVOT,
) -> str:
    """Twin of interval_containing_spark: containing / notContaining of
    unordered(t1, t2) against a term subtrahend — same event-stream
    suffix-min formulation (interval rows order before same-position
    small rows so a small at the start stays in frame)."""
    big = _DUCK_UNORD_PAIRS.format(name="big", a=t1, b=t2)
    keep = (
        "(next_small IS NULL OR next_small > \"end\")"
        if negate else "next_small <= \"end\""
    )
    return f"""
WITH {_duck_set_cte((t1, t2, small))},
{big},
ev AS (
  SELECT doc_id, start AS pos, 0 AS is_small, "end" FROM big
  UNION ALL
  SELECT doc_id, pos, 1 AS is_small, NULL AS "end"
  FROM tok WHERE term = '{small}'
),
marked AS (
  SELECT doc_id, pos, is_small, "end",
         min(CASE WHEN is_small = 1 THEN pos END)
           OVER (PARTITION BY doc_id ORDER BY pos, is_small
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
           AS next_small
  FROM ev
),
pairs AS (
  SELECT doc_id, pos AS start, "end"
  FROM marked WHERE is_small = 0 AND {keep}
),
{_duck_score_select(weight, pivot, max_gaps, k)}
""".strip()


def interval_atleast_duck(
    terms: tuple, k: int = 10, max_gaps: int | None = None,
    weight: float = 1.0, pivot: float = DEFAULT_PIVOT,
) -> str:
    """Twin of interval_atleast_spark: atLeast(2 of 3) = minimalized
    union of the pairwise unordered minimal sets."""
    a, b, c = terms
    p_ab = _DUCK_UNORD_PAIRS.format(name="p_ab", a=a, b=b)
    p_ac = _DUCK_UNORD_PAIRS.format(name="p_ac", a=a, b=c)
    p_bc = _DUCK_UNORD_PAIRS.format(name="p_bc", a=b, b=c)
    return f"""
WITH {_duck_set_cte(terms)},
{p_ab},
{p_ac},
{p_bc},
cands AS (
  SELECT * FROM p_ab UNION SELECT * FROM p_ac UNION SELECT * FROM p_bc
),
per_start AS (
  SELECT doc_id, start, min("end") AS "end"
  FROM cands GROUP BY doc_id, start
),
pairs AS (
  SELECT doc_id, start, "end"
  FROM (
    SELECT doc_id, start, "end",
           min("end") OVER (PARTITION BY doc_id ORDER BY start
                            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
             AS suff_min
    FROM per_start
  )
  WHERE suff_min IS NULL OR suff_min > "end"
),
{_duck_score_select(weight, pivot, max_gaps, k)}
""".strip()
