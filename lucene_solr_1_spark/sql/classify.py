"""Text classification over the index — the `lucene/classification` module
re-expressed on the relational (Catalyst, double-precision) path.

Two classifiers, matching the reference semantics:

* k-nearest-neighbor (`KNearestNeighborClassifier.java:120-231`): a
  MoreLikeThis-style boosted-OR BM25 query from the input text (terms
  df-floored like `MoreLikeThis.setMinDocFreq`, boosted by their
  query-side tf) retrieves the top-k training docs; each hit votes for
  its class with weight `score / maxScore`; the class score is
  `boostSum / k` with the reference's `sumdoc < k` correction
  (`buildListFromTopDocs`, KNearestNeighborClassifier.java:192-226).

* simple naive Bayes (`SimpleNaiveBayesClassifier.java:135-277`):
  per class c, `logPrior = ln(docFreq(c)) - ln(N)` and per query token w
  `logLik += ln((docs(c, w) + 1) / (avgUniqueTermsPerDoc * docFreq(c) + N))`
  (add-1 smoothing; the denominator is `getTextTermFreqForClass +
  docsWithClass`, :203-246); scores are softmax-normalized exactly like
  `normClassificationResults` (:279-305, log-sum-exp form).

The class field is the documents table's `lang` column (single-valued,
present on every doc — so docsWithClassSize == N). Every aggregate is a
map-side-partial groupBy; per-class frames are tiny and broadcast; the
top-k retrieval is a bounded TakeOrderedAndProject. Nothing here
collects more than the class list to the driver — at 100 TB the only
shuffles are the tokenize-explode aggregations the BM25 path already
pays.

DuckDB twins replicate the same double-precision formulas over the same
shared token spec (SQL_TOKEN_PATTERN); sums of ≤k doubles may differ in
association order between engines, absorbed by round(.., 4) like every
relational oracle pair.
"""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import DataFrame, SparkSession, functions as F

from .relational import (
    B,
    K1,
    _sql_list,
    duck_tokens_expr,
    load_documents,
    spark_tokens_expr,
)
from ..kernels.analyzer import SQL_TOKEN_PATTERN


def _query_tf(text: str) -> dict[str, int]:
    """Tokenize the unseen input text with the SAME shared spec the
    relational path and the DuckDB twins use (the classifier's
    `tokenize()` step, SimpleNaiveBayesClassifier.java:188-201) —
    computed driver-side once (the input is a constant string) and
    embedded as literals in BOTH engines."""
    return dict(Counter(re.findall(SQL_TOKEN_PATTERN, text.lower())))


# ---------------------------------------------------------------------------
# k-nearest-neighbor
# ---------------------------------------------------------------------------

def knn_classify_spark(
    spark: SparkSession, sf_dir: str, text: str, k: int = 10, min_df: int = 2
) -> DataFrame:
    """KNearestNeighborClassifier: MLT-style retrieval + class vote."""
    from pyspark.sql import Window

    tf_q = _query_tf(text)
    terms = sorted(tf_q)
    docs = load_documents(spark, sf_dir).withColumn(
        "toks", F.expr(spark_tokens_expr())
    )
    totals = docs.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.sum(F.size("toks")).cast("double").alias("sum_dl"),
    )
    toks = docs.select(
        "doc_id", F.size("toks").cast("double").alias("dl"),
        F.explode("toks").alias("term"),
    )
    tf = (
        toks.where(F.col("term").isin(terms))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("double").alias("tf"), F.first("dl").alias("dl"))
    )
    boost_col = F.create_map(
        *[x for t in terms for x in (F.lit(t), F.lit(float(tf_q[t])))]
    )[F.col("term")]
    sc = (
        tf.withColumn(
            "df", F.count("*").over(Window.partitionBy("term")).cast("double")
        )
        # MoreLikeThis.setMinDocFreq: rare terms don't enter the MLT query
        .where(F.col("df") >= float(min_df))
        .crossJoin(F.broadcast(totals))
        .withColumn(
            "s",
            boost_col
            * F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
            * F.col("tf")
            / (F.col("tf") + K1 * ((1 - B) + B * F.col("dl") / (F.col("sum_dl") / F.col("n_docs")))),
        )
    )
    hits = (
        sc.groupBy("doc_id")
        .agg(F.sum("s").alias("score_raw"))
        .orderBy(F.round(F.col("score_raw"), 6).desc(), F.col("doc_id"))
        .limit(k)
        .select("doc_id", F.round(F.col("score_raw"), 4).alias("score"))
    )
    labeled = F.broadcast(hits).join(
        load_documents(spark, sf_dir).select("doc_id", "lang"), "doc_id"
    )
    tops = labeled.agg(
        F.max("score").alias("max_score"),
        F.count("*").cast("double").alias("sumdoc"),
    )
    per_class = (
        labeled.crossJoin(F.broadcast(tops))
        .groupBy("lang")
        .agg(
            F.count("*").alias("votes"),
            F.sum(F.col("score") / F.col("max_score")).alias("bsum"),
            F.first("sumdoc").alias("sumdoc"),
        )
    )
    # (count * (boostSum/count)) / k, scaled by k/sumdoc when fewer than k
    # hits came back — KNearestNeighborClassifier.java:210-226 verbatim
    shaped = per_class.withColumn(
        "cls_raw",
        F.when(
            F.col("sumdoc") < float(k),
            (F.col("bsum") / float(k)) * (float(k) / F.col("sumdoc")),
        ).otherwise(F.col("bsum") / float(k)),
    )
    return (
        shaped.orderBy(F.round(F.col("cls_raw"), 6).desc(), F.col("lang"))
        .select(
            F.col("lang").alias("label"),
            F.round(F.col("cls_raw"), 4).alias("score"),
            F.col("votes").cast("bigint").alias("votes"),
        )
    )


def knn_classify_duck(text: str, k: int = 10, min_df: int = 2) -> str:
    tf_q = _query_tf(text)
    terms = sorted(tf_q)
    te = duck_tokens_expr()
    boost_case = " ".join(f"WHEN '{t}' THEN {float(tf_q[t])}" for t in terms)
    return f"""
WITH tot AS (
  SELECT count(*)::DOUBLE AS n_docs, sum(len({te}))::DOUBLE AS sum_dl FROM documents
),
tok AS (SELECT doc_id, unnest({te}) AS term FROM documents),
tf AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tok
  WHERE term IN ({_sql_list(terms)}) GROUP BY 1, 2
),
dfr AS (SELECT term, count(DISTINCT doc_id)::DOUBLE AS df FROM tf GROUP BY 1),
dl AS (SELECT doc_id, len({te})::DOUBLE AS dl FROM documents),
sc AS (
  SELECT tf.doc_id,
         (CASE tf.term {boost_case} END)
           * ln(1.0 + (tot.n_docs - dfr.df + 0.5)/(dfr.df + 0.5))
           * tf.tf / (tf.tf + {K1}*((1-{B}) + {B}*dl.dl/(tot.sum_dl/tot.n_docs))) AS s
  FROM tf JOIN dfr USING (term) JOIN dl USING (doc_id) CROSS JOIN tot
  WHERE dfr.df >= {float(min_df)}
),
hits AS (
  SELECT doc_id, round(sum(s), 4) AS score FROM sc GROUP BY 1
  ORDER BY round(sum(s), 6) DESC, doc_id LIMIT {k}
),
labeled AS (SELECT h.doc_id, h.score, d.lang FROM hits h JOIN documents d USING (doc_id)),
tops AS (SELECT max(score) AS max_score, count(*)::DOUBLE AS sumdoc FROM labeled),
per_class AS (
  SELECT lang, count(*) AS votes, sum(score / tops.max_score) AS bsum,
         first(tops.sumdoc) AS sumdoc
  FROM labeled CROSS JOIN tops GROUP BY lang
)
SELECT lang AS label,
       round(CASE WHEN sumdoc < {float(k)}
                  THEN (bsum / {float(k)}) * ({float(k)} / sumdoc)
                  ELSE bsum / {float(k)} END, 4) AS score,
       votes::BIGINT AS votes
FROM per_class
ORDER BY round(CASE WHEN sumdoc < {float(k)}
                    THEN (bsum / {float(k)}) * ({float(k)} / sumdoc)
                    ELSE bsum / {float(k)} END, 6) DESC, lang
""".strip()


# ---------------------------------------------------------------------------
# simple naive Bayes
# ---------------------------------------------------------------------------

def naive_bayes_classify_spark(
    spark: SparkSession, sf_dir: str, text: str
) -> DataFrame:
    """SimpleNaiveBayesClassifier: add-1-smoothed multinomial NB over
    per-class document frequencies, softmax-normalized."""
    tf_q = _query_tf(text)
    docs = load_documents(spark, sf_dir).withColumn(
        "toks", F.expr(spark_tokens_expr())
    )
    # distinct (doc, class, term) pairs: getWordFreqForClass counts DOCS
    # (TotalHitCountCollector over term AND class), not occurrences
    pairs = docs.select(
        "doc_id", "lang", F.explode(F.array_distinct("toks")).alias("term")
    )
    totals = pairs.agg(
        F.count_distinct("doc_id").cast("double").alias("n_docs"),
        F.count("*").cast("double").alias("sum_doc_freq"),
    )
    classes = docs.groupBy("lang").agg(F.count("*").cast("double").alias("df_c"))
    qterms = spark.createDataFrame(
        [(t, float(m)) for t, m in sorted(tf_q.items())], "term string, mult double"
    )
    hits = (
        pairs.where(F.col("term").isin(sorted(tf_q)))
        .groupBy("lang", "term")
        .agg(F.count("*").cast("double").alias("hits"))
    )
    grid = (
        classes.crossJoin(F.broadcast(qterms))
        .join(F.broadcast(hits), ["lang", "term"], "left")
        .fillna(0.0, subset=["hits"])
        .crossJoin(F.broadcast(totals))
    )
    # log P(w|c) summed per token occurrence (repeats weigh via mult);
    # den = avgUniqueTermsPerDoc * docFreq(class) + docsWithClass
    # (SimpleNaiveBayesClassifier.java:203-246)
    ll = grid.withColumn(
        "ll",
        F.col("mult")
        * F.log(
            (F.col("hits") + 1.0)
            / ((F.col("sum_doc_freq") / F.col("n_docs")) * F.col("df_c") + F.col("n_docs"))
        ),
    )
    clval = ll.groupBy("lang").agg(
        (F.log(F.first("df_c")) - F.log(F.first("n_docs")) + F.sum("ll")).alias("clval")
    )
    # normClassificationResults: softmax via log-sum-exp in double
    mx = clval.agg(F.max("clval").alias("mx"))
    lse = (
        clval.crossJoin(F.broadcast(mx))
        .agg(
            (F.first("mx") + F.log(F.sum(F.exp(F.col("clval") - F.col("mx"))))).alias("lse")
        )
    )
    return (
        clval.crossJoin(F.broadcast(lse))
        .select(
            F.col("lang").alias("label"),
            F.round(F.exp(F.col("clval") - F.col("lse")), 4).alias("score"),
            F.round(F.col("clval"), 4).alias("log_score"),
        )
        .orderBy(F.col("score").desc(), F.col("label"))
    )


def naive_bayes_classify_duck(text: str) -> str:
    tf_q = _query_tf(text)
    te = duck_tokens_expr()
    terms = sorted(tf_q)
    mult_rows = ", ".join(f"('{t}', {float(tf_q[t])})" for t in terms)
    return f"""
WITH pairs AS (
  SELECT doc_id, lang, unnest(list_distinct({te})) AS term FROM documents
),
tot AS (
  SELECT count(DISTINCT doc_id)::DOUBLE AS n_docs, count(*)::DOUBLE AS sum_doc_freq
  FROM pairs
),
classes AS (SELECT lang, count(*)::DOUBLE AS df_c FROM documents GROUP BY 1),
qterms(term, mult) AS (VALUES {mult_rows}),
hits AS (
  SELECT lang, term, count(*)::DOUBLE AS hits FROM pairs
  WHERE term IN ({_sql_list(terms)}) GROUP BY 1, 2
),
grid AS (
  SELECT c.lang, c.df_c, q.term, q.mult, coalesce(h.hits, 0.0) AS hits,
         tot.n_docs, tot.sum_doc_freq
  FROM classes c CROSS JOIN qterms q
  LEFT JOIN hits h ON h.lang = c.lang AND h.term = q.term
  CROSS JOIN tot
),
clval AS (
  SELECT lang,
         ln(first(df_c)) - ln(first(n_docs))
           + sum(mult * ln((hits + 1.0)
                 / ((sum_doc_freq / n_docs) * df_c + n_docs))) AS clval
  FROM grid GROUP BY lang
),
mx AS (SELECT max(clval) AS mx FROM clval),
lse AS (
  SELECT first(mx.mx) + ln(sum(exp(clval.clval - mx.mx))) AS lse
  FROM clval CROSS JOIN mx
)
SELECT lang AS label, round(exp(clval - lse.lse), 4) AS score,
       round(clval, 4) AS log_score
FROM clval CROSS JOIN lse
ORDER BY round(exp(clval - lse.lse), 4) DESC, label
""".strip()
