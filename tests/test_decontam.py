"""Benchmark decontamination + unigram log-perplexity
(pipeline/decontam.py): planted-contamination semantics and the
broadcast-join scale shape."""

import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from lucene_solr_1_spark.pipeline import decontam

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def planted(spark, tmp_path):
    """Tiny corpus where doc 29*0=0 is benchmark; doc 100 copies doc 0's
    text verbatim (fully contaminated), doc 101 shares nothing."""
    rows = [
        (0, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (100, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (101, "one two three four five six seven eight nine ten"),
        (102, "short text"),  # < n tokens -> zero n-grams
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    d = str(tmp_path / "docs")
    spark.createDataFrame(pdf).write.parquet(f"{d}/documents.parquet")
    return d


def test_planted_contamination(spark, planted):
    out = decontam.decontam_spark(spark, planted).toPandas().set_index("doc_id")
    assert 0 not in out.index  # benchmark doc excluded from scoring
    assert out.loc[100, "contamination"] == 1.0 and bool(out.loc[100, "flagged"])
    assert out.loc[101, "contamination"] == 0.0 and not bool(out.loc[101, "flagged"])
    assert out.loc[102, "n_ngrams"] == 0 and out.loc[102, "contamination"] == 0.0
    # 10 tokens, 5-grams -> 6 distinct n-grams
    assert out.loc[100, "n_ngrams"] == 6 and out.loc[100, "n_matched"] == 6


def test_decontam_plan_broadcasts_benchmark(spark):
    """The benchmark side must broadcast (it is MB-scale in production);
    the candidate side must never be collected or cross-joined."""
    df = decontam.decontam_spark(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_logppl_reference(spark, planted):
    """Unigram cross-entropy matches a hand computation on the planted
    corpus: every token is unique (c=1 each, total=32) except the
    duplicated doc's tokens (c=2)."""
    out = (
        decontam.unigram_logppl_spark(spark, planted, vocab_size=1000)
        .toPandas()
        .set_index("doc_id")
    )
    total = 32  # 10 + 10 + 10 + 2 tokens
    # docs 0/100 share every token -> each token has corpus count 2
    expect_dup = -math.log(2 / total)
    assert abs(out.loc[0, "logppl"] - round(expect_dup, 4)) < 5e-4
    assert out.loc[0, "logppl"] == out.loc[100, "logppl"]
    # doc 101's tokens are singletons -> higher perplexity (rarer)
    assert out.loc[101, "logppl"] > out.loc[0, "logppl"]
    assert out.loc[101, "logppl"] == pytest.approx(-math.log(1 / total), abs=5e-4)


def test_logppl_oov_path(spark, planted):
    """vocab_size=1 keeps only the most frequent token; OOV tokens score
    as count-1 events, so perplexity rises for all-OOV docs."""
    small = (
        decontam.unigram_logppl_spark(spark, planted, vocab_size=1)
        .toPandas()
        .set_index("doc_id")
    )
    full = (
        decontam.unigram_logppl_spark(spark, planted, vocab_size=1000)
        .toPandas()
        .set_index("doc_id")
    )
    assert small.loc[0, "logppl"] >= full.loc[0, "logppl"]


def test_logppl_plan_broadcasts_vocab(spark):
    df = decontam.unigram_logppl_spark(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
