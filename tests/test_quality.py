"""QualityBenchmark analog: metric math on golden cases + an end-to-end
evaluation where qrels derive from the brute-force oracle (perfect-recall
contract: a doc is relevant iff it contains the query term)."""

import pytest

from lucene_solr_1_spark.index.builder import build_index
from lucene_solr_1_spark.search import quality as Q
from lucene_solr_1_spark.search.query import Bool, Occur, Term
from lucene_solr_1_spark.search.searcher import LuceneSparkSearcher

from .oracle import OracleIndex


@pytest.fixture(scope="module")
def searcher(spark, tiny_corpus_pdf, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx_q"))
    build_index(spark, spark.createDataFrame(tiny_corpus_pdf), d, num_segments=4)
    return LuceneSparkSearcher(spark, d)


@pytest.fixture(scope="module")
def oracle(tiny_corpus_pdf):
    return OracleIndex(tiny_corpus_pdf)


def test_metric_golden():
    ranked = ["a", "b", "c", "d"]
    rel = {"a", "c", "x"}
    assert Q.precision_at_k(ranked, rel, 2) == 0.5
    assert Q.recall_at_k(ranked, rel, 4) == pytest.approx(2 / 3)
    # AP: hits at ranks 1 and 3 → (1/1 + 2/3) / 3
    assert Q.average_precision(ranked, rel) == pytest.approx((1 + 2 / 3) / 3)
    assert 0 < Q.ndcg_at_k(ranked, rel, 4) < 1
    assert Q.ndcg_at_k(["a", "c"], {"a", "c"}, 2) == 1.0


def test_e2e_oracle_qrels(searcher, oracle):
    query_set = {
        "hot": Term("return"),
        "tail": Term("tail_marker"),
        "conj": Bool.of((Occur.MUST, Term("return")), (Occur.MUST, Term("int"))),
    }
    qrels = {
        "hot": {oracle.key_of(d) for d in oracle.term_scores("return")},
        "tail": {oracle.key_of(d) for d in oracle.term_scores("tail_marker")},
        "conj": {
            oracle.key_of(d) for d in oracle.bool_and(["return", "int"])
        },
    }
    # k covers the whole corpus → the ranking contains every relevant doc
    # and nothing else, so precision, recall and MAP are all exactly 1
    rep = Q.evaluate(searcher, query_set, qrels, k=64)
    assert rep["mean_p_at_k"] == 1.0
    assert rep["map"] == pytest.approx(1.0)
    assert rep["queries"]["tail"]["recall_at_k"] == 1.0
    # truncated ranking: precision stays 1, MAP degrades gracefully
    rep10 = Q.evaluate(searcher, query_set, qrels, k=10)
    assert rep10["mean_p_at_k"] == 1.0
    assert 0 < rep10["map"] < 1.0
