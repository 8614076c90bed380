"""FeatureField scoring functions + distance feature query
(document/FeatureField.java newSaturationQuery/newLogQuery/
newSigmoidQuery, document/LongDistanceFeatureQuery.java) expressed as
FunctionScore modes over the numeric doc-values channel."""

import numpy as np
import pandas as pd
import pytest

from lucene_solr_1_spark.search import kernel as K
from lucene_solr_1_spark.search.query import FunctionScore, Term


def test_feature_fn_math():
    v = np.array([0.0, 1.0, 10.0, 100.0])
    np.testing.assert_allclose(
        K._feature_fn("saturation", v, {"pivot": 10.0}), v / (v + 10.0)
    )
    np.testing.assert_allclose(
        K._feature_fn("log", v, {"scaling": 1.0}), np.log(1.0 + v)
    )
    sig = K._feature_fn("sigmoid", v, {"pivot": 10.0, "exp": 2.0})
    np.testing.assert_allclose(sig, v**2 / (v**2 + 100.0))
    dist = K._feature_fn("dist_feature", v, {"pivot": 5.0, "origin": 10.0})
    np.testing.assert_allclose(dist, 5.0 / (5.0 + np.abs(v - 10.0)))
    # saturation/sigmoid are bounded [0,1) and monotone increasing
    assert (np.diff(sig) > 0).all() and (sig < 1).all()
    # distance feature peaks at the origin
    assert dist.argmax() == 2
    with pytest.raises(ValueError):
        K._feature_fn("nope", v, {})


FEATS = [
    FunctionScore(Term("return"), "dl", "saturation", weight=0.5, pivot=45.0),
    FunctionScore(Term("return"), "dl", "log", weight=0.1, scaling=1.0),
    FunctionScore(Term("return"), "dl", "sigmoid", weight=1.0, pivot=60.0, exp=2.0),
    FunctionScore(Term("return"), "n_chars", "dist_feature", weight=2.0,
                  pivot=100.0, origin=500.0),
]


@pytest.mark.parametrize("q", FEATS, ids=[q.mode for q in FEATS])
def test_feature_local_equals_distributed(spark, tmp_path_factory, q,
                                          _feature_index):
    s = _feature_index
    dist = s.search(q, k=20, with_stored=False)
    loc = s.search_local(q, k=20, with_stored=False)
    pd.testing.assert_frame_equal(
        dist.reset_index(drop=True), loc.reset_index(drop=True)
    )
    # feature boost only ADDS: every score >= the bare query's score for
    # the same doc (fn >= 0 for non-negative doc values)
    bare = s.search(Term("return"), k=1000, with_stored=False)
    base = dict(zip(bare["global_doc_id"], bare["score"]))
    for g, sc in zip(dist["global_doc_id"], dist["score"]):
        assert sc >= base[g] - 1e-6


@pytest.fixture(scope="module")
def _feature_index(spark, tmp_path_factory):
    from lucene_solr_1_spark.corpus import corpus_spark_df
    from lucene_solr_1_spark.index.builder import build_index
    from lucene_solr_1_spark.search.searcher import LuceneSparkSearcher

    d = str(tmp_path_factory.mktemp("idx_feat"))
    build_index(spark, corpus_spark_df(spark, 300, partitions=2),
                d, num_segments=2)
    return LuceneSparkSearcher(spark, d)


def test_distance_feature_reranks(_feature_index):
    """dist_feature with a tight pivot must pull docs near the origin
    doc-length to the top — the recency-boost behavior."""
    s = _feature_index
    q = FunctionScore(Term("return"), "dl", "dist_feature",
                      weight=5.0, pivot=2.0, origin=80.0)
    hits = s.search(q, k=5, with_stored=True)
    bare = s.search(Term("return"), k=5, with_stored=True)
    assert not hits["global_doc_id"].tolist() == bare["global_doc_id"].tolist()
    # the top hit sits near dl=80
    assert abs(int(hits["dl"].iloc[0]) - 80) <= 15
