"""Pluggable similarities (kernels/similarity.py): Classic TF-IDF,
BooleanSimilarity, LM Dirichlet, LM Jelinek-Mercer swapped per query
(IndexSearcher.setSimilarity) over the ONE unified-norm index.

Contract pins:
- scorer math vs an independent pure-python float64 reference
  (ClassicSimilarity.java:38-64, LMDirichletSimilarity.java:73-77,
  LMJelinekMercerSimilarity.java:63-68 formulas re-derived here from
  the published equations, NOT from the kernel code);
- distributed == local evaluation for every similarity;
- strictly-positive sims prune under WAND with sim-scored impact UBs,
  result-identical to exhaustive; zero-clamping sims route exhaustive;
- LM sims reject multi-term stats shapes (SimilarityBase: one
  BasicStats per term).
"""

import math

import numpy as np
import pandas as pd
import pytest

from lucene_solr_1_spark.index.builder import build_index
from lucene_solr_1_spark.kernels import similarity as simk
from lucene_solr_1_spark.kernels.smallfloat import LENGTH_TABLE
from lucene_solr_1_spark.search import kernel as K
from lucene_solr_1_spark.search.query import Bool, Occur, Phrase, Term
from lucene_solr_1_spark.search.searcher import LuceneSparkSearcher


@pytest.fixture(scope="module")
def sim_setup(spark, tmp_path_factory):
    from lucene_solr_1_spark.corpus import corpus_spark_df

    d = str(tmp_path_factory.mktemp("idx_sim"))
    build_index(spark, corpus_spark_df(spark, 400, partitions=3),
                d, num_segments=3)
    return LuceneSparkSearcher(spark, d)


# ---------------------------------------------------------------- kernels

def test_classic_score_reference():
    """f32 pipeline tracks tf*idf*lengthNorm computed in plain float64
    (rtol bounds the quantization), and the exact op order is reproduced
    by an independent scalar chain."""
    freqs = np.array([1, 2, 5, 13, 40])
    norm_bytes = np.array([10, 24, 39, 52, 120])
    qw = simk.classic_query_weight(simk.classic_idf(7, 400))
    got = simk.classic_score(freqs, norm_bytes, qw)
    idf = math.log(401.0 / 8.0) + 1.0
    for g, f, b in zip(got, freqs, norm_bytes):
        approx = math.sqrt(f) * idf / math.sqrt(float(LENGTH_TABLE[b]))
        assert abs(float(g) - approx) < 1e-5 * approx
        # scalar float32 chain
        exact = np.float32(
            np.float32(np.float32(math.sqrt(float(np.float32(f)))) * qw)
            * simk.CLASSIC_NORM_TABLE[b]
        )
        assert float(g) == float(exact)


def test_classic_norm_table_slot0():
    # TFIDFSimilarity normTable[0] = 1f / normTable[255]
    assert simk.CLASSIC_NORM_TABLE[0] == np.float32(1.0) / simk.CLASSIC_NORM_TABLE[255]


@pytest.mark.parametrize("fn,extra", [("lmd", 2000.0), ("lmjm", 0.1)])
def test_lm_score_reference(fn, extra):
    freqs = np.array([1, 3, 9, 27])
    norm_bytes = np.array([15, 40, 80, 200])
    p = simk.lm_collection_probability(123, 54321)
    assert p == 124.0 / 54322.0
    if fn == "lmd":
        got = simk.lmd_score(freqs, norm_bytes, p, extra, 1.0)
    else:
        got = simk.lmjm_score(freqs, norm_bytes, p, extra, 1.0)
    for g, f, b in zip(got, freqs, norm_bytes):
        dl = float(LENGTH_TABLE[b])
        if fn == "lmd":
            ref = max(0.0, math.log(1 + f / (extra * p)) + math.log(extra / (dl + extra)))
        else:
            ref = math.log(1 + ((1 - extra) * f / dl) / (extra * p))
        assert abs(float(g) - ref) < 1e-6 * max(1.0, abs(ref))


def test_lmd_clamps_at_zero():
    # a common doc-frequent term in a long doc scores <= 0 -> clamped
    s = simk.lmd_score(np.array([1]), np.array([255]), 0.5, 2000.0, 1.0)
    assert s[0] == np.float32(0.0)


def test_dfr_inl2_reference():
    """DFR I(n)L2 vs the published formula computed in plain float64:
    score = A * (1 - 1/(1+tfn)), tfn = f*log2(1 + avgfl/dl),
    A = log2((N+1)/(df+0.5))."""
    freqs = np.array([1, 4, 16])
    norm_bytes = np.array([20, 60, 150])
    got = simk.dfr_inl2_score(freqs, norm_bytes, df=12, dc=400,
                              avgfl=55.5, c=1.0, boost=1.0)
    A = math.log2(401.0 / 12.5)
    for g, f, b in zip(got, freqs, norm_bytes):
        dl = float(LENGTH_TABLE[b])
        tfn = f * math.log2(1 + 55.5 / dl)
        ref = A * (1 - 1 / (1 + tfn))
        assert abs(float(g) - ref) < 1e-6 * ref
    # monotone increasing in freq at fixed dl
    same = simk.dfr_inl2_score(np.array([1, 2, 3]), np.array([60, 60, 60]),
                               12, 400, 55.5, 1.0, 1.0)
    assert (np.diff(same) > 0).all()


def test_ib_ll_reference():
    freqs = np.array([1, 4, 16])
    norm_bytes = np.array([20, 60, 150])
    lam = simk.ib_lambda(12, 400)
    assert float(lam) == np.float32(13.0 / 401.0)
    got = simk.ib_ll_score(freqs, norm_bytes, lam, avgfl=55.5, c=1.0, boost=1.0)
    for g, f, b in zip(got, freqs, norm_bytes):
        dl = float(LENGTH_TABLE[b])
        tfn = f * math.log2(1 + 55.5 / dl)
        ref = -math.log(float(lam) / (tfn + float(lam)))
        assert abs(float(g) - ref) < 1e-6 * ref
    # lambda nextDown guard: df == N must not yield lambda == 1
    assert float(simk.ib_lambda(400, 400)) < 1.0


def test_dfi_reference():
    """DFI standardized: zero at/below expected freq, log2 measure above
    (DFISimilarity.java:55-64)."""
    # dl=100-ish slot, ttf=500, sumTTF=10000 -> expected ~ 5
    b = int(np.argmin(np.abs(LENGTH_TABLE - 100)))
    dl = float(LENGTH_TABLE[b])
    exp = 501.0 * dl / 10001.0
    got = simk.dfi_score(np.array([1, 5, 25]), np.array([b, b, b]),
                         500, 10000, 1.0)
    assert got[0] == np.float32(0.0)  # freq below expected
    for g, f in zip(got[1:], (5, 25)):
        if f <= exp:
            assert g == np.float32(0.0)
        else:
            ref = math.log2((f - exp) / math.sqrt(exp) + 1)
            assert abs(float(g) - ref) < 1e-6 * max(ref, 1.0)


def test_boolean_sim_is_boost():
    spec = {"name": "boolean", "boost": np.float32(2.5)}
    out = simk.score(spec, np.array([1, 7, 99]), np.array([3, 90, 200]))
    assert (out == np.float32(2.5)).all()


# ------------------------------------------------------------ plan compile

def test_sim_wand_routing():
    """Strictly-positive sims prune under WAND (UBs scored through the
    sim); zero-clamping sims (lmd/dfi) stay exhaustive."""
    gdf = {("content", "a"): 5, ("content", "b"): 9}
    ft = {"field_tokens": {"content": 1000}, "ttf": {("content", "a"): 7,
                                                     ("content", "b"): 11}}
    prunable = ({"name": "classic"}, {"name": "boolean"},
                {"name": "lmjm", **ft}, {"name": "dfr_inl2", **ft},
                {"name": "ib_ll", **ft})
    for sim in prunable:
        plan = K.compile_plan(Term("a"), gdf, 100, sim=sim)
        assert K.wand_applicable(plan), sim
        bp = K.compile_plan(
            Bool.of((Occur.SHOULD, Term("a")), (Occur.SHOULD, Term("b"))),
            gdf, 100, sim=sim,
        )
        assert K.wand_applicable(bp), sim
    for sim in ({"name": "lmd", **ft}, {"name": "dfi", **ft}):
        assert not K.wand_applicable(K.compile_plan(Term("a"), gdf, 100, sim=sim))
    # default BM25 still prunes
    assert K.wand_applicable(K.compile_plan(Term("a"), gdf, 100))


def test_lm_rejects_multi_term_stats():
    gdf = {("content", "a"): 5, ("content", "b"): 9}
    sim = {"name": "lmd", "ttf": {}, "field_tokens": {"content": 1000}}
    with pytest.raises(NotImplementedError):
        K.compile_plan(Phrase(("a", "b")), gdf, 100, sim=sim)


# ------------------------------------------------------------ end to end

SIMS = ["classic", "boolean", "lmd", "lmjm", ("lmd", 500.0), ("lmjm", 0.7),
        "dfr", "ib", ("dfr", 2.0), ("ib", 0.5), "dfi",
        "f2exp", ("f2exp", 0.5), ("multi", ("classic", "boolean"))]


@pytest.mark.parametrize("sim", SIMS, ids=["we-" + str(s) for s in SIMS])
def test_sim_wand_equals_exhaustive(sim_setup, sim):
    """WAND pruning under a swapped similarity must be result-identical
    to the exhaustive path (the BM25 invariant, extended to sims)."""
    s = sim_setup
    for q in (Term("return"), Term("id_0042"),
              Bool.of((Occur.SHOULD, Term("public")), (Occur.SHOULD, Term("static"))),
              Bool.of((Occur.MUST, Term("return")), (Occur.SHOULD, Term("class")))):
        a = s.search(q, k=12, use_wand=True, with_stored=False, similarity=sim)
        b = s.search(q, k=12, use_wand=False, with_stored=False, similarity=sim)
        assert a["global_doc_id"].tolist() == b["global_doc_id"].tolist()
        assert (a["score"].to_numpy() == b["score"].to_numpy()).all()


@pytest.mark.parametrize("sim", SIMS, ids=[str(s) for s in SIMS])
def test_local_equals_distributed_per_sim(sim_setup, sim):
    s = sim_setup
    q = Bool.of((Occur.SHOULD, Term("return")), (Occur.SHOULD, Term("class")))
    if isinstance(sim, tuple) or sim in ("lmd", "lmjm", "dfr", "ib", "dfi"):
        q = Term("return")
    dist = s.search(q, k=15, with_stored=False, similarity=sim)
    loc = s.search_local(q, k=15, with_stored=False, similarity=sim)
    pd.testing.assert_frame_equal(
        dist.reset_index(drop=True), loc.reset_index(drop=True)
    )
    assert dist.attrs["total_hits"] == loc.attrs["total_hits"]


def test_sims_share_match_set_differ_in_rank(sim_setup):
    """One index, many scorers: the matched doc SET is similarity-
    independent; only scores/ranks change. BM25 vs classic must agree on
    membership for a disjunction when k covers every match."""
    s = sim_setup
    q = Term("return")
    bm = s.search(q, k=1000, with_stored=False)
    cl = s.search(q, k=1000, with_stored=False, similarity="classic")
    bo = s.search(q, k=1000, with_stored=False, similarity="boolean")
    assert (
        set(bm["global_doc_id"]) == set(cl["global_doc_id"])
        == set(bo["global_doc_id"])
    )
    assert (bo["score"] == 1.0).all()
    # boolean ties break by global docID asc
    assert bo["global_doc_id"].tolist() == sorted(bo["global_doc_id"].tolist())


def test_param_changes_scores(sim_setup):
    s = sim_setup
    a = s.search(Term("return"), k=10, with_stored=False, similarity=("lmjm", 0.1))
    b = s.search(Term("return"), k=10, with_stored=False, similarity=("lmjm", 0.7))
    assert not np.array_equal(a["score"].to_numpy(), b["score"].to_numpy())


def test_unknown_similarity_raises(sim_setup):
    with pytest.raises(ValueError):
        sim_setup.search(Term("return"), k=5, similarity="axiomatic_f3exp")


def test_explain_matches_score_per_sim(sim_setup):
    """Explanation value == scorer score under every similarity (the
    BaseSimilarityTestCase explain invariant, extended to the swap)."""
    s = sim_setup
    for sim in ("classic", "lmd", "dfr", "ib", "dfi", "boolean", "lmjm"):
        hits = s.search(Term("return"), k=3, with_stored=False, similarity=sim)
        g = int(hits["global_doc_id"].iloc[0])
        ex = s.explain(Term("return"), g, similarity=sim)
        assert abs(ex["value"] - float(hits["score"].iloc[0])) < 1e-6, sim
        assert "BM25" not in ex["description"], sim  # model named in the tree


def test_sweetspot_degrades_to_classic_at_defaults():
    """SweetSpotSimilarity with (min=1, max=1, steep=0.5, tf defaults)
    degrades to ClassicSimilarity exactly (the reference javadoc
    contracts at lengthNorm:100-106 and baselineTf:150-153)."""
    import numpy as np

    from lucene_solr_1_spark.kernels.similarity import (
        CLASSIC_NORM_TABLE,
        classic_score,
        sweetspot_norm_table,
        sweetspot_score,
    )

    table = sweetspot_norm_table(1, 1, 0.5)
    np.testing.assert_array_equal(table, CLASSIC_NORM_TABLE)
    rng = np.random.default_rng(5)
    freqs = rng.integers(1, 50, 300)
    norms = rng.integers(0, 256, 300)
    qw = np.float32(1.73)
    np.testing.assert_array_equal(
        sweetspot_score(freqs, norms, qw, table, 0.0, 0.0),
        classic_score(freqs, norms, qw),
    )


def test_sweetspot_plateau_and_routing(sim_setup):
    """Lengths inside [min,max] share lengthNorm 1.0 (the sweet spot);
    the sim routes EXHAUSTIVE (plateau is non-monotone in length so
    impact UBs are invalid), and wand/exhaustive flags agree."""
    import numpy as np

    from lucene_solr_1_spark.kernels.similarity import sweetspot_norm_table
    from lucene_solr_1_spark.kernels.smallfloat import LENGTH_TABLE

    table = sweetspot_norm_table(30, 80, 0.5)
    inside = [i for i in range(256) if 30 <= LENGTH_TABLE[i] <= 80]
    assert inside and all(table[i] == np.float32(1.0) for i in inside)
    # non-monotone: rises to the plateau then falls
    assert table[inside[0] - 1] < np.float32(1.0)
    assert table[inside[-1] + 1] < np.float32(1.0)

    s = sim_setup
    sim = ("sweetspot", (30, 80))
    a = s.search(Term("return"), k=10, use_wand=True, with_stored=False,
                 similarity=sim)
    b = s.search(Term("return"), k=10, use_wand=False, with_stored=False,
                 similarity=sim)
    assert a["global_doc_id"].tolist() == b["global_doc_id"].tolist()
    assert a["score"].tolist() == b["score"].tolist()
    # differs from classic on this corpus (the plateau changes ranking)
    c = s.search(Term("return"), k=10, with_stored=False, similarity="classic")
    assert not np.array_equal(a["score"].to_numpy(), c["score"].to_numpy())
