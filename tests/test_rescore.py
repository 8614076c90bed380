"""QueryRescorer semantics (reference QueryRescorer.java:51-139 rescore
loop, :168-180 linear-combination sugar), pinned against a manual
two-pass reference built from two independent plain searches:

- combined = float32(first_f64 + weight * second_f64) when the second
  pass matches, else the first-pass float32 score unchanged;
- the second pass scores ONLY the first-pass doc set: a doc outside the
  first-pass top-N never appears, however well rescore_q scores it;
- re-ranked by (score desc, global docID asc), truncated to k.
"""

import numpy as np
import pandas as pd

from lucene_solr_1_spark.index.builder import build_index
from lucene_solr_1_spark.search.query import Bool, Occur, Term
from lucene_solr_1_spark.search.searcher import LuceneSparkSearcher


def _mk_index(spark, tmp_path, name):
    rng = np.random.default_rng(17)
    vocab = ["merge", "query", "spark", "index", "shard", "commit"]
    rows = []
    for i in range(60):
        toks = rng.choice(vocab, size=rng.integers(4, 40), p=[0.3, 0.3, 0.15, 0.1, 0.1, 0.05])
        rows.append(("r", f"p/{i:03d}", f"c{i}", "en", " ".join(toks)))
    # docs that match ONLY the rescore query — must never surface
    rows.append(("r", "only/0", "cx", "en", "spark " * 30))
    rows.append(("r", "only/1", "cy", "en", "spark spark spark"))
    pdf = pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])
    d = str(tmp_path / name)
    build_index(spark, spark.createDataFrame(pdf), d, num_segments=3)
    return LuceneSparkSearcher(spark, d)


def test_rescore_matches_two_pass_reference(spark, tmp_path):
    s = _mk_index(spark, tmp_path, "ridx")
    first_q = Term("merge")
    rescore_q = Bool.of((Occur.SHOULD, Term("spark")), (Occur.SHOULD, Term("index")))
    weight, first_k, k = 2.0, 12, 6

    got = s.rescore(first_q, rescore_q, weight=weight, first_k=first_k, k=k,
                    with_stored=True)

    # reference: two plain searches, driver-side combine
    first = s.search(first_q, k=first_k, with_stored=False)
    second = s.search(rescore_q, k=10_000, with_stored=False)
    sec = second.set_index("global_doc_id")["score"]
    comb = []
    for _, r in first.iterrows():
        f32 = np.float32(r["score"])
        if r["global_doc_id"] in sec.index:
            sc = np.float32(np.float64(f32) + weight * np.float64(
                np.float32(sec.loc[r["global_doc_id"]])))
        else:
            sc = f32
        comb.append((r["global_doc_id"], sc))
    ref = (
        pd.DataFrame(comb, columns=["global_doc_id", "score"])
        .sort_values(["score", "global_doc_id"], ascending=[False, True],
                     kind="mergesort")
        .head(k)
        .reset_index(drop=True)
    )
    assert got["global_doc_id"].tolist() == ref["global_doc_id"].tolist()
    np.testing.assert_array_equal(
        got["score"].to_numpy(np.float32), ref["score"].to_numpy(np.float32)
    )
    # second-pass-only docs never surface
    assert not set(got["path"]) & {"only/0", "only/1"}
    # stored fields rode along
    assert {"path", "content", "score", "rank"} <= set(got.columns)
    assert got["rank"].tolist() == list(range(len(got)))


def test_rescore_no_second_pass_match_keeps_first_scores(spark, tmp_path):
    s = _mk_index(spark, tmp_path, "ridx2")
    got = s.rescore(Term("merge"), Term("zzz_absent"), weight=5.0,
                    first_k=8, k=8, with_stored=False)
    plain = s.search(Term("merge"), k=8, with_stored=False)
    assert got["global_doc_id"].tolist() == plain["global_doc_id"].tolist()
    np.testing.assert_array_equal(
        got["score"].to_numpy(np.float32), plain["score"].to_numpy(np.float32)
    )


def test_rescore_empty_first_pass(spark, tmp_path):
    s = _mk_index(spark, tmp_path, "ridx3")
    got = s.rescore(Term("zzz_absent"), Term("merge"), k=5)
    assert len(got) == 0
