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
