"""Replication (lucene/replicator pull model): replica == source after
each cycle, incremental copies only new segments, deletes replicate,
no-change cycles are no-ops."""

import os

import numpy as np
import pandas as pd

from lucene_solr_1_spark.index.builder import add_documents, build_index
from lucene_solr_1_spark.index.deletes import delete_by_term
from lucene_solr_1_spark.index.replicator import replicate
from lucene_solr_1_spark.search.query import Term
from lucene_solr_1_spark.search.searcher import LuceneSparkSearcher

VOCAB = ["ant", "bee", "cat", "dog", "elk"]


def _corpus(seed: int, n: int, tag: str) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    rows = [
        (f"r/{tag}", f"p/{tag}/{i:04d}", f"c{seed}{i:04x}", "en",
         " ".join(rng.choice(VOCAB, size=15)))
        for i in range(n)
    ]
    return pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])


def _hits(spark, d, term="ant"):
    s = LuceneSparkSearcher(spark, d)
    h = s.search(Term(term), k=200, with_stored=True)
    return dict(zip(h["path"], h["score"].astype(np.float32)))


def test_replicate_cycle(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    build_index(spark, spark.createDataFrame(_corpus(1, 30, "a")), src,
                num_segments=3)
    r1 = replicate(src, dst)
    assert r1["status"] == "replicated" and r1["copied_segments"] == 3
    assert _hits(spark, dst) == _hits(spark, src)
    # no source change -> no-op
    r2 = replicate(src, dst)
    assert r2["status"] == "up_to_date" and r2["copied_segments"] == 0
    # append at the source: only the NEW segment copies
    add_documents(spark, spark.createDataFrame(_corpus(2, 10, "b")), src,
                  num_segments=1)
    r3 = replicate(src, dst)
    assert r3["status"] == "replicated" and r3["copied_segments"] == 1
    assert _hits(spark, dst) == _hits(spark, src)


def test_replicate_carries_deletes(spark, tmp_path):
    src, dst = str(tmp_path / "s2"), str(tmp_path / "d2")
    pdf = _corpus(3, 20, "x")
    pdf.loc[0, "content"] = pdf.loc[0, "content"] + " zzgone"
    build_index(spark, spark.createDataFrame(pdf), src, num_segments=2)
    replicate(src, dst)
    delete_by_term(spark, src, "zzgone")
    r = replicate(src, dst)
    assert r["status"] == "replicated" and r["copied_segments"] == 0
    s = LuceneSparkSearcher(spark, dst)
    assert len(s.search(Term("zzgone"), k=5, with_stored=False)) == 0


def test_replica_is_searchable_while_source_advances(spark, tmp_path):
    """The replica's view is a COMMIT POINT: source appends after the
    cycle don't leak in until the next replicate()."""
    src, dst = str(tmp_path / "s3"), str(tmp_path / "d3")
    build_index(spark, spark.createDataFrame(_corpus(4, 15, "a")), src,
                num_segments=2)
    replicate(src, dst)
    before = _hits(spark, dst)
    add_documents(spark, spark.createDataFrame(_corpus(5, 15, "b")), src,
                  num_segments=1)
    assert _hits(spark, dst) == before  # replica frozen at its commit
    replicate(src, dst)
    assert _hits(spark, dst) == _hits(spark, src)


def test_replicate_fetches_new_norms_generation(spark, tmp_path):
    """Doc-values updates write a NEW norms generation into an EXISTING
    segment dir (copy-on-write); the revision diff must still fetch it
    even though the segment's meta.json is already present on the
    replica — otherwise the published entry points at a norms_file the
    replica never copied and every replica search breaks."""
    from lucene_solr_1_spark.index import manifest as mf
    from lucene_solr_1_spark.index.docvalues import update_numeric_docvalue
    from lucene_solr_1_spark.search.query import Bool, NumericRange, Occur

    src, dst = str(tmp_path / "s4"), str(tmp_path / "d4")
    build_index(spark, spark.createDataFrame(_corpus(6, 20, "dv")), src,
                num_segments=2)
    replicate(src, dst)
    # dv update at the SOURCE: new norms-g<N>.parquet inside existing dirs
    update_numeric_docvalue(spark, src, term="en", field="n_chars",
                            value=10_000, term_field="lang")
    r = replicate(src, dst)
    assert r["status"] == "replicated"
    assert r["copied_segments"] >= 1  # the norms generations were fetched
    man = mf.read_manifest(dst)
    for s in man["segments"]:
        nf = s.get("norms_file")
        if nf:
            assert os.path.exists(
                os.path.join(mf.segment_dir(dst, s["segment_id"]), nf)
            )
    s = LuceneSparkSearcher(spark, dst)
    q = Bool.of(
        (Occur.MUST, Term("ant")),
        (Occur.FILTER, NumericRange("n_chars", 10_000, None)),
    )
    hits = s.search(q, k=100, with_stored=False)
    assert len(hits) > 0  # replica sees the updated doc-values
    assert _hits(spark, dst) == _hits(spark, src)  # ranking norms intact
