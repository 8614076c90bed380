"""Tiered merge tests: stats preserved, top-k invariant, docIDs stable
(FIXTURES.md §5 merge invariance; SegmentMerger/TieredMergePolicy analogs)."""

import numpy as np

from lucene_solr_1_spark.index import manifest as mf
from lucene_solr_1_spark.index.builder import build_index
from lucene_solr_1_spark.index.merge import find_merges, merge_down, merge_once
from lucene_solr_1_spark.search.query import Bool, Occur, Phrase, SpanNear, Term
from lucene_solr_1_spark.search.searcher import LuceneSparkSearcher


def test_find_merges_policy():
    manifest = {
        "segments": [
            {"segment_id": f"s{i}", "partition_id": i, "doc_count": 10}
            for i in range(25)
        ]
    }
    groups = find_merges(manifest, target_segments=10)
    merged_away = sum(len(g) - 1 for g in groups)
    assert 25 - merged_away <= 10
    for g in groups:
        assert 2 <= len(g) <= 10
    # groups must be contiguous in partition order and disjoint
    seen = set()
    for g in groups:
        ids = sorted(int(s[1:]) for s in g)
        assert ids == list(range(ids[0], ids[-1] + 1))
        assert not (set(ids) & seen)
        seen |= set(ids)


def test_merge_preserves_results(spark, small_corpus_pdf, tmp_path_factory):
    df = spark.createDataFrame(small_corpus_pdf)
    d = str(tmp_path_factory.mktemp("idx_m"))
    m0 = build_index(spark, df, d, num_segments=8)
    s0 = LuceneSparkSearcher(spark, d)
    queries = [
        Term("return"),
        Bool.of((Occur.MUST, Term("return")), (Occur.SHOULD, Term("class")),
                (Occur.MUST_NOT, Term("id_0003"))),
        Phrase(("beta", "gamma")),
        # multi-field + positional invariants through the bucketed merge:
        # keyword postings and re-encoded position streams must survive
        Term("python", field="lang"),
        Bool.of((Occur.MUST, Term("return")),
                (Occur.FILTER, Term("java", field="lang"))),
        SpanNear(("public", "static"), slop=3),
    ]
    before = [s0.search(q, k=20, with_stored=False) for q in queries]

    m1 = merge_down(spark, d, target_segments=2)
    assert len(m1["segments"]) <= 2
    assert m1["doc_count"] == m0["doc_count"]
    assert m1["sum_ttf"] == m0["sum_ttf"]

    s1 = LuceneSparkSearcher(spark, d)
    after = [s1.search(q, k=20, with_stored=False) for q in queries]
    for b, a in zip(before, after):
        # global docIDs and float32 scores must be bit-identical post-merge
        np.testing.assert_array_equal(
            b["global_doc_id"].to_numpy(), a["global_doc_id"].to_numpy()
        )
        np.testing.assert_array_equal(b["score"].to_numpy(), a["score"].to_numpy())
        assert b.attrs["total_hits"] == a.attrs["total_hits"]

    # WAND still equals exhaustive on the merged (multi-block) index
    aw = s1.search(Term("return"), k=15, use_wand=True, with_stored=False)
    ae = s1.search(Term("return"), k=15, use_wand=False, with_stored=False)
    np.testing.assert_array_equal(
        aw["global_doc_id"].to_numpy(), ae["global_doc_id"].to_numpy()
    )
    np.testing.assert_array_equal(aw["score"].to_numpy(), ae["score"].to_numpy())


def test_merge_global_df_consistent(spark, small_corpus_pdf, tmp_path_factory):
    df = spark.createDataFrame(small_corpus_pdf)
    d = str(tmp_path_factory.mktemp("idx_df"))
    build_index(spark, df, d, num_segments=8)
    s0 = LuceneSparkSearcher(spark, d)
    keys = {("content", t) for t in ("return", "class", "id_0001")}
    df_before = s0._global_df(keys)
    merge_down(spark, d, target_segments=1)
    s1 = LuceneSparkSearcher(spark, d)
    assert len(s1.manifest["segments"]) == 1
    assert s1._global_df(keys) == df_before


def test_concurrent_merge_matches_sequential(spark, tmp_path_factory):
    """merge_down(concurrent=True) — the ConcurrentMergeScheduler analog —
    produces the same live set, stats and rankings as sequential merging."""
    from lucene_solr_1_spark.corpus import make_corpus_pandas
    from lucene_solr_1_spark.index.check import check_index
    from lucene_solr_1_spark.search.query import Term
    from lucene_solr_1_spark.search.searcher import LuceneSparkSearcher

    pdf = make_corpus_pandas(300)
    outs = []
    for conc in (False, True):
        d = str(tmp_path_factory.mktemp(f"idx_cm_{conc}"))
        build_index(spark, spark.createDataFrame(pdf), d, num_segments=16)
        m = merge_down(spark, d, target_segments=4, concurrent=conc)
        assert len(m["segments"]) <= 4
        assert check_index(spark, d)["errors"] == []
        s = LuceneSparkSearcher(spark, d)
        h = s.search(Term("return"), k=20, with_stored=False)
        outs.append(
            (m["doc_count"], m["sum_ttf"],
             h["global_doc_id"].tolist(), h["score"].tolist())
        )
    assert outs[0] == outs[1]

def test_merge_bucket_matches_contract(spark, small_corpus_pdf, tmp_path_factory):
    """The vectorized slice walker (_merge_bucket → _merge_term_slice) must
    be row-identical to the pinned per-group contract (_merge_term_rows) —
    including the singleton fast path (stream pass-through + doc rebase)
    and reclaim mode (tombstone masking)."""
    import pandas as pd
    import pyarrow.dataset as ds

    from lucene_solr_1_spark.index import merge as M
    from lucene_solr_1_spark.index.builder import _POSTINGS_FILE
    from lucene_solr_1_spark.index.segment import POSTINGS_COLS

    df = spark.createDataFrame(small_corpus_pdf)
    d = str(tmp_path_factory.mktemp("idx_bk"))
    m = build_index(spark, df, d, num_segments=6)
    segs = sorted(m["segments"], key=lambda s: s["partition_id"])
    frames = []
    for s in segs:
        p = f"{mf.segment_dir(d, s['segment_id'])}/{_POSTINGS_FILE}"
        f = ds.dataset(p).to_table().to_pandas()
        f["segment_id"] = s["segment_id"]
        frames.append(f)
    pdf = pd.concat(frames, ignore_index=True)
    seg_order = {s["segment_id"]: i for i, s in enumerate(segs)}
    offsets, base = {}, 0
    for s in segs:
        offsets[s["segment_id"]] = base
        base += s["doc_count"]
    rng = np.random.default_rng(7)
    docmaps = {}
    cbase = 0
    for s in segs:
        n = s["doc_count"]
        keep = rng.random(n) > 0.2
        mm = np.full(n, -1, dtype=np.int64)
        mm[np.flatnonzero(keep)] = cbase + np.arange(int(keep.sum()))
        docmaps[s["segment_id"]] = mm
        cbase += int(keep.sum())

    for maps in (None, docmaps):
        contract = pd.DataFrame(
            [M._merge_term_rows(g, seg_order, offsets, maps)
             for _, g in pdf.groupby(["field", "term"], sort=False)],
            columns=POSTINGS_COLS,
        )
        fast = M._merge_bucket(pdf, seg_order, offsets, maps)
        key = ["field", "term"]
        contract = contract.sort_values(key, ignore_index=True)
        fast = fast.sort_values(key, ignore_index=True)
        assert len(contract) == len(fast)
        for c in POSTINGS_COLS:
            a, b = contract[c].tolist(), fast[c].tolist()
            assert a == b, f"column {c} diverges"
