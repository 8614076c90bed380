"""Index splitting — IndexSplitter (whole segments per part) and
MultiPassIndexSplitter (all segments + complement deletes per part).
Contract: parts partition the LIVE document set exactly, are
independently searchable, and segments-mode round-trips through
addIndexes to the original rankings."""

import numpy as np
import pandas as pd
import pytest

from lucene_solr_1_spark.index import manifest as mf
from lucene_solr_1_spark.index.builder import add_indexes, build_index, split_index
from lucene_solr_1_spark.search.query import Bool, Occur, Term
from lucene_solr_1_spark.search.searcher import LuceneSparkSearcher


def _live_paths(spark, d):
    s = LuceneSparkSearcher(spark, d)
    h = s.search(Term("return"), k=10_000, with_stored=True)
    return set(h["path"].tolist())


def test_segments_split_partitions_and_roundtrip(spark, small_corpus_pdf,
                                                 tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx_sp"))
    m0 = build_index(spark, spark.createDataFrame(small_corpus_pdf), d,
                     num_segments=6)
    s0 = LuceneSparkSearcher(spark, d)
    q = Bool.of((Occur.MUST, Term("return")), (Occur.SHOULD, Term("class")))
    orig = s0.search(q, k=30, with_stored=True)
    orig_pairs = list(zip(orig["path"], orig["score"]))

    parts = [str(tmp_path_factory.mktemp(f"part{i}")) for i in range(3)]
    ms = split_index(d, parts, mode="segments")
    assert sum(m["doc_count"] for m in ms) == m0["doc_count"]
    assert {len(m["segments"]) for m in ms} == {2}
    # parts partition the matching docs exactly
    union, total = set(), 0
    for p in parts:
        got = _live_paths(spark, p)
        assert not (union & got)
        union |= got
        total += len(got)
    assert union == _live_paths(spark, d)

    # round-trip: part0 + addIndexes(part1, part2) == original rankings
    add_indexes(parts[0], parts[1], parts[2])
    s1 = LuceneSparkSearcher(spark, parts[0])
    back = s1.search(q, k=30, with_stored=True)
    assert list(zip(back["path"], back["score"])) == orig_pairs


def test_docs_split_round_robin_and_sequential(spark, small_corpus_pdf,
                                               tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx_mp"))
    m0 = build_index(spark, spark.createDataFrame(small_corpus_pdf), d,
                     num_segments=4)
    all_paths = _live_paths(spark, d)

    for seq in (False, True):
        parts = [str(tmp_path_factory.mktemp(f"mp{seq}{i}")) for i in range(3)]
        split_index(d, parts, mode="docs", sequential=seq)
        union = set()
        sizes = []
        for p in parts:
            got = _live_paths(spark, p)
            assert not (union & got)
            union |= got
            sizes.append(len(got))
        assert union == all_paths
        # MultiPassIndexSplitter keeps stats Lucene-stale: doc_count
        # still reports the full segment counts until a reclaim merge
        mp = mf.read_manifest(parts[0])
        assert mp["doc_count"] == m0["doc_count"]
        # roughly even split of the matching docs
        assert max(sizes) - min(sizes) <= max(3, len(all_paths) // 2)

    # reclaim merge on one part compacts it to the live set only
    from lucene_solr_1_spark.index.check import check_index
    from lucene_solr_1_spark.index.merge import merge_down

    parts = [str(tmp_path_factory.mktemp(f"mprc{i}")) for i in range(3)]
    split_index(d, parts, mode="docs")
    before = _live_paths(spark, parts[1])
    full = mf.read_manifest(parts[1])["doc_count"]
    m = merge_down(spark, parts[1], target_segments=1, reclaim_deletes=True)
    # reclaim drops the complement: the part's stats now count ONLY its
    # own documents (a strict third of the original, give or take one)
    assert m["doc_count"] < full
    assert abs(m["doc_count"] - full / 3) <= 1
    assert _live_paths(spark, parts[1]) == before
    assert check_index(spark, parts[1])["errors"] == []


def test_split_errors(spark, tiny_corpus_pdf, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx_er"))
    build_index(spark, spark.createDataFrame(tiny_corpus_pdf), d, num_segments=2)
    with pytest.raises(ValueError):
        split_index(d, [str(tmp_path_factory.mktemp("x"))])  # n < 2
    with pytest.raises(ValueError):
        split_index(d, [str(tmp_path_factory.mktemp(f"y{i}")) for i in range(3)],
                    mode="segments")  # 2 segments / 3 parts -> empty part
    with pytest.raises(ValueError):
        split_index(d, [str(tmp_path_factory.mktemp(f"z{i}")) for i in range(2)],
                    mode="nope")
