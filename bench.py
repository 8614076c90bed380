"""Headline benchmark (driver contract).

Runs at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Workload = the two halves of the north rule:
  1. index-build throughput: build a full inverted index (segments, FOR
     blocks, impacts, norms, manifest) over the deterministic synthetic
     source-code corpus (corpus.py — per-index seeded, so the corpus is
     identical at any parallelism), reporting files/sec;
  2. BM25 top-k latency: block-max-WAND kernel queries over that index plus
     the relational/Catalyst path and training-data pipeline ops over the
     sf documents/embeddings tables.

`python bench.py --scaling` additionally runs the SAME index build at
local[8] and local[32] and reports throughput at both plus scaling
efficiency ((t8/t32)/4) — the sandbox stand-in for the north rule's
N -> 4N executor criterion (no real cluster available here).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

N_REPOS = 50


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.removeprefix("sf"))
    except ValueError:
        return 0.1


def _spark(cpus: int):
    from lucene_solr_1_spark.session import get_spark

    return get_spark(
        app_name=f"bench-local{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
    )


def _build(spark, n_files: int, num_segments: int) -> tuple[float, str]:
    from lucene_solr_1_spark.corpus import corpus_spark_df
    from lucene_solr_1_spark.index.builder import build_index

    corpus = corpus_spark_df(spark, n_files, n_repos=N_REPOS, partitions=num_segments)
    index_dir = tempfile.mkdtemp(prefix="sgbench_idx_")
    t0 = time.monotonic()
    build_index(spark, corpus, index_dir, num_segments=num_segments)
    return time.monotonic() - t0, index_dir


def _timed(fn) -> float:
    t0 = time.monotonic()
    fn()
    return time.monotonic() - t0


def run_bench(sf_dir: str, cpus: int, n_files: int) -> dict:
    from lucene_solr_1_spark.pipeline import dedup, similarity, textstats
    from lucene_solr_1_spark.search.query import Bool, Occur, Prefix, Term
    from lucene_solr_1_spark.search.searcher import LuceneSparkSearcher
    from lucene_solr_1_spark.sql import relational as R

    spark = _spark(cpus)
    queries: dict[str, float] = {}

    build_s, index_dir = _build(spark, n_files, num_segments=cpus)
    queries["index_build"] = build_s
    try:
        searcher = LuceneSparkSearcher(spark, index_dir)
        # warm the JVM/Arrow path once; not counted
        searcher.search(Term("return"), k=10, with_stored=False)

        kernel_qs = {
            "wand_term_hot": Term("return"),
            "wand_term_tail": Term("id_2500"),
            "wand_bool_and": Bool.of(
                (Occur.MUST, Term("return")), (Occur.MUST, Term("class"))
            ),
            "wand_bool_or": Bool.of(
                (Occur.SHOULD, Term("public")),
                (Occur.SHOULD, Term("static")),
                (Occur.SHOULD, Term("void")),
            ),
            "prefix_expand": Prefix("id_1"),
        }
        for name, q in kernel_qs.items():
            queries[name] = _timed(
                lambda q=q: searcher.search(q, k=10, with_stored=False)
            )
    finally:
        shutil.rmtree(index_dir, ignore_errors=True)

    # relational/Catalyst path + pipeline ops over the sf tables
    queries["rel_bm25_bool"] = _timed(
        lambda: R.bm25_bool_spark(
            spark, sf_dir, must=("data",), should=("query", "merge"), k=10
        ).collect()
    )
    queries["rel_phrase"] = _timed(
        lambda: R.phrase_match_spark(spark, sf_dir, "fast", "sort").collect()
    )
    queries["dedup_minhash"] = _timed(
        lambda: dedup.minhash_bands_spark(spark, sf_dir).collect()
    )
    queries["ann_cosine_topk"] = _timed(
        lambda: similarity.cosine_topk_spark(spark, sf_dir, 0, 20).collect()
    )
    queries["quality_score"] = _timed(
        lambda: textstats.quality_score_spark(spark, sf_dir).collect()
    )

    total = sum(queries.values())
    return {
        "metric": "index_build_plus_bm25_topk_e2e",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in queries.items()},
        "sf": _sf_of(sf_dir),
        "cpus": cpus,
        "corpus_files": n_files,
        "index_files_per_sec": round(n_files / build_s, 1),
    }


def run_scaling(n_files: int) -> dict:
    """Same deterministic corpus + build at two parallelism levels."""
    out = {}
    for cpus in (8, 32):
        spark = _spark(cpus)
        build_s, index_dir = _build(spark, n_files, num_segments=cpus)
        shutil.rmtree(index_dir, ignore_errors=True)
        out[f"local[{cpus}]"] = {
            "build_sec": round(build_s, 3),
            "files_per_sec": round(n_files / build_s, 1),
        }
        spark.stop()
    t8 = out["local[8]"]["build_sec"]
    t32 = out["local[32]"]["build_sec"]
    out["scaling_efficiency_8_to_32"] = round((t8 / t32) / 4.0, 3)
    out["corpus_files"] = n_files
    return out


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_files = int(os.environ.get("SPARK_GRAFT_BENCH_FILES", "20000"))
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling(n_files)))
        return
    print(json.dumps(run_bench(sf_dir, cpus, n_files)))


if __name__ == "__main__":
    main()
