"""spark-submit entry point: build (or resume) an index over a corpus table.

    spark-submit --py-files dist/lucene_solr_1_spark.zip scripts/index_job.py \
        --corpus <parquet-or-iceberg-path> --index <index-dir> \
        [--segments 4096] [--merge-to 64] [--pre-partitioned]

Reads the corpus (columns repo, path, commit, lang, content), builds
segment postings/norms + manifest, optionally merges down, prints the
manifest summary as one JSON line. Safe to re-run: completed segments are
skipped via their per-partition checkpoints (resume semantics).
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True)
    ap.add_argument("--index", required=True)
    ap.add_argument("--segments", type=int, default=256)
    ap.add_argument("--merge-to", type=int, default=0)
    ap.add_argument("--pre-partitioned", action="store_true")
    ap.add_argument("--format", default="parquet")
    args = ap.parse_args()

    from lucene_solr_1_spark.index.builder import build_index
    from lucene_solr_1_spark.index.merge import merge_down

    spark = SparkSession.builder.appName("lucene-solr-1-spark-index").getOrCreate()
    corpus = spark.read.format(args.format).load(args.corpus)
    manifest = build_index(
        spark,
        corpus,
        args.index,
        num_segments=args.segments,
        pre_partitioned=args.pre_partitioned,
    )
    if args.merge_to:
        manifest = merge_down(spark, args.index, target_segments=args.merge_to)
    print(
        json.dumps(
            {
                "doc_count": manifest["doc_count"],
                "sum_ttf": manifest["sum_ttf"],
                "segments": len(manifest["segments"]),
                "generation": manifest["generation"],
                "reused_segments": sum(
                    1 for s in manifest["segments"] if s.get("reused")
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
