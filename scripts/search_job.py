"""spark-submit entry point: query an index built by index_job.py.

    spark-submit --py-files dist/lucene_solr_1_spark.zip scripts/search_job.py \
        --index <index-dir> --query 'body:"inverted index" AND spark' \
        [--k 10] [--no-wand] [--explain-top]

Multiple --query flags run as ONE batch job (search_many). Prints one JSON
line per query with ranked hits (stored keys + float32 BM25 scores).
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--query", action="append", required=True)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--no-wand", action="store_true")
    ap.add_argument("--explain-top", action="store_true")
    args = ap.parse_args()

    from lucene_solr_1_spark.search.parser import parse
    from lucene_solr_1_spark.search.searcher import LuceneSparkSearcher

    spark = SparkSession.builder.appName("lucene-solr-1-spark-search").getOrCreate()
    s = LuceneSparkSearcher(spark, args.index)
    use_wand = not args.no_wand

    if len(args.query) > 1:
        batch = {f"q{i}": parse(text) for i, text in enumerate(args.query)}
        hits = s.search_many(batch, k=args.k, use_wand=use_wand)
        for i, text in enumerate(args.query):
            h = hits[hits["query"] == f"q{i}"]
            print(json.dumps({
                "query": text,
                "hits": [
                    {"global_doc_id": int(r.global_doc_id), "score": float(r.score)}
                    for r in h.itertuples(index=False)
                ],
            }))
        return

    text = args.query[0]
    q = parse(text)
    hits = s.search(q, k=args.k, use_wand=use_wand)
    out = {
        "query": text,
        "total_hits": int(hits.attrs["total_hits"]),
        "relation": hits.attrs["relation"],
        "hits": [
            {
                "rank": int(r.rank),
                "score": float(r.score),
                "global_doc_id": int(r.global_doc_id),
                **{f: getattr(r, f) for f in ("repo", "path", "commit") if hasattr(r, f)},
            }
            for r in hits.itertuples(index=False)
        ],
    }
    if args.explain_top and len(hits):
        out["explain_top"] = s.explain(q, int(hits["global_doc_id"].iloc[0]))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
