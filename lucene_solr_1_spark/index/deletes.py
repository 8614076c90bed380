"""Deletes as tombstones — the live-docs analog (SURVEY.md §2.1:
codecs/lucene50/Lucene50LiveDocsFormat.java, index/ReadersAndUpdates.java).

A delete never rewrites segment files: matching (segment_id, doc_id) pairs
are appended as a tombstone parquet file under <index>/deletes/, and a new
manifest generation lists the live tombstone files — same two-phase commit
as segment publication (file durable first, manifest rename second).
Searchers mask tombstoned docs in the scoring kernel; global stats
(docFreq, sumTTF) intentionally still include deleted docs until a merge
reclaims them, matching Lucene (deleted docs affect stats until merge).

Scale note: tombstones are tiny relative to the index (ids only) and are
broadcast to the scoring kernels with the query plan; a 100 TB index with
heavy churn would compact them at merge time (merge.py drops them when the
merged segment is rewritten — future work, documented in the manifest).
"""

from __future__ import annotations

import os
import uuid

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql import SparkSession, functions as F

from . import manifest as mf
from .builder import postings_paths


def _deletes_dir(index_dir: str) -> str:
    d = os.path.join(index_dir, "deletes")
    os.makedirs(d, exist_ok=True)
    return d


def read_tombstones(index_dir: str, manifest: dict) -> dict[str, np.ndarray]:
    """{segment_id: sorted np.int64 array of deleted local docIDs}."""
    out: dict[str, np.ndarray] = {}
    for rel in manifest.get("tombstone_files", []):
        pdf = pq.read_table(os.path.join(index_dir, rel)).to_pandas()
        for sid, grp in pdf.groupby("segment_id"):
            prev = out.get(sid)
            ids = grp["doc_id"].to_numpy(dtype=np.int64)
            out[sid] = ids if prev is None else np.concatenate((prev, ids))
    return {sid: np.unique(ids) for sid, ids in out.items()}


def _publish(index_dir: str, manifest: dict, pairs: pd.DataFrame, reason: str) -> dict:
    if len(pairs) == 0:
        return manifest
    _deletes_dir(index_dir)
    rel = os.path.join("deletes", f"del-{uuid.uuid4().hex}.parquet")
    pq.write_table(
        pa.Table.from_pandas(pairs[["segment_id", "doc_id"]], preserve_index=False),
        os.path.join(index_dir, rel),
    )
    files = list(manifest.get("tombstone_files", [])) + [rel]
    return mf.commit_manifest(
        index_dir,
        [dict(s) for s in manifest["segments"]],
        extra={"tombstone_files": files, "delete_reason": reason},
    )


def pairs_for_terms(
    spark: SparkSession, index_dir: str, manifest: dict, field: str,
    terms: tuple,
) -> pd.DataFrame:
    """(segment_id, doc_id) pairs of every doc whose `field` contains any
    of `terms` — the postings-decode half of deleteDocuments(Term...).
    Distributed: the terms' posting rows (pruned by parquet predicate
    pushdown) are decoded in an Arrow UDF; only the matched doc lists
    come back to the driver (the tombstone set)."""
    post = spark.read.parquet(*postings_paths(index_dir, manifest))

    def _decode(batches):
        from ..kernels.forcodec import decode_all

        for pdf in batches:
            for r in pdf.itertuples(index=False):
                docs = np.cumsum(
                    decode_all(bytes(r.docs_enc), np.asarray(r.docs_offsets))
                )
                yield pd.DataFrame({"segment_id": r.segment_id, "doc_id": docs})

    return (
        post.where((F.col("field") == field) & (F.col("term").isin(list(terms))))
        .mapInPandas(_decode, schema="segment_id string, doc_id bigint")
        .toPandas()
        .drop_duplicates()
    )


def delete_by_term(
    spark: SparkSession, index_dir: str, term: str, field: str = "content"
) -> dict:
    """IndexWriter.deleteDocuments(Term): tombstone every doc whose `field`
    contains `term`."""
    manifest = mf.read_manifest(index_dir)
    pairs = pairs_for_terms(spark, index_dir, manifest, field, (term,))
    return _publish(index_dir, manifest, pairs, f"term:{term}")


def delete_by_doc_ids(index_dir: str, pairs: pd.DataFrame) -> dict:
    """Tombstone explicit (segment_id, doc_id) pairs (tests / upstream joins)."""
    manifest = mf.read_manifest(index_dir)
    return _publish(index_dir, manifest, pairs, "explicit")


def live_doc_count(index_dir: str) -> int:
    manifest = mf.read_manifest(index_dir)
    dels = read_tombstones(index_dir, manifest)
    return manifest["doc_count"] - sum(len(v) for v in dels.values())


def delete_by_query(spark: SparkSession, index_dir: str, q) -> dict:
    """IndexWriter.deleteDocuments(Query...) (index/IndexWriter.java
    deleteDocuments(Query) — "Deletes the document(s) matching any of the
    provided queries"): tombstone the query's FULL match set. The set is
    collected through the searcher's exhaustive path with scoring intact
    (k = maxDoc, like DocumentsWriterDeleteQueue resolving a query
    delete against every segment); only (segment_id, doc_id) pairs reach
    the driver."""
    manifest = mf.read_manifest(index_dir)
    from ..search.searcher import LuceneSparkSearcher

    s = LuceneSparkSearcher(spark, index_dir)
    hits = s.search(
        q, k=int(manifest["doc_count"]), use_wand=False, with_stored=False
    )
    pairs = hits[["segment_id", "doc_id"]].drop_duplicates()
    return _publish(index_dir, manifest, pairs, f"query:{q!r}"[:200])
