"""Sequence packing (concat-and-chunk placement map): pandas reference
on sf0.001 + invariants — offsets tile each bucket's stream exactly,
sequence spans follow from integer division, stats reconcile."""

import re

import pandas as pd

from lucene_solr_1_spark.pipeline import packing as P
from lucene_solr_1_spark.sql.relational import load_documents

SF = "/root/testdata/sf0.001"
SEQ = 128
B = 4


def _ref(spark) -> pd.DataFrame:
    docs = load_documents(spark, SF).toPandas()[["doc_id", "text"]]
    docs["n_tokens"] = docs["text"].map(
        lambda t: len(re.findall(r"[a-z0-9_]+", t.lower()))
    )
    docs["bucket"] = docs["doc_id"] % B
    docs = docs.sort_values("doc_id").reset_index(drop=True)
    docs["stream_offset"] = (
        docs.groupby("bucket")["n_tokens"].cumsum() - docs["n_tokens"]
    )
    return docs


def test_pack_sequences_reference(spark):
    got = P.pack_sequences_spark(spark, SF, seq_len=SEQ, n_buckets=B).toPandas()
    ref = _ref(spark)
    m = got.merge(ref, on="doc_id", suffixes=("", "_ref"))
    assert (m["bucket"] == m["bucket_ref"]).all()
    assert (m["stream_offset"] == m["stream_offset_ref"]).all()
    assert (m["n_tokens"] == m["n_tokens_ref"]).all()
    assert (m["first_seq"] == m["stream_offset"] // SEQ).all()
    nz = m["n_tokens"] > 0
    assert (
        m.loc[nz, "last_seq"]
        == (m.loc[nz, "stream_offset"] + m.loc[nz, "n_tokens"] - 1) // SEQ
    ).all()


def test_pack_offsets_tile_streams(spark):
    """Within a bucket, each doc starts exactly where the previous one
    ended — the concatenation places every token exactly once."""
    got = (
        P.pack_sequences_spark(spark, SF, seq_len=SEQ, n_buckets=B)
        .toPandas()
        .sort_values(["bucket", "stream_offset"])
    )
    for _, g in got.groupby("bucket"):
        ends = (g["stream_offset"] + g["n_tokens"]).to_numpy()
        assert g["stream_offset"].iloc[0] == 0
        assert (g["stream_offset"].to_numpy()[1:] == ends[:-1]).all()


def test_packing_stats_reconcile(spark):
    placed = P.pack_sequences_spark(spark, SF, seq_len=SEQ, n_buckets=B).toPandas()
    stats = P.packing_stats_spark(spark, SF, seq_len=SEQ, n_buckets=B).toPandas()
    per_bucket = placed.groupby("bucket")["n_tokens"].sum()
    for _, r in stats.iterrows():
        tot = per_bucket[r["bucket"]]
        assert r["total_tokens"] == tot
        assert r["full_seqs"] == tot // SEQ
        assert r["tail_tokens"] == tot % SEQ
