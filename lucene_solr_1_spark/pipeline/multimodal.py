"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched mapInPandas.

The Spark-side plumbing (schema, batch shape, partitioning, UDF signature)
is real and tested; the actual media decode is STUBBED (no image/audio libs
in this container): `decode_image` raises NotImplementedError, and the
pipeline uses `fake_decode` — a deterministic stand-in that derives feature
values from the bytes so results are oracle-checkable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sql.relational import load_documents

PAYLOAD_SCHEMA = "doc_id bigint, payload binary, media_type string, n_bytes bigint"
FEATURE_SCHEMA = "doc_id bigint, n_bytes bigint, sha string, feat array<double>"


def decode_image(payload: bytes) -> np.ndarray:
    """Real decode hook — requires an image library not present here."""
    raise NotImplementedError(
        "media decode requires PIL/libvips/ffmpeg — not available in this "
        "environment; pipeline uses fake_decode for plumbing tests"
    )


def fake_decode(payload: bytes, dim: int = 8) -> np.ndarray:
    """Deterministic stand-in: derive `dim` doubles from the byte content."""
    h = hashlib.sha256(payload).digest()
    return (
        np.frombuffer(h[: dim * 4], dtype=np.uint32).astype(np.float64)
        / np.float64(2**32)
    )


def binary_payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attach an opaque binary payload column (here: the utf-8 bytes of the
    text stand in for media bytes) with typed metadata."""
    docs = load_documents(spark, sf_dir)
    return docs.select(
        F.col("doc_id").cast("bigint"),
        F.encode("text", "utf-8").alias("payload"),
        F.lit("image/fake").alias("media_type"),
        F.octet_length(F.encode("text", "utf-8")).cast("bigint").alias("n_bytes"),
    )


def extract_features(payloads: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads — the real
    plumbing for decode/resize/frame-sample at 100 TB (one batch of bytes
    per Arrow chunk, no per-row Python at the Spark level)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads_np = pdf["payload"]
            feats = [fake_decode(bytes(p)).tolist() for p in payloads_np]
            shas = [hashlib.sha256(bytes(p)).hexdigest() for p in payloads_np]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["n_bytes"],
                    "sha": shas,
                    "feat": feats,
                }
            )

    return payloads.mapInPandas(run, schema=FEATURE_SCHEMA)


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """Real resize hook — requires an image library not present here."""
    raise NotImplementedError(
        "image resize requires PIL/libvips — not available in this "
        "environment; pipeline uses fake_resize for plumbing tests"
    )


def fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in: width*height bytes derived from the
    payload digest (cycled) — same output shape a real resize-to-raw
    would produce, so downstream batch plumbing is exercised for real."""
    h = hashlib.sha256(payload + bytes([width & 0xFF, height & 0xFF])).digest()
    n = width * height
    reps = -(-n // len(h))
    return (h * reps)[:n]


def frame_sample(payload: bytes, n_frames: int) -> list[bytes]:
    """Deterministic frame sampler stand-in (video decode stub): cuts the
    payload into n_frames evenly-spaced windows — the per-frame fan-out
    shape a real ffmpeg sampler produces."""
    if not payload:
        return []
    size = max(1, len(payload) // max(n_frames, 1))
    return [payload[i * size:(i + 1) * size] or payload[-size:] for i in range(n_frames)]


FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame binary, frame_bytes bigint"


def sample_frames(payloads: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame-sampling fan-out as Arrow-batched mapInPandas: each media row
    explodes to n_frames (doc_id, frame_idx, frame) rows — the 100 TB
    shape for per-frame feature extraction (frames repartition freely
    downstream; no per-row Python at the Spark level)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_doc, out_idx, out_frame = [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                for i, fr in enumerate(frame_sample(bytes(p), n_frames)):
                    out_doc.append(doc_id)
                    out_idx.append(i)
                    out_frame.append(fr)
            yield pd.DataFrame(
                {
                    "doc_id": out_doc,
                    "frame_idx": out_idx,
                    "frame": out_frame,
                    "frame_bytes": [len(f) for f in out_frame],
                }
            )

    return payloads.mapInPandas(run, schema=FRAME_SCHEMA)


def multimodal_features_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checkable projection of the feature table (byte length + sha —
    values DuckDB can recompute from the text)."""
    feats = extract_features(binary_payloads(spark, sf_dir))
    return feats.select("doc_id", "n_bytes", "sha").orderBy("doc_id")


def multimodal_features_duck() -> str:
    return (
        "SELECT doc_id::BIGINT AS doc_id, "
        "octet_length(encode(text))::BIGINT AS n_bytes, "
        "sha256(text) AS sha FROM documents ORDER BY 1"
    )
