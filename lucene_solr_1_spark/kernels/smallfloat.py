"""SmallFloat norm encoding — NumPy port of Lucene's 4-bit float-like
integer compression used for per-document field-length norms.

Semantics match the reference exactly (bit-for-bit):
  /root/reference/lucene/core/src/java/org/apache/lucene/util/SmallFloat.java:101-169
  (longToInt4 / int4ToLong / intToByte4 / byte4ToInt)

A field length (token count) is compressed to ONE byte with 4 significant
bits; low values < NUM_FREE_VALUES are stored exactly. BM25 decodes via a
256-entry table (BM25Similarity.java:106-112).
"""

from __future__ import annotations

import numpy as np


def _num_bits(x: np.ndarray) -> np.ndarray:
    """Vectorized 64 - numberOfLeadingZeros(x) for non-negative int64."""
    v = x.astype(np.uint64)
    bits = np.zeros(v.shape, dtype=np.int64)
    for shift in (32, 16, 8, 4, 2, 1):
        m = v >= np.uint64(1 << shift)
        bits[m] += shift
        v = np.where(m, v >> np.uint64(shift), v)
    bits[x > 0] += 1
    return bits


def long_to_int4(i) -> np.ndarray:
    """Float-like encoding for positive longs preserving order, 4 significant
    bits (SmallFloat.java:101-120)."""
    i = np.atleast_1d(np.asarray(i, dtype=np.int64))
    if np.any(i < 0):
        raise ValueError("Only supports positive values")
    num_bits = _num_bits(i)
    shift = num_bits - 4
    normal = (
        ((i >> np.maximum(shift, 0)) & 0x07) | ((shift + 1) << 3)
    )
    return np.where(num_bits < 4, i, normal).astype(np.int64)


def int4_to_long(i) -> np.ndarray:
    """Inverse of long_to_int4 (SmallFloat.java:125-138)."""
    i = np.atleast_1d(np.asarray(i, dtype=np.int64))
    bits = i & 0x07
    shift = (i >> 3) - 1
    return np.where(shift == -1, bits, (bits | 0x08) << np.maximum(shift, 0))


MAX_INT4 = int(long_to_int4(np.int64(2**31 - 1))[0])
NUM_FREE_VALUES = 255 - MAX_INT4


def int_to_byte4(i) -> np.ndarray:
    """Encode a non-negative int to one byte (SmallFloat.java:147-156).

    Returns uint8 array. Low values < NUM_FREE_VALUES stored exactly.
    """
    i = np.atleast_1d(np.asarray(i, dtype=np.int64))
    if np.any(i < 0):
        raise ValueError("Only supports positive values")
    enc = np.where(
        i < NUM_FREE_VALUES,
        i,
        NUM_FREE_VALUES + long_to_int4(np.maximum(i - NUM_FREE_VALUES, 0)),
    )
    return enc.astype(np.uint8)


def byte4_to_int(b) -> np.ndarray:
    """Decode bytes written by int_to_byte4 (SmallFloat.java:161-169)."""
    i = np.atleast_1d(np.asarray(b, dtype=np.int64)) & 0xFF
    return np.where(
        i < NUM_FREE_VALUES,
        i,
        NUM_FREE_VALUES + int4_to_long(np.maximum(i - NUM_FREE_VALUES, 0)),
    ).astype(np.int64)


# BM25Similarity.LENGTH_TABLE equivalent: decoded length per norm byte.
LENGTH_TABLE = byte4_to_int(np.arange(256)).astype(np.float32)
