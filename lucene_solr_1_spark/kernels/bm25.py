"""BM25 scoring — float32 op-order-exact NumPy port of the reference's
BM25Similarity (this fork drops the (k1+1) numerator, LUCENE-8563).

Reference: /root/reference/lucene/core/src/java/org/apache/lucene/search/
similarities/BM25Similarity.java
  - idf        :104-107   (float) log(1 + (N - n + 0.5)/(n + 0.5))
  - avgdl      :114-117   (float)(sumTotalTermFreq / (double) docCount)
  - cache      :184-193   float32: k1 * ((1 - b) + b * LENGTH_TABLE[i] / avgdl)
  - score      :222-226   weight * (float)(freq / (freq + (double) cache[norm]))
  - multi-term idf summed in double then cast to float  :172-180
"""

from __future__ import annotations

import numpy as np

from .smallfloat import LENGTH_TABLE

K1_DEFAULT = 1.2
B_DEFAULT = 0.75

F32 = np.float32


def idf(doc_freq, doc_count) -> np.float32:
    """(float) Math.log(1 + (docCount - docFreq + 0.5)/(docFreq + 0.5))."""
    df = np.asarray(doc_freq, dtype=np.float64)
    n = float(doc_count)
    return np.log1p((n - df + 0.5) / (df + 0.5)).astype(F32)


def avg_field_length(sum_total_term_freq: int, doc_count: int) -> np.float32:
    """(float)(sumTotalTermFreq / (double) docCount)."""
    return F32(float(sum_total_term_freq) / float(doc_count))


def norm_cache(avgdl: np.float32, k1: float = K1_DEFAULT, b: float = B_DEFAULT) -> np.ndarray:
    """256-entry float32 cache: k1 * ((1 - b) + b * LENGTH_TABLE[i] / avgdl).

    Every intermediate is float32, same op order as the JVM expression.
    """
    k1f, bf = F32(k1), F32(b)
    return (k1f * ((F32(1) - bf) + bf * LENGTH_TABLE / F32(avgdl))).astype(F32)


def term_weight(idf_value: np.float32, boost: float = 1.0) -> np.float32:
    """weight = boost * idf (float32)."""
    return F32(F32(boost) * F32(idf_value))


def synonym_idf(idfs) -> np.float32:
    """Multi-term idf: per-term float32 idfs summed in double, cast to float
    (BM25Similarity.java:172-180)."""
    return F32(np.sum(np.asarray(idfs, dtype=np.float32).astype(np.float64)))


def score(freq, norm_bytes, weight: np.float32, cache: np.ndarray) -> np.ndarray:
    """weight * (float)(freq / (freq + norm)) with norm = (double) cache[b].

    `freq` int array (term frequency), `norm_bytes` uint8 array. The JVM
    promotes float freq and the float32 cache entry to double, divides in
    double, casts to float, multiplies by float weight — reproduced exactly.
    """
    freq_d = np.asarray(freq).astype(F32).astype(np.float64)
    norm_d = cache[np.asarray(norm_bytes, dtype=np.int64) & 0xFF].astype(np.float64)
    return (F32(weight) * (freq_d / (freq_d + norm_d)).astype(F32)).astype(F32)


def max_score(weight: np.float32) -> np.float32:
    """Upper bound: freq/(freq+norm) < 1 ⇒ score < weight (used for WAND)."""
    return F32(weight)


def score_pairs_max(freqs, norms, weight: np.float32, cache: np.ndarray) -> np.float32:
    """Max BM25 score over competitive (freq, norm) impact pairs — the
    per-block upper bound used by block-max WAND (MaxScoreCache.java:61-124)."""
    if len(freqs) == 0:
        return F32(0)
    return F32(np.max(score(np.asarray(freqs), np.asarray(norms), weight, cache)))
