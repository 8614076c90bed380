"""Pluggable per-term similarities beyond BM25 — float32 op-order-exact
NumPy ports of the reference's classic and language-model scorers.

All four share the index's unified norm encoding (SmallFloat intToByte4
of the field length — the same byte the BM25 path reads), so ONE index
serves every similarity; only query-time scoring changes. That mirrors
the reference, where computeNorm is identical across TFIDFSimilarity /
SimilarityBase / BM25Similarity (all encode the length with
SmallFloat.intToByte4).

References (public Lucene source, /root/reference/lucene/core/src/java/
org/apache/lucene/search/similarities/):
- ClassicSimilarity.java:38-64 — tf = (float)sqrt(freq); idf =
  (float)(log((docCount+1)/(double)(docFreq+1)) + 1.0); lengthNorm =
  (float)(1.0/sqrt(numTerms)).
- TFIDFSimilarity.java:515-552 — normTable[i] =
  lengthNorm(byte4ToInt(i)), normTable[0] = 1f/normTable[255];
  queryWeight = boost * idf (float); score = (tf(freq) * queryWeight)
  * normTable[norm & 0xFF] (all float ops).
- LMSimilarity.java:148-156 — DefaultCollectionModel p(w|C) =
  (totalTermFreq + 1) / (numberOfFieldTokens + 1) in double.
- LMDirichletSimilarity.java:73-77 — score = boost * (log(1 + freq /
  (mu * p)) + log(mu / (docLen + mu))) in double, clamped at 0.
- LMJelinekMercerSimilarity.java:63-68 — score = boost * log(1 +
  ((1 - lambda) * freq / docLen) / (lambda * p)) in double (no clamp).
- SimilarityBase.java:177-181,222-229 — docLen = (double) float
  LENGTH_TABLE[norm & 0xFF]; final (float) cast on the double score.
- BooleanSimilarity.java:47-61 — score = boost, norms ignored.

Multi-term weights (synonym/phrase) follow TFIDFSimilarity.idfExplain
(per-term float idfs summed in double, cast float) — the same shape as
bm25.synonym_idf. The language models score single-term stats only
(SimilarityBase builds one BasicStats per term); phrase/synonym under
LM sims is rejected at compile time.
"""

from __future__ import annotations

import numpy as np

from .smallfloat import LENGTH_TABLE

F32 = np.float32
F64 = np.float64

LMD_MU_DEFAULT = 2000.0
LMJM_LAMBDA_DEFAULT = 0.1

# TFIDFSimilarity.scorer normTable: lengthNorm of the decoded byte4
# length, computed as (float)(1.0/sqrt(length)); slot 0 (length 0 —
# docs whose field produced no tokens) is defined as 1f/normTable[255].
with np.errstate(divide="ignore"):
    CLASSIC_NORM_TABLE = (1.0 / np.sqrt(LENGTH_TABLE.astype(F64))).astype(F32)
CLASSIC_NORM_TABLE[0] = F32(1.0) / CLASSIC_NORM_TABLE[255]


def classic_idf(doc_freq: int, doc_count: int) -> np.float32:
    """(float)(Math.log((docCount+1)/(double)(docFreq+1)) + 1.0)."""
    return F32(np.log(F64(doc_count + 1) / F64(doc_freq + 1)) + 1.0)


def classic_idf_sum(idfs) -> np.float32:
    """Multi-term idf: float idfs summed in double, cast float
    (TFIDFSimilarity.idfExplain over TermStatistics...)."""
    return F32(np.sum(np.asarray(idfs, dtype=F32).astype(F64)))


def classic_query_weight(idf_value: np.float32, boost: float = 1.0) -> np.float32:
    """queryWeight = boost * idf (TFIDFScorer ctor, float multiply)."""
    return F32(F32(boost) * F32(idf_value))


def classic_score(freqs, norm_bytes, qw: np.float32) -> np.ndarray:
    """raw = (float)sqrt(freq) * queryWeight; raw * normTable[b] — every
    op float32, freq promoted float -> double only inside sqrt
    (TFIDFSimilarity.java:548-551, ClassicSimilarity.tf)."""
    tf = np.sqrt(np.asarray(freqs).astype(F32).astype(F64)).astype(F32)
    raw = (tf * F32(qw)).astype(F32)
    nt = CLASSIC_NORM_TABLE[np.asarray(norm_bytes, dtype=np.int64) & 0xFF]
    return (raw * nt).astype(F32)


def lm_collection_probability(ttf: int, sum_ttf: int) -> float:
    """DefaultCollectionModel: (ttf + 1D) / (numberOfFieldTokens + 1D)."""
    return (float(ttf) + 1.0) / (float(sum_ttf) + 1.0)


def lmd_score(freqs, norm_bytes, p: float, mu: float, boost: float) -> np.ndarray:
    """boost * (log(1 + freq/(mu*p)) + log(mu/(dl+mu))) in double,
    clamped at 0, cast float32. freq arrives as (float) freq promoted to
    double; docLen = (double) LENGTH_TABLE[b]; mu is a float parameter
    promoted to double (LMDirichletSimilarity.java:73-77)."""
    freq_d = np.asarray(freqs).astype(F32).astype(F64)
    dl_d = LENGTH_TABLE[np.asarray(norm_bytes, dtype=np.int64) & 0xFF].astype(F64)
    mu_d = F64(F32(mu))
    s = F64(F32(boost)) * (
        np.log(1.0 + freq_d / (mu_d * F64(p))) + np.log(mu_d / (dl_d + mu_d))
    )
    return np.where(s > 0.0, s, 0.0).astype(F32)


def lmjm_score(freqs, norm_bytes, p: float, lam: float, boost: float) -> np.ndarray:
    """boost * log(1 + ((1-lambda)*freq/docLen) / (lambda*p)) in double,
    cast float32. (1 - lambda) is computed in FLOAT first (lambda is a
    float field), then promoted (LMJelinekMercerSimilarity.java:63-68)."""
    freq_d = np.asarray(freqs).astype(F32).astype(F64)
    dl_d = LENGTH_TABLE[np.asarray(norm_bytes, dtype=np.int64) & 0xFF].astype(F64)
    lam_f = F32(lam)
    one_minus = F64(F32(1.0) - lam_f)
    s = F64(F32(boost)) * np.log(
        1.0 + (one_minus * freq_d / dl_d) / (F64(lam_f) * F64(p))
    )
    return s.astype(F32)


def score(spec: dict, freqs, norm_bytes) -> np.ndarray:
    """Dispatch a compiled per-node sim spec (kernel.compile_plan) to its
    scorer. Returns float32 scores aligned with the posting arrays."""
    name = spec["name"]
    if name == "classic":
        return classic_score(freqs, norm_bytes, spec["qw"])
    if name == "lmd":
        return lmd_score(freqs, norm_bytes, spec["p"], spec["mu"], spec["boost"])
    if name == "lmjm":
        return lmjm_score(freqs, norm_bytes, spec["p"], spec["lam"], spec["boost"])
    if name == "boolean":
        n = len(np.atleast_1d(np.asarray(freqs)))
        return np.full(n, F32(spec["boost"]), dtype=F32)
    raise ValueError(f"unknown similarity {name!r}")
