"""Pluggable per-term similarities beyond BM25 — float32 op-order-exact
NumPy ports of the reference's classic, boolean, language-model, DFR, IB
and DFI scorers.

All of them share the index's unified norm encoding (SmallFloat intToByte4
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
    if name == "sweetspot":
        return sweetspot_score(freqs, norm_bytes, spec["qw"], spec["table"],
                               spec["tf_base"], spec["tf_min"])
    if name == "lmd":
        return lmd_score(freqs, norm_bytes, spec["p"], spec["mu"], spec["boost"])
    if name == "lmjm":
        return lmjm_score(freqs, norm_bytes, spec["p"], spec["lam"], spec["boost"])
    if name == "boolean":
        n = len(np.atleast_1d(np.asarray(freqs)))
        return np.full(n, F32(spec["boost"]), dtype=F32)
    if name == "dfr_inl2":
        return dfr_inl2_score(freqs, norm_bytes, spec["df"], spec["dc"],
                              spec["avgfl"], spec["c"], spec["boost"])
    if name == "ib_ll":
        return ib_ll_score(freqs, norm_bytes, spec["lam"],
                           spec["avgfl"], spec["c"], spec["boost"])
    if name == "dfi":
        return dfi_score(freqs, norm_bytes, spec["ttf"], spec["sum_ttf"],
                         spec["boost"])
    if name == "f2exp":
        return f2exp_score(freqs, norm_bytes, spec["df"], spec["dc"],
                           spec["avgfl"], spec["s"], spec["k"], spec["boost"])
    if name == "multi":
        # MultiSimilarity.java:66-71: float sum accumulated PER STEP
        # (sum += sub.score(freq, norm) in float32)
        out = None
        for sub in spec["specs"]:
            sc = score(sub, freqs, norm_bytes).astype(F32)
            out = sc if out is None else (out + sc).astype(F32)
        return out
    raise ValueError(f"unknown similarity {name!r}")


# --------------------------------------------------------------------------
# DFR and IB (SimilarityBase framework, all-double, final float cast):
# - DFRSimilarity(BasicModelIn, AfterEffectL, NormalizationH2(c)) — the
#   "I(n)L2" model: tfn = freq * log2(1 + c*avgfl/dl)
#   (NormalizationH2.java:58-59), aeTimes1pTfn = 1 (AfterEffectL.java:32),
#   score = boost * A * (1 - 1/(1+tfn)) with
#   A = log2((N+1)/(n+0.5)) (BasicModelIn.java:33-44,
#   DFRSimilarity.java:110-113); log2(x) = log(x)/LOG_2
#   (SimilarityBase.java:47,202-204).
# - IBSimilarity(DistributionLL, LambdaDF, NormalizationH2(c)) — "LL-D2":
#   lambda = float((df+1)/(N+1)), nextDown'd off 1 (LambdaDF.java:32-38);
#   score = boost * -log(lambda/(tfn+lambda)) (DistributionLL.java:33-34,
#   IBSimilarity.java:99-105).
# avgfl = sumTotalTermFreq/(double)docCount (SimilarityBase.java:112);
# docLen = double(LENGTH_TABLE[norm&0xFF]) (SimilarityBase.java:222-228).
# --------------------------------------------------------------------------

LOG_2 = float(np.log(2.0))  # SimilarityBase.LOG_2 = Math.log(2)


def _h2_tfn(freqs, norm_bytes, avgfl: float, c: float) -> np.ndarray:
    """NormalizationH2: tf * log2(1 + c*avgfl/dl), all double; tf arrives
    as (float) freq promoted double, c is a float field promoted."""
    freq_d = np.asarray(freqs).astype(F32).astype(F64)
    dl_d = LENGTH_TABLE[np.asarray(norm_bytes, dtype=np.int64) & 0xFF].astype(F64)
    return freq_d * (np.log(1.0 + F64(F32(c)) * F64(avgfl) / dl_d) / LOG_2)


def dfr_inl2_score(freqs, norm_bytes, df: int, dc: int,
                   avgfl: float, c: float, boost: float) -> np.ndarray:
    tfn = _h2_tfn(freqs, norm_bytes, avgfl, c)
    a = np.log(float(dc + 1) / (float(df) + 0.5)) / LOG_2
    s = F64(F32(boost)) * (a * 1.0 * (1.0 - 1.0 / (1.0 + tfn)))
    return s.astype(F32)


def ib_lambda(df: int, dc: int) -> np.float32:
    """LambdaDF: float((df+1)/(N+1)), nextDown if exactly 1."""
    lam = F32((float(df) + 1.0) / (float(dc) + 1.0))
    if lam == F32(1.0):
        lam = np.nextafter(lam, F32(0.0))
    return lam


def ib_ll_score(freqs, norm_bytes, lam: np.float32,
                avgfl: float, c: float, boost: float) -> np.ndarray:
    tfn = _h2_tfn(freqs, norm_bytes, avgfl, c)
    lam_d = F64(lam)
    s = F64(F32(boost)) * (-np.log(lam_d / (tfn + lam_d)))
    return s.astype(F32)


def dfi_score(freqs, norm_bytes, ttf: int, sum_ttf: int,
              boost: float) -> np.ndarray:
    """DFISimilarity(IndependenceStandardized) (DFISimilarity.java:55-64,
    IndependenceStandardized.java:37-38): expected = (F+1)*dl/(T+1);
    0 when freq <= expected, else boost * log2((freq-expected)/
    sqrt(expected) + 1). All double, final float cast."""
    freq_d = np.asarray(freqs).astype(F32).astype(F64)
    dl_d = LENGTH_TABLE[np.asarray(norm_bytes, dtype=np.int64) & 0xFF].astype(F64)
    expected = (float(ttf) + 1.0) * dl_d / (float(sum_ttf) + 1.0)
    with np.errstate(invalid="ignore", divide="ignore"):
        measure = (freq_d - expected) / np.sqrt(expected)
        s = F64(F32(boost)) * (np.log(measure + 1.0) / LOG_2)
    return np.where(freq_d <= expected, 0.0, s).astype(F32)


def f2exp_score(freqs, norm_bytes, df: int, dc: int, avgfl: float,
                s: float, k: float, boost: float) -> np.ndarray:
    """AxiomaticF2EXP (Axiomatic.java:104-113 score = tf·ln·tfln·idf −
    gamma, then ·boost, clamped at 0; AxiomaticF2EXP.java:60-88:
    tf = ln = 1, gamma = 0, tfln = freq/(freq + s + s·docLen/avgdl),
    idf = ((N+1)/df)^k). All double over the quantized docLen
    (SimilarityBase LENGTH_TABLE), float params promoted, final float
    cast. Defaults s = 0.25, k = 0.35 (Axiomatic.java:99-101)."""
    freq_d = np.asarray(freqs).astype(F32).astype(F64)
    dl_d = LENGTH_TABLE[np.asarray(norm_bytes, dtype=np.int64) & 0xFF].astype(F64)
    s_d = F64(F32(s))
    tfln = freq_d / (freq_d + s_d + s_d * dl_d / F64(avgfl))
    idf = np.power((float(dc) + 1.0) / float(df), F64(F32(k)))
    out = (tfln * idf) * F64(F32(boost))
    return np.maximum(0.0, out).astype(F32)


def sweetspot_norm_table(ln_min: int = 1, ln_max: int = 1,
                         steep: float = 0.5) -> np.ndarray:
    """SweetSpotSimilarity.lengthNorm (misc/SweetSpotSimilarity.java:
    117-133): 1/sqrt(steep*(|l-min| + |l-max| - (max-min)) + 1) — a
    plateau of 1.0 for lengths inside [min, max]. Precomputed per norm
    byte over the SmallFloat LENGTH_TABLE like the classic normTable;
    float op order: int sum -> (float) -> f32 mul/add -> double sqrt ->
    f32. Degrades to the classic 1/sqrt(length) at (1, 1, 0.5)."""
    lengths = LENGTH_TABLE.astype(np.int64)
    span = np.abs(lengths - ln_min) + np.abs(lengths - ln_max) - (ln_max - ln_min)
    inner = (F32(steep) * span.astype(F32)).astype(F32) + F32(1.0)
    table = (1.0 / np.sqrt(inner.astype(F64))).astype(F32)
    table[0] = F32(1.0) / table[255]  # slot 0 convention, like classic
    return table


def sweetspot_tf(freqs, tf_base: float = 0.0, tf_min: float = 0.0) -> np.ndarray:
    """baselineTf (SweetSpotSimilarity.java:158-166): 0 for freq 0,
    tf_base for freq <= min, else f32(sqrt(freq + base^2 - min)) — the
    inner sum in FLOAT, sqrt in double. Degrades to sqrt(freq) at
    (0, 0)."""
    f = np.asarray(freqs).astype(F32)
    inner = (f + (F32(tf_base) * F32(tf_base) - F32(tf_min))).astype(F32)
    out = np.sqrt(inner.astype(F64)).astype(F32)
    out = np.where(f <= F32(tf_min), F32(tf_base), out)
    return np.where(f == 0.0, F32(0.0), out).astype(F32)


def sweetspot_score(freqs, norm_bytes, qw: np.float32, table: np.ndarray,
                    tf_base: float, tf_min: float) -> np.ndarray:
    """raw = baselineTf * queryWeight (f32); raw * normTable[b] — the
    TFIDFScorer.score shape with SweetSpot's tf and lengthNorm."""
    tf = sweetspot_tf(freqs, tf_base, tf_min)
    raw = (tf * F32(qw)).astype(F32)
    nt = table[np.asarray(norm_bytes, dtype=np.int64) & 0xFF]
    return (raw * nt).astype(F32)
