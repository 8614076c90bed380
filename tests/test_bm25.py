"""BM25 float32 kernel tests — property tests per the reference's
BaseSimilarityTestCase.java:252-400 plus a frozen hand-computed golden
(FIXTURES.md §3)."""

import numpy as np

from lucene_solr_1_spark.kernels import bm25
from lucene_solr_1_spark.kernels.smallfloat import int_to_byte4


def test_idf_formula():
    # idf = (float) ln(1 + (N - n + 0.5)/(n + 0.5))
    v = bm25.idf(1, 5)
    assert v.dtype == np.float32
    assert np.isclose(float(v), np.float32(np.log(1 + (5 - 1 + 0.5) / 1.5)))


def test_score_properties():
    rng = np.random.default_rng(42)
    for _ in range(50):
        doc_count = int(rng.integers(1, 10**6))
        df = int(rng.integers(1, doc_count + 1))
        sum_ttf = int(rng.integers(doc_count, doc_count * 500))
        avgdl = bm25.avg_field_length(sum_ttf, doc_count)
        cache = bm25.norm_cache(avgdl)
        w = bm25.term_weight(bm25.idf(df, doc_count))
        freqs = np.sort(rng.integers(1, 1000, size=64))
        norm = int(rng.integers(0, 256))
        s = bm25.score(freqs, np.full(64, norm), w, cache)
        assert s.dtype == np.float32
        assert np.all(np.isfinite(s)) and np.all(s >= 0)
        # monotone non-decreasing in freq
        assert np.all(np.diff(s) >= 0)
        # bounded by weight (no (k1+1) numerator ⇒ tf factor < 1)
        assert np.all(s <= bm25.max_score(w))
        # monotone non-increasing in norm byte (longer doc ⇒ lower score)
        s_by_norm = bm25.score(np.full(256, 5), np.arange(256), w, cache)
        assert np.all(np.diff(s_by_norm) <= 1e-9)


def _oracle_score(freq, dl, df, n_docs, sum_ttf, k1=1.2, b=0.75):
    """Plain-float64 BM25 for sanity cross-check (not bit-exact)."""
    idf = np.log(1 + (n_docs - df + 0.5) / (df + 0.5))
    # dl goes through the byte4 lossy roundtrip like the engine
    from lucene_solr_1_spark.kernels.smallfloat import byte4_to_int
    dl_lossy = float(byte4_to_int(int_to_byte4(dl))[0])
    avgdl = sum_ttf / n_docs
    denom = freq + k1 * ((1 - b) + b * dl_lossy / avgdl)
    return idf * freq / denom


def test_hand_corpus_golden():
    # 5-doc corpus: ["a b c", "a a b", "c", "a b c d", "b"], query "a"
    # dls: 3,3,1,4,1 ; N=5, sumTTF=12 ; term a: df=3
    n_docs, sum_ttf = 5, 12
    dls = np.array([3, 3, 1, 4, 1])
    norms = int_to_byte4(dls)
    avgdl = bm25.avg_field_length(sum_ttf, n_docs)
    assert float(avgdl) == np.float32(12 / 5)
    cache = bm25.norm_cache(avgdl)
    w = bm25.term_weight(bm25.idf(3, n_docs))
    # doc0 freq(a)=1, doc1 freq(a)=2, doc3 freq(a)=1
    s = bm25.score(np.array([1, 2, 1]), norms[[0, 1, 3]], w, cache)
    for got, (freq, dl) in zip(s, [(1, 3), (2, 3), (1, 4)]):
        want = _oracle_score(freq, dl, 3, n_docs, sum_ttf)
        assert abs(float(got) - want) < 1e-5
    # doc1 (freq 2) must outrank doc0 (freq 1, same dl) and doc3 (longer)
    assert s[1] > s[0] > s[2]


def test_synonym_idf_sums_in_double():
    idfs = [bm25.idf(2, 100), bm25.idf(5, 100)]
    v = bm25.synonym_idf(idfs)
    assert v.dtype == np.float32
    assert abs(float(v) - (float(idfs[0]) + float(idfs[1]))) < 1e-6


def test_score_pairs_max():
    cache = bm25.norm_cache(np.float32(10.0))
    w = np.float32(2.0)
    ub = bm25.score_pairs_max([1, 4, 8], [40, 40, 200], w, cache)
    all_scores = bm25.score(np.array([1, 4, 8]), np.array([40, 40, 200]), w, cache)
    assert float(ub) == float(np.max(all_scores))
