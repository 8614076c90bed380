"""Randomized sloppy-phrase oracle test (round-2 verdict item #8).

An INDEPENDENT reference implementation of the documented sloppy-phrase
contract (kernel._sloppy_freq docstring; modeled on
search/SloppyPhraseMatcher.java + TestSloppyPhraseQuery.java) is run over
raw tokenized text; the engine must produce rank- and score-identical
results through the full path (index build → position decode → matcher →
quantized BM25). Repeated-term phrases ("a b a") are generated on purpose
— repeats must align to distinct token occurrences."""

import numpy as np
import pandas as pd
import pytest

from lucene_solr_1_spark.index.builder import build_index
from lucene_solr_1_spark.kernels.analyzer import tokenize_one
from lucene_solr_1_spark.search.query import Phrase
from lucene_solr_1_spark.search.searcher import LuceneSparkSearcher

from .oracle import OracleIndex

VOCAB = ["alpha", "beta", "gamma", "delta", "eps"]


def _corpus(n_docs: int = 48, n_tokens: int = 40) -> pd.DataFrame:
    rng = np.random.default_rng(7)
    rows = []
    for i in range(n_docs):
        toks = rng.choice(VOCAB, size=n_tokens, p=[0.35, 0.25, 0.2, 0.15, 0.05])
        rows.append(
            (
                f"r/{i % 5}",
                f"p/{i:04d}.txt",
                f"c{i:06x}",
                "en",
                " ".join(toks),
            )
        )
    return pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])


@pytest.fixture(scope="module")
def sp_setup(spark, tmp_path_factory):
    pdf = _corpus()
    index_dir = str(tmp_path_factory.mktemp("idx_sloppy"))
    build_index(spark, spark.createDataFrame(pdf), index_dir, num_segments=3)
    return LuceneSparkSearcher(spark, index_dir), OracleIndex(pdf), pdf


def ref_sloppy_freq(tokens: list, phrase: list, slop: int) -> float:
    """Reference matcher over raw token positions (no index structures):
    greedy minimal windows, freq += 1/(1+dist), repeats forced onto
    distinct raw positions in slot order."""
    pos = [[p - i for p, t in enumerate(tokens) if t == phrase[i]]
           for i in range(len(phrase))]
    if any(not p for p in pos):
        return 0.0
    n = len(phrase)
    groups = {}
    for i, t in enumerate(phrase):
        groups.setdefault(t, []).append(i)
    repeat_groups = [g for g in groups.values() if len(g) > 1]
    idx = [0] * n
    total = 0.0
    while all(idx[i] < len(pos[i]) for i in range(n)):
        dead = False
        for g in repeat_groups:
            for gi in range(1, len(g)):
                a, b = g[gi - 1], g[gi]
                while (
                    idx[b] < len(pos[b])
                    and pos[b][idx[b]] + b <= pos[a][idx[a]] + a
                ):
                    idx[b] += 1
                if idx[b] >= len(pos[b]):
                    dead = True
                    break
            if dead:
                break
        if dead:
            break
        vals = [pos[i][idx[i]] for i in range(n)]
        dist = max(vals) - min(vals)
        if dist <= slop:
            total += 1.0 / (1.0 + dist)
            idx = [x + 1 for x in idx]
        else:
            idx[vals.index(min(vals))] += 1
    return total


def ref_exact_freq(tokens: list, phrase: list) -> float:
    """Exact-phrase reference: count of start positions where the full
    phrase occurs consecutively (ExactPhraseMatcher semantics)."""
    n = 0
    for s in range(len(tokens) - len(phrase) + 1):
        if all(tokens[s + i] == phrase[i] for i in range(len(phrase))):
            n += 1
    return float(n)


def _expected(oracle: OracleIndex, pdf: pd.DataFrame, phrase: list, slop: int) -> dict:
    """Expected hits: freq from the INDEPENDENT reference matcher, score
    from the pinned float32 bm25 kernel primitives (bit-exact with the
    engine, so ordering ties resolve identically)."""
    from lucene_solr_1_spark.kernels import bm25
    from lucene_solr_1_spark.kernels.smallfloat import int_to_byte4

    n = oracle.n_docs
    cache = bm25.norm_cache(bm25.avg_field_length(oracle.sum_ttf, n))
    idfs = [bm25.idf(oracle.df[t], n) for t in phrase if oracle.df.get(t)]
    w = bm25.term_weight(bm25.synonym_idf(idfs)) if idfs else np.float32(0.0)
    out = {}
    for doc_id, text in enumerate(oracle.pdf["content"]):
        toks, _ = tokenize_one(text)
        freq = (
            ref_exact_freq(toks, phrase)
            if slop == 0
            else ref_sloppy_freq(toks, phrase, slop)
        )
        if freq > 0:
            nb = int_to_byte4(np.asarray([len(toks)]))
            out[doc_id] = float(
                bm25.score(np.asarray([freq], dtype=np.float64), nb, w, cache)[0]
            )
    return out


PHRASES = [
    (("alpha", "beta"), 0),
    (("alpha", "beta"), 1),
    (("alpha", "beta"), 3),
    (("alpha", "alpha"), 0),
    (("alpha", "alpha"), 2),
    (("alpha", "beta", "alpha"), 2),
    (("beta", "gamma", "beta"), 3),
    (("gamma", "delta"), 2),
    (("alpha", "eps"), 4),
    (("beta", "beta", "alpha"), 3),
]


def test_sloppy_freq_hypothesis_fuzz():
    """Kernel _sloppy_freq == reference matcher on random token streams
    (pure NumPy vs pure-Python reference, no Spark — hundreds of cases)."""
    from hypothesis import given, settings, strategies as st

    from lucene_solr_1_spark.search.kernel import _sloppy_freq

    vocab = ["a", "b", "c"]

    @settings(max_examples=300, deadline=None)
    @given(
        toks=st.lists(st.sampled_from(vocab), min_size=1, max_size=40),
        phrase=st.lists(st.sampled_from(vocab), min_size=2, max_size=3),
        slop=st.integers(min_value=1, max_value=4),
    )
    def check(toks, phrase, slop):
        ref = ref_sloppy_freq(toks, phrase, slop)
        term_pos = [
            np.array([p - i for p, t in enumerate(toks) if t == phrase[i]],
                     dtype=np.int64)
            for i in range(len(phrase))
        ]
        if any(len(p) == 0 for p in term_pos):
            kern = 0.0
        else:
            groups = {}
            for i, t in enumerate(phrase):
                groups.setdefault(t, []).append(i)
            rg = tuple(tuple(g) for g in groups.values() if len(g) > 1)
            kern = _sloppy_freq(term_pos, slop, rg)
        assert abs(ref - kern) < 1e-9, (toks, phrase, slop, ref, kern)

    check()


def test_batched_sloppy_equals_scalar():
    """_batched_sloppy (vectorized-across-docs engine path) must be
    step-identical to the scalar contract reference _sloppy_freq on
    random multi-doc posting sets — pins the r3 vectorization."""
    from lucene_solr_1_spark.search.kernel import _batched_sloppy, _sloppy_freq

    rng = np.random.default_rng(7)
    for trial in range(60):
        n_docs = int(rng.integers(1, 25))
        n_slots = int(rng.integers(2, 4))
        # repeat groups: sometimes slots share a term
        terms = rng.choice(["a", "b"], size=n_slots)
        groups = {}
        for i, t in enumerate(terms):
            groups.setdefault(str(t), []).append(i)
        rg = tuple(tuple(g) for g in groups.values() if len(g) > 1)
        slop = int(rng.integers(0, 5))
        cand = np.arange(n_docs, dtype=np.int64)
        post = []
        per_doc = []  # per slot: list of per-doc raw position arrays
        for i in range(n_slots):
            doc_pos = [
                np.unique(rng.integers(0, 30, size=rng.integers(1, 6)))
                for _ in range(n_docs)
            ]
            per_doc.append(doc_pos)
            freqs = np.array([len(p) for p in doc_pos], dtype=np.int64)
            starts = np.cumsum(freqs) - freqs
            pos = np.concatenate(doc_pos).astype(np.int64)
            post.append((cand, freqs, starts, pos))
        got = _batched_sloppy(post, cand, slop, rg)
        want = np.array(
            [
                _sloppy_freq(
                    [per_doc[i][d] - i for i in range(n_slots)], slop, rg
                )
                for d in range(n_docs)
            ]
        )
        np.testing.assert_allclose(got, want, rtol=0, atol=0)


@pytest.mark.parametrize("phrase,slop", PHRASES)
def test_sloppy_phrase_matches_reference(sp_setup, phrase, slop):
    searcher, oracle, pdf = sp_setup
    # k > corpus size: no top-k boundary, the FULL match set must agree
    want = oracle.top_k(_expected(oracle, pdf, list(phrase), slop), 60)
    hits = searcher.search(Phrase(tuple(phrase), slop=slop), k=60, with_stored=False)
    got = list(zip(hits["global_doc_id"].tolist(), hits["score"].tolist()))
    assert [d for d, _ in got] == [d for d, _ in want], (phrase, slop)
    # scores bit-exact (same float32 kernel primitives on both sides)
    np.testing.assert_array_equal(
        np.asarray([s for _, s in got], dtype=np.float32),
        np.asarray([s for _, s in want], dtype=np.float32),
    )
