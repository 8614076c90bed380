"""MultiPhraseQuery + BlendedTermQuery oracle tests.

MultiPhrase: an INDEPENDENT pure-Python reference (union-of-alternatives
per slot over raw tokenized text, modeled on MultiPhraseQuery.java:285-294
UnionPostingsEnum -> Exact/SloppyPhraseMatcher) is compared against the
engine's full path (index build -> position decode -> union matcher ->
quantized BM25). Blended: the df-max blend (BlendedTermQuery.java:279)
must make equally-boosted terms of different rarity score through ONE
shared idf, combined DisjunctionMax with tie 0.01 (:183).
"""

import numpy as np
import pandas as pd
import pytest

from lucene_solr_1_spark.index.builder import build_index
from lucene_solr_1_spark.kernels.analyzer import tokenize_one
from lucene_solr_1_spark.search.query import (
    Blended, Bool, DisjunctionMax, MultiPhrase, Occur, Phrase, Term,
)
from lucene_solr_1_spark.search.searcher import LuceneSparkSearcher

from .oracle import OracleIndex

VOCAB = ["alpha", "beta", "gamma", "delta", "eps"]


def _corpus(n_docs: int = 48, n_tokens: int = 40) -> pd.DataFrame:
    rng = np.random.default_rng(13)
    rows = []
    for i in range(n_docs):
        toks = rng.choice(VOCAB, size=n_tokens, p=[0.35, 0.25, 0.2, 0.15, 0.05])
        rows.append(
            (f"r/{i % 5}", f"p/{i:04d}.txt", f"c{i:06x}", "en", " ".join(toks))
        )
    # planted comparable pair for the blend-equalization test: same tf of
    # the target term, same dl, one matches ONLY alpha / ONLY eps
    rows.append(("r/9", "p/zz-a.txt", "cpa", "en", "alpha delta delta gamma"))
    rows.append(("r/9", "p/zz-e.txt", "cpe", "en", "eps delta delta gamma"))
    return pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])


@pytest.fixture(scope="module")
def mp_setup(spark, tmp_path_factory):
    pdf = _corpus()
    index_dir = str(tmp_path_factory.mktemp("idx_multiphrase"))
    build_index(spark, spark.createDataFrame(pdf), index_dir, num_segments=3)
    return LuceneSparkSearcher(spark, index_dir), OracleIndex(pdf), pdf


# ---------------- independent reference matcher ----------------------------

def ref_exact_multi_freq(tokens: list, slots: list) -> float:
    """Count of start positions where slot i admits tokens[s+i]."""
    n = 0
    for s in range(len(tokens) - len(slots) + 1):
        if all(tokens[s + i] in slots[i] for i in range(len(slots))):
            n += 1
    return float(n)


def _repeat_groups(slots: list) -> list:
    """Union-find slots sharing ANY term (SloppyPhraseMatcher repeats
    over union enums)."""
    parent = list(range(len(slots)))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    seen = {}
    for i, alts in enumerate(slots):
        for t in alts:
            if t in seen:
                parent[find(i)] = find(seen[t])
            else:
                seen[t] = i
    groups = {}
    for i in range(len(slots)):
        groups.setdefault(find(i), []).append(i)
    return [g for g in groups.values() if len(g) > 1]


def ref_sloppy_multi_freq(tokens: list, slots: list, slop: int) -> float:
    """Greedy minimal windows over UNION position lists; repeat groups
    forced onto distinct raw positions in slot order — the same documented
    contract as kernel._sloppy_freq, evaluated independently on raw text."""
    pos = [
        [p - i for p, t in enumerate(tokens) if t in slots[i]]
        for i in range(len(slots))
    ]
    if any(not p for p in pos):
        return 0.0
    n = len(slots)
    repeat_groups = _repeat_groups(slots)
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


def _expected(oracle: OracleIndex, slots: list, slop: int) -> dict:
    from lucene_solr_1_spark.kernels import bm25
    from lucene_solr_1_spark.kernels.smallfloat import int_to_byte4

    n = oracle.n_docs
    cache = bm25.norm_cache(bm25.avg_field_length(oracle.sum_ttf, n))
    all_terms = [t for slot in slots for t in slot]
    idfs = [bm25.idf(oracle.df[t], n) for t in all_terms if oracle.df.get(t)]
    w = bm25.term_weight(bm25.synonym_idf(idfs)) if idfs else np.float32(0.0)
    out = {}
    for doc_id, text in enumerate(oracle.pdf["content"]):
        toks, _ = tokenize_one(text)
        freq = (
            ref_exact_multi_freq(toks, slots)
            if slop == 0
            else ref_sloppy_multi_freq(toks, slots, slop)
        )
        if freq > 0:
            nb = int_to_byte4(np.asarray([len(toks)]))
            out[doc_id] = float(
                bm25.score(np.asarray([freq], dtype=np.float64), nb, w, cache)[0]
            )
    return out


SHAPES = [
    ([("alpha", "beta"), ("gamma",)], 0),
    ([("alpha",), ("beta", "gamma")], 0),
    ([("alpha", "beta"), ("gamma", "delta")], 0),
    ([("alpha", "beta"), ("gamma",)], 2),
    ([("alpha",), ("beta", "gamma"), ("delta", "eps")], 0),
    ([("alpha",), ("beta", "gamma"), ("delta", "eps")], 3),
    # overlapping alternatives across slots -> repeat-group handling
    ([("alpha", "beta"), ("alpha", "gamma")], 2),
    ([("alpha",), ("alpha", "beta")], 1),
]


@pytest.mark.parametrize("slots,slop", SHAPES)
def test_multiphrase_matches_reference(mp_setup, slots, slop):
    searcher, oracle, pdf = mp_setup
    expected = _expected(oracle, [list(s) for s in slots], slop)
    hits = searcher.search(
        MultiPhrase(tuple(slots), slop=slop), k=len(pdf), with_stored=False
    )
    got = {
        int(r.global_doc_id): float(r.score) for r in hits.itertuples(index=False)
    }
    assert set(got) == set(expected), (slots, slop)
    for d, s in expected.items():
        assert got[d] == pytest.approx(s, abs=0), (slots, slop, d)


def test_multiphrase_single_alternatives_equals_phrase(mp_setup):
    """Degenerate MultiPhrase (one term per slot) is rank- AND
    score-identical to PhraseQuery — the union enum reduces to the plain
    postings enum."""
    searcher, _, pdf = mp_setup
    for slop in (0, 2):
        a = searcher.search(
            Phrase(("alpha", "beta"), slop=slop), k=20, with_stored=False
        )
        b = searcher.search(
            MultiPhrase((("alpha",), ("beta",)), slop=slop), k=20,
            with_stored=False,
        )
        pd.testing.assert_frame_equal(
            a.reset_index(drop=True), b.reset_index(drop=True)
        )


def test_multiphrase_local_matches_distributed(mp_setup):
    searcher, _, _ = mp_setup
    q = MultiPhrase((("alpha", "beta"), ("gamma", "delta")), slop=1)
    dist = searcher.search(q, k=15, with_stored=False)
    loc = searcher.search_local(q, k=15)
    pd.testing.assert_frame_equal(
        dist.reset_index(drop=True), loc.reset_index(drop=True)
    )


# ---------------- BlendedTermQuery ------------------------------------------

def test_blended_rewrite_uses_max_df_and_dismax(mp_setup):
    """expand(Blended) == DisjunctionMax of df-overridden Terms with the
    blended (max) docFreq and tie 0.01 (BlendedTermQuery.java:279, :183)."""
    searcher, oracle, _ = mp_setup
    q = searcher.expand(Blended(("alpha", "eps")))
    assert isinstance(q, DisjunctionMax)
    assert q.tie_breaker == pytest.approx(0.01)
    df_max = max(oracle.df["alpha"], oracle.df["eps"])
    assert all(
        isinstance(s, Term) and s.df_override == df_max for s in q.queries
    )


def test_blended_search_matches_manual_dismax(mp_setup):
    """Full-path check: Blended == DisMax of Terms whose idf uses the
    blended df, computed via the pinned kernel primitives."""
    from lucene_solr_1_spark.kernels import bm25
    from lucene_solr_1_spark.kernels.smallfloat import int_to_byte4

    searcher, oracle, pdf = mp_setup
    terms = ("gamma", "eps")
    hits = searcher.search(Blended(terms), k=len(pdf), with_stored=False)
    n = oracle.n_docs
    cache = bm25.norm_cache(bm25.avg_field_length(oracle.sum_ttf, n))
    df_max = max(oracle.df[t] for t in terms)
    w = bm25.term_weight(bm25.idf(df_max, n))
    expected = {}
    for doc_id, text in enumerate(oracle.pdf["content"]):
        toks, _ = tokenize_one(text)
        nb = int_to_byte4(np.asarray([len(toks)]))
        subs = []
        for t in terms:
            f = float(toks.count(t))
            if f > 0:
                subs.append(
                    float(bm25.score(np.asarray([f]), nb, w, cache)[0])
                )
        if subs:
            mx, sm = max(subs), sum(np.float64(s) for s in subs)
            expected[doc_id] = np.float32(mx + np.float64(np.float32(0.01)) * (sm - mx))
    got = {
        int(r.global_doc_id): np.float32(r.score)
        for r in hits.itertuples(index=False)
    }
    assert set(got) == set(expected)
    for d in expected:
        assert got[d] == expected[d], d


def test_blended_equalizes_rare_vs_common(mp_setup):
    """The blend's POINT: a doc with tf occurrences of the rare term and a
    doc with tf of the common term (same dl) score identically."""
    searcher, oracle, pdf = mp_setup
    ha = searcher.search(Blended(("alpha", "eps")), k=len(pdf), with_stored=False)
    # group by (tf of matched term, dl): any pair matching only alpha vs
    # only eps with equal tf+dl must tie exactly
    from lucene_solr_1_spark.kernels.analyzer import tokenize_one as tok

    sig = {}
    for doc_id, text in enumerate(oracle.pdf["content"]):
        toks, _ = tok(text)
        ca, ce = toks.count("alpha"), toks.count("eps")
        if ca > 0 and ce == 0:
            sig.setdefault(("a", ca, len(toks)), []).append(doc_id)
        elif ce > 0 and ca == 0:
            sig.setdefault(("e", ce, len(toks)), []).append(doc_id)
    got = {int(r.global_doc_id): float(r.score) for r in ha.itertuples(index=False)}
    pairs = 0
    for (kind, tf, dl), docs in sig.items():
        other = sig.get(("e" if kind == "a" else "a", tf, dl))
        if other:
            assert got[docs[0]] == got[other[0]]
            pairs += 1
    assert pairs > 0, "corpus produced no comparable pair — regenerate"


def test_blended_inside_bool(mp_setup):
    """Blended composes as a clause (expand recurses through Bool)."""
    searcher, _, pdf = mp_setup
    q = Bool.of(
        (Occur.MUST, Term("alpha")),
        (Occur.SHOULD, Blended(("beta", "eps"))),
    )
    hits = searcher.search(q, k=10, with_stored=False)
    assert len(hits) > 0
    assert hits.attrs["relation"] in ("EQUAL_TO", "GREATER_THAN_OR_EQUAL_TO")
