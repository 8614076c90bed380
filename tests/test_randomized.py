"""Randomized engine-vs-oracle equivalence — the RandomIndexWriter /
RandomPostingsTester analog (test-framework/.../index/RandomIndexWriter.java,
BasePostingsFormatTestCase.java): seeded random corpora + random query
shapes + random segment counts; the engine's top-k must be rank-identical
to the brute-force oracle every time."""

import numpy as np
import pandas as pd
import pytest

from lucene_solr_1_spark.index.builder import build_index
from lucene_solr_1_spark.search.query import Bool, Occur, Phrase, Term
from lucene_solr_1_spark.search.searcher import LuceneSparkSearcher

from .oracle import OracleIndex

VOCAB = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa return int "
    "public void class static final if else for while"
).split()


def _random_corpus(rng: np.random.Generator, n_docs: int) -> pd.DataFrame:
    rows = []
    for i in range(n_docs):
        n = int(rng.integers(0, 40))  # includes empty docs
        content = " ".join(rng.choice(VOCAB, size=n)) if n else ""
        rows.append(
            (f"r/{i % 3}", f"p/{i}", f"c{i:04d}", "x", content)
        )
    return pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])


def _random_query(rng: np.random.Generator):
    kind = rng.integers(0, 5)
    t = lambda: Term(str(rng.choice(VOCAB)))  # noqa: E731
    if kind == 0:
        return t()
    if kind == 1:
        return Bool.of((Occur.MUST, t()), (Occur.MUST, t()))
    if kind == 2:
        return Bool.of(
            (Occur.SHOULD, t()), (Occur.SHOULD, t()), (Occur.SHOULD, t())
        )
    if kind == 3:
        return Phrase((str(rng.choice(VOCAB)), str(rng.choice(VOCAB))))
    return Bool.of((Occur.MUST, t()), (Occur.SHOULD, t()), (Occur.MUST_NOT, t()))


@pytest.mark.parametrize("seed", [7, 23, 1009])
def test_randomized_rank_identity(spark, tmp_path_factory, seed):
    rng = np.random.default_rng(seed)
    pdf = _random_corpus(rng, int(rng.integers(20, 80)))
    oracle = OracleIndex(pdf)
    d = str(tmp_path_factory.mktemp(f"ridx{seed}"))
    n_seg = int(rng.integers(1, 6))
    build_index(spark, spark.createDataFrame(pdf), d, num_segments=n_seg)
    s = LuceneSparkSearcher(spark, d)
    for _ in range(6):
        q = _random_query(rng)
        k = int(rng.integers(1, 15))
        hits = s.search(q, k=k)
        # oracle evaluation of the same query shape
        if isinstance(q, Term):
            scores = oracle.term_scores(q.text)
        elif isinstance(q, Phrase):
            scores = oracle.phrase_scores(list(q.terms))
        else:
            musts = [c.query.text for c in q.clauses if c.occur == Occur.MUST]
            shoulds = [c.query.text for c in q.clauses if c.occur == Occur.SHOULD]
            nots = [c.query.text for c in q.clauses if c.occur == Occur.MUST_NOT]
            if musts:
                base = oracle.bool_and(musts)
                for d_id in list(base):
                    for t2 in shoulds:
                        extra = oracle.term_scores(t2).get(d_id)
                        if extra:
                            base[d_id] += extra
                scores = base
            else:
                scores = oracle.bool_or(shoulds)
            for t2 in nots:
                for d_id in oracle.term_scores(t2):
                    scores.pop(d_id, None)
        want = oracle.top_k(scores, k)
        got_keys = [
            f"{r.repo}|{r.path}|{r.commit}" for r in hits.itertuples(index=False)
        ]
        want_keys = [oracle.key_of(i) for i, _ in want]
        assert got_keys == want_keys, (seed, q, k)
        np.testing.assert_allclose(
            hits["score"].to_numpy(dtype=np.float64),
            np.array([sc for _, sc in want]),
            rtol=2e-5,
        )
