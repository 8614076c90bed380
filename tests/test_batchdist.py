"""Batched spell distances (kernels/batchdist) == the pinned scalar
contracts (kernels/osa.osa, kernels/strdist.jaro_winkler /
ngram_distance), bit-identical — the same batched==scalar posture as
the sloppy-phrase/span matchers. Plus the dispatch seams: osa_series /
distance_series return identical values above and below the batch
cutoff."""

import random

import numpy as np
import pandas as pd
import pytest

from lucene_solr_1_spark.kernels import batchdist, osa as osa_mod, strdist
from lucene_solr_1_spark.kernels.batchdist import (
    jaro_winkler_batch, ngram_batch, osa_batch,
)
from lucene_solr_1_spark.kernels.osa import osa, osa_series
from lucene_solr_1_spark.kernels.strdist import (
    distance_series, jaro_winkler, ngram_distance,
)


def _rand_words(seed, n, maxlen=14, alpha="abcdef"):
    rng = random.Random(seed)
    return [
        "".join(rng.choice(alpha) for _ in range(rng.randint(0, maxlen)))
        for _ in range(n)
    ]


@pytest.mark.parametrize("seed", [3, 11, 29])
def test_osa_batch_matches_scalar(seed):
    rng = random.Random(seed)
    text = "".join(rng.choice("abcdef") for _ in range(rng.randint(0, 10)))
    terms = _rand_words(seed + 1, 300) + ["", text, text + "x", "zzzz"]
    got = osa_batch(terms, text)
    for t, d in zip(terms, got):
        assert int(d) == osa(t, text), (t, text)


@pytest.mark.parametrize("seed", [5, 17, 41])
def test_jaro_winkler_batch_bit_identical(seed):
    rng = random.Random(seed)
    text = "".join(rng.choice("abcdef") for _ in range(rng.randint(1, 10)))
    terms = _rand_words(seed + 1, 300) + ["", text, text * 2]
    got = jaro_winkler_batch(terms, text)
    for t, d in zip(terms, got):
        assert float(d) == jaro_winkler(t, text), (t, text)


@pytest.mark.parametrize("seed", [7, 23, 53])
def test_ngram_batch_bit_identical(seed):
    rng = random.Random(seed)
    text = "".join(rng.choice("abcdef") for _ in range(rng.randint(0, 10)))
    terms = _rand_words(seed + 1, 300) + ["", "a", text]
    got = ngram_batch(terms, text)
    for t, d in zip(terms, got):
        assert float(d) == ngram_distance(t, text), (t, text)


def test_osa_transposition_semantics_batch():
    # restricted (OSA): a transposed pair is never edited again
    assert osa_batch(["abc"], "ca")[0] == 3  # unrestricted DL would say 2
    assert osa_batch(["ab"], "ba")[0] == 1
    assert osa_batch(["abcd"], "acbd")[0] == 1


def test_osa_series_same_across_cutoff(monkeypatch):
    text = "merge"
    terms = pd.Series(_rand_words(99, 200, alpha="mergsotx"))
    big = osa_series(terms, text)
    monkeypatch.setattr(osa_mod, "_BATCH_CUTOFF", 10**9)  # force scalar
    small = osa_series(terms, text)
    assert (big == small).all()


@pytest.mark.parametrize("dist", ["jaro_winkler", "ngram"])
def test_distance_series_same_across_cutoff(dist, monkeypatch):
    text = "quary"
    terms = pd.Series(_rand_words(123, 200, alpha="quarystem"))
    big = distance_series(terms, text, dist)
    monkeypatch.setattr(strdist, "_BATCH_CUTOFF", 10**9)  # force scalar
    small = distance_series(terms, text, dist)
    assert (big.to_numpy() == small.to_numpy()).all()
