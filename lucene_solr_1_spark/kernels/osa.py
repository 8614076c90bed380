"""Optimal-string-alignment (restricted Damerau-Levenshtein) edit distance.

Lucene's fuzzy machinery counts a transposition of two adjacent
characters as ONE edit: FuzzyQuery defaults transpositions=true
(reference lucene/core/src/java/org/apache/lucene/search/FuzzyQuery.java:58
`defaultTranspositions = true`), FuzzyTermsEnum builds its automata with
the transpositions option, and DirectSpellChecker scores with
LuceneLevenshteinDistance — documented as "Damerau-Levenshtein (optimal
string alignment) implemented in a consistent way as Lucene's
FuzzyTermsEnum with the transpositions option enabled"
(lucene/suggest/src/java/org/apache/lucene/search/spell/
LuceneLevenshteinDistance.java:22-23, transposition case at :99).

This module is the engine's ONE spec for that distance.  The DuckDB
oracle twins use the built-in `damerau_levenshtein`, which is the
UNRESTRICTED variant (a transposed pair may be edited again); OSA and
unrestricted DL agree except on compound patterns like 'ca'->'abc'
(OSA 3, DL 2), and tests/test_osa.py asserts the two agree over every
in-window dictionary pair of the pinned corpora, so the oracle hashes
are exact on the gate data while the engine implements true Lucene
semantics.

Distributed usage: the exact OSA check is an Arrow-batched pandas UDF
applied AFTER two Catalyst-pushable prefilters — a length window and
`levenshtein(term, q) <= 2*max_edits` (sound because each transposition
costs at most two plain edits, so osa <= e implies levenshtein <= 2e).
Catalyst pushes the cheap predicates into the dictionary scan and the
Python stage sees only the survivors.
"""
from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf


def osa(a: str, b: str) -> int:
    """Scalar optimal-string-alignment distance (the contract reference).

    Standard DP with one extra transition: d[i][j] can come from
    d[i-2][j-2]+1 when a[i-2:i] == reversed(b[j-2:j]) — each adjacent
    transposition counts one edit but a transposed pair is never edited
    again (restricted / OSA semantics, matching LuceneLevenshteinDistance).
    """
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if la == 0:
        return lb
    if lb == 0:
        return la
    prev2: list[int] | None = None
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        ca = a[i - 1]
        for j in range(1, lb + 1):
            cost = 0 if ca == b[j - 1] else 1
            d = prev[j] + 1
            if cur[j - 1] + 1 < d:
                d = cur[j - 1] + 1
            if prev[j - 1] + cost < d:
                d = prev[j - 1] + cost
            if (
                i > 1
                and j > 1
                and ca == b[j - 2]
                and a[i - 2] == b[j - 1]
                and prev2[j - 2] + 1 < d
            ):
                d = prev2[j - 2] + 1
            cur[j] = d
        prev2, prev = prev, cur
    return prev[lb]


_BATCH_CUTOFF = 64  # below this the scalar DP beats matrix setup cost


def osa_series(terms: pd.Series, text: str) -> pd.Series:
    """OSA distance of each term to `text`, computed once per unique
    term (Zipf: the candidate dictionary slice is far smaller than any
    posting stream it gates). Large slices run the NumPy char-matrix
    DP (kernels/batchdist.osa_batch — fuzz-pinned row-identical to the
    scalar), so per-candidate cost is vectorized, not a Python loop."""
    u = pd.unique(terms.astype(str))
    if len(u) >= _BATCH_CUTOFF:
        from .batchdist import osa_batch

        uniq = dict(zip(u, osa_batch(list(u), text)))
    else:
        uniq = {t: osa(t, text) for t in u}
    return terms.map(uniq).astype("int32")


def osa_udf(text: str):
    """Arrow-batched pandas UDF computing OSA distance to `text`.

    Build one per query string; apply after the Catalyst-pushable
    prefilters (see module docstring)."""

    @pandas_udf("int")
    def _osa(terms: pd.Series) -> pd.Series:
        return osa_series(terms, text)

    return _osa
