"""Pluggable spell-checker string distances (suggest/spell/
StringDistance.java implementations).

- `jaro_winkler`: suggest/spell/JaroWinklerDistance.java:37-105 — note
  the Lucene variant does NOT cap the common prefix at 4 like classic
  Winkler; it uses the FULL common prefix (bounded by the shorter
  string) with scale min(0.1, 1/len(longer)), bonus applied only when
  the Jaro score passes the 0.7 threshold.
- `ngram_distance`: suggest/spell/NGramDistance.java:53-141 — n-gram
  Levenshtein: cell cost = fraction of differing positions between the
  source's i-th n-gram (null-prefixed) and the target's j-th n-gram,
  with null-prefix matches discounted from the denominator; similarity
  = 1 - dist/max(len).

Both return SIMILARITY in [0, 1] (DirectSpellChecker uses getDistance
as the suggestion score directly). Ported reference test vectors pin
them in tests/test_strdist.py.
"""

from __future__ import annotations

from functools import lru_cache


@lru_cache(maxsize=1 << 16)
def jaro_winkler(s1: str, s2: str, threshold: float = 0.7) -> float:
    if len(s1) > len(s2):
        mx, mn = s1, s2
    else:
        mx, mn = s2, s1
    rng = max(len(mx) // 2 - 1, 0)
    match_idx = [-1] * len(mn)
    match_flags = [False] * len(mx)
    matches = 0
    for mi, c1 in enumerate(mn):
        for xi in range(max(mi - rng, 0), min(mi + rng + 1, len(mx))):
            if not match_flags[xi] and c1 == mx[xi]:
                match_idx[mi] = xi
                match_flags[xi] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    ms1 = [mn[i] for i in range(len(mn)) if match_idx[i] != -1]
    ms2 = [mx[i] for i in range(len(mx)) if match_flags[i]]
    transpositions = sum(a != b for a, b in zip(ms1, ms2)) // 2
    prefix = 0
    for a, b in zip(s1, s2):
        if a != b or prefix >= len(mn):
            break
        prefix += 1
    m = float(matches)
    j = (m / len(s1) + m / len(s2) + (m - transpositions) / m) / 3.0
    if j < threshold:
        return j
    return j + min(0.1, 1.0 / len(mx)) * prefix * (1.0 - j)


@lru_cache(maxsize=1 << 16)
def ngram_distance(source: str, target: str, n: int = 2) -> float:
    sl, tl = len(source), len(target)
    if sl == 0 or tl == 0:
        return 1.0 if sl == tl else 0.0
    if sl < n or tl < n:
        cost = sum(source[i] == target[i] for i in range(min(sl, tl)))
        return cost / max(sl, tl)
    # null-character prefix so the first char appears in n n-grams
    sa = "\0" * (n - 1) + source
    p = list(range(sl + 1))
    d = [0.0] * (sl + 1)
    for j in range(1, tl + 1):
        if j < n:
            t_j = "\0" * (n - j) + target[:j]
        else:
            t_j = target[j - n:j]
        d[0] = float(j)
        for i in range(1, sl + 1):
            cost = 0
            tn = n
            for ni in range(n):
                if sa[i - 1 + ni] != t_j[ni]:
                    cost += 1
                elif sa[i - 1 + ni] == "\0":
                    tn -= 1  # discount null-prefix matches
            ec = cost / tn
            d[i] = min(d[i - 1] + 1, p[i] + 1, p[i - 1] + ec)
        p, d = d, p
    return 1.0 - (p[sl] / max(tl, sl))


DISTANCES = {
    "jaro_winkler": jaro_winkler,
    "ngram": ngram_distance,
}


_BATCH_CUTOFF = 64  # below this the scalar beats matrix setup cost

_BATCHED = {
    "jaro_winkler": "jaro_winkler_batch",
    "ngram": "ngram_batch",
}


def distance_series(terms, text: str, distance: str):
    """Per-unique StringDistance scores for a term Series — the NumPy
    char-matrix batch (kernels/batchdist, fuzz-pinned row-identical to
    the scalars) for large slices, the memoized scalar below the
    cutoff."""
    import pandas as pd

    fn = DISTANCES[distance]
    u = pd.unique(terms.astype(str))
    if len(u) >= _BATCH_CUTOFF:
        from . import batchdist

        batch = getattr(batchdist, _BATCHED[distance])
        uniq = dict(zip(u, (round(float(v), 4) for v in batch(list(u), text))))
    else:
        uniq = {t: round(fn(t, text), 4) for t in u}
    return terms.map(uniq).astype("float64")


def distance_udf(text: str, distance: str):
    """Arrow-batched pandas UDF scoring terms against `text` with the
    named StringDistance, rounded to 4 like the relational twins."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    DISTANCES[distance]  # unknown name raises HERE, not on the executor

    def _dist(terms):
        return distance_series(terms, text, distance)

    _dist.__annotations__ = {"terms": pd.Series, "return": pd.Series}
    return pandas_udf(_dist, "double")
