"""DictionaryCompoundWordTokenFilter — dictionary-based decomposition of
compound words (the Germanic-language recall feature: "softwaresystem"
additionally indexes "software" and "system" at the same position).

Reference contract (lucene/analysis/common/src/java/org/apache/lucene/
analysis/compound/):
- CompoundWordTokenFilterBase.java:37-47 — defaults minWordSize=5,
  minSubwordSize=2, maxSubwordSize=15; :90-116 — only tokens with
  length >= minWordSize are decomposed, the ORIGINAL token is always
  passed through first, subwords follow at posIncr 0 in discovery order.
- DictionaryCompoundWordTokenFilter.java:73-100 — decompose(): for every
  start offset i (0..len-minSubword) try every length j (minSubword..
  maxSubword); every dictionary hit is emitted (or only the longest per
  start when onlyLongestMatch).

The scalar `decompose` below is the pinned contract; `subwords_for_array`
is the per-unique-term vectorized twin used by the flatten path (Zipf:
vocabulary << token stream)."""

from __future__ import annotations

import numpy as np
import pandas as pd

DEFAULT_MIN_WORD_SIZE = 5
DEFAULT_MIN_SUBWORD_SIZE = 2
DEFAULT_MAX_SUBWORD_SIZE = 15


def decompose(
    token: str,
    dictionary: frozenset,
    min_word: int = DEFAULT_MIN_WORD_SIZE,
    min_sub: int = DEFAULT_MIN_SUBWORD_SIZE,
    max_sub: int = DEFAULT_MAX_SUBWORD_SIZE,
    only_longest: bool = False,
) -> list:
    """Subwords of `token` found in `dictionary`, in the reference's
    (start asc, length asc) discovery order. Empty when the token is
    shorter than min_word. The original token is NOT included (the base
    filter passes it through separately); a dictionary hit equal to the
    whole token IS emitted (the reference does too)."""
    n = len(token)
    if n < min_word:
        return []
    out = []
    for i in range(0, n - min_sub + 1):
        longest = None
        for j in range(min_sub, max_sub + 1):
            if i + j > n:
                break
            cand = token[i : i + j]
            if cand in dictionary:
                if only_longest:
                    longest = cand  # j ascends: the last hit is longest
                else:
                    out.append(cand)
        if only_longest and longest is not None:
            out.append(longest)
    return out


def subwords_for_array(terms: np.ndarray, dictionary: frozenset) -> list:
    """Per-unique decomposition over a token array: returns a list (len ==
    len(terms)) of subword lists, computed once per unique term then
    gathered back — the vectorized twin of calling `decompose` per token
    (the scalar==vectorized stream test pins agreement)."""
    codes, uniq = pd.factorize(pd.Series(terms, dtype=object), sort=False)
    subs_u = [decompose(u, dictionary) for u in uniq]
    return [subs_u[c] for c in codes]
