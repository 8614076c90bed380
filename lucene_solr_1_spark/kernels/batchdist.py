"""Batched (NumPy char-matrix) twins of the spell-distance scalars.

The scalar implementations — kernels/osa.osa (LuceneLevenshteinDistance
/ FuzzyTermsEnum OSA semantics), kernels/strdist.jaro_winkler
(suggest/spell/JaroWinklerDistance.java:37-105) and
kernels/strdist.ngram_distance (suggest/spell/NGramDistance.java:53-141)
— are the pinned CONTRACTS (reference test vectors). These batched
versions run the same DP/matching SIMULTANEOUSLY over every candidate
term against ONE query string: python-level loops scale with
max_term_len × len(query) only, each step a vectorized op over the
whole candidate slice, so a 10⁶-term dictionary slice costs thousands
of NumPy ops instead of 10⁶ Python DP runs. batched == scalar is
fuzz-pinned in tests/test_batchdist.py (same posture as the batched
sloppy-phrase/span matchers)."""

from __future__ import annotations

import numpy as np

_I32 = np.int32


def _char_matrix(terms, pad_rows: int = 0):
    """(n, L) uint32 codepoint matrix (0-padded) + int64 lengths."""
    n = len(terms)
    lens = np.fromiter((len(t) for t in terms), dtype=np.int64, count=n)
    L = int(lens.max()) if n else 0
    A = np.zeros((n, max(L, pad_rows, 1)), dtype=np.uint32)
    for i, t in enumerate(terms):
        if t:
            A[i, : len(t)] = np.frombuffer(
                t.encode("utf-32-le"), dtype=np.uint32
            )
    return A, lens


def _chars_of(text: str) -> np.ndarray:
    if not text:
        return np.empty(0, dtype=np.uint32)
    return np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)


def osa_batch(terms, text: str) -> np.ndarray:
    """Optimal-string-alignment distance of every term to `text` —
    row-identical to kernels/osa.osa. DP rows iterate over term chars,
    columns over the query; the restricted-transposition transition
    reads the i-2 row exactly like the scalar."""
    n = len(terms)
    out = np.zeros(n, dtype=_I32)
    if n == 0:
        return out
    A, lens = _char_matrix(terms)
    b = _chars_of(text)
    m = len(b)
    if m == 0:
        return lens.astype(_I32)
    out[lens == 0] = m
    L = int(lens.max())
    prev2 = None
    prev = np.tile(np.arange(m + 1, dtype=_I32), (n, 1))
    for i in range(1, L + 1):
        cur = np.empty((n, m + 1), dtype=_I32)
        cur[:, 0] = i
        ca = A[:, i - 1]
        if i > 1:
            ca2 = A[:, i - 2]
        for j in range(1, m + 1):
            cost = (ca != b[j - 1]).astype(_I32)
            d = np.minimum(prev[:, j] + 1, prev[:, j - 1] + cost)
            np.minimum(d, cur[:, j - 1] + 1, out=d)
            if i > 1 and j > 1:
                trans = (ca == b[j - 2]) & (ca2 == b[j - 1])
                if trans.any():
                    d = np.where(
                        trans, np.minimum(d, prev2[:, j - 2] + 1), d
                    )
            cur[:, j] = d
        done = lens == i
        if done.any():
            out[done] = cur[done, m]
        prev2, prev = prev, cur
    return out


def ngram_batch(terms, text: str, n: int = 2) -> np.ndarray:
    """NGramDistance similarity of every term (source) to `text`
    (target) — row-identical to kernels/strdist.ngram_distance. The
    outer j loop walks the target's n-grams (fixed per query); the
    inner i loop walks source positions, vectorized over terms."""
    cnt = len(terms)
    out = np.zeros(cnt, dtype=np.float64)
    if cnt == 0:
        return out
    tl = len(text)
    lens = np.fromiter((len(t) for t in terms), dtype=np.int64, count=cnt)
    dp_mask = (lens >= n) & (tl >= n)
    # short-circuit rows the scalar handles before the DP
    for i in np.flatnonzero(~dp_mask):
        t, sl = terms[i], int(lens[i])
        if sl == 0 or tl == 0:
            out[i] = 1.0 if sl == tl else 0.0
        else:
            c = sum(t[k] == text[k] for k in range(min(sl, tl)))
            out[i] = c / max(sl, tl)
    if not dp_mask.any():
        return out
    idx = np.flatnonzero(dp_mask)
    sub = [terms[i] for i in idx]
    slens = lens[idx]
    L = int(slens.max())
    # null-prefixed source matrix: sa[i] spans chars [i .. i+n-1]
    SA, _ = _char_matrix(["\0" * (n - 1) + t for t in sub])
    nn = len(sub)
    p = np.tile(np.arange(L + 1, dtype=np.float64), (nn, 1))
    d = np.empty((nn, L + 1), dtype=np.float64)
    for j in range(1, tl + 1):
        if j < n:
            t_j = "\0" * (n - j) + text[:j]
        else:
            t_j = text[j - n: j]
        tj = _chars_of(t_j)
        d[:, 0] = float(j)
        for i in range(1, L + 1):
            cost = np.zeros(nn, dtype=np.int64)
            tn = np.full(nn, n, dtype=np.int64)
            for ni in range(n):
                sc = SA[:, i - 1 + ni]
                diff = sc != tj[ni]
                cost += diff
                tn -= (~diff) & (sc == 0)
            ec = cost / tn
            d[:, i] = np.minimum(
                np.minimum(d[:, i - 1] + 1.0, p[:, i] + 1.0),
                p[:, i - 1] + ec,
            )
        p, d = d, p
    res = p[np.arange(nn), slens]
    out[idx] = 1.0 - res / np.maximum(slens, tl)
    return out


def _jw_group(T, tlens, text_chars, term_is_min) -> np.ndarray:
    """Jaro-Winkler for one orientation group, fully vectorized.

    T: (n, L) term char matrix; term_is_min: mn = term (len(t) <=
    len(text)) vs mn = text. Greedy window matching iterates (mi, xi)
    in scalar order with per-term found/flag masks — identical match
    assignment to the scalar loop."""
    n, L = T.shape
    m = len(text_chars)
    X = np.tile(text_chars, (n, 1)) if m else np.zeros((n, 0), np.uint32)
    if term_is_min:
        MN, mn_len, MX, mx_len = T, tlens, X, np.full(n, m)
    else:
        MN, mn_len, MX, mx_len = X, np.full(n, m), T, tlens
    rng = np.maximum(mx_len // 2 - 1, 0)
    n_mn, n_mx = MN.shape[1], MX.shape[1]
    match_idx = np.full((n, n_mn), -1, dtype=np.int64)
    flags = np.zeros((n, n_mx), dtype=bool)
    for mi in range(n_mn):
        active = mi < mn_len
        if not active.any():
            break
        found = ~active
        c1 = MN[:, mi]
        lo = np.maximum(mi - rng, 0)
        hi = np.minimum(mi + rng + 1, mx_len)
        for xi in range(n_mx):
            cand = (
                ~found
                & (xi >= lo)
                & (xi < hi)
                & ~flags[:, xi]
                & (c1 == MX[:, xi])
            )
            if cand.any():
                flags[cand, xi] = True
                match_idx[cand, mi] = xi
                found |= cand
    matches = (match_idx >= 0).sum(axis=1)
    out = np.zeros(n, dtype=np.float64)
    live = matches > 0
    # ms1: matched mn chars in mi order; ms2: flagged mx chars in xi
    # order — stable argsort packs the selected columns left
    sel1 = match_idx >= 0
    o1 = np.argsort(~sel1, axis=1, kind="stable")
    ms1 = np.take_along_axis(MN, o1, axis=1)
    o2 = np.argsort(~flags, axis=1, kind="stable")
    ms2 = np.take_along_axis(MX, o2, axis=1)
    K = min(n_mn, n_mx)
    pos = np.arange(K)
    valid = pos[None, :] < matches[:, None]
    trans = ((ms1[:, :K] != ms2[:, :K]) & valid).sum(axis=1) // 2
    # full common prefix of (s1=term, s2=text), capped at len(mn)
    P = min(L, m)
    if P:
        eq = T[:, :P] == text_chars[:P]
        pref = np.where(
            eq.all(axis=1), P, eq.argmin(axis=1)
        )
    else:
        pref = np.zeros(n, dtype=np.int64)
    pref = np.minimum(pref, mn_len)
    s1len, s2len = tlens, np.full(n, m)
    mm = matches.astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        j = (mm / s1len + mm / s2len + (mm - trans) / mm) / 3.0
    j = np.where(live, j, 0.0)
    bonus = np.minimum(0.1, 1.0 / np.maximum(mx_len, 1)) * pref * (1.0 - j)
    out = np.where(live & (j >= 0.7), j + bonus, j)
    return out


def jaro_winkler_batch(terms, text: str) -> np.ndarray:
    """JaroWinklerDistance of every term to `text` — row-identical to
    kernels/strdist.jaro_winkler (threshold 0.7). Terms split into the
    two mn/mx orientations; each group runs one vectorized pass."""
    n = len(terms)
    out = np.zeros(n, dtype=np.float64)
    if n == 0:
        return out
    T, tlens = _char_matrix(terms)
    tc = _chars_of(text)
    m = len(tc)
    is_min = tlens <= m  # scalar: len(s1) > len(s2) -> mx = s1
    for group, term_is_min in ((is_min, True), (~is_min, False)):
        if not group.any():
            continue
        idx = np.flatnonzero(group)
        out[idx] = _jw_group(T[idx], tlens[idx], tc, term_is_min)
    return out
