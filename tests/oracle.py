"""Brute-force BM25 oracle — independent of the engine (FIXTURES.md §5).

Pure pandas/float64 implementation: no index, no compression, no pruning.
Only the analyzer is shared (the tokenization contract is pinned by its own
golden tests). Used to assert rank-identity of the engine's top-k.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from lucene_solr_1_spark.kernels.analyzer import AnalyzerConfig, STANDARD, tokenize_one
from lucene_solr_1_spark.kernels.smallfloat import byte4_to_int, int_to_byte4


def levenshtein(a: str, b: str) -> int:
    """Plain DP edit distance (oracle-side; engine uses F.levenshtein)."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def osa_distance(a: str, b: str) -> int:
    """Independent OSA (restricted Damerau) reference — transposition of
    adjacent chars costs 1, transposed pairs never edited again; the
    engine twin lives in kernels/osa.py (FuzzyQuery transpositions=true)."""
    rows = [list(range(len(b) + 1))]
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            d = min(rows[i - 1][j] + 1, cur[j - 1] + 1, rows[i - 1][j - 1] + (ca != cb))
            if i > 1 and j > 1 and ca == b[j - 2] and a[i - 2] == cb:
                d = min(d, rows[i - 2][j - 2] + 1)
            cur.append(d)
        rows.append(cur)
    return rows[-1][-1]


class OracleIndex:
    def __init__(self, corpus_pdf: pd.DataFrame, cfg: AnalyzerConfig = STANDARD):
        pdf = corpus_pdf.sort_values(["repo", "path", "commit"]).reset_index(drop=True)
        self.pdf = pdf
        self.docs = []  # list[dict term -> freq]
        self.positions = []  # list[dict term -> [pos]]
        dls = []
        for text in pdf["content"]:
            terms, pos = tokenize_one(text, cfg)
            tf: dict = {}
            pp: dict = {}
            for t, p in zip(terms, pos):
                tf[t] = tf.get(t, 0) + 1
                pp.setdefault(t, []).append(p)
            self.docs.append(tf)
            self.positions.append(pp)
            dls.append(len(terms))
        # dl goes through the lossy norm-byte roundtrip, like the engine
        self.dl = byte4_to_int(int_to_byte4(np.asarray(dls, dtype=np.int64))).astype(
            np.float64
        )
        self.exact_dl = np.asarray(dls, dtype=np.int64)
        self.n_docs = len(pdf)
        self.sum_ttf = int(self.exact_dl.sum())
        self.avgdl = self.sum_ttf / self.n_docs
        self.df = {}
        for tf in self.docs:
            for t in tf:
                self.df[t] = self.df.get(t, 0) + 1

    def idf(self, term: str) -> float:
        n = self.df.get(term, 0)
        return math.log(1 + (self.n_docs - n + 0.5) / (n + 0.5))

    def term_scores(self, term: str, boost: float = 1.0) -> dict:
        w = boost * self.idf(term)
        out = {}
        for doc_id, tf in enumerate(self.docs):
            f = tf.get(term)
            if f:
                denom = f + 1.2 * (0.25 + 0.75 * self.dl[doc_id] / self.avgdl)
                out[doc_id] = w * f / denom
        return out

    def bool_or(self, terms, min_should_match: int = 1) -> dict:
        per = [self.term_scores(t) for t in terms]
        docs = {}
        cnt = {}
        for p in per:
            for d, s in p.items():
                docs[d] = docs.get(d, 0.0) + s
                cnt[d] = cnt.get(d, 0) + 1
        return {d: s for d, s in docs.items() if cnt[d] >= min_should_match}

    def phrase_scores(self, terms: list) -> dict:
        """Exact-phrase BM25: freq = count of positions where the terms
        occur consecutively; weight = summed idf (PhraseQuery semantics)."""
        w = sum(self.idf(t) for t in terms)
        out = {}
        for doc_id, pp in enumerate(self.positions):
            pos_sets = [pp.get(t) for t in terms]
            if any(p is None for p in pos_sets):
                continue
            first = set(pos_sets[0])
            for i, p in enumerate(pos_sets[1:], start=1):
                first &= {x - i for x in p}
            f = len(first)
            if f:
                denom = f + 1.2 * (0.25 + 0.75 * self.dl[doc_id] / self.avgdl)
                out[doc_id] = w * f / denom
        return out

    def fuzzy_scores(self, text: str, max_edits: int = 2,
                     prefix_length: int = 0) -> dict:
        """FuzzyQuery scoring-rewrite oracle: every dictionary term within
        max_edits contributes with boost 1 - ed/min(|term|, |text|)
        (FuzzyTermsEnum.java:218-238), summed as a SHOULD disjunction.
        ed is OSA (transpositions=true, FuzzyQuery.java:58). With a
        non-fuzzy prefix (FuzzyQuery.java:133-138) candidates must carry
        the first min(prefix_length, |text|) chars verbatim and ed is
        measured over the SUFFIXES; maxEdits 0 or a prefix covering the
        whole text matches only the exact term (FuzzyQuery.java:151)."""
        pl = min(max(prefix_length, 0), len(text))
        exact_only = max_edits == 0 or pl >= len(text)
        out: dict = {}
        for term in self.df:
            if exact_only:
                if term != text:
                    continue
                d = 0
            else:
                if pl and not term.startswith(text[:pl]):
                    continue
                if abs(len(term) - len(text)) > max_edits:
                    continue
                d = osa_distance(term[pl:], text[pl:])
                if d > max_edits:
                    continue
            boost = 1.0 if d == 0 else 1.0 - d / min(len(term), len(text))
            for doc, s in self.term_scores(term, boost=boost).items():
                out[doc] = out.get(doc, 0.0) + s
        return out

    def bool_and(self, terms) -> dict:
        per = [self.term_scores(t) for t in terms]
        if not per:
            return {}
        common = set(per[0])
        for p in per[1:]:
            common &= set(p)
        return {d: sum(p[d] for p in per) for d in common}

    def top_k(self, scores: dict, k: int) -> list[tuple[int, float]]:
        """tie-break: score desc, docID asc (HitQueue.java:76-81)."""
        return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]

    def key_of(self, doc_id: int) -> str:
        r = self.pdf.iloc[doc_id]
        return f"{r['repo']}|{r['path']}|{r['commit']}"
