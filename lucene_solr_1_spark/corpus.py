"""Deterministic synthetic source-code corpus (FIXTURES.md §1).

Shape is exactly the BASELINE.json input_hint Iceberg table:
  (repo: string, path: string, commit: string, lang: string, content: string)

Generation is per-file-index deterministic (seeded by (SEED, i)), so a
distributed generation over any partitioning produces the identical corpus —
this is what makes the resume/merge-invariance tests and the two-parallelism
scaling benchmark compare like-for-like.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

SEED = 42
EXTS = {"py": "python", "java": "java", "scala": "scala", "c": "c"}
_EXT_LIST = sorted(EXTS)

# Hot terms: language keywords (Zipf head); long tail: synthetic identifiers.
KEYWORDS = (
    "return int public static void if else for while class def import "
    "new null true false try catch final private this self int long "
    "string float double"
).split()
N_IDENTIFIERS = 5000
VOCAB = np.asarray(
    KEYWORDS + [f"id_{i:04d}" for i in range(N_IDENTIFIERS)], dtype=object
)


def _zipf_probs(n: int, s: float = 1.07) -> np.ndarray:
    ranks = np.arange(1, n + 1, dtype=np.float64)
    p = ranks ** (-s)
    return p / p.sum()


_PROBS = _zipf_probs(len(VOCAB))


def _gen_content(rng: np.random.Generator, n_tokens: int) -> str:
    toks = rng.choice(VOCAB, size=n_tokens, p=_PROBS)
    # lightweight code-ish punctuation so the tokenizer has work to do
    lines = []
    for j in range(0, len(toks), 8):
        lines.append(" ".join(toks[j : j + 8]) + (";" if j % 16 else " {"))
    return "\n".join(lines)


def _edge_case_content(i: int) -> str | None:
    """Edge-case rows always present at the head of the corpus (FIXTURES.md §1)."""
    if i == 0:
        return ""  # empty content
    if i == 1:
        return "the and of to a in is it that this"  # stopwords only
    if i == 2:
        # one overlong token (>255 chars): dropped, consumes a position
        return "alpha " + ("z" * 300) + " beta gamma"
    if i == 3:
        return "naïve café δelta ünïcode_id return int"  # unicode identifiers
    if i == 4:
        # hot term repeated >128 times ⇒ multi-block posting within one doc
        return " ".join(["return"] * 200) + " tail_marker"
    return None


def make_file(i: int, n_repos: int) -> tuple[str, str, str, str, str]:
    rng = np.random.default_rng([SEED, i])
    repo = f"org/repo-{i % n_repos}"
    ext = _EXT_LIST[i % len(_EXT_LIST)]
    path = f"src/d{(i // 7) % 13}/f_{i}.{ext}"
    commit = hashlib.sha1(f"{repo}:{path}".encode()).hexdigest()
    content = _edge_case_content(i)
    if content is None:
        n_tokens = int(rng.integers(20, 401))
        content = _gen_content(rng, n_tokens)
    return repo, path, commit, EXTS[ext], content


def make_corpus_pandas(n_files: int, n_repos: int = 20, start: int = 0) -> pd.DataFrame:
    rows = [make_file(i, n_repos) for i in range(start, start + n_files)]
    return pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])


CORPUS_DDL = "repo string, path string, commit string, lang string, content string"


def corpus_spark_df(spark, n_files: int, n_repos: int = 20, partitions: int = 8):
    """Distributed deterministic generation: range → mapInPandas.

    Identical rows regardless of `partitions` (per-index seeding), so the
    same logical corpus is produced at local[8] and local[32].
    """
    idx = spark.range(0, n_files, 1, partitions)

    def gen(batches):
        for pdf in batches:
            yield make_corpus_pandas_from_ids(pdf["id"].to_numpy(), n_repos)

    return idx.mapInPandas(gen, schema=CORPUS_DDL)


def make_corpus_pandas_from_ids(ids: np.ndarray, n_repos: int = 20) -> pd.DataFrame:
    rows = [make_file(int(i), n_repos) for i in ids]
    return pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])
