"""Relevance-quality evaluation — the QualityBenchmark analog
(lucene/benchmark/src/java/org/apache/lucene/benchmark/quality/
QualityBenchmark.java, trec/ judge framework): run a query set against a
searcher, score ranked results vs relevance judgments (qrels) with the
standard IR metrics the reference harness reports (precision@k, recall@k,
average precision / MAP, NDCG@k).

Judgments are binary (TrecJudge model). Doc identity = the stored-field
key `repo|path|commit` so metrics survive docID remapping across segment
layouts.
"""

from __future__ import annotations

import math


def key_of(row) -> str:
    return f"{row.repo}|{row.path}|{row.commit}"


def precision_at_k(ranked: list[str], relevant: set, k: int) -> float:
    top = ranked[:k]
    if not top:
        return 0.0
    return sum(1 for d in top if d in relevant) / len(top)


def recall_at_k(ranked: list[str], relevant: set, k: int) -> float:
    if not relevant:
        return 0.0
    return sum(1 for d in ranked[:k] if d in relevant) / len(relevant)


def average_precision(ranked: list[str], relevant: set) -> float:
    """AP over the returned ranking (QualityStats.getAvp model)."""
    if not relevant:
        return 0.0
    hits, s = 0, 0.0
    for i, d in enumerate(ranked):
        if d in relevant:
            hits += 1
            s += hits / (i + 1)
    return s / len(relevant)


def ndcg_at_k(ranked: list[str], relevant: set, k: int) -> float:
    dcg = sum(
        1.0 / math.log2(i + 2) for i, d in enumerate(ranked[:k]) if d in relevant
    )
    ideal = sum(1.0 / math.log2(i + 2) for i in range(min(len(relevant), k)))
    return dcg / ideal if ideal else 0.0


def evaluate(searcher, query_set: dict, qrels: dict, k: int = 10) -> dict:
    """query_set: name → Query; qrels: name → set of relevant doc keys.
    Returns per-query metrics + macro averages (the benchmark report)."""
    per_query = {}
    for name, q in query_set.items():
        hits = searcher.search(q, k=k)
        ranked = [key_of(r) for r in hits.itertuples(index=False)]
        rel = qrels.get(name, set())
        per_query[name] = {
            "p_at_k": precision_at_k(ranked, rel, k),
            "recall_at_k": recall_at_k(ranked, rel, k),
            "ap": average_precision(ranked, rel),
            "ndcg_at_k": ndcg_at_k(ranked, rel, k),
            "returned": len(ranked),
        }
    n = max(len(per_query), 1)
    return {
        "map": sum(m["ap"] for m in per_query.values()) / n,
        "mean_p_at_k": sum(m["p_at_k"] for m in per_query.values()) / n,
        "mean_ndcg": sum(m["ndcg_at_k"] for m in per_query.values()) / n,
        "k": k,
        "queries": per_query,
    }
