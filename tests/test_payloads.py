"""Payloads: DelimitedPayloadTokenFilter parsing, the .pay stream through
build/merge, and PayloadScoreQuery scoring (Min/Max/Sum/Average functions,
includeSpanScore product) — pinned against a pure-Python reference over
raw annotated text."""

import numpy as np
import pandas as pd
import pytest

from lucene_solr_1_spark.index.builder import add_documents, build_index
from lucene_solr_1_spark.kernels.analyzer import (
    parse_delimited_payloads, tokenize_one,
)
from lucene_solr_1_spark.search.query import (
    PayloadScore, SpanNear, SpanOr, SpanTerm, Term,
)
from lucene_solr_1_spark.search.searcher import LuceneSparkSearcher


def test_parse_delimited_payloads_alignment():
    t, p = parse_delimited_payloads("rain|2.5 and snow|0.5 mixed")
    assert t == "rain and snow mixed"
    assert p.tolist() == [2.5, 1.0, 0.5, 1.0]
    t2, p2 = parse_delimited_payloads("plain text")
    assert t2 == "plain text" and p2.tolist() == [1.0, 1.0]
    t3, p3 = parse_delimited_payloads("neg|-1.5 end|3")
    assert t3 == "neg end" and p3.tolist() == [-1.5, 3.0]


VOCAB = ["rain", "snow", "hail", "wind", "fog"]


def _annotated_corpus(n_docs: int = 30, n_tokens: int = 25) -> pd.DataFrame:
    rng = np.random.default_rng(17)
    rows = []
    for i in range(n_docs):
        toks = []
        for t in rng.choice(VOCAB, size=n_tokens):
            if rng.random() < 0.4:
                toks.append(f"{t}|{round(float(rng.uniform(0.1, 5.0)), 2)}")
            else:
                toks.append(str(t))
        rows.append((f"r/{i % 3}", f"p/{i:04d}", f"c{i:05x}", "en", " ".join(toks)))
    return pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])


@pytest.fixture(scope="module")
def pay_setup(spark, tmp_path_factory):
    pdf = _annotated_corpus()
    d = str(tmp_path_factory.mktemp("idx_pay"))
    build_index(spark, spark.createDataFrame(pdf), d, num_segments=3,
                store_payloads=True)
    return LuceneSparkSearcher(spark, d), pdf


def _doc_payload_map(pdf: pd.DataFrame) -> list:
    """Per doc (in global docID order): (tokens, payload array)."""
    out = []
    for text in (
        pdf.sort_values(["repo", "path", "commit"]).reset_index(drop=True)["content"]
    ):
        clean, pays = parse_delimited_payloads(text)
        toks, _ = tokenize_one(clean)
        out.append((toks, pays))
    return out


def _ref_factor(toks, pays, term, func):
    vals = [float(pays[i]) for i, t in enumerate(toks) if t == term]
    if not vals:
        return None
    if func == "max":
        return max(vals)
    if func == "min":
        return min(vals)
    acc = np.float32(0.0)
    for v in vals:  # float32 accumulation in collection order
        acc = np.float32(acc + np.float32(v))
    if func == "sum":
        return float(acc)
    return float(np.float32(acc / np.float32(len(vals))))


@pytest.mark.parametrize("func", ["min", "max", "sum", "avg"])
def test_payload_factor_matches_reference(pay_setup, func):
    searcher, pdf = pay_setup
    hits = searcher.search(
        PayloadScore(SpanTerm("rain"), func=func, include_span_score=False),
        k=len(pdf), with_stored=False,
    )
    got = dict(zip(hits["global_doc_id"].astype(int), hits["score"].astype(np.float32)))
    docs = _doc_payload_map(pdf)
    want = {
        i: np.float32(f)
        for i, (toks, pays) in enumerate(docs)
        if (f := _ref_factor(toks, pays, "rain", func)) is not None
    }
    assert got == want


def test_payload_include_span_score_product(pay_setup):
    """includeSpanScore: score = f32(span_score * factor) — the span score
    equals the plain SpanTerm query's score."""
    searcher, pdf = pay_setup
    base = searcher.search(SpanTerm("snow"), k=len(pdf), with_stored=False)
    pay = searcher.search(
        PayloadScore(SpanTerm("snow"), func="max", include_span_score=True),
        k=len(pdf), with_stored=False,
    )
    fac = searcher.search(
        PayloadScore(SpanTerm("snow"), func="max", include_span_score=False),
        k=len(pdf), with_stored=False,
    )
    b = dict(zip(base["global_doc_id"], base["score"].astype(np.float32)))
    f = dict(zip(fac["global_doc_id"], fac["score"].astype(np.float32)))
    p = dict(zip(pay["global_doc_id"], pay["score"].astype(np.float32)))
    assert set(p) == set(b)
    for d in p:
        assert p[d] == np.float32(b[d] * f[d])


def test_payload_unannotated_index_factor_is_one(spark, tmp_path):
    """Payload query on a payload-less index: every factor is the null-
    payload default 1.0 (score == plain span score)."""
    pdf = _annotated_corpus(10)
    pdf["content"] = pdf["content"].str.replace(r"\|[0-9.-]+", "", regex=True)
    d = str(tmp_path / "nopay")
    build_index(spark, spark.createDataFrame(pdf), d, num_segments=2)
    s = LuceneSparkSearcher(spark, d)
    # max over all-1.0 null payloads == 1 -> score == plain span score
    a = s.search(PayloadScore(SpanTerm("rain"), func="max",
                              include_span_score=True), k=20, with_stored=False)
    b = s.search(SpanTerm("rain"), k=20, with_stored=False)
    pd.testing.assert_frame_equal(a.reset_index(drop=True), b.reset_index(drop=True))
    # sum over null payloads == payloadsSeen (SumPayloadFunction over the
    # FLOAT_DECODER null->1 convention): factor equals the occurrence count
    f = s.search(PayloadScore(SpanTerm("rain"), func="sum",
                              include_span_score=False), k=20, with_stored=False)
    assert set(f["score"].astype(float)) <= {float(i) for i in range(1, 30)}


def test_payloads_survive_merge(spark, tmp_path):
    from lucene_solr_1_spark.index.merge import merge_down

    pdf = _annotated_corpus(24)
    d = str(tmp_path / "paymerge")
    build_index(spark, spark.createDataFrame(pdf), d, num_segments=4,
                store_payloads=True)
    s1 = LuceneSparkSearcher(spark, d)
    q = PayloadScore(SpanOr(("rain", "snow")), func="sum",
                     include_span_score=True)
    before = s1.search(q, k=30, with_stored=False)
    merge_down(spark, d, target_segments=1)
    s2 = LuceneSparkSearcher(spark, d)
    after = s2.search(q, k=30, with_stored=False)
    cols = ["rank", "score", "global_doc_id"]  # segment ids change on merge
    pd.testing.assert_frame_equal(
        before[cols].reset_index(drop=True), after[cols].reset_index(drop=True)
    )


def test_payloads_sticky_on_append(spark, tmp_path):
    pdf = _annotated_corpus(12)
    d = str(tmp_path / "payapp")
    build_index(spark, spark.createDataFrame(pdf), d, num_segments=2,
                store_payloads=True)
    extra = pd.DataFrame(
        [("r/9", "p/zzz", "cz", "en", "hail|9.5 storm")],
        columns=["repo", "path", "commit", "lang", "content"],
    )
    add_documents(spark, spark.createDataFrame(extra), d, num_segments=1)
    s = LuceneSparkSearcher(spark, d)
    hits = s.search(
        PayloadScore(SpanTerm("hail"), func="max", include_span_score=False),
        k=30, with_stored=True,
    )
    got = dict(zip(hits["path"], hits["score"].astype(np.float32)))
    assert got["p/zzz"] == np.float32(9.5)
    # appended doc's stored content is clean
    row = hits[hits["path"] == "p/zzz"]
    assert len(row) == 1


def test_payload_near_window_collection(spark, tmp_path):
    """SpanNear payload collection covers the leaf occurrences inside the
    matched window (both clause terms contribute)."""
    rows = [("r", "p/0", "c0", "en", "rain|2 x snow|7 y"),
            ("r", "p/1", "c1", "en", "rain|9 far far far far far far snow|1")]
    pdf = pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])
    d = str(tmp_path / "paynear")
    build_index(spark, spark.createDataFrame(pdf), d, num_segments=1,
                store_payloads=True)
    s = LuceneSparkSearcher(spark, d)
    hits = s.search(
        PayloadScore(SpanNear(("rain", "snow"), slop=2), func="max",
                     include_span_score=False),
        k=10, with_stored=True,
    )
    got = dict(zip(hits["path"], hits["score"].astype(np.float32)))
    assert got == {"p/0": np.float32(7.0)}  # p/1's near window exceeds slop
