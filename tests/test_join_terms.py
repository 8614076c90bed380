"""JoinUtil score modes + Solr TermsComponent: pandas references on the
sf0.001 parquet (the DuckDB twins are the driver-gate check; these pin
semantics without SQL in the loop)."""

import re

import pandas as pd
import pytest

from lucene_solr_1_spark.sql import relational as R

SF = "/root/testdata/sf0.001"


def _scored(spark, term) -> pd.DataFrame:
    return R.bm25_bool_spark(spark, SF, should=(term,), k=None).toPandas()


@pytest.mark.parametrize("mode,agg", [
    ("total", "sum"), ("max", "max"), ("min", "min"), ("avg", "mean"),
])
def test_join_scored_modes_reference(spark, mode, agg):
    """Every to-doc of a join value scores the from-side aggregate
    (TermsWithScoreCollector.java:74-134)."""
    got = R.join_query_scored_spark(
        spark, SF, "customer", score_mode=mode, k=10
    ).toPandas()
    docs = R.load_documents(spark, SF).toPandas()[["doc_id", "source"]]
    sc = _scored(spark, "customer").merge(docs, on="doc_id")
    keys = sc.groupby("source")["score"].agg(agg)
    ref = docs[docs["source"].isin(keys.index)].copy()
    ref["score"] = ref["source"].map(keys).round(4)
    ref = ref.sort_values(
        ["score", "doc_id"], ascending=[False, True]
    ).head(10).reset_index(drop=True)
    assert got["doc_id"].tolist() == ref["doc_id"].tolist()
    assert got["score"].tolist() == pytest.approx(ref["score"].tolist(), abs=1e-9)


def test_join_scored_constant_per_key(spark):
    """All to-docs sharing a join value carry ONE score."""
    got = R.join_query_scored_spark(spark, SF, "customer", "max", k=10).toPandas()
    per_key = got.groupby("source")["score"].nunique()
    assert (per_key == 1).all()


def test_terms_enum_reference(spark):
    """terms.prefix/mincount/limit with count-desc, term-asc tie order
    (TermsComponent.java:168-236)."""
    got = R.terms_enum_spark(spark, SF, prefix="s", mincount=2, limit=10).toPandas()
    docs = R.load_documents(spark, SF).toPandas()
    df_count: dict = {}
    for _, row in docs.iterrows():
        for t in set(re.findall(r"[a-z0-9_]+", row["text"].lower())):
            if t.startswith("s"):
                df_count[t] = df_count.get(t, 0) + 1
    ref = sorted(
        ((t, c) for t, c in df_count.items() if c >= 2),
        key=lambda x: (-x[1], x[0]),
    )[:10]
    assert list(zip(got["term"], got["df"].astype(int))) == ref


def test_terms_enum_df_is_docfreq_not_ttf(spark):
    """df counts DOCUMENTS, not occurrences (the TermsEnum.docFreq
    contract) — a term repeated in one doc counts once."""
    got = R.terms_enum_spark(spark, SF, prefix="", mincount=1, limit=5).toPandas()
    n_docs = R.load_documents(spark, SF).count()
    assert (got["df"] <= n_docs).all()
