"""Round-3 tail operators: StatsComponent, DrillSideways, term vectors.

Each is checked against an independent pandas reference built from the
same sf0.001 parquet (the DuckDB twins are the driver-gate check; these
pin semantics without SQL in the loop).
"""

import pandas as pd

from lucene_solr_1_spark.sql import relational as R

SF = "/root/testdata/sf0.001"


def _matched(spark, term):
    scored = R.bm25_bool_spark(spark, SF, should=(term,), k=None).toPandas()
    docs = R.load_documents(spark, SF).toPandas()
    return docs[docs["doc_id"].isin(scored["doc_id"])]


def test_stats_numeric_reference(spark):
    got = R.stats_numeric_spark(spark, SF, "query").toPandas()
    m = _matched(spark, "query")
    ref = (
        m.groupby("lang")["n_chars"]
        .agg(cnt="count", min_chars="min", max_chars="max",
             sum_chars="sum", mean_chars="mean", stddev_chars="std")
        .reset_index()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    ref["mean_chars"] = ref["mean_chars"].round(4)
    ref["stddev_chars"] = ref["stddev_chars"].round(4)
    got = got.sort_values("lang").reset_index(drop=True)
    assert got["lang"].tolist() == ref["lang"].tolist()
    for c in ("cnt", "min_chars", "max_chars", "sum_chars"):
        assert got[c].astype(int).tolist() == ref[c].astype(int).tolist()
    pd.testing.assert_series_equal(got["mean_chars"], ref["mean_chars"],
                                   check_dtype=False)
    pd.testing.assert_series_equal(got["stddev_chars"], ref["stddev_chars"],
                                   check_dtype=False)


def test_drill_sideways_reference(spark):
    """Drilled dim counts ignore its own constraint; other dims honor it."""
    got = R.drill_sideways_spark(spark, SF, "query", "en").toPandas()
    m = _matched(spark, "query")
    side = got[got["dim"] == "lang"].set_index("value")["cnt"]
    ref_side = m.groupby("lang").size()
    assert side.astype(int).to_dict() == ref_side.astype(int).to_dict()
    drilled = got[got["dim"] == "source"].set_index("value")["cnt"]
    ref_drill = m[m["lang"] == "en"].groupby("source").size()
    assert drilled.astype(int).to_dict() == ref_drill.astype(int).to_dict()
    flags = got[got["dim"] == "lang"].set_index("value")["in_drilldown"]
    assert bool(flags.get("en", False)) is True
    assert not flags.drop(index="en", errors="ignore").any()
    assert not got[got["dim"] == "source"]["in_drilldown"].any()


def test_term_vectors_reference(spark):
    import re

    from lucene_solr_1_spark.kernels.analyzer import SQL_TOKEN_PATTERN

    ids = (1, 5, 9)
    got = R.term_vector_spark(spark, SF, ids).toPandas()
    docs = R.load_documents(spark, SF).toPandas()
    sel = docs[docs["doc_id"].isin(ids)].sort_values("doc_id")
    ref_rows = []
    for _, r in sel.iterrows():
        toks = re.findall(SQL_TOKEN_PATTERN, r["text"].lower())
        vc = pd.Series(toks).value_counts()
        for term in sorted(vc.index):
            ref_rows.append((int(r["doc_id"]), term, int(vc[term])))
    ref = pd.DataFrame(ref_rows, columns=["doc_id", "term", "freq"])
    got2 = got.astype({"doc_id": int, "freq": int}).reset_index(drop=True)
    pd.testing.assert_frame_equal(got2, ref, check_dtype=False)


def test_query_elevation_semantics(spark):
    """QueryElevationComponent contract: elevated docs first in CONFIG
    order with elevated=true, excluded docs absent, organic BM25 fills
    the rest in (score desc, doc_id) order without duplicates."""
    from lucene_solr_1_spark.sql import relational as R

    out = R.query_elevation_spark(
        spark, SF, "query", elevated=(7, 3), excluded=(5,), k=10
    ).toPandas()
    assert out["doc_id"].tolist()[:2] == [7, 3]
    assert out["elevated"].tolist()[:2] == [True, True]
    assert not out["elevated"].iloc[2:].any()
    assert 5 not in set(out["doc_id"])
    assert len(out) == 10 and out["doc_id"].is_unique
    assert out["rank"].tolist() == list(range(10))
    organic = out.iloc[2:]
    assert (organic["score"].to_numpy()[:-1] >= organic["score"].to_numpy()[1:]).all()


def test_facet_queries_reference(spark):
    """facet.query counts (SimpleFacets.getFacetQueryCounts): docs of the
    main match set also matching each named facet term."""
    import re

    got = R.facet_queries_spark(
        spark, SF, "query", ("merge", "spark")
    ).toPandas().set_index("facet")
    docs = R.load_documents(spark, SF).toPandas()
    toks = docs["text"].map(lambda t: set(re.findall(r"[a-z0-9_]+", t.lower())))
    main = toks.map(lambda s: "query" in s)
    assert int(got.loc["merge", "n_matched"]) == int(main.sum())
    for t in ("merge", "spark"):
        want = int((main & toks.map(lambda s: t in s)).sum())
        assert int(got.loc[t, "cnt"]) == want


def test_group_facets_each_group_counts_once(spark):
    """Solr group.facet / GroupFacetCollector: a facet value's count is
    the number of GROUPS with a matching doc, independent of how many
    matching docs each group holds (pandas reference)."""
    import pandas as pd

    from lucene_solr_1_spark.kernels.analyzer import tokenize_one
    from lucene_solr_1_spark.sql.relational import group_facets_spark

    sf = "/root/testdata/sf0.001"
    got = group_facets_spark(spark, sf, "query").toPandas()
    docs = pd.read_parquet(f"{sf}/documents.parquet")
    m = docs[docs["text"].map(lambda t: "query" in tokenize_one(t)[0])]
    ref = (
        m.groupby("lang")["source"].nunique().reset_index(name="group_count")
        .sort_values(["group_count", "lang"], ascending=[False, True],
                     ignore_index=True)
    )
    assert got[["lang", "group_count"]].values.tolist() == ref.values.tolist()
    # groups counted once: raw doc counts differ from group counts
    raw = m.groupby("lang").size()
    assert (raw > ref.set_index("lang")["group_count"]).any()


def test_block_join_one_parent_scoped_to_block(spark):
    """ParentChildrenBlockJoinQuery: results come ONLY from the given
    parent block, scored by the child query."""
    from lucene_solr_1_spark.sql.relational import block_join_one_parent_spark

    sf = "/root/testdata/sf0.001"
    got = block_join_one_parent_spark(spark, sf, "src3", "query", k=50).toPandas()
    assert len(got) > 0
    assert set(got["source"]) == {"src3"}
    assert got["score"].is_monotonic_decreasing
