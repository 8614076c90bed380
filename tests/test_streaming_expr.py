"""Solr streaming expressions (solrj/io/stream) — parser goldens, error
shapes, semantics references, and Spark==DuckDB twin equality (the two
backends compile from ONE parsed AST)."""

import duckdb
import pandas as pd
import pytest

from lucene_solr_1_spark.sql.streaming_expr import (
    SExpr,
    StreamSyntaxError,
    parse_stream_expr,
    stream_duck,
    stream_spark,
)

SF = "/root/testdata/sf0.001"


def _duck_run(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    return con.execute(sql).fetchdf()


def _assert_same(sdf: pd.DataFrame, ddf: pd.DataFrame):
    cols = sorted(sdf.columns)
    assert cols == sorted(ddf.columns)
    a = sdf[cols].sort_values(cols, ignore_index=True)
    b = ddf[cols].sort_values(cols, ignore_index=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False, rtol=1e-9)


# ---------------------------------------------------------------------------
# grammar (StreamExpressionParser.java shapes)
# ---------------------------------------------------------------------------

def test_parse_shapes():
    e = parse_stream_expr('rollup(search(documents, q="a b"), over="lang", count(*), sum(n_chars))')
    assert e.func == "rollup"
    assert isinstance(e.args[0], SExpr) and e.args[0].func == "search"
    assert e.args[0].named_dict()["q"] == "a b"
    assert e.args[1] == SExpr("count", ("*",))
    assert e.args[2] == SExpr("sum", ("n_chars",))
    assert e.named_dict()["over"] == "lang"
    # quoted escapes + bare numeric values
    e2 = parse_stream_expr('top(n=40, sort="score desc", search(documents, q="say \\"hi\\""))')
    assert e2.named_dict()["n"] == "40"
    assert e2.args[0].named_dict()["q"] == 'say "hi"'
    # nested boolean evaluators
    e3 = parse_stream_expr("having(search(documents), and(gt(a, 1), not(eq(b, 2))))")
    assert e3.args[1].func == "and"
    assert e3.args[1].args[1].func == "not"


def test_parse_errors():
    for bad in (
        "top(n=1",                        # unterminated
        'search(documents, q="x") tail',  # trailing input
        "()",                             # no function name
        'search(documents, q="unterminated',  # unterminated quote
    ):
        with pytest.raises(StreamSyntaxError):
            parse_stream_expr(bad)


def test_compile_errors(spark):
    with pytest.raises(StreamSyntaxError):
        stream_spark(spark, SF, 'nosuch(search(documents, q="a", fl="doc_id"))')
    with pytest.raises(StreamSyntaxError):
        # fl must carry doc_id (tuple identity / deterministic rows cut)
        stream_spark(spark, SF, 'search(documents, q="data", fl="lang", sort="lang asc")')
    with pytest.raises(StreamSyntaxError):
        # rows cut on a sort field outside fl
        stream_spark(
            spark, SF,
            'search(documents, q="data", fl="doc_id,lang", sort="n_chars desc", rows=5)',
        )
    with pytest.raises(StreamSyntaxError):
        # bad sort direction surfaces at compile time
        stream_spark(
            spark, SF,
            'top(n=1, sort="lang up", search(documents, q="data", fl="doc_id,lang", sort="doc_id asc"))',
        )


# ---------------------------------------------------------------------------
# semantics references
# ---------------------------------------------------------------------------

def test_unique_keeps_first_in_sort_order(spark):
    """UniqueStream.java:88-93 — DistinctOperation keeps the FIRST tuple of
    each `over` group under the stream sort. Reference: compute the same
    from the full (uncut) stream with pandas."""
    base = 'search(documents, q="fast OR sort", fl="doc_id,score,lang", sort="score desc")'
    full = stream_spark(spark, SF, base).toPandas()
    uniq = stream_spark(spark, SF, f'unique({base}, over="lang")').toPandas()
    ref = (
        full.sort_values(["score", "doc_id"], ascending=[False, True])
        .groupby("lang", as_index=False)
        .first()
    )
    _assert_same(uniq, ref[uniq.columns])


def test_join_right_side_wins_on_shared_names(spark):
    """InnerJoinStream.read(): joined tuple = left.clone().merge(right) —
    the right stream's value overwrites a shared field name."""
    expr = (
        'innerJoin(search(documents, q="data", fl="doc_id,score", sort="doc_id asc"),'
        ' select(search(documents, q="data AND query", fl="doc_id,score",'
        ' sort="doc_id asc"), "doc_id", "score as s2", "score"),'
        ' on="doc_id")'
    )
    out = stream_spark(spark, SF, expr).toPandas()
    # right carried both s2 and score (same value): right's score must win
    assert (out["score"] == out["s2"]).all()


def test_top_is_deterministic_under_score_ties(spark):
    """Rank cuts append a doc_id tie-break in BOTH backends."""
    expr = (
        'top(n=7, sort="lang asc", search(documents, q="data",'
        ' fl="doc_id,lang", sort="doc_id asc"))'
    )
    a = stream_spark(spark, SF, expr).toPandas()
    b = stream_spark(spark, SF, expr).toPandas()
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    _assert_same(a, _duck_run(stream_duck(expr)))


def test_stream_compositions_match_duck(spark):
    """Backend equality on compositions not covered by the driver gate."""
    exprs = [
        # sort + select rename + having on a renamed column
        'having(select(sort(search(documents, q="data", fl="doc_id,n_chars",'
        ' sort="doc_id asc"), by="n_chars desc"), "doc_id", "n_chars as nc"),'
        " gteq(nc, 300))",
        # intersect: left tuples whose key appears in right
        'intersect(search(documents, q="data", fl="doc_id,lang", sort="doc_id asc"),'
        ' search(documents, q="query", fl="doc_id", sort="doc_id asc"), on="doc_id")',
        # leftOuterJoin with COALESCE merge on the shared score column
        'leftOuterJoin(search(documents, q="data", fl="doc_id,score", sort="doc_id asc"),'
        ' search(documents, q="data AND query", fl="doc_id,score", sort="doc_id asc"),'
        ' on="doc_id")',
        # rollup over a merge of two searches
        'rollup(merge(search(documents, q="slow", fl="doc_id,lang", sort="doc_id asc"),'
        ' search(documents, q="batch", fl="doc_id,lang", sort="doc_id asc"),'
        ' on="doc_id asc"), over="lang", count(*))',
    ]
    for expr in exprs:
        sdf = stream_spark(spark, SF, expr).toPandas()
        ddf = _duck_run(stream_duck(expr))
        assert len(sdf) > 0, expr
        _assert_same(sdf, ddf)


def test_search_rows_cut_matches_duck(spark):
    expr = (
        'search(documents, q="data OR query", fl="doc_id,score,lang",'
        ' sort="score desc", rows=12)'
    )
    sdf = stream_spark(spark, SF, expr).toPandas()
    assert len(sdf) == 12
    _assert_same(sdf, _duck_run(stream_duck(expr)))


def test_stream_join_plans_no_cartesian(spark):
    """Joins/complement/intersect compile to equi-joins — never
    CartesianProduct / BroadcastNestedLoopJoin (the 100 TB guard)."""
    exprs = [
        'innerJoin(search(documents, q="data", fl="doc_id,score", sort="doc_id asc"),'
        ' select(search(documents, q="query", fl="doc_id,score", sort="doc_id asc"),'
        ' "doc_id", "score as s2"), on="doc_id")',
        'complement(search(documents, q="data", fl="doc_id", sort="doc_id asc"),'
        ' search(documents, q="query", fl="doc_id", sort="doc_id asc"), on="doc_id")',
        'intersect(search(documents, q="data", fl="doc_id", sort="doc_id asc"),'
        ' search(documents, q="query", fl="doc_id", sort="doc_id asc"), on="doc_id")',
    ]
    for expr in exprs:
        plan = (
            stream_spark(spark, SF, expr)
            ._jdf.queryExecution().executedPlan().toString()
        )
        # (BroadcastNestedLoopJoin DOES appear — it is the 1-row `totals`
        # scalar broadcast inside the BM25 scorer, a constant-size build
        # side; the stream-level `on` join must still be an equi-join)
        assert "CartesianProduct" not in plan, expr
        assert any(j in plan for j in
                   ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin")), expr


def test_fetch_joins_extra_fields(spark):
    """FetchStream: extra collection fields batch-joined onto the stream
    by key; tuple count unchanged (left join)."""
    expr = (
        'fetch(documents, top(n=9, sort="score desc", search(documents,'
        ' q="data", fl="doc_id,score", sort="doc_id asc")),'
        ' on="doc_id", fl="lang,n_chars")'
    )
    sdf = stream_spark(spark, SF, expr).toPandas()
    assert len(sdf) == 9
    assert {"doc_id", "score", "lang", "n_chars"} == set(sdf.columns)
    assert sdf["lang"].notna().all()
    _assert_same(sdf, _duck_run(stream_duck(expr)))


def test_missing_required_params_raise_syntax_error(spark):
    for bad in (
        "search(documents)",                              # no q/fl
        'search(documents, q="data")',                    # no fl
        'top(n=3, search(documents, q="a", fl="doc_id"))',  # no sort
    ):
        with pytest.raises(StreamSyntaxError):
            stream_spark(spark, SF, bad)


def test_missing_required_params_raise_syntax_errors_everywhere():
    """Every required named parameter raises StreamSyntaxError (not bare
    KeyError/TypeError) in BOTH backends."""
    import pytest

    from lucene_solr_1_spark.sql.streaming_expr import (
        StreamSyntaxError, parse_stream_expr, stream_duck,
    )

    inner = 'search(documents, q="query", fl="doc_id,score_bm25", sort="score_bm25 desc")'
    bad = [
        f"top({inner}, sort=\"score_bm25 desc\")",          # top missing n
        f"top({inner}, n=3)",                                # top missing sort
        f"sort({inner})",                                    # sort missing by
        f"unique({inner})",                                  # unique missing over
        f"rollup({inner}, count(*))",                        # rollup missing over
        f"innerJoin({inner}, {inner})",                      # join missing on
        f"complement({inner}, {inner})",                     # complement missing on
        f"merge({inner}, {inner})",                          # merge missing on
        f"fetch(documents, {inner})",                        # fetch missing fl
    ]
    for expr in bad:
        with pytest.raises(StreamSyntaxError):
            stream_duck(parse_stream_expr(expr))
