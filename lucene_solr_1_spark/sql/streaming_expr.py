"""Solr streaming expressions compiled to DataFrame plans.

Reference: `solr/solrj/src/java/org/apache/solr/client/solrj/io/stream/`
- grammar: `expr/StreamExpressionParser.java` — `func(arg, arg, name=value)`
  nesting with quoted values
- `search`: `CloudSolrStream.java` / `SearchStream.java` (q / fl / sort /
  rows parameters; tuples carry the fl fields, `score` when requested)
- `select`: `SelectStream.java` ("a as b" renames, plain field keeps)
- `top`: `RankStream.java` (re-sort under its own comparator, keep n)
- `unique`: `UniqueStream.java:88-93` — ReducerStream + DistinctOperation:
  FIRST tuple of each `over` group in the stream's sort order
- `rollup`: `RollupStream.java:66-103` — buckets from `over`, metric
  operands sum/avg/min/max/count
- `innerJoin`/`leftOuterJoin`/`hashJoin`: `InnerJoinStream.java:49-105`,
  `JoinStream.java` — joined tuple is `left.clone().merge(right)`: the
  RIGHT side's value wins on shared field names
- `merge`: `MergeStream.java` — union of two streams interleaved under the
  `on` comparator (same tuple set as UNION ALL; order carried as sort spec)
- `complement`/`intersect`: `ComplementStream.java`, `IntersectStream.java`
  — emit left tuples whose `on` key is absent / present in the right
- `having`: `HavingStream.java` with the boolean evaluators
  (`io/eval/GreaterThanEvaluator.java` etc.): gt/gteq/lt/lteq/eq/and/or/not

Spark-first mapping: each stream op IS a DataFrame transformation —
search = the relational BM25 scorer (sql/relational.py) joined to its fl
columns, unique = window row_number over the carried sort, rollup =
groupBy().agg(), joins = equi-joins (Catalyst picks hash vs merge — the
hashJoin/innerJoin distinction is a physical hint the optimizer owns).

Twin invariant: `compile_spark` and `compile_duck` walk the SAME parsed
AST, so the two backends cannot drift (CLAUDE.md relational-twin rule).
Determinism: every rank-cutting op (search `rows`, `top`) appends a
`doc_id` tie-break in BOTH backends; `unique` orders its window by the
carried sort + tie-break.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import relational as R

# ---------------------------------------------------------------------------
# expression grammar (StreamExpressionParser.java analog)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class SExpr:
    """One `func(...)` node: positional args are nested SExprs or bare
    strings; named args are `name=value` pairs (value: string or SExpr)."""

    func: str
    args: tuple = ()
    named: tuple = ()  # ((name, value), ...) — kept ordered & hashable

    def named_dict(self) -> dict:
        return dict(self.named)


class StreamSyntaxError(ValueError):
    pass


def parse_stream_expr(s: str) -> SExpr:
    expr, pos = _parse_expr(s, 0)
    if s[pos:].strip():
        raise StreamSyntaxError(f"trailing input at {pos}: {s[pos:]!r}")
    return expr


def _skip_ws(s: str, i: int) -> int:
    while i < len(s) and s[i].isspace():
        i += 1
    return i


def _parse_ident(s: str, i: int) -> tuple[str, int]:
    j = i
    while j < len(s) and (s[j].isalnum() or s[j] in "_*"):
        j += 1
    if j == i:
        raise StreamSyntaxError(f"expected identifier at {i}: {s[i:i+20]!r}")
    return s[i:j], j


def _parse_quoted(s: str, i: int) -> tuple[str, int]:
    # i points at the opening quote
    q = s[i]
    j = i + 1
    out = []
    while j < len(s):
        c = s[j]
        if c == "\\" and j + 1 < len(s):
            out.append(s[j + 1])
            j += 2
            continue
        if c == q:
            return "".join(out), j + 1
        out.append(c)
        j += 1
    raise StreamSyntaxError("unterminated quoted value")


def _parse_value(s: str, i: int):
    """A parameter value: quoted string, nested expression, or bare token."""
    i = _skip_ws(s, i)
    if i < len(s) and s[i] in "\"'":
        return _parse_quoted(s, i)
    # nested expression? ident followed by '('
    j = i
    while j < len(s) and (s[j].isalnum() or s[j] in "_*"):
        j += 1
    k = _skip_ws(s, j)
    if j > i and k < len(s) and s[k] == "(":
        return _parse_expr(s, i)
    # bare token: up to ',' or ')' at this level
    while j < len(s) and s[j] not in ",)":
        j += 1
    tok = s[i:j].strip()
    if not tok:
        raise StreamSyntaxError(f"empty value at {i}")
    return tok, j


def _parse_expr(s: str, i: int) -> tuple[SExpr, int]:
    i = _skip_ws(s, i)
    name, i = _parse_ident(s, i)
    i = _skip_ws(s, i)
    if i >= len(s) or s[i] != "(":
        raise StreamSyntaxError(f"expected '(' after {name!r}")
    i += 1
    args: list = []
    named: list = []
    while True:
        i = _skip_ws(s, i)
        if i >= len(s):
            raise StreamSyntaxError("unterminated expression")
        if s[i] == ")":
            return SExpr(name, tuple(args), tuple(named)), i + 1
        # named parameter? ident '=' (but not '==' — evaluators use words)
        save = i
        try:
            pname, j = _parse_ident(s, i)
            j2 = _skip_ws(s, j)
            is_named = j2 < len(s) and s[j2] == "=" and s[j2:j2 + 2] != "=="
        except StreamSyntaxError:
            is_named = False
        if is_named:
            val, i = _parse_value(s, j2 + 1)
            named.append((pname, val))
        else:
            i = save
            val, i = _parse_value(s, i)
            args.append(val)
        i = _skip_ws(s, i)
        if i < len(s) and s[i] == ",":
            i += 1


# ---------------------------------------------------------------------------
# shared helpers (one spec, two backends)
# ---------------------------------------------------------------------------

_DOC_COLS = ("doc_id", "text", "lang", "source", "n_chars")
_METRICS = {"sum", "avg", "min", "max", "count"}
_JOINS = {"innerJoin": "inner", "hashJoin": "inner", "leftOuterJoin": "left"}
_CMP = {"gt": ">", "gteq": ">=", "lt": "<", "lteq": "<=", "eq": "="}


def _parse_sort(spec: str) -> list[tuple[str, str]]:
    out = []
    for part in spec.split(","):
        bits = part.split()
        if not bits:
            continue
        col = bits[0]
        direction = bits[1].lower() if len(bits) > 1 else "asc"
        if direction not in ("asc", "desc"):
            raise StreamSyntaxError(f"bad sort direction {direction!r}")
        out.append((col, direction))
    if not out:
        raise StreamSyntaxError(f"empty sort spec {spec!r}")
    return out


def _with_tiebreak(sort: list[tuple[str, str]], cols: list[str]) -> list:
    """Rank cuts must be deterministic: append doc_id asc (if present),
    else every remaining column, as the tie-break in BOTH backends."""
    sorted_cols = {c for c, _ in sort}
    if "doc_id" in cols and "doc_id" not in sorted_cols:
        return sort + [("doc_id", "asc")]
    return sort + [(c, "asc") for c in cols if c not in sorted_cols]


def _req(n: dict, name: str, func: str) -> str:
    try:
        return n[name]
    except KeyError:
        raise StreamSyntaxError(f"{func}() requires the {name!r} parameter")


def _search_fl(n: dict) -> list[str]:
    """fl must carry doc_id (the tuple identity + the deterministic
    tie-break for the rows cut), and when rows is set the sort fields
    must be in fl so both backends cut on projected columns."""
    fl = [c.strip() for c in _req(n, "fl", "search").split(",")]
    if "doc_id" not in fl:
        raise StreamSyntaxError("search() fl must include doc_id")
    if "rows" in n and "sort" in n:
        missing = [c for c, _ in _parse_sort(n["sort"]) if c not in fl]
        if missing:
            raise StreamSyntaxError(f"rows-cut sort fields not in fl: {missing}")
    return fl


def _q_parts(qstr: str):
    """Parse the `q` parameter with the engine's classic query parser and
    flatten to (should, must, must_not, msm) content-term tuples — the
    relational scorer's vocabulary. Richer shapes belong on the kernel
    path, not in stream expressions."""
    from ..search.parser import parse
    from ..search.query import Bool, Occur, Term

    q = parse(qstr)
    if isinstance(q, Term):
        return (q.text,), (), (), 0
    if not isinstance(q, Bool):
        raise StreamSyntaxError(f"stream search supports term/bool q, got {type(q).__name__}")
    should, must, must_not = [], [], []
    for cl in q.clauses:
        if not isinstance(cl.query, Term):
            raise StreamSyntaxError("stream search q must be a flat term bool")
        t = cl.query.text
        if cl.occur == Occur.SHOULD:
            should.append(t)
        elif cl.occur in (Occur.MUST, Occur.FILTER):
            must.append(t)
        else:
            must_not.append(t)
    return tuple(should), tuple(must), tuple(must_not), q.min_should_match


def _metric_alias(m: SExpr) -> str:
    if m.func == "count":
        return "count_star"
    return f"{m.func}_{m.args[0]}"


def _having_sql(e: SExpr | str) -> str:
    """Boolean evaluator tree → one SQL predicate string (valid in both
    Spark SQL and DuckDB — comparison/boolean operators only)."""
    if isinstance(e, str):
        return e
    if e.func in _CMP:
        lhs, rhs = e.args
        return f"({_operand_sql(lhs)} {_CMP[e.func]} {_operand_sql(rhs)})"
    if e.func in ("and", "or"):
        op = f" {e.func.upper()} "
        return "(" + op.join(_having_sql(a) for a in e.args) + ")"
    if e.func == "not":
        return f"(NOT {_having_sql(e.args[0])})"
    raise StreamSyntaxError(f"unsupported having evaluator {e.func!r}")


def _operand_sql(v) -> str:
    if isinstance(v, SExpr):
        return _having_sql(v)
    try:
        float(v)
        return v
    except ValueError:
        if v.replace("_", "").isalnum():
            return v  # column reference
        return "'" + v.replace("'", "''") + "'"


# ---------------------------------------------------------------------------
# Spark backend
# ---------------------------------------------------------------------------


def stream_spark(spark: SparkSession, sf_dir: str, expr: str | SExpr) -> DataFrame:
    if isinstance(expr, str):
        expr = parse_stream_expr(expr)
    df, _sort = _spark(spark, sf_dir, expr)
    return df


def _order_cols(sort):
    return [F.col(c).desc() if d == "desc" else F.col(c).asc() for c, d in sort]


def _spark(spark, sf_dir, e: SExpr):
    n = e.named_dict()
    if e.func == "search":
        if not e.args or e.args[0] != "documents":
            raise StreamSyntaxError("search() collection must be 'documents'")
        should, must, must_not, msm = _q_parts(_req(n, "q", "search"))
        fl = _search_fl(n)
        base = R.bm25_bool_spark(
            spark, sf_dir, should=should, must=must, must_not=must_not,
            msm=msm, k=None,
        )
        docs = R.load_documents(spark, sf_dir)
        df = base.join(docs, "doc_id")
        sort = _parse_sort(n["sort"]) if "sort" in n else [("doc_id", "asc")]
        rows = n.get("rows")
        if rows is not None:
            cut = _with_tiebreak(sort, fl)
            df = df.orderBy(*_order_cols(cut)).limit(int(rows))
        return df.select(*fl), sort
    if e.func == "select":
        child, sort = _spark(spark, sf_dir, e.args[0])
        exprs, renames = _select_items(e.args[1:])
        sort = [(renames.get(c, c), d) for c, d in sort
                if renames.get(c, c) in {a for _, a in exprs}]
        return child.selectExpr(*[f"{src} AS {alias}" for src, alias in exprs]), sort
    if e.func == "top":
        child, _ = _spark(spark, sf_dir, e.args[0])
        sort = _parse_sort(_req(n, "sort", "top"))
        cut = _with_tiebreak(sort, child.columns)
        return child.orderBy(*_order_cols(cut)).limit(int(_req(n, "n", "top"))), sort
    if e.func == "sort":
        child, _ = _spark(spark, sf_dir, e.args[0])
        sort = _parse_sort(_req(n, "by", "sort"))
        return child.orderBy(*_order_cols(sort)), sort
    if e.func == "unique":
        from pyspark.sql import Window

        child, sort = _spark(spark, sf_dir, e.args[0])
        if not sort:
            raise StreamSyntaxError("unique() needs a sorted substream")
        over = [c.strip() for c in _req(n, "over", "unique").split(",")]
        cut = _with_tiebreak(sort, child.columns)
        w = Window.partitionBy(*over).orderBy(*_order_cols(cut))
        return (
            child.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        ), sort
    if e.func == "rollup":
        child, _ = _spark(spark, sf_dir, e.args[0])
        over = [c.strip() for c in _req(n, "over", "rollup").split(",")]
        aggs = []
        for m in e.args[1:]:
            if not isinstance(m, SExpr) or m.func not in _METRICS:
                raise StreamSyntaxError(f"bad rollup metric {m!r}")
            a = _metric_alias(m)
            if m.func == "count":
                aggs.append(F.count("*").alias(a))
            else:
                fn = {"sum": F.sum, "avg": F.avg, "min": F.min, "max": F.max}[m.func]
                aggs.append(fn(m.args[0]).cast("double").alias(a))
        return child.groupBy(*over).agg(*aggs), []
    if e.func in _JOINS:
        lf, _ = _spark(spark, sf_dir, e.args[0])
        rf, _ = _spark(spark, sf_dir, e.args[1])
        pairs = _on_pairs(_req(n, "on", e.func))
        la, ra = lf.alias("l"), rf.alias("r")
        cond = None
        for lcol, rcol in pairs:
            c = F.col(f"l.{lcol}") == F.col(f"r.{rcol}")
            cond = c if cond is None else (cond & c)
        how = _JOINS[e.func]
        joined = la.join(ra, cond, how)
        rcols = list(rf.columns)
        out = []
        for c in lf.columns:
            if c not in rcols:
                out.append(F.col(f"l.{c}").alias(c))
        for c in rcols:
            if how == "left" and c in lf.columns:
                # left-outer merge: right wins only where a right tuple
                # matched (Tuple.merge applies only to joined rows)
                out.append(F.coalesce(F.col(f"r.{c}"), F.col(f"l.{c}")).alias(c))
            else:
                out.append(F.col(f"r.{c}").alias(c))
        return joined.select(*out), []
    if e.func in ("complement", "intersect"):
        lf, lsort = _spark(spark, sf_dir, e.args[0])
        rf, _ = _spark(spark, sf_dir, e.args[1])
        on = [c.strip() for c in _req(n, "on", e.func).split(",")]
        how = "left_anti" if e.func == "complement" else "left_semi"
        return lf.join(rf.select(*on).distinct(), on, how), lsort
    if e.func == "merge":
        lf, _ = _spark(spark, sf_dir, e.args[0])
        rf, _ = _spark(spark, sf_dir, e.args[1])
        sort = _parse_sort(_req(n, "on", "merge"))
        return lf.unionByName(rf).orderBy(*_order_cols(sort)), sort
    if e.func == "having":
        child, sort = _spark(spark, sf_dir, e.args[0])
        return child.where(F.expr(_having_sql(e.args[1]))), sort
    if e.func == "fetch":
        # FetchStream.java: batch-fetch extra fields from the collection
        # by the `on` key, LEFT-joined so unmatched tuples pass through
        if not e.args or e.args[0] != "documents":
            raise StreamSyntaxError("fetch() collection must be 'documents'")
        child, sort = _spark(spark, sf_dir, e.args[1])
        on = n.get("on", "doc_id")
        fl = [c.strip() for c in _req(n, "fl", "fetch").split(",")]
        docs = R.load_documents(spark, sf_dir).select(on, *fl)
        return child.join(docs, on, "left"), sort
    raise StreamSyntaxError(f"unknown stream function {e.func!r}")


def _select_items(items) -> tuple[list[tuple[str, str]], dict]:
    exprs, renames = [], {}
    for it in items:
        if isinstance(it, SExpr):
            raise StreamSyntaxError("select() operations beyond renames unsupported")
        parts = it.split()
        if len(parts) == 3 and parts[1].lower() == "as":
            exprs.append((parts[0], parts[2]))
            renames[parts[0]] = parts[2]
        elif len(parts) == 1:
            exprs.append((parts[0], parts[0]))
        else:
            raise StreamSyntaxError(f"bad select item {it!r}")
    return exprs, renames


def _on_pairs(on: str) -> list[tuple[str, str]]:
    pairs = []
    for part in on.split(","):
        part = part.strip()
        if "=" in part:
            l, r = part.split("=", 1)
            pairs.append((l.strip(), r.strip()))
        else:
            pairs.append((part, part))
    return pairs


# ---------------------------------------------------------------------------
# DuckDB backend (the oracle twin — same AST walk)
# ---------------------------------------------------------------------------


def stream_duck(expr: str | SExpr) -> str:
    if isinstance(expr, str):
        expr = parse_stream_expr(expr)
    sql, _cols, _sort = _duck(expr)
    return sql


def _ob(sort) -> str:
    return ", ".join(f"{c} {d.upper()}" for c, d in sort)


def _duck(e: SExpr):
    n = e.named_dict()
    if e.func == "search":
        should, must, must_not, msm = _q_parts(_req(n, "q", "search"))
        fl = _search_fl(n)
        base = R.bm25_bool_duck(
            should=should, must=must, must_not=must_not, msm=msm, k=None
        )
        sort = _parse_sort(n["sort"]) if "sort" in n else [("doc_id", "asc")]
        rows = n.get("rows")
        sql = (
            f"SELECT {', '.join(fl)} FROM ({base}) s "
            f"JOIN documents d USING (doc_id)"
        )
        if rows is not None:
            cut = _with_tiebreak(sort, fl)
            sql = (
                f"SELECT {', '.join(fl)} FROM ({sql}) c "
                f"ORDER BY {_ob(cut)} LIMIT {int(rows)}"
            )
        return sql, fl, sort
    if e.func == "select":
        sub, cols, sort = _duck(e.args[0])
        exprs, renames = _select_items(e.args[1:])
        out_cols = [a for _, a in exprs]
        sort = [(renames.get(c, c), d) for c, d in sort
                if renames.get(c, c) in set(out_cols)]
        items = ", ".join(f"{src} AS {alias}" for src, alias in exprs)
        return f"SELECT {items} FROM ({sub}) t", out_cols, sort
    if e.func == "top":
        sub, cols, _ = _duck(e.args[0])
        sort = _parse_sort(_req(n, "sort", "top"))
        cut = _with_tiebreak(sort, cols)
        return (
            f"SELECT * FROM ({sub}) t ORDER BY {_ob(cut)} LIMIT {int(_req(n, 'n', 'top'))}",
            cols, sort,
        )
    if e.func == "sort":
        sub, cols, _ = _duck(e.args[0])
        sort = _parse_sort(_req(n, "by", "sort"))
        return f"SELECT * FROM ({sub}) t ORDER BY {_ob(sort)}", cols, sort
    if e.func == "unique":
        sub, cols, sort = _duck(e.args[0])
        if not sort:
            raise StreamSyntaxError("unique() needs a sorted substream")
        over = [c.strip() for c in _req(n, "over", "unique").split(",")]
        cut = _with_tiebreak(sort, cols)
        return (
            f"SELECT * FROM ({sub}) t "
            f"QUALIFY row_number() OVER (PARTITION BY {', '.join(over)} "
            f"ORDER BY {_ob(cut)}) = 1",
            cols, sort,
        )
    if e.func == "rollup":
        sub, _cols, _ = _duck(e.args[0])
        over = [c.strip() for c in _req(n, "over", "rollup").split(",")]
        items = list(over)
        out_cols = list(over)
        for m in e.args[1:]:
            if not isinstance(m, SExpr) or m.func not in _METRICS:
                raise StreamSyntaxError(f"bad rollup metric {m!r}")
            a = _metric_alias(m)
            if m.func == "count":
                items.append(f"count(*) AS {a}")
            else:
                items.append(f"CAST({m.func}({m.args[0]}) AS DOUBLE) AS {a}")
            out_cols.append(a)
        return (
            f"SELECT {', '.join(items)} FROM ({sub}) t "
            f"GROUP BY {', '.join(over)}",
            out_cols, [],
        )
    if e.func in _JOINS:
        lsub, lcols, _ = _duck(e.args[0])
        rsub, rcols, _ = _duck(e.args[1])
        pairs = _on_pairs(_req(n, "on", e.func))
        cond = " AND ".join(f"l.{a} = r.{b}" for a, b in pairs)
        how = "LEFT JOIN" if _JOINS[e.func] == "left" else "JOIN"
        items, out_cols = [], []
        for c in lcols:
            if c not in rcols:
                items.append(f"l.{c} AS {c}")
                out_cols.append(c)
        for c in rcols:
            if _JOINS[e.func] == "left" and c in lcols:
                items.append(f"COALESCE(r.{c}, l.{c}) AS {c}")
            else:
                items.append(f"r.{c} AS {c}")
            out_cols.append(c)
        return (
            f"SELECT {', '.join(items)} FROM ({lsub}) l {how} ({rsub}) r ON {cond}",
            out_cols, [],
        )
    if e.func in ("complement", "intersect"):
        lsub, lcols, lsort = _duck(e.args[0])
        rsub, _rcols, _ = _duck(e.args[1])
        on = [c.strip() for c in _req(n, "on", e.func).split(",")]
        cond = " AND ".join(f"l.{c} = r.{c}" for c in on)
        op = "NOT EXISTS" if e.func == "complement" else "EXISTS"
        return (
            f"SELECT * FROM ({lsub}) l WHERE {op} "
            f"(SELECT 1 FROM ({rsub}) r WHERE {cond})",
            lcols, lsort,
        )
    if e.func == "merge":
        lsub, lcols, _ = _duck(e.args[0])
        rsub, rcols, _ = _duck(e.args[1])
        if set(lcols) != set(rcols):
            raise StreamSyntaxError("merge() streams must share a schema")
        sort = _parse_sort(_req(n, "on", "merge"))
        cl = ", ".join(lcols)
        return (
            f"SELECT {cl} FROM ({lsub}) a UNION ALL SELECT {cl} FROM ({rsub}) b",
            lcols, sort,
        )
    if e.func == "having":
        sub, cols, sort = _duck(e.args[0])
        return (
            f"SELECT * FROM ({sub}) t WHERE {_having_sql(e.args[1])}",
            cols, sort,
        )
    if e.func == "fetch":
        sub, cols, sort = _duck(e.args[1])
        on = n.get("on", "doc_id")
        fl = [c.strip() for c in _req(n, "fl", "fetch").split(",")]
        items = ", ".join([f"t.{c}" for c in cols] + [f"d.{c}" for c in fl])
        return (
            f"SELECT {items} FROM ({sub}) t "
            f"LEFT JOIN documents d ON d.{on} = t.{on}",
            cols + fl, sort,
        )
    raise StreamSyntaxError(f"unknown stream function {e.func!r}")
