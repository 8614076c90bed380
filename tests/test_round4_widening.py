"""Round-4 widening: Solr DisMax/eDisMax parser
(solr/core/src/java/org/apache/solr/search/DisMaxQParser.java:182-266,
ExtendedDismaxQParser.java), plus the later round-4 operators.

The dismax tie path (a word matching BOTH a content term and a keyword
field value) cannot occur on the shipped testdata corpus (no lang code
appears as a content token — asserted by the oracle-pattern test), so
the tie semantics are pinned here on a synthetic overlap corpus,
bit-exact against the DuckDB twin.
"""

import duckdb
import numpy as np
import pandas as pd
import pytest

from lucene_solr_1_spark.index.builder import build_index
from lucene_solr_1_spark.search.parser import parse_dismax
from lucene_solr_1_spark.search.query import (
    Bool, Boost, DisjunctionMax, MatchNone, Occur, Phrase, Term,
)
from lucene_solr_1_spark.search.searcher import LuceneSparkSearcher
from lucene_solr_1_spark.sql import kernel_oracle as KO

# ---------------------------------------------------------------------------
# parse_dismax structure goldens
# ---------------------------------------------------------------------------

QF = {"content": 1.0, "lang": 2.0}


def test_dismax_word_becomes_cross_field_dismax():
    q = parse_dismax("merge", QF, tie=0.25)
    # single word, two fields -> bare DisjunctionMax (1-clause bool unwraps)
    assert isinstance(q, DisjunctionMax)
    assert q.tie_breaker == 0.25
    assert q.queries[0] == Term("merge", field="content")
    assert q.queries[1] == Boost(Term("merge", field="lang"), 2.0)


def test_dismax_mm_and_signs():
    q = parse_dismax("a b +c -d", {"content": 1.0}, mm=2)
    assert isinstance(q, Bool)
    occurs = [c.occur for c in q.clauses]
    assert occurs == [Occur.SHOULD, Occur.SHOULD, Occur.MUST, Occur.MUST_NOT]
    assert q.min_should_match == 2


def test_dismax_mm_clamps_like_solr():
    # SolrPluginUtils.calculateMinShouldMatch clamps to the optional
    # count: mm=3 over 2 words -> both required (NOT MatchNone — that is
    # raw BooleanQuery behavior, still available via Bool directly)
    q = parse_dismax("a b", {"content": 1.0}, mm=3)
    assert q.min_should_match == 2

    # the full Solr spec grammar
    from lucene_solr_1_spark.search.parser import calculate_min_should_match
    assert calculate_min_should_match(5, "3") == 3
    assert calculate_min_should_match(5, "-2") == 3
    assert calculate_min_should_match(5, "50%") == 2
    assert calculate_min_should_match(5, "-25%") == 4
    assert calculate_min_should_match(10, "3<-25% 9<-3") == 7
    assert calculate_min_should_match(2, "2<-25%") == 2


def test_dismax_bq_bf_composition(spark):
    from lucene_solr_1_spark.search.query import Boost, FunctionExpr, Term as T

    q = parse_dismax(
        "query merge", {"content": 1.0}, mm=2,
        bq="lang:en^2", bf="recip(n_chars, 1, 1000, 1000)",
    )
    assert isinstance(q, FunctionExpr)
    assert q.expr[0] == "sum" and q.expr[1] == ("score",)
    outer = q.query
    assert outer.clauses[1].query == Boost(T("en", field="lang"), 2.0)
    # end-to-end: bf shifts every score by recip(n_chars)
    import __spark_entry__ as E

    s = E._get_index(spark, SF001)
    base = s.search(parse_dismax("query merge", {"content": 1.0}, mm=2), k=1000)
    boosted = s.search(
        parse_dismax("query merge", {"content": 1.0}, mm=2,
                     bf="recip(n_chars, 1, 1000, 1000)"),
        k=1000,
    )
    assert set(base["global_doc_id"]) == set(boosted["global_doc_id"])
    assert (boosted["score"].to_numpy() >= 0).all()


def test_dismax_pf_phrase_outside_mm_bool():
    q = parse_dismax("query merge", QF, mm=2, pf={"content": 1.5}, ps=1)
    assert isinstance(q, Bool)
    assert q.min_should_match == 0  # outer bool: (main, phrase)
    inner, phrase = q.clauses
    assert isinstance(inner.query, Bool) and inner.query.min_should_match == 2
    assert phrase.query == Boost(
        Phrase(("query", "merge"), slop=1, field="content"), 1.5
    )


def test_dismax_prohibited_word_excluded_from_pf():
    q = parse_dismax("query merge -data", QF, pf={"content": 1.0})
    phrase = q.clauses[-1].query
    assert isinstance(phrase, Phrase)
    assert phrase.terms == ("query", "merge")


def test_dismax_quoted_word_is_phrase_per_analyzed_field():
    q = parse_dismax('"fast sort"', {"content": 1.0, "lang": 2.0})
    assert isinstance(q, DisjunctionMax)
    assert q.queries[0] == Phrase(("fast", "sort"), field="content")
    # keyword field takes the quoted body verbatim
    assert q.queries[1] == Boost(Term("fast sort", field="lang"), 2.0)


def test_dismax_multitoken_word_is_should_bool():
    # Solr autoGeneratePhraseQueries=false default: analyzer-split word
    # -> OR of the parts on analyzed fields
    q = parse_dismax("sort-merge", {"content": 1.0})
    assert isinstance(q, Bool)
    assert {c.query for c in q.clauses} == {
        Term("sort", field="content"),
        Term("merge", field="content"),
    }


# ---------------------------------------------------------------------------
# tie path: synthetic corpus where words match BOTH fields, bit-exact twin
# ---------------------------------------------------------------------------


def _overlap_corpus(n=90) -> pd.DataFrame:
    langs = ["en", "de", "fr"]
    rows = []
    for i in range(n):
        lang = langs[i % 3]
        words = ["merge"] * (1 + i % 4) + ["data"] * (i % 3)
        if i % 5 < 2:
            words += ["en"] * (1 + i % 2)  # 'en' as a CONTENT token
        if i % 7 == 0:
            words += ["query", "merge"]
        words += ["filler%d" % (i % 11)]
        rows.append(
            {
                "repo": "r",
                "path": f"doc/{i:08d}",
                "commit": f"c{i:08d}",
                "lang": lang,
                "content": " ".join(words),
            }
        )
    return pd.DataFrame(rows)


@pytest.fixture(scope="module")
def overlap_searcher(spark, tmp_path_factory):
    pdf = _overlap_corpus()
    d = str(tmp_path_factory.mktemp("idx_dismax"))
    build_index(spark, spark.createDataFrame(pdf), d, num_segments=3)
    return LuceneSparkSearcher(spark, d), pdf


def test_dismax_tie_bitexact_vs_twin(overlap_searcher):
    searcher, pdf = overlap_searcher
    con = duckdb.connect()
    docs = pd.DataFrame(
        {
            "doc_id": range(len(pdf)),
            "text": pdf["content"],
            "lang": pdf["lang"],
        }
    )
    con.register("documents", docs)
    # 'en' matches content AND lang -> the tie branch actually fires
    q = parse_dismax("en merge", {"content": 1.0, "lang": 2.0}, tie=0.3, mm=1)
    hits = searcher.search(q, k=15)
    got = pd.DataFrame(
        {
            "doc_id": hits["path"].str.removeprefix("doc/").astype("int64"),
            "score": hits["score"].astype("float64"),
            "rank": hits["rank"].astype("int64"),
        }
    )
    sql = KO.kernel_edismax_duck(
        ("en", "merge"), kw_field="lang", content_boost=1.0, kw_boost=2.0,
        tie=0.3, mm=1, k=15,
    )
    want = con.execute(sql).df()
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    np.testing.assert_array_equal(
        got["score"].to_numpy(np.float64), want["score"].to_numpy(np.float64)
    )
    # sanity: at least one top hit's score actually used the tie sum
    # (strictly above what either field alone would give)
    assert (got["score"] > 0).all()


def test_dismax_mm_filters_matches(overlap_searcher):
    searcher, pdf = overlap_searcher
    q1 = parse_dismax("en merge", {"content": 1.0, "lang": 2.0}, mm=1)
    q2 = parse_dismax("en merge", {"content": 1.0, "lang": 2.0}, mm=2)
    h1 = searcher.search(q1, k=100)
    h2 = searcher.search(q2, k=100)
    assert len(h2) < len(h1)
    # mm=2 docs must match both words (every doc has some lang; 'en'
    # matches via lang only for lang='en' docs or content 'en' docs)
    ok = set()
    for i, r in pdf.iterrows():
        toks = r["content"].split()
        w_en = ("en" in toks) or (r["lang"] == "en")
        w_me = ("merge" in toks) or (r["lang"] == "merge")
        if w_en and w_me:
            ok.add(f"doc/{i:08d}")
    assert set(h2["path"]) <= ok and len(h2) == min(100, len(ok))


# ---------------------------------------------------------------------------
# Solr /export, DiversifiedTopDocsCollector, association facets, collate
# ---------------------------------------------------------------------------

SF001 = "/root/testdata/sf0.001"


def test_export_sorted_is_full_match_set_in_order(spark):
    from lucene_solr_1_spark.sql import relational as R

    pdf = R.export_sorted_spark(spark, SF001, "merge").toPandas()
    docs = R.load_documents(spark, SF001).toPandas()
    import re as _re

    match = docs[docs["text"].str.lower().apply(
        lambda t: "merge" in _re.findall(r"[a-z0-9_]+", t)
    )]
    assert len(pdf) == len(match)  # no top-k cap: the FULL match set
    # emitted order is exactly (lang asc, n_chars desc, doc_id asc)
    expect = pdf.sort_values(
        ["lang", "n_chars", "doc_id"], ascending=[True, False, True]
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(pdf.reset_index(drop=True), expect)


def test_diversified_topk_caps_per_key(spark):
    from lucene_solr_1_spark.sql import relational as R

    top = R.diversified_topk_spark(spark, SF001, "merge", max_per_key=2, k=10).toPandas()
    assert len(top) == 10
    assert top["lang"].value_counts().max() <= 2
    # reference semantics: per-key best-2 of the undiversified ranking
    full = R.diversified_topk_spark(spark, SF001, "merge", max_per_key=10**6, k=10**6).toPandas()
    full = full.sort_values(["score", "doc_id"], ascending=[False, True])
    keep, seen = [], {}
    for _, r in full.iterrows():
        c = seen.get(r["lang"], 0)
        if c < 2:
            keep.append(r["doc_id"])
            seen[r["lang"]] = c + 1
    assert top["doc_id"].tolist() == keep[:10]


def test_facet_associations_sums(spark):
    from lucene_solr_1_spark.sql import relational as R

    out = R.facet_associations_spark(spark, SF001, "query").toPandas()
    exp = R.export_sorted_spark(spark, SF001, "query").toPandas()
    want = (
        (exp.assign(a=exp["n_chars"] / 1000.0).groupby("lang")["a"].sum()).round(4)
    )
    got = dict(zip(out["lang"], out["assoc"]))
    assert got == want.to_dict()
    assert (out["assoc"].values[:-1] >= out["assoc"].values[1:]).all()


def test_spell_collate_corrects_only_oov_words(spark):
    from lucene_solr_1_spark.sql import relational as R

    out = R.suggest_spell_collate_spark(spark, SF001, ("quary", "merge")).toPandas()
    assert len(out) == 1
    assert out["collation"].iloc[0] == "query merge"  # quary->query, merge kept
    # hit count == conjunction count of the collated words
    docs = R.load_documents(spark, SF001).toPandas()
    import re as _re

    n = sum(
        1
        for t in docs["text"]
        if {"query", "merge"} <= set(_re.findall(r"[a-z0-9_]+", t.lower()))
    )
    assert int(out["hits"].iloc[0]) == n


# ---------------------------------------------------------------------------
# CoveringQuery (sandbox/search/CoveringQuery.java): per-doc min_match
# from a numeric doc-values source
# ---------------------------------------------------------------------------


def test_covering_semantics_vs_bruteforce(spark):
    import re as _re

    from lucene_solr_1_spark.search.query import Covering, Term
    from lucene_solr_1_spark.sql import relational as R
    import __spark_entry__ as E

    s = E._get_index(spark, SF001)
    terms = ("query", "merge", "data")
    q = Covering(tuple(Term(t) for t in terms), "n_chars", scale=1.0 / 150.0)
    hits = s.search(q, k=1000)
    got = set(hits["path"])
    docs = R.load_documents(spark, SF001).toPandas()
    want = set()
    for _, r in docs.iterrows():
        toks = set(_re.findall(r"[a-z0-9_]+", r["text"].lower()))
        cnt = sum(t in toks for t in terms)
        need = max(1, int(len(r["text"]) // 150))
        if cnt >= need:
            want.add(f"doc/{r['doc_id']:08d}")
    assert got == want
    # the per-doc threshold actually bites: some docs match >=1 clause
    # but fail their min_match
    fails = 0
    for _, r in docs.iterrows():
        toks = set(_re.findall(r"[a-z0-9_]+", r["text"].lower()))
        cnt = sum(t in toks for t in terms)
        if 1 <= cnt < max(1, int(len(r["text"]) // 150)):
            fails += 1
    assert fails > 0


def test_covering_local_matches_distributed(spark):
    from lucene_solr_1_spark.search.query import Covering, Term
    import __spark_entry__ as E

    s = E._get_index(spark, SF001)
    q = Covering((Term("query"), Term("merge")), "dl", scale=0.01)
    dist = s.search(q, k=20)
    loc = s.search_local(q, k=20)
    assert dist["global_doc_id"].tolist() == loc["global_doc_id"].tolist()
    np.testing.assert_array_equal(
        dist["score"].to_numpy(np.float64), loc["score"].to_numpy(np.float64)
    )


# ---------------------------------------------------------------------------
# ComplexPhraseQueryParser: wildcard slot inside a phrase -> MultiPhrase
# ---------------------------------------------------------------------------


def test_complex_phrase_matches_bruteforce(spark):
    import re as _re

    from lucene_solr_1_spark.sql import relational as R
    import __spark_entry__ as E

    s = E._get_index(spark, SF001)
    q = s.complex_phrase(("fast", "s*"))
    hits = s.search(q, k=1000)
    got = set(hits["path"])
    docs = R.load_documents(spark, SF001).toPandas()
    want = set()
    for _, r in docs.iterrows():
        toks = _re.findall(r"[a-z0-9_]+", r["text"].lower())
        if any(
            a == "fast" and b.startswith("s")
            for a, b in zip(toks, toks[1:])
        ):
            want.add(f"doc/{r['doc_id']:08d}")
    assert got == want and len(got) > 0


def test_complex_phrase_dead_slot_matches_nothing(spark):
    from lucene_solr_1_spark.search.query import MatchNone
    import __spark_entry__ as E

    s = E._get_index(spark, SF001)
    assert isinstance(s.complex_phrase(("fast", "zzqx*")), MatchNone)


# ---------------------------------------------------------------------------
# pipeline: mixture upsampling + code stats
# ---------------------------------------------------------------------------


def test_mixture_upsample_semantics(spark):
    from lucene_solr_1_spark.pipeline.curate import mixture_upsample_spark
    from lucene_solr_1_spark.sql import relational as R

    out = mixture_upsample_spark(spark, SF001, 2.5, 0.5).toPandas()
    docs = R.load_documents(spark, SF001).toPandas()
    n = len(docs)
    # deterministic: re-running gives the identical placement map
    out2 = mixture_upsample_spark(spark, SF001, 2.5, 0.5).toPandas()
    pd.testing.assert_frame_equal(out, out2)
    # per-doc repetition bounds: even sources 2-3 epochs, odd 0-1
    reps = out.groupby("doc_id").size()
    src = docs.set_index("doc_id")["source"]
    for doc_id, r in reps.items():
        even = int(src[doc_id][3:]) % 2 == 0
        assert r in ((2, 3) if even else (1,))
    # expected mass: ~ n/2*2.5 + n/2*0.5 within 15%
    assert abs(len(out) - n * 1.5) / (n * 1.5) < 0.15
    # epochs are 0..rep-1 per doc
    for doc_id, g in out.groupby("doc_id"):
        assert sorted(g["epoch"]) == list(range(len(g)))


def test_code_stats_reference(spark):
    from lucene_solr_1_spark.pipeline.textstats import code_stats_spark
    from lucene_solr_1_spark.sql import relational as R
    import re as _re

    out = code_stats_spark(spark, SF001).toPandas().set_index("doc_id")
    docs = R.load_documents(spark, SF001).toPandas()
    for _, r in docs.head(40).iterrows():
        lines = r["text"].split("\n")
        row = out.loc[r["doc_id"]]
        assert row["n_lines"] == len(lines)
        assert row["max_line_len"] == max(len(x) for x in lines)
        assert row["avg_line_len"] == round(
            sum(len(x) for x in lines) / len(lines), 4
        )
        assert row["comment_lines"] == sum(
            1 for x in lines if _re.match(r"^\s*(#|//)", x)
        )
        alnum = sum(ch.isascii() and ch.isalnum() for ch in r["text"])
        assert row["alpha_frac"] == round(alnum / max(len(r["text"]), 1), 4)


# ---------------------------------------------------------------------------
# WAND over dismax groups: pruning must stay result-identical
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed", [11, 389])
def test_dismax_wand_equals_exhaustive(spark, tmp_path_factory, seed):
    from lucene_solr_1_spark.search import kernel as K
    from lucene_solr_1_spark.search.query import query_terms

    rng = np.random.default_rng(seed)
    pdf = _overlap_corpus(120)
    d = str(tmp_path_factory.mktemp(f"dmw{seed}"))
    build_index(spark, spark.createDataFrame(pdf), d, num_segments=3)
    s = LuceneSparkSearcher(spark, d)
    vocab = ["merge", "data", "en", "query", "filler1", "filler2"]

    def rand_q():
        kind = rng.integers(0, 3)
        tie = float(rng.choice([0.0, 0.1, 0.37, 1.0]))
        terms = rng.choice(vocab, size=2 + rng.integers(0, 2), replace=False)
        dm = DisjunctionMax(
            tuple(Term(str(t)) for t in terms), tie_breaker=tie
        )
        if kind == 0:
            return dm
        if kind == 1:
            return Bool.of(
                (Occur.SHOULD, dm),
                (Occur.SHOULD, Term(str(rng.choice(vocab)))),
            )
        return Bool.of(
            (Occur.MUST, Term("merge")),
            (Occur.SHOULD, dm),
        )

    checked_wandable = 0
    for _ in range(10):
        q = rand_q()
        k = int(rng.integers(1, 12))
        plan = K.compile_plan(
            s.expand(q), s._global_df(query_terms(s.expand(q))), s.doc_counts
        )
        if K.wand_applicable(plan):
            checked_wandable += 1
        a = s.search(q, k=k, use_wand=True, with_stored=False)
        b = s.search(q, k=k, use_wand=False, with_stored=False)
        np.testing.assert_array_equal(
            a["global_doc_id"].to_numpy(), b["global_doc_id"].to_numpy(),
            err_msg=repr(q),
        )
        np.testing.assert_array_equal(
            a["score"].to_numpy(), b["score"].to_numpy(), err_msg=repr(q)
        )
    assert checked_wandable >= 8  # the shapes really take the pruned path


def test_dismax_tie_above_one_stays_exhaustive():
    from lucene_solr_1_spark.search import kernel as K

    df = {("content", "a"): 3, ("content", "b"): 5}
    plan = K.compile_plan(
        DisjunctionMax((Term("a"), Term("b")), tie_breaker=1.5), df, 100
    )
    assert not K.wand_applicable(plan)  # combiner not monotone-bounded


# ---------------------------------------------------------------------------
# FunctionExpr: compiled score expressions (lucene/expressions surface)
# ---------------------------------------------------------------------------


def test_function_expr_parser_and_eval():
    import numpy as np

    from lucene_solr_1_spark.search.kernel import _eval_expr
    from lucene_solr_1_spark.search.parser import ParseError, parse_function_expr

    e = parse_function_expr("sum(ln(dl), product(2, _score), recip(n_chars, 1, 10, 0))")
    got = _eval_expr(
        e,
        np.array([1.5]),
        {"dl": np.array([np.e]), "n_chars": np.array([5.0])},
    )
    assert got[0] == 1.0 + 3.0 + 2.0
    with pytest.raises(ParseError):
        parse_function_expr("nosuchfn(dl)")
    with pytest.raises(ParseError):
        parse_function_expr("recip(dl, 1)")  # wrong arity
    with pytest.raises(ParseError):
        parse_function_expr("unknown_field")


def test_function_expr_local_matches_distributed(spark):
    from lucene_solr_1_spark.search.parser import parse_function_expr
    from lucene_solr_1_spark.search.query import FunctionExpr, Term
    import __spark_entry__ as E

    s = E._get_index(spark, SF001)
    q = FunctionExpr(
        Term("merge"),
        parse_function_expr("sum(_score, div(sqrt(dl), 100))"),
    )
    dist = s.search(q, k=15)
    loc = s.search_local(q, k=15)
    assert dist["global_doc_id"].tolist() == loc["global_doc_id"].tolist()
    np.testing.assert_array_equal(
        dist["score"].to_numpy(np.float64), loc["score"].to_numpy(np.float64)
    )


# ---------------------------------------------------------------------------
# Surround query parser (queryparser/surround): W/N distance operators
# ---------------------------------------------------------------------------


def test_surround_parser_goldens():
    from lucene_solr_1_spark.search.parser import ParseError, parse_surround
    from lucene_solr_1_spark.search.query import SpanNear, SpanOr

    assert parse_surround("word1 w word2") == SpanNear(
        ("word1", "word2"), slop=0, in_order=True
    )
    assert parse_surround("public 3W static") == SpanNear(
        ("public", "static"), slop=2, in_order=True
    )
    assert parse_surround("3N(aa, bb, cc)") == SpanNear(
        ("aa", "bb", "cc"), slop=2, in_order=False
    )
    assert parse_surround("(aa or bb) w cc") == SpanNear(
        (SpanOr(("aa", "bb")), "cc"), slop=0, in_order=True
    )
    # chained one-op infix folds into ONE distance list (ComposedQuery)
    assert parse_surround("a w b w c") == SpanNear(
        ("a", "b", "c"), slop=0, in_order=True
    )
    # precedence per QueryParser.jj: NOT binds tighter than AND
    q = parse_surround("aa and bb not cc")
    assert [c.occur.value for c in q.clauses] == ["MUST", "MUST"]
    inner = q.clauses[1].query
    assert [c.occur.value for c in inner.clauses] == ["MUST", "MUST_NOT"]
    # the reference's Test01Exceptions shapes stay exceptions
    for bad in ("(aa and bb) w cc", "(aa not bb) w cc"):
        with pytest.raises(ParseError):
            parse_surround(bad)


def test_surround_search_equals_span_query(spark):
    from lucene_solr_1_spark.search.parser import parse_surround
    from lucene_solr_1_spark.search.query import SpanNear
    import __spark_entry__ as E

    s = E._get_index(spark, SF001)
    a = s.search(parse_surround("fast w sort"), k=20)
    b = s.search(SpanNear(("fast", "sort"), slop=0, in_order=True), k=20)
    assert a["global_doc_id"].tolist() == b["global_doc_id"].tolist()
    np.testing.assert_array_equal(
        a["score"].to_numpy(np.float64), b["score"].to_numpy(np.float64)
    )
    assert len(a) > 0


# ---------------------------------------------------------------------------
# Synonym impact-merged WAND (SynonymQuery "impacts merged")
# ---------------------------------------------------------------------------


def test_synonym_wand_equals_exhaustive(spark):
    from lucene_solr_1_spark.search import kernel as K
    from lucene_solr_1_spark.search.query import Synonym, query_terms
    import __spark_entry__ as E

    s = E._get_index(spark, SF001)
    shapes = [
        Synonym(("query", "merge")),
        Synonym(("fast", "slow", "sort")),
        Bool.of(
            (Occur.MUST, Term("data")),
            (Occur.SHOULD, Synonym(("query", "merge"))),
        ),
        Bool.of(
            (Occur.SHOULD, Synonym(("fast", "slow"))),
            (Occur.SHOULD, Term("window")),
        ),
    ]
    for q in shapes:
        qq = s.expand(q)
        plan = K.compile_plan(qq, s._global_df(query_terms(qq)), s.doc_counts)
        assert K.wand_applicable(plan), repr(q)  # synonym now prunes
        for k in (3, 10, 50):
            a = s.search(q, k=k, use_wand=True, with_stored=False)
            b = s.search(q, k=k, use_wand=False, with_stored=False)
            assert a["global_doc_id"].tolist() == b["global_doc_id"].tolist(), repr(q)
            np.testing.assert_array_equal(
                a["score"].to_numpy(np.float64), b["score"].to_numpy(np.float64)
            )
    # the pruned path actually prunes on a small k (total-hits relation)
    a = s.search(Synonym(("query", "merge")), k=3, with_stored=False)
    assert a.attrs["relation"] in ("EQUAL_TO", "GREATER_THAN_OR_EQUAL_TO")


# ---------------------------------------------------------------------------
# XML query parser (queryparser/xml CoreParser subset)
# ---------------------------------------------------------------------------


def test_xml_parser_goldens():
    from lucene_solr_1_spark.search.parser import ParseError
    from lucene_solr_1_spark.search.query import (
        ConstantScore, NumericRange, SpanFirst, SpanNear, SpanTerm, Term as T,
        TermRange,
    )
    from lucene_solr_1_spark.search.xmlparser import parse_xml

    q = parse_xml("""
<BooleanQuery fieldName="content" minimumNumberShouldMatch="1">
  <Clause occurs="must"><TermQuery>query</TermQuery></Clause>
  <Clause occurs="should"><TermQuery boost="2">merge</TermQuery></Clause>
  <Clause occurs="mustNot"><TermQuery fieldName="lang">zh</TermQuery></Clause>
</BooleanQuery>""")
    assert [c.occur.value for c in q.clauses] == ["MUST", "SHOULD", "MUST_NOT"]
    assert q.clauses[2].query == T("zh", field="lang")  # nearest fieldName wins
    assert q.min_should_match == 1

    q = parse_xml('<RangeQuery fieldName="lang" lowerTerm="de" upperTerm="es"/>')
    assert q == TermRange("de", "es", field="lang")
    q = parse_xml('<PointRangeQuery fieldName="n_chars" lowerTerm="100"/>')
    assert q == NumericRange("n_chars", 100, None)
    q = parse_xml("""
<SpanFirst end="8"><SpanNear slop="2" inOrder="true">
  <SpanTerm>fast</SpanTerm><SpanTerm>sort</SpanTerm>
</SpanNear></SpanFirst>""")
    assert q == SpanFirst(
        SpanNear((SpanTerm("fast"), SpanTerm("sort")), slop=2, in_order=True),
        8,
    )
    q = parse_xml('<TermsQuery fieldName="content">Fast, Sort!</TermsQuery>')
    assert isinstance(q, ConstantScore)
    assert {c.query.text for c in q.query.clauses} == {"fast", "sort"}
    with pytest.raises(ParseError):
        parse_xml("<NoSuchQuery/>")
    with pytest.raises(ParseError):
        parse_xml("<BooleanQuery><TermQuery>x</TermQuery></BooleanQuery>")


def test_xml_parser_search_equals_programmatic(spark):
    from lucene_solr_1_spark.search.query import Bool as B, Occur as O, Term as T
    from lucene_solr_1_spark.search.xmlparser import parse_xml
    import __spark_entry__ as E

    s = E._get_index(spark, SF001)
    xml_q = parse_xml("""
<BooleanQuery fieldName="content">
  <Clause occurs="must"><TermQuery>query</TermQuery></Clause>
  <Clause occurs="should"><UserQuery>merge OR spark</UserQuery></Clause>
</BooleanQuery>""")
    prog_q = B.of(
        (O.MUST, T("query")),
        (O.SHOULD, T("merge")),
        (O.SHOULD, T("spark")),
    )
    a = s.search(xml_q, k=25)
    b = s.search(prog_q, k=25)
    assert a["global_doc_id"].tolist() == b["global_doc_id"].tolist()
    np.testing.assert_array_equal(
        a["score"].to_numpy(np.float64), b["score"].to_numpy(np.float64)
    )


# ---------------------------------------------------------------------------
# SetKeywordMarkerFilter stem exclusions (analysis/miscellaneous/
# SetKeywordMarkerFilter.java; every language analyzer's stemExclusionSet)
# ---------------------------------------------------------------------------


def test_stem_exclusion_chain():
    from lucene_solr_1_spark.kernels.analyzer import (
        ENGLISH_STEM_EXCL,
        AnalyzerConfig,
        GERMAN,
        analyze_series,
        flatten_tokens,
        tokenize_one,
    )

    t, p = tokenize_one("the customer merges data", ENGLISH_STEM_EXCL)
    assert t == ["customer", "merg", "data"]  # excluded keeps surface form
    # German: normalization is NOT keyword-aware, only the stem is
    gex = AnalyzerConfig(stop_words=GERMAN.stop_words, german=True,
                         stem_exclusions=frozenset({"häuser"}))
    t, _ = tokenize_one("die häuser kategorie", gex)
    assert t == ["hauser", "kategori"]
    # exclusions without a stemming stage are rejected
    with pytest.raises(ValueError):
        AnalyzerConfig(stem_exclusions=frozenset({"x"}))
    with pytest.raises(ValueError):
        AnalyzerConfig(stem=True, stem_keep_original=True,
                       stem_exclusions=frozenset({"x"}))
    # scalar == vectorized under exclusions
    import random

    rng = random.Random(29)
    frag = ["customer", "customers", "merges", "merge", "the", "running"]
    docs = [" ".join(rng.choice(frag) for _ in range(rng.randint(0, 8)))
            for _ in range(120)]
    s = pd.Series(docs)
    terms, rows, pos, dl = flatten_tokens(s, ENGLISH_STEM_EXCL)
    st = []
    for text in docs:
        st.extend(tokenize_one(text, ENGLISH_STEM_EXCL)[0])
    assert list(terms) == st
    assert [x for lst in analyze_series(s, ENGLISH_STEM_EXCL) for x in lst] == st


def test_stem_exclusion_search(spark, tmp_path_factory):
    from lucene_solr_1_spark.kernels.analyzer import ENGLISH_STEM_EXCL
    from lucene_solr_1_spark.search.query import Term

    rows = [
        ("r", "p0", "c", "x", "the customer record"),
        ("r", "p1", "c", "x", "many customers here"),
        ("r", "p2", "c", "x", "customizing everything"),
    ]
    pdf = pd.DataFrame(rows,
                       columns=["repo", "path", "commit", "lang", "content"])
    d = str(tmp_path_factory.mktemp("idx_sx"))
    m = build_index(spark, spark.createDataFrame(pdf), d, num_segments=2,
                    cfg=ENGLISH_STEM_EXCL)
    assert m["analyzer"] == "english_stem_excl"
    s = LuceneSparkSearcher(spark, d)
    # excluded query term stays verbatim -> only the verbatim doc
    assert s._analyze_query(Term("customer")) == Term("customer",
                                                      field="content")
    assert set(s.search(Term("customer"), k=10)["path"]) == {"p0"}
    # non-excluded inflection stems ('customers' -> 'custom') and matches
    # the stemmed forms, NOT the excluded surface form
    got = set(s.search(Term("customers"), k=10)["path"])
    assert "p0" not in got and "p1" in got


# ---------------------------------------------------------------------------
# Pattern analysis (analysis/pattern/): PatternReplaceCharFilter chain +
# PatternTokenizer (match mode, group 0)
# ---------------------------------------------------------------------------


def test_pattern_analysis_chain():
    from lucene_solr_1_spark.kernels.analyzer import (
        PATTERN_CF,
        PATTERN_TOK,
        AnalyzerConfig,
        analyze_series,
        flatten_tokens,
        tokenize_one,
    )

    t, _ = tokenize_one("the data-driven approach", PATTERN_CF)
    assert t == ["the", "datadriven", "approach"]
    t, p = tokenize_one("v2data and x42", PATTERN_TOK)
    assert t == ["v", "data", "and", "x"]
    assert p == [0, 1, 2, 3]  # each regex match is one position
    # char filters apply in declaration order
    two = AnalyzerConfig(char_filters=(("-", "_"), ("_", "")))
    assert tokenize_one("a-b", two)[0] == ["ab"]
    with pytest.raises(ValueError):
        AnalyzerConfig(token_pattern="[a-z]+", word_delimiter=1)
    # scalar == vectorized
    import random

    rng = random.Random(37)
    frag = ["data-driven", "v2data", "plain", "x42", "a-b-c", "the"]
    docs = [" ".join(rng.choice(frag) for _ in range(rng.randint(0, 8)))
            for _ in range(120)]
    s = pd.Series(docs)
    for cfg in (PATTERN_CF, PATTERN_TOK, two):
        terms, rows, pos, dl = flatten_tokens(s, cfg)
        st = []
        for text in docs:
            st.extend(tokenize_one(text, cfg)[0])
        assert list(terms) == st
        assert [x for lst in analyze_series(s, cfg) for x in lst] == st


def test_pattern_analysis_offsets_rejected(spark, tmp_path_factory):
    from lucene_solr_1_spark.kernels.analyzer import PATTERN_CF

    pdf = pd.DataFrame(
        [("r", "p0", "c", "x", "data-driven work")],
        columns=["repo", "path", "commit", "lang", "content"],
    )
    d = str(tmp_path_factory.mktemp("idx_pcf"))
    with pytest.raises(Exception):
        build_index(spark, spark.createDataFrame(pdf), d, num_segments=1,
                    cfg=PATTERN_CF, store_offsets=True)


def test_pattern_analysis_search(spark, tmp_path_factory):
    from lucene_solr_1_spark.kernels.analyzer import PATTERN_CF
    from lucene_solr_1_spark.search.query import Term

    rows = [
        ("r", "p0", "c", "x", "a data-driven pipeline"),
        ("r", "p1", "c", "x", "plain data driven apart"),
    ]
    pdf = pd.DataFrame(rows,
                       columns=["repo", "path", "commit", "lang", "content"])
    d = str(tmp_path_factory.mktemp("idx_pat"))
    m = build_index(spark, spark.createDataFrame(pdf), d, num_segments=1,
                    cfg=PATTERN_CF)
    assert m["analyzer"] == "pattern_charfilter"
    s = LuceneSparkSearcher(spark, d)
    # the joined compound is one token; the separated words stay apart
    assert set(s.search(Term("datadriven"), k=10)["path"]) == {"p0"}
    assert set(s.search(Term("driven"), k=10)["path"]) == {"p1"}
    # query-side re-analysis applies the char filter to raw query text
    assert s._analyze_query(Term("data-driven")) == Term("datadriven",
                                                         field="content")
    assert set(s.search(Term("data-driven"), k=10)["path"]) == {"p0"}


def test_synonym_offsets_payloads_rejected(spark, tmp_path_factory):
    """Review fix: the synonym graph flatten RENUMBERS and can EXTEND
    positions past the raw token count, so the per-raw-token offset and
    payload arrays no longer align — build must refuse."""
    from lucene_solr_1_spark.kernels.analyzer import SYNONYM_EN

    pdf = pd.DataFrame(
        [("r", "p0", "c", "x", "fast sort and window data")],
        columns=["repo", "path", "commit", "lang", "content"],
    )
    for kw in ({"store_offsets": True}, {"store_payloads": True}):
        d = str(tmp_path_factory.mktemp("idx_synoff"))
        with pytest.raises(Exception):
            build_index(spark, spark.createDataFrame(pdf), d,
                        num_segments=1, cfg=SYNONYM_EN, **kw)


def test_char_filter_applied_once_in_stacked_series():
    """Review fix: analyze_series used to apply html_strip/char_filters
    and then route stacked chains through tokenize_one which applied
    them AGAIN — a non-idempotent char filter diverged from the scalar
    and flatten paths."""
    from lucene_solr_1_spark.kernels.analyzer import (
        AnalyzerConfig,
        analyze_series,
        flatten_tokens,
        tokenize_one,
    )

    cfg = AnalyzerConfig(char_filters=(("ab", "ba"),),
                         compound_dict=frozenset({"ba"}))
    # 'ababa' -> one filter pass gives 'babaa' (a second pass would give
    # 'bbaaa'); the compound stage then injects both 'ba' subwords
    scalar = tokenize_one("ababa", cfg)[0]
    series = list(analyze_series(pd.Series(["ababa"]), cfg))[0]
    flat = list(flatten_tokens(pd.Series(["ababa"]), cfg)[0])
    assert scalar == series == flat == ["babaa", "ba", "ba"]
