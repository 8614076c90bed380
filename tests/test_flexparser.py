"""Flexible (Standard) query parser (search/flexparser.py) — mirrors
queryparser/flexible/standard/ behavior: StandardQueryParser.java setters
(default operator, multi-fields + boosts, phrase slop, fuzzy min-sim,
leading wildcard, points config) driving the classic grammar, plus
TestQueryParser.java's AND-operator clause-resolution goldens."""

import sys
from pathlib import Path

import pandas as pd
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from lucene_solr_1_spark.search.flexparser import (  # noqa: E402
    StandardQueryParser,
    float_to_edits,
)
from lucene_solr_1_spark.search.parser import ParseError, parse  # noqa: E402
from lucene_solr_1_spark.search.query import (  # noqa: E402
    Bool,
    Boost,
    Clause,
    Fuzzy,
    NumericRange,
    Occur,
    Phrase,
    Prefix,
    Term,
    TermRange,
    Wildcard,
)


def occurs(q):
    assert isinstance(q, Bool), q
    return [(c.occur, c.query) for c in q.clauses]


def test_default_operator_or():
    p = StandardQueryParser()
    assert occurs(p.parse("fast window")) == [
        (Occur.SHOULD, Term("fast", field="content")),
        (Occur.SHOULD, Term("window", field="content")),
    ]


def test_default_operator_and():
    # QueryParserBase.addClause AND_OPERATOR branch goldens
    p = StandardQueryParser()
    p.set_default_operator("AND")
    assert [o for o, _ in occurs(p.parse("fast window"))] == [
        Occur.MUST, Occur.MUST
    ]
    # OR demotes the PREVIOUS clause and the next one
    assert [o for o, _ in occurs(p.parse("fast OR window"))] == [
        Occur.SHOULD, Occur.SHOULD
    ]
    # a `+` introduced by OR is ignored (required = conj != CONJ_OR)
    assert [o for o, _ in occurs(p.parse("+fast OR window"))] == [
        Occur.SHOULD, Occur.SHOULD
    ]
    # prohibited survives the OR demotion
    assert [o for o, _ in occurs(p.parse("-fast OR window"))] == [
        Occur.MUST_NOT, Occur.SHOULD
    ]
    assert [o for o, _ in occurs(p.parse("fast AND window OR data"))] == [
        Occur.MUST, Occur.SHOULD, Occur.SHOULD
    ]
    # explicit AND still requires under either default
    assert [o for o, _ in occurs(p.parse("fast AND window"))] == [
        Occur.MUST, Occur.MUST
    ]


def test_classic_parse_unchanged():
    # regression: the classic entrypoint keeps OR defaults + lenient
    # leading wildcards after the config-point refactor
    assert occurs(parse("fast window")) == [
        (Occur.SHOULD, Term("fast", field="content")),
        (Occur.SHOULD, Term("window", field="content")),
    ]
    assert [o for o, _ in occurs(parse("a AND b"))] == [Occur.MUST, Occur.MUST]
    assert parse("*lead") == Wildcard("*lead", field="content")
    assert parse("x~") == Fuzzy("x", max_edits=2, field="content")
    assert parse('"a b"~2') == Phrase(("a", "b"), slop=2, field="content")


def test_multi_fields_and_boosts():
    p = StandardQueryParser()
    p.set_multi_fields(("content", "title"))
    p.set_fields_boost({"title": 2.0})
    q = p.parse("fast")
    assert occurs(q) == [
        (Occur.SHOULD, Term("fast", field="content")),
        (Occur.SHOULD, Boost(Term("fast", field="title"), 2.0)),
    ]
    # an explicit field prefix is NOT expanded
    q = p.parse("content:fast window")
    kinds = [c for _, c in occurs(q)]
    assert Term("fast", field="content") in kinds
    assert Boost(Term("window", field="title"), 2.0) in kinds
    assert Boost(Term("fast", field="title"), 2.0) not in kinds
    # multi-term leaves expand too
    q = p.parse("wind*")
    assert occurs(q) == [
        (Occur.SHOULD, Prefix("wind", field="content")),
        (Occur.SHOULD, Boost(Prefix("wind", field="title"), 2.0)),
    ]
    # a default_field argument bypasses multi-field expansion
    assert p.parse("fast", default_field="path") == Term("fast", field="path")
    # keyword fields are verbatim — analyzed copies would silently never
    # match, so multi_fields rejects them up front
    with pytest.raises(ValueError):
        p.set_multi_fields(("content", "path"))


def test_phrase_slop_default():
    p = StandardQueryParser()
    p.set_phrase_slop(3)
    assert p.parse('"fast window"') == Phrase(
        ("fast", "window"), slop=3, field="content"
    )
    # an explicit ~n wins over the default
    assert p.parse('"fast window"~1') == Phrase(
        ("fast", "window"), slop=1, field="content"
    )


def test_leading_wildcard_guard():
    p = StandardQueryParser()
    with pytest.raises(ParseError):
        p.parse("*oops")
    with pytest.raises(ParseError):
        p.parse("?oops")
    p.set_allow_leading_wildcard(True)
    assert p.parse("*oops") == Wildcard("*oops", field="content")
    # trailing wildcards never need the permission
    q = StandardQueryParser().parse("oop*")
    assert q == Prefix("oop", field="content")


def test_fuzzy_min_sim():
    # FuzzyQuery.floatToEdits: >=1 is an edit count, (0,1) scales by len
    assert float_to_edits(2.0, 10) == 2
    assert float_to_edits(1.0, 10) == 1
    assert float_to_edits(0.0, 10) == 0
    # binary-float truncation matches Java: (1-0.8)*10 = 1.999... -> 1
    assert float_to_edits(0.8, 10) == 1
    assert float_to_edits(0.7, 10) == 2
    assert float_to_edits(0.8, 4) == 0
    p = StandardQueryParser()
    p.set_fuzzy_min_sim(0.8)
    assert p.parse("windowing~") == Fuzzy("windowing", max_edits=1,
                                          field="content")
    assert p.parse("wind~") == Term("wind", field="content") or p.parse(
        "wind~") == Fuzzy("wind", max_edits=0, field="content")
    # explicit edit counts win
    assert p.parse("windowing~2") == Fuzzy("windowing", max_edits=2,
                                           field="content")
    # explicit FRACTIONAL similarities also scale by term length
    # (FuzzyQueryNodeBuilder -> floatToEdits), in flex AND classic
    assert p.parse("organization~0.7") == Fuzzy("organization",
                                                max_edits=2, field="content")
    assert parse("organization~0.7") == Fuzzy("organization", max_edits=2,
                                              field="content")


def test_points_config_map():
    p = StandardQueryParser()
    # without config: lexicographic term range
    assert isinstance(p.parse("n_stars:[3 TO 8]"), TermRange)
    p.set_points_config_map({"n_stars"})
    assert p.parse("n_stars:[3 TO 8}") == NumericRange("n_stars", 3, 7)
    # built-in numeric doc-values keep working
    assert isinstance(p.parse("dl:[30 TO 60]"), NumericRange)


def test_end_to_end_matches_manual_tree(spark, tmp_path_factory):
    from lucene_solr_1_spark.index.builder import build_index
    from lucene_solr_1_spark.search.searcher import LuceneSparkSearcher

    rows = [
        ("r", f"p{i}", "c", "x", t)
        for i, t in enumerate([
            "fast window scan", "fast data merge", "window data spark",
            "fast window data", "nothing here",
        ])
    ]
    pdf = pd.DataFrame(rows,
                       columns=["repo", "path", "commit", "lang", "content"])
    d = str(tmp_path_factory.mktemp("idx_flex"))
    build_index(spark, spark.createDataFrame(pdf), d, num_segments=2)
    s = LuceneSparkSearcher(spark, d)
    p = StandardQueryParser()
    p.set_default_operator("AND")
    flex = p.parse("fast window OR data -spark")
    manual = Bool((
        Clause(Occur.MUST, Term("fast", field="content")),
        Clause(Occur.SHOULD, Term("window", field="content")),
        Clause(Occur.SHOULD, Term("data", field="content")),
        Clause(Occur.MUST_NOT, Term("spark", field="content")),
    ))
    a = s.search(flex, k=10, with_stored=False)
    b = s.search(manual, k=10, with_stored=False)
    assert a.equals(b)
    assert set(s.search(flex, k=10)["path"]) == {"p0", "p1", "p3"}
