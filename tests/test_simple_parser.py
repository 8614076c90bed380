"""SimpleQueryParser goldens — ported from the reference's
queryparser/src/test/.../simple/TestSimpleQueryParser.java (raw trees,
default operator MUST like the test helper at :56-62). Cases whose
expectations depend on MockAnalyzer keeping punctuation inside tokens are
adapted to this engine's tokenizer (underscore-token equivalents)."""

import pytest

from lucene_solr_1_spark.search.parser import (
    AND_OPERATOR,
    NOT_OPERATOR,
    OR_OPERATOR,
    PHRASE_OPERATOR,
    PRECEDENCE_OPERATORS,
    PREFIX_OPERATOR,
    SimpleParser,
    parse_simple,
)
from lucene_solr_1_spark.search.query import (
    Bool, Clause, Fuzzy, MatchAll, MatchNone, Occur, Phrase, Prefix, Term,
)

MUST, SHOULD, MUST_NOT = Occur.MUST, Occur.SHOULD, Occur.MUST_NOT


def parse(text, flags=-1):
    return SimpleParser(flags=flags, default_operator=MUST).parse(
        text, do_rewrite=False
    )


def B(*pairs):
    return Bool(tuple(Clause(o, q) for o, q in pairs))


def test_term():
    assert parse("foobar") == Term("foobar")


def test_fuzzy():
    # TestSimpleQueryParser.testFuzzy
    assert parse("foobar~2") == Fuzzy("foobar", 2)
    assert parse("foobar~") == Fuzzy("foobar", 2)       # bare ~ = auto 2
    assert parse("foobar~a") == Term("foobar")          # NFE -> 0 -> term
    assert parse("foobar~1a") == Term("foobar")
    # over-max is clamped to LevenshteinAutomata MAX (2)
    assert parse("foo~21 bar") == B((MUST, Fuzzy("foo", 2)), (MUST, Term("bar")))


def test_phrase_and_slop():
    assert parse('"foo bar"') == Phrase(("foo", "bar"))
    assert parse('"foo bar"~2') == Phrase(("foo", "bar"), slop=2)
    assert parse('"foo bar"~10') == Phrase(("foo", "bar"), slop=10)
    assert parse('"foo bar"~') == Phrase(("foo", "bar"))     # trailing tilde
    assert parse('"foo bar"~a') == Phrase(("foo", "bar"))    # non-numeric
    assert parse('"foo bar"~1a') == Phrase(("foo", "bar"))
    assert parse('"foo bar"~-1') == Phrase(("foo", "bar"))   # negative -> 0
    assert parse('"foo bar"~12 baz') == B(
        (MUST, Phrase(("foo", "bar"), slop=12)), (MUST, Term("baz"))
    )


def test_prefix():
    assert parse("foobar*") == Prefix("foobar")
    # multiple asterisks: only the LAST unescaped '*' is the operator
    # (testCrazyPrefixes1 — our analyzer-free normalize keeps the body)
    assert parse("st*ar*") == Prefix("st*ar")


def test_and_or_not():
    assert parse("foo+bar") == B((MUST, Term("foo")), (MUST, Term("bar")))
    assert parse("foo bar") == B((MUST, Term("foo")), (MUST, Term("bar")))
    assert parse("foo|bar") == B((SHOULD, Term("foo")), (SHOULD, Term("bar")))
    assert parse("foo||bar") == B((SHOULD, Term("foo")), (SHOULD, Term("bar")))
    not_foo = B((MUST_NOT, Term("foo")), (SHOULD, MatchAll()))
    assert parse("-foo") == not_foo
    assert parse("-(foo)") == not_foo
    assert parse("---foo") == not_foo  # odd count of NOTs


def test_phrase_operators():
    p1, p2 = Phrase(("foo", "bar")), Phrase(("star", "wars"))
    assert parse('"foo bar"+"star wars"') == B((MUST, p1), (MUST, p2))
    assert parse('"foo bar"|"star wars"') == B((SHOULD, p1), (SHOULD, p2))


def test_garbage_recovery():
    # testGarbageTerm: every mangled form still decodes to the term
    for text in ("star", "star\n", "star\r", "star\t", "star(", "star)",
                 'star"', "\t \r\n\nstar   \n \r \t ", '- + "" - star \\'):
        assert parse(text) == Term("star"), text
    # testGarbageEmpty
    for text in ("", "  ", "\\ ", "+", "-", "|", '"', "(", ")"):
        assert parse(text) == MatchNone(), text
    # testGarbageAND / OR / NOT / phrase / subquery
    sw_and = B((MUST, Term("star")), (MUST, Term("wars")))
    assert parse("star wars +") == sw_and
    assert parse("star + + wars") == sw_and
    assert parse("+ star + + wars +") == sw_and
    sw_or = B((SHOULD, Term("star")), (SHOULD, Term("wars")))
    assert parse("star|wars|") == sw_or
    assert parse("star| | wars") == sw_or
    assert parse("| star| | wars |") == sw_or
    # even NOT count negates itself; trailing dashes vanish in analysis
    assert parse("--star--") == Term("star")
    assert parse('star "') == Term("star")
    assert parse("star (") == Term("star")


def test_compound_and_complex():
    star, wars, empire = Term("star"), Term("wars"), Term("empire")
    # testCompoundAnd
    exp = B((MUST, star), (MUST, wars), (MUST, empire))
    for t in ("star wars empire", "star+wars + empire", " | --star wars empire \n\\"):
        assert parse(t) == exp, t
    # testCompoundOr
    exp = B((SHOULD, star), (SHOULD, wars), (SHOULD, empire))
    for t in ("star|wars|empire", "star|wars | empire", " | --star|wars|empire \n\\"):
        assert parse(t) == exp, t
    # testComplex00: (star | wars) MUST empire
    exp = B((MUST, B((SHOULD, star), (SHOULD, wars))), (MUST, empire))
    for t in ("star|wars empire", "star|wars + empire", "star| + wars + ----empire |"):
        assert parse(t) == exp, t
    # testComplex01: (star + wars) SHOULD empire
    exp = B((SHOULD, B((MUST, star), (MUST, wars))), (SHOULD, empire))
    for t in ("star wars | empire", "star + wars|empire", "star + | wars | ----empire +"):
        assert parse(t) == exp, t
    # testComplex04: parenthesized groups
    strikes, back = Term("strikes"), Term("back")
    exp = B(
        (SHOULD, B((MUST, star), (MUST, wars))),
        (SHOULD, empire),
        (SHOULD, B((MUST, strikes), (MUST, back))),
    )
    for t in (
        "(star wars) | empire | (strikes back)",
        "(star + wars) |empire | (strikes + back)",
        "(star + | wars |) | ----empire | + --(strikes + | --back) \\",
    ):
        assert parse(t) == exp, t
    # testComplex05 (nested parens + negation + empty groups)
    jar = Term("jarjar")
    exp = B(
        (SHOULD, B((MUST, star), (MUST, wars))),
        (SHOULD, B(
            (SHOULD, empire),
            (SHOULD, B(
                (MUST, strikes), (MUST, back),
                (MUST, B((MUST_NOT, jar), (SHOULD, MatchAll()))),
            )),
        )),
    )
    for t in (
        "(star wars) | (empire | (strikes back -jarjar))",
        '(star + wars) |(empire | (strikes + back -jarjar) () )',
        '(star + | wars |) | --(--empire | + --(strikes + | --back + -jarjar) "" ) "',
    ):
        assert parse(t) == exp, t


def test_disable_flags():
    # testDisablePhrase: with the flag off the quotes ride into the raw
    # token ('"test"' in MockAnalyzer); our analyzer strips them -> a term
    assert parse('"test"', flags=-1 & ~PHRASE_OPERATOR) == Term("test")
    # testDisablePrefix: trailing * kept in the raw token, tokenizer strips
    assert parse("test*", flags=-1 & ~PREFIX_OPERATOR) == Term("test")
    # testDisableAND
    assert parse("foo+bar", flags=-1 & ~AND_OPERATOR) == B(
        (MUST, Term("foo")), (MUST, Term("bar"))
    )
    # testDisableOR
    assert parse("foo|bar", flags=-1 & ~OR_OPERATOR) == B(
        (MUST, Term("foo")), (MUST, Term("bar"))
    )
    # testDisableNOT: '-foo' keeps the dash in the raw token
    assert parse("-foo", flags=-1 & ~NOT_OPERATOR) == Term("foo")
    # testDisablePrecedence
    assert parse("(foo)", flags=-1 & ~PRECEDENCE_OPERATORS) == Term("foo")


def test_match_all_and_default_operator():
    assert parse("*") == MatchAll()
    assert parse_simple("foo bar") == B((SHOULD, Term("foo")), (SHOULD, Term("bar")))
    with pytest.raises(ValueError):
        SimpleParser(default_operator=MUST_NOT)


def test_weights_multi_field():
    from lucene_solr_1_spark.search.query import Boost

    q = SimpleParser(
        weights={"content": 1.0, "lang": 2.0}, default_operator=MUST
    ).parse("foo", do_rewrite=False)
    assert q == B((SHOULD, Term("foo", field="content")),
                  (SHOULD, Boost(Term("foo", field="lang"), 2.0)))


def test_simple_parse_searches(spark, tiny_corpus_pdf, tmp_path_factory):
    """End-to-end: parse_simple trees run on the kernel path and equal the
    classic parser's equivalent query."""
    from lucene_solr_1_spark.index.builder import build_index
    from lucene_solr_1_spark.search.parser import parse as cparse
    from lucene_solr_1_spark.search.searcher import LuceneSparkSearcher

    d = str(tmp_path_factory.mktemp("idx_sqp"))
    build_index(spark, spark.createDataFrame(tiny_corpus_pdf), d, num_segments=2)
    s = LuceneSparkSearcher(spark, d)
    pairs = [
        (parse_simple("return + (class | static)"),
         cparse("return AND (class OR static)")),
        (parse_simple('"public static"~2'), cparse('"public static"~2')),
        (parse_simple("retur*"), cparse("retur*")),
    ]
    for sq, cq in pairs:
        a = s.search(sq, k=10, with_stored=False)
        b = s.search(cq, k=10, with_stored=False)
        assert a["global_doc_id"].tolist() == b["global_doc_id"].tolist()
        assert a["score"].tolist() == b["score"].tolist()
