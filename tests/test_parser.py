"""Golden parse tests for the classic query parser (queryparser/classic
QueryParser.jj semantics subset; cases modeled on
queryparser/.../classic/TestQueryParser.java)."""

import pytest

from lucene_solr_1_spark.search.parser import ParseError, parse
from lucene_solr_1_spark.search.query import (
    Bool, Boost, Clause, Fuzzy, MatchAll, MatchNone, Occur, Phrase, Prefix,
    Term, TermRange, Wildcard, Regexp,
)

S, M, N = Occur.SHOULD, Occur.MUST, Occur.MUST_NOT


def test_single_term():
    assert parse("Hello") == Term("hello")


def test_default_or():
    assert parse("hello world") == Bool.of((S, Term("hello")), (S, Term("world")))


def test_and():
    assert parse("a AND b") == Bool.of((M, Term("a")), (M, Term("b")))
    assert parse("a && b") == Bool.of((M, Term("a")), (M, Term("b")))


def test_or_keyword():
    assert parse("a OR b") == Bool.of((S, Term("a")), (S, Term("b")))


def test_not_and_minus():
    expected = Bool.of((S, Term("a")), (N, Term("b")))
    assert parse("a NOT b") == expected
    assert parse("a -b") == expected
    assert parse("a !b") == expected


def test_plus_required():
    assert parse("+a b") == Bool.of((M, Term("a")), (S, Term("b")))


def test_mixed_and_or():
    # a AND b OR c → +a +b c (QueryParser conjunction is clause-local)
    assert parse("a AND b OR c") == Bool.of(
        (M, Term("a")), (M, Term("b")), (S, Term("c"))
    )


def test_phrase():
    assert parse('"foo bar"') == Phrase(("foo", "bar"))


def test_phrase_slop():
    assert parse('"foo bar"~2') == Phrase(("foo", "bar"), slop=2)


def test_single_token_phrase_is_term():
    assert parse('"foo"') == Term("foo")


def test_grouping_with_required():
    q = parse("+(a b) c")
    assert q == Bool.of(
        (M, Bool.of((S, Term("a")), (S, Term("b")))), (S, Term("c"))
    )


def test_boost_term_and_group():
    assert parse("foo^2") == Boost(Term("foo"), 2.0)
    assert parse("(a b)^3") == Boost(Bool.of((S, Term("a")), (S, Term("b"))), 3.0)


def test_fuzzy():
    assert parse("roam~") == Fuzzy("roam", max_edits=2)
    assert parse("roam~1") == Fuzzy("roam", max_edits=1)


def test_prefix_and_wildcard():
    assert parse("pre*") == Prefix("pre")
    assert parse("wi*ld?") == Wildcard("wi*ld?")


def test_regexp():
    assert parse("/ab+c/") == Regexp("ab+c")


def test_range():
    assert parse("[Alpha TO omega]") == TermRange("alpha", "omega", True, True)
    assert parse("{a TO b}") == TermRange("a", "b", False, False)
    assert parse("[* TO b]") == TermRange(None, "b", True, True)


def test_match_all():
    assert parse("*:*") == MatchAll()


def test_field_resolution():
    # getFieldQuery (QueryParserBase.java:466): field prefixes RESOLVE
    # (cases modeled on TestQueryParser / TestMultiFieldQueryParser)
    assert parse("body:hello") == Term("hello", field="body")
    assert parse('body:"a b"') == Phrase(("a", "b"), field="body")
    assert parse("content:hello") == Term("hello")


def test_keyword_field_verbatim():
    # keyword (StringField-analog) fields are NOT analyzed: values match
    # verbatim, like a per-field KeywordAnalyzer
    assert parse("lang:python") == Term("python", field="lang")
    assert parse("repo:org/repo-3") != MatchNone()
    assert parse('path:"src/d4/f_756.c"') == Term("src/d4/f_756.c", field="path")


def test_field_range_and_regex():
    # ADVICE r1: 'lang:[aa TO bb]' must lex FIELD + RANGE, not three TERMs
    assert parse("lang:[aa TO bb]") == TermRange("aa", "bb", True, True, field="lang")
    assert parse("body:[a TO b]") == TermRange("a", "b", True, True, field="body")
    assert parse("body:/ab+c/") == Regexp("ab+c", field="body")


def test_field_group_inheritance():
    # field:(a OR b) pushes the field onto the group's leaves
    assert parse("lang:(python OR java)") == Bool.of(
        (S, Term("python", field="lang")), (S, Term("java", field="lang"))
    )


def test_field_group_keyword_verbatim():
    # ADVICE r2 medium: grouped keyword-field values get the SAME verbatim
    # treatment as direct field:term — no lowercasing, no tokenization
    assert parse("repo:(MyRepo OR other)") == Bool.of(
        (S, Term("MyRepo", field="repo")), (S, Term("other", field="repo"))
    )
    assert parse("path:(src/a.py)") == Term("src/a.py", field="path")
    assert parse("repo:(Org/Repo-3 AND NOT Other/X)") == Bool.of(
        (M, Term("Org/Repo-3", field="repo")),
        (N, Term("Other/X", field="repo")),
    )
    # grouped phrase under a keyword field is verbatim too
    assert parse('path:("Src File.c" OR other)') == Bool.of(
        (S, Term("Src File.c", field="path")), (S, Term("other", field="path"))
    )
    # analyzed default field inside an unprefixed group is unchanged
    assert parse("(Foo OR Bar)") == Bool.of(
        (S, Term("foo")), (S, Term("bar"))
    )


def test_field_star_matches_all():
    assert parse("lang:*") == MatchAll()


def test_numeric_field_range():
    from lucene_solr_1_spark.search.query import NumericRange

    assert parse("dl:[30 TO 60]") == NumericRange("dl", 30, 60)
    assert parse("dl:{30 TO 60}") == NumericRange("dl", 31, 59)
    assert parse("n_chars:[* TO 500]") == NumericRange("n_chars", None, 500)
    q = parse("hello AND dl:[10 TO 20]")
    assert q == Bool.of((M, Term("hello")), (M, NumericRange("dl", 10, 20)))


def test_field_prefix_and_boost():
    assert parse("lang:py*") == Prefix("py", field="lang")
    assert parse("body:hello^2") == Boost(Term("hello", field="body"), 2.0)


def test_term_analysis_lowercases_and_splits():
    # analyzer splits the syntactic token on '-'
    q = parse("Foo-Bar")
    assert q == Bool.of((S, Term("foo")), (S, Term("bar")))


def test_empty_and_pure_negative():
    assert parse("") == MatchNone()
    assert parse("-a") == MatchNone()  # pure negation (rewrite rule)


def test_unbalanced_paren_raises():
    with pytest.raises(ParseError):
        parse("(a b")


def test_not_prefix_word_is_a_term():
    # NOTE is a term, not the NOT operator
    assert parse("note") == Term("note")
    assert parse("NOTE") == Term("note")


def test_parse_with_synonym_map():
    """Query-time SynonymGraphFilter placement: Term leaves with a map
    entry become SynonymQuery over {term} ∪ synonyms; other leaves and
    keyword fields untouched."""
    from lucene_solr_1_spark.search.parser import parse
    from lucene_solr_1_spark.search.query import (
        Bool, Occur, Synonym, Term,
    )

    q = parse("fast AND sort", synonyms={"fast": ("quick", "speedy")})
    assert q == Bool.of(
        (Occur.MUST, Synonym(("fast", "quick", "speedy"))),
        (Occur.MUST, Term("sort")),
    )
    # keyword-field leaves stay verbatim terms even if the text collides
    q2 = parse("lang:fast", synonyms={"fast": ("quick",)})
    assert q2 == Term("fast", field="lang")
    # duplicates collapse, order stable (original term first)
    q3 = parse("fast", synonyms={"fast": ("quick", "fast", "quick")})
    assert q3 == Synonym(("fast", "quick"))


def test_synonym_map_search_equals_explicit_synonym(spark, tiny_corpus_pdf, tmp_path_factory):
    from lucene_solr_1_spark.index.builder import build_index
    from lucene_solr_1_spark.search.parser import parse
    from lucene_solr_1_spark.search.query import Synonym
    from lucene_solr_1_spark.search.searcher import LuceneSparkSearcher

    d = str(tmp_path_factory.mktemp("idx_syn"))
    build_index(spark, spark.createDataFrame(tiny_corpus_pdf), d, num_segments=2)
    s = LuceneSparkSearcher(spark, d)
    via_map = s.search(
        parse("return", synonyms={"return": ("class",)}), k=10, with_stored=False
    )
    explicit = s.search(Synonym(("return", "class")), k=10, with_stored=False)
    assert via_map["global_doc_id"].tolist() == explicit["global_doc_id"].tolist()
    assert via_map["score"].tolist() == explicit["score"].tolist()
