"""XML query parser — the lucene/queryparser/xml module
(queryparser/xml/CoreParser.java:77-117 element registry; builders/*):
a query expressed as an XML tree builds the same Query objects the
programmatic API does. Faithful subset of the core vocabulary:

  TermQuery, TermsQuery, MatchAllDocsQuery, BooleanQuery (Clause
  occurs= must|should|mustNot|filter, minimumNumberShouldMatch=),
  DisjunctionMaxQuery (tieBreaker=), ConstantScoreQuery, UserQuery
  (classic-syntax text parsed with the analyzer), RangeQuery
  (lexicographic), PointRangeQuery (numeric doc-values), SpanTerm,
  SpanOr, SpanOrTerms, SpanNear (slop=, inOrder=), SpanNot, SpanFirst
  (end=), BoostingTermQuery (payload-boosted term).

Attribute semantics follow the reference builders: `fieldName` inherits
from enclosing elements (DOMUtils.getAttributeWithInheritance), `boost`
wraps any element in a BoostQuery, TermQuery text is verbatim while
TermsQuery/UserQuery run the analyzer (TermQueryBuilder vs
TermsQueryBuilder.java).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from ..index.segment import KEYWORD_FIELDS
from ..kernels.analyzer import AnalyzerConfig, STANDARD, tokenize_one
from .parser import ParseError, parse
from .query import (
    Bool, Boost, Clause, ConstantScore, DEFAULT_FIELD, DisjunctionMax,
    MatchAll, MatchNone, NUMERIC_DOCVALUES, NumericRange, Occur,
    PayloadScore, Query, SpanFirst, SpanNear, SpanNot, SpanOr, SpanTerm,
    Term, TermRange, rewrite,
)

_OCCURS = {
    "should": Occur.SHOULD,
    "must": Occur.MUST,
    "mustnot": Occur.MUST_NOT,
    "filter": Occur.FILTER,
}


def parse_xml(
    xml_text: str,
    cfg: AnalyzerConfig = STANDARD,
    keyword_fields: tuple = KEYWORD_FIELDS,
) -> Query:
    """Parse an XML query document → rewritten Query tree."""
    try:
        root = ET.fromstring(xml_text)
    except ET.ParseError as exc:  # mirror ParserException
        raise ParseError(f"malformed query XML: {exc}") from exc
    return rewrite(_build(root, None, cfg, frozenset(keyword_fields)))


def _field_of(e: ET.Element, inherited: str | None) -> str:
    # DOMUtils.getAttributeWithInheritance: nearest fieldName wins
    return e.get("fieldName") or inherited or DEFAULT_FIELD


def _boost_wrap(e: ET.Element, q: Query) -> Query:
    b = float(e.get("boost", 1.0))
    return Boost(q, b) if b != 1.0 else q


def _text(e: ET.Element) -> str:
    return (e.text or "").strip()


def _build(e: ET.Element, field: str | None, cfg, kw: frozenset) -> Query:
    tag = e.tag
    f = _field_of(e, field)
    if tag == "TermQuery":
        # TermQueryBuilder.java:33-40 — the term text is VERBATIM
        return _boost_wrap(e, Term(_text(e), field=f))
    if tag == "TermsQuery":
        # TermsQueryBuilder: analyze the text, constant-score IN-set
        # (TermInSetQuery's CONSTANT_SCORE_REWRITE)
        terms, _ = tokenize_one(_text(e), cfg) if f not in kw else ([_text(e)], None)
        if not terms:
            return MatchNone()
        inner = Bool.of(*((Occur.SHOULD, Term(t, field=f)) for t in terms))
        return ConstantScore(inner, float(e.get("boost", 1.0)))
    if tag == "MatchAllDocsQuery":
        return _boost_wrap(e, MatchAll())
    if tag == "UserQuery":
        # UserInputQueryBuilder: classic-syntax text through the parser
        return _boost_wrap(e, parse(_text(e), cfg, tuple(kw)))
    if tag == "BooleanQuery":
        clauses = []
        for ce in e:
            if ce.tag != "Clause":
                raise ParseError(f"BooleanQuery admits only Clause, got {ce.tag}")
            occ = _OCCURS.get(ce.get("occurs", "should").lower())
            if occ is None:
                raise ParseError(f"invalid occurs value {ce.get('occurs')!r}")
            subs = list(ce)
            if len(subs) != 1:
                raise ParseError("Clause needs exactly one child query")
            clauses.append(Clause(occ, _build(subs[0], f, cfg, kw)))
        q: Query = Bool(
            tuple(clauses),
            min_should_match=int(e.get("minimumNumberShouldMatch", 0)),
        )
        return _boost_wrap(e, q)
    if tag == "DisjunctionMaxQuery":
        subs = tuple(_build(ce, f, cfg, kw) for ce in e)
        return _boost_wrap(
            e, DisjunctionMax(subs, float(e.get("tieBreaker", 0.0)))
        )
    if tag == "ConstantScoreQuery":
        subs = list(e)
        if len(subs) != 1:
            raise ParseError("ConstantScoreQuery needs exactly one child")
        return ConstantScore(
            _build(subs[0], f, cfg, kw), float(e.get("boost", 1.0))
        )
    if tag == "RangeQuery":
        return _boost_wrap(e, TermRange(
            e.get("lowerTerm"),
            e.get("upperTerm"),
            include_lower=e.get("includeLower", "true").lower() == "true",
            include_upper=e.get("includeUpper", "true").lower() == "true",
            field=f,
        ))
    if tag == "PointRangeQuery":
        if f not in NUMERIC_DOCVALUES:
            raise ParseError(f"PointRangeQuery needs a numeric field, got {f!r}")
        lo, hi = e.get("lowerTerm"), e.get("upperTerm")
        return _boost_wrap(e, NumericRange(
            f, int(lo) if lo is not None else None,
            int(hi) if hi is not None else None,
        ))
    if tag == "BoostingTermQuery":
        # BoostingTermBuilder: PayloadScoreQuery(SpanTerm, AveragePayload)
        return _boost_wrap(e, PayloadScore(
            SpanTerm(_text(e), field=f), func="avg",
            include_span_score=True, field=f,
        ))
    # ---- span vocabulary (SpanQueryBuilderFactory) ----
    if tag == "SpanTerm":
        return _boost_wrap(e, SpanTerm(_text(e), field=f))
    if tag == "SpanOr":
        return _boost_wrap(e, SpanOr(
            tuple(_build(ce, f, cfg, kw) for ce in e), field=f
        ))
    if tag == "SpanOrTerms":
        terms, _ = tokenize_one(_text(e), cfg)
        if not terms:
            raise ParseError("SpanOrTerms analyzed to no tokens")
        return _boost_wrap(e, SpanOr(
            tuple(SpanTerm(t, field=f) for t in terms), field=f
        ))
    if tag == "SpanNear":
        return _boost_wrap(e, SpanNear(
            tuple(_build(ce, f, cfg, kw) for ce in e),
            slop=int(e.get("slop", 0)),
            in_order=e.get("inOrder", "true").lower() == "true",
            field=f,
        ))
    if tag == "SpanNot":
        subs = list(e)
        if [c.tag for c in subs] != ["Include", "Exclude"]:
            raise ParseError("SpanNot needs <Include> then <Exclude>")
        return _boost_wrap(e, SpanNot(
            _build(list(subs[0])[0], f, cfg, kw),
            _build(list(subs[1])[0], f, cfg, kw),
            field=f,
        ))
    if tag == "SpanFirst":
        subs = list(e)
        if len(subs) != 1:
            raise ParseError("SpanFirst needs exactly one child span")
        return _boost_wrap(e, SpanFirst(
            _build(subs[0], f, cfg, kw), int(e.get("end", 1)), field=f
        ))
    raise ParseError(f"unknown query element <{tag}>")
