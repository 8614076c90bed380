"""Flexible (Standard) query parser — the configurable parse helper.

Reference contract (lucene/queryparser/src/java/org/apache/lucene/
queryparser/flexible/standard/):
- StandardQueryParser.java:155 parse(query, defaultField); the syntax is
  the classic grammar (StandardSyntaxParser mirrors QueryParser.jj), so
  this facade reuses the classic recursive-descent parser and applies the
  config handler's knobs at the same decision points the reference's
  query-node processor pipeline does:
  * :178 setDefaultOperator(AND|OR) —
    processors/GroupQueryNodeProcessor / BooleanQuery2ModifierNodeProcessor
    occur resolution, including the retroactive `a OR b` demotion under
    AND (classic QueryParserBase.addClause:xx parity);
  * :192 setAllowLeadingWildcard —
    processors/AllowLeadingWildcardProcessor raises on `*foo`/`?foo`;
  * :255 setMultiFields + :429 setFieldsBoost —
    processors/MultiFieldQueryNodeProcessor: every field-less leaf expands
    to an OR over the configured fields, each copy boosted by the map;
  * :334 setPhraseSlop — processors/PhraseSlopQueryNodeProcessor: default
    slop for phrases without an explicit `~n`;
  * :412 setFuzzyMinSim — FuzzyQueryNodeBuilder + FuzzyQuery.floatToEdits:
    minSim >= 1 is an edit count; 0 < minSim < 1 maps to
    floor((1 - minSim) * len(term)) capped at 2;
  * :295 setPointsConfigMap — processors/PointQueryNodeProcessor: ranges
    on configured fields become numeric range queries instead of
    lexicographic term ranges.
  * :419 setFuzzyPrefixLength — FuzzyConfig.prefixLength feeding
    FuzzyQueryNodeBuilder: the non-fuzzy prefix locks the first N chars
    (Fuzzy.prefix_length; the expansion becomes a pushed-down startswith).
  Not modeled: locale/timezone/date resolution (no date fields in this
  engine's schema).
"""

from __future__ import annotations

import dataclasses

from ..index.segment import KEYWORD_FIELDS
from ..kernels.analyzer import STANDARD, AnalyzerConfig
from .parser import (NUMERIC_FIELDS, ParseError, _lex, _Parser,
                     float_to_edits)
from .query import (
    Bool,
    Boost,
    Clause,
    Fuzzy,
    Occur,
    Phrase,
    Prefix,
    Query,
    Regexp,
    Term,
    TermRange,
    Wildcard,
    rewrite,
)

_MULTI_SENTINEL = "\x00multi"

# leaves MultiFieldQueryNodeProcessor re-fields (FieldableNode analogs)
_FIELDED_LEAVES = (Term, Phrase, Prefix, Wildcard, Fuzzy, Regexp, TermRange)


class _FlexParser(_Parser):
    """Classic grammar with the flexible pipeline's fuzzy semantics."""

    fuzzy_min_sim: float | None = None

    def _suffix(self, q: Query, allow_fuzzy: bool) -> Query:
        # identical to the classic suffix loop except the no-argument `~`
        # resolves through floatToEdits when a minSim is configured
        while True:
            kind = self.peek()
            if kind == "TILDE" and allow_fuzzy and isinstance(q, Term):
                _, tv = self.next()
                if len(tv) > 1:
                    # FuzzyQueryNodeBuilder: every explicit similarity
                    # runs through floatToEdits (fractional scales by len)
                    max_e = float_to_edits(float(tv[1:]), len(q.text))
                elif self.fuzzy_min_sim is not None:
                    max_e = float_to_edits(self.fuzzy_min_sim, len(q.text))
                else:
                    max_e = self.fuzzy_max_edits
                q = Fuzzy(q.text, max_edits=max_e, field=q.field,
                          prefix_length=self.fuzzy_prefix_length)
            elif kind == "CARAT":
                _, bv = self.next()
                q = Boost(q, float(bv[1:]))
            else:
                return q


class StandardQueryParser:
    """`StandardQueryParser()` → configure → `parse(query, default_field)`.

    >>> p = StandardQueryParser()
    >>> p.set_default_operator("AND")
    >>> p.set_multi_fields(("content", "title"))
    >>> q = p.parse("fast window")   # no default field -> multi-field OR
    """

    def __init__(self, cfg: AnalyzerConfig = STANDARD,
                 keyword_fields: tuple = KEYWORD_FIELDS):
        self.cfg = cfg
        self.keyword_fields = keyword_fields
        self._default_occur = Occur.SHOULD
        self._allow_leading_wildcard = False  # reference default
        self._multi_fields: tuple = ()
        self._fields_boost: dict = {}
        self._phrase_slop = 0
        self._fuzzy_min_sim: float | None = None
        self._fuzzy_prefix_length = 0
        self._points_fields: frozenset = frozenset()

    # --- config handler surface (StandardQueryParser.java setters) --------

    def set_default_operator(self, op) -> None:
        if isinstance(op, str):
            op = {"OR": Occur.SHOULD, "AND": Occur.MUST}[op.upper()]
        if op not in (Occur.SHOULD, Occur.MUST):
            raise ValueError("default operator must be AND or OR")
        self._default_occur = op

    def set_allow_leading_wildcard(self, allowed: bool) -> None:
        self._allow_leading_wildcard = bool(allowed)

    def set_multi_fields(self, fields) -> None:
        fields = tuple(fields)
        kw = [f for f in fields if f in self.keyword_fields]
        if kw:
            # field-less leaves parse through the ANALYZER; re-fielding
            # an analyzed (lowercased) copy onto a verbatim keyword
            # field silently never matches — the reference avoids this
            # with PerFieldAnalyzerWrapper, which this engine models as
            # explicit `field:` prefixes instead
            raise ValueError(
                f"multi_fields must be analyzed fields; keyword fields "
                f"{kw} need an explicit 'field:' prefix (verbatim terms)"
            )
        self._multi_fields = fields

    def set_fields_boost(self, boosts: dict) -> None:
        self._fields_boost = dict(boosts)

    def set_phrase_slop(self, slop: int) -> None:
        self._phrase_slop = int(slop)

    def set_fuzzy_min_sim(self, min_sim: float) -> None:
        self._fuzzy_min_sim = float(min_sim)

    def set_fuzzy_prefix_length(self, prefix_length: int) -> None:
        """StandardQueryParser.java:419 — non-fuzzy prefix for every
        fuzzy leaf this parser produces."""
        if prefix_length < 0:
            raise ValueError("prefixLength cannot be negative")
        self._fuzzy_prefix_length = int(prefix_length)

    def set_points_config_map(self, fields) -> None:
        """Fields whose [a TO b] ranges parse as numeric ranges (the
        engine's PointsConfig carries no number format: the corpus's
        numeric doc-values are integers)."""
        self._points_fields = frozenset(fields)

    # --- parse -------------------------------------------------------------

    def parse(self, text: str, default_field: str | None = None,
              do_rewrite: bool = True) -> Query:
        """Parse with the configured pipeline. `default_field=None` with
        multi_fields configured expands field-less leaves across them."""
        multi = default_field is None and self._multi_fields
        p = _FlexParser(_lex(text), self.cfg, self.keyword_fields)
        p.default_occur = self._default_occur
        p.default_phrase_slop = self._phrase_slop
        p.allow_leading_wildcard = self._allow_leading_wildcard
        p.fuzzy_min_sim = self._fuzzy_min_sim
        p.fuzzy_prefix_length = self._fuzzy_prefix_length
        p.numeric_fields = frozenset(NUMERIC_FIELDS) | self._points_fields
        if multi:
            p.default_field = _MULTI_SENTINEL
        elif default_field is not None:
            p.default_field = default_field
        q = p.parse_query()
        if p.peek() is not None:
            raise ParseError("unbalanced parenthesis")
        if multi:
            q = self._expand_multi(q)
        return rewrite(q) if do_rewrite else q

    def _expand_multi(self, node: Query) -> Query:
        """MultiFieldQueryNodeProcessor.java: each leaf that still carries
        the sentinel (i.e. had no explicit `field:` prefix) becomes an OR
        over multi_fields, each copy boosted per fields_boost."""
        if isinstance(node, _FIELDED_LEAVES):
            if node.field != _MULTI_SENTINEL:
                return node
            copies = []
            for f in self._multi_fields:
                leaf: Query = dataclasses.replace(node, field=f)
                b = self._fields_boost.get(f, 1.0)
                copies.append(Boost(leaf, b) if b != 1.0 else leaf)
            if len(copies) == 1:
                return copies[0]
            return Bool.of(*((Occur.SHOULD, c) for c in copies))
        if isinstance(node, Bool):
            return Bool(tuple(
                Clause(c.occur, self._expand_multi(c.query))
                for c in node.clauses
            ))
        for attr in ("query", "match"):
            if hasattr(node, attr):
                return dataclasses.replace(
                    node, **{attr: self._expand_multi(getattr(node, attr))}
                )
        return node
