"""Classic query-parser: Lucene QueryParser syntax → query dataclasses.

Python recursive-descent analog of the reference's JavaCC grammar
(queryparser/classic/QueryParser.jj; QueryParserBase.java:105 parse(),
getFieldQuery/getRangeQuery/getFuzzyQuery/getPrefixQuery/getWildcardQuery/
getBooleanQuery at QueryParserBase.java:466-830). Term/phrase text runs
through the SAME analyzer as indexing (util/QueryBuilder.java), so query
tokens match index tokens exactly.

Field-qualified queries (QueryParserBase.java:466 getFieldQuery; tests:
queryparser/.../classic/TestQueryParser.java, TestMultiFieldQueryParser.java):
`field:` is its own lexer token, so `lang:python`, `lang:[aa TO bb]`,
`path:/re/` and `repo:(a OR b)` all resolve against the named field.
Keyword fields (repo/path/commit/lang — StringField analog) are NOT
analyzed: the query text is matched verbatim, like a per-field
KeywordAnalyzer (PerFieldAnalyzerWrapper).

Supported syntax:

  hello world            OR of terms (default operator OR)
  a AND b / a && b       both required
  a OR b  / a || b       either
  NOT a / -a / !a        excluded
  +a                     required
  "a b c"                exact phrase;  "a b"~2  sloppy phrase
  pre*                   prefix;  wi*ld?         wildcard
  fuzzy~ / fuzzy~1       fuzzy (default max edits 2)
  /regex/                regexp
  [a TO b] / {a TO b}    term range (inclusive / exclusive)
  term^2.5 / (...)^2     boost
  ( ... )                grouping
  field:term / field:"p" / field:[a TO b] / field:(...)   field queries
  field:*                docs with the field (all docs here)
  *:*                    match all
"""

from __future__ import annotations

import re

from ..index.segment import KEYWORD_FIELDS
from ..kernels.analyzer import AnalyzerConfig, STANDARD, tokenize_one
from .query import (
    Bool, Boost, Clause, ConstantScore, DEFAULT_FIELD, DisjunctionMax, Fuzzy,
    MatchAll, MatchNone, NUMERIC_DOCVALUES, NumericRange, Occur, Phrase,
    Prefix, Query, Regexp, SpanNear, SpanOr, Term, TermRange, Wildcard,
    rewrite,
)

# numeric doc-values fields parse `dl:[30 TO 60]` to a NumericRange
# (PointRangeQuery analog) instead of a lexicographic TermRange
NUMERIC_FIELDS = NUMERIC_DOCVALUES


class ParseError(ValueError):
    pass


def float_to_edits(min_sim: float, term_len: int) -> int:
    """FuzzyQuery.floatToEdits (core/search/FuzzyQuery.java): >= 1 is an
    edit count; a (0, 1) similarity maps to scaled edits, capped at the
    maximum supported distance (2). QueryParserBase.handleBareFuzzy runs
    every explicit fractional `~0.8` through this."""
    if min_sim >= 1.0:
        return min(int(min_sim), 2)
    if min_sim == 0.0:
        return 0
    return min(int((1.0 - min_sim) * term_len), 2)


_TOKEN_SPEC = [
    ("SPACE", r"\s+"),
    ("AND", r"AND(?=[\s(\"]|$)|&&"),
    ("OR", r"OR(?=[\s(\"]|$)|\|\|"),
    ("NOT", r"NOT(?=[\s(\"])|!"),
    ("PLUS", r"\+"),
    ("MINUS", r"-"),
    ("LPAREN", r"\("),
    ("RPAREN", r"\)"),
    ("PHRASE", r'"(?:[^"\\]|\\.)*"'),
    ("REGEX", r"/(?:[^/\\]|\\.)*/"),
    ("RANGE", r"[\[{][^\]}]*[\]}]"),
    ("CARAT", r"\^(?P<boostval>\d+(?:\.\d+)?)"),
    ("TILDE", r"~(?P<tildeval>\d+(?:\.\d+)?)?"),
    # `field:` is its own token (before TERM) so field-prefixed range /
    # regex / group syntax lexes correctly: 'lang:[aa TO bb]' is
    # FIELD('lang:') RANGE('[aa TO bb]'), not three TERMs.
    ("FIELD", r"[A-Za-z_][\w.]*:"),
    ("TERM", r"[^\s()\"^~]+"),
]
_LEXER = re.compile("|".join(f"(?P<{n}>{p})" for n, p in _TOKEN_SPEC))


def _lex(text: str) -> list[tuple[str, str]]:
    out, i = [], 0
    while i < len(text):
        m = _LEXER.match(text, i)
        if m is None:
            raise ParseError(f"cannot lex at offset {i}: {text[i:i+20]!r}")
        kind = m.lastgroup
        # named inner groups (boostval/tildeval) can shadow lastgroup
        for outer, _ in _TOKEN_SPEC:
            if m.group(outer):
                kind = outer
                break
        if kind != "SPACE":
            out.append((kind, m.group(0)))
        i = m.end()
    return out


class _Parser:
    def __init__(self, tokens: list[tuple[str, str]], cfg: AnalyzerConfig,
                 keyword_fields: tuple = KEYWORD_FIELDS):
        self.toks = tokens
        self.i = 0
        self.cfg = cfg
        self.keyword_fields = frozenset(keyword_fields)
        # config points the flexible parser (flexparser.StandardQueryParser)
        # overrides; these defaults ARE classic QueryParser behavior
        self.default_occur = Occur.SHOULD      # OR_OPERATOR
        self.default_phrase_slop = 0           # setPhraseSlop
        self.fuzzy_max_edits = 2               # FuzzyQuery default
        self.fuzzy_prefix_length = 0           # setFuzzyPrefixLength default
        self.allow_leading_wildcard = True     # classic parse() kept lenient
        self.default_field = DEFAULT_FIELD
        self.numeric_fields = NUMERIC_FIELDS   # + PointsConfig map in flex

    def peek(self) -> str | None:
        return self.toks[self.i][0] if self.i < len(self.toks) else None

    def next(self) -> tuple[str, str]:
        t = self.toks[self.i]
        self.i += 1
        return t

    # ---- grammar: Query := ( Conjunction? Modifier? Clause )* -------------

    def parse_query(self, field: str | None = None) -> Query:
        """`field` threads a pending field prefix into every clause of a
        group — `repo:(MyRepo OR other)` must give each grouped term the
        SAME treatment as direct `repo:MyRepo` (keyword fields verbatim,
        analyzed fields tokenized; ADVICE r2 medium fix: relabeling after
        a default-field parse silently lowercased keyword values)."""
        clauses: list[Clause] = []
        pending_and = False
        pending_or = False
        while self.peek() not in (None, "RPAREN"):
            kind = self.peek()
            if kind == "AND":
                self.next()
                # retroactively require the previous clause (QueryParser.jj
                # Conjunction semantics: a AND b → +a +b)
                if clauses and clauses[-1].occur == Occur.SHOULD:
                    clauses[-1] = Clause(Occur.MUST, clauses[-1].query)
                pending_and = True
                pending_or = False
                continue
            if kind == "OR":
                self.next()
                pending_and = False
                # AND-default mode (QueryParserBase.addClause): OR demotes
                # the previous non-prohibited clause AND the next one
                if self.default_occur == Occur.MUST:
                    if clauses and clauses[-1].occur != Occur.MUST_NOT:
                        clauses[-1] = Clause(Occur.SHOULD, clauses[-1].query)
                    pending_or = True
                continue
            if pending_and:
                occur = Occur.MUST
            elif pending_or:
                occur = Occur.SHOULD
            else:
                occur = self.default_occur
            was_or = pending_or
            pending_and = pending_or = False
            if kind in ("NOT", "MINUS"):
                self.next()
                occur = Occur.MUST_NOT
            elif kind == "PLUS":
                self.next()
                # AND-default + CONJ_OR ignores the `+` (addClause:
                # required = !prohibited && conj != CONJ_OR)
                if self.default_occur == Occur.SHOULD or not was_or:
                    occur = Occur.MUST
            q = self.parse_clause(field=field)
            if q is not None:
                clauses.append(Clause(occur, q))
        if not clauses:
            return MatchNone()
        if len(clauses) == 1 and clauses[0].occur == Occur.SHOULD:
            return clauses[0].query
        return Bool(tuple(clauses))

    def parse_clause(self, field: str | None = None) -> Query | None:
        kind, text = self.next()
        if kind == "FIELD":
            if field is not None:
                raise ParseError(f"nested field prefix at {text!r}")
            if self.peek() is None:
                raise ParseError("dangling field prefix")
            return self.parse_clause(field=text[:-1])
        eff_field = field or self.default_field
        if kind == "LPAREN":
            # the pending field THREADS into the group so every leaf is
            # built with the target field's keyword/analyzed rule
            q = self.parse_query(field=field)
            if self.peek() != "RPAREN":
                raise ParseError("unbalanced parenthesis")
            self.next()
            return self._suffix(q, allow_fuzzy=False)
        if kind == "PHRASE":
            body = re.sub(r"\\(.)", r"\1", text[1:-1])
            if eff_field in self.keyword_fields:
                terms = [body]  # keyword fields match verbatim
            else:
                terms, _ = tokenize_one(body, self.cfg)
            if not terms:
                return None
            slop = self.default_phrase_slop
            if self.peek() == "TILDE":
                _, tv = self.next()
                slop = int(float(tv[1:])) if len(tv) > 1 else 0
            q: Query = (
                Phrase(tuple(terms), slop=slop, field=eff_field)
                if len(terms) > 1
                else Term(terms[0], field=eff_field)
            )
            return self._suffix(q, allow_fuzzy=False)
        if kind == "REGEX":
            return self._suffix(
                Regexp(re.sub(r"\\(.)", r"\1", text[1:-1]), field=eff_field), False
            )
        if kind == "RANGE":
            return self._suffix(self._range(text, eff_field), False)
        if kind == "TERM":
            return self._suffix(self._term(text, field), allow_fuzzy=True)
        raise ParseError(f"unexpected token {kind} {text!r}")

    def _suffix(self, q: Query, allow_fuzzy: bool) -> Query:
        """Trailing ~ (fuzzy) and ^boost."""
        while True:
            kind = self.peek()
            if kind == "TILDE" and allow_fuzzy and isinstance(q, Term):
                _, tv = self.next()
                if len(tv) > 1:
                    # QueryParserBase.handleBareFuzzy: fractional
                    # similarities scale by term length (floatToEdits)
                    max_e = float_to_edits(float(tv[1:]), len(q.text))
                else:
                    max_e = self.fuzzy_max_edits
                q = Fuzzy(q.text, max_edits=max_e, field=q.field,
                          prefix_length=self.fuzzy_prefix_length)
            elif kind == "CARAT":
                _, bv = self.next()
                q = Boost(q, float(bv[1:]))
            else:
                return q

    def _range(self, text: str, field: str) -> Query:
        inc_lo, inc_hi = text[0] == "[", text[-1] == "]"
        body = text[1:-1].strip()
        m = re.match(r"(\S+)\s+TO\s+(\S+)$", body)
        if not m:
            raise ParseError(f"bad range syntax: {text!r}")
        if field in self.numeric_fields:
            # getRangeQuery on a points field (QueryParserBase +
            # IntPoint.newRangeQuery): numeric doc-values range; exclusive
            # brackets tighten the integer bound by one
            lo = None if m.group(1) == "*" else int(m.group(1))
            hi = None if m.group(2) == "*" else int(m.group(2))
            if lo is not None and not inc_lo:
                lo += 1
            if hi is not None and not inc_hi:
                hi -= 1
            return NumericRange(field, lo, hi)
        keyword = field in self.keyword_fields
        lo = None if m.group(1) == "*" else self._norm(m.group(1), keyword)
        hi = None if m.group(2) == "*" else self._norm(m.group(2), keyword)
        return TermRange(
            lo, hi, include_lower=inc_lo, include_upper=inc_hi, field=field
        )

    def _norm(self, raw: str, keyword: bool = False) -> str:
        if keyword:
            return raw
        return raw.lower() if self.cfg.lowercase else raw

    def _term(self, raw: str, field: str | None) -> Query | None:
        if raw == "*:*" and field is None:
            return MatchAll()
        eff_field = field or self.default_field
        if raw == "*" and field is not None:
            # field:* — FieldExistsQuery analog; every doc has every field
            return MatchAll()
        keyword = eff_field in self.keyword_fields
        if "*" in raw or "?" in raw:
            if not self.allow_leading_wildcard and raw[0] in "*?":
                raise ParseError(
                    "'*' or '?' not allowed as first character in "
                    "WildcardQuery (setAllowLeadingWildcard)"
                )
            pat = self._norm(raw, keyword)
            body = pat.rstrip("*")
            if "*" not in body and "?" not in body and pat.endswith("*") and body:
                return Prefix(body, field=eff_field)  # PrefixQuery fast path
            return Wildcard(pat, field=eff_field)
        if keyword:
            return Term(raw, field=eff_field)  # StringField: verbatim
        terms, _ = tokenize_one(raw, self.cfg)
        if not terms:
            return None
        if len(terms) == 1:
            return Term(terms[0], field=eff_field)
        # analyzer split one syntactic token (e.g. "foo-bar") → OR of parts
        return Bool.of(*((Occur.SHOULD, Term(t, field=eff_field)) for t in terms))


_FUNC_ARITY = {
    "sum": None, "sub": 2, "product": None, "div": 2, "log": 1, "ln": 1,
    "sqrt": 1, "abs": 1, "pow": 2, "min": None, "max": None, "recip": 4,
}


def parse_function_expr(text: str) -> tuple:
    """Solr function-query syntax → FunctionExpr AST
    (solr/core/src/java/org/apache/solr/search/FunctionQParser.java
    parseValueSource; ValueSourceParser.java standard sources;
    lucene/expressions JavascriptCompiler's compiled-expression role).
    Grammar: name(arg, ...) | _score | <field> | <number>. Example:
    'product(_score, recip(n_chars, 1, 1000, 1000))'."""
    toks = re.findall(r"[A-Za-z_][\w]*|[-+]?\d+(?:\.\d+)?|[(),]", text)
    pos = 0

    def peek():
        return toks[pos] if pos < len(toks) else None

    def eat(t=None):
        nonlocal pos
        if pos >= len(toks) or (t is not None and toks[pos] != t):
            raise ParseError(f"function-expr syntax at {toks[pos:pos+3]!r}")
        pos += 1
        return toks[pos - 1]

    def parse_one() -> tuple:
        tok = eat()
        if re.fullmatch(r"[-+]?\d+(?:\.\d+)?", tok):
            return ("lit", float(tok))
        if tok == "_score":
            return ("score",)
        if peek() == "(":
            fn = tok.lower()
            if fn not in _FUNC_ARITY:
                raise ParseError(f"unknown function {fn!r}")
            eat("(")
            args = [parse_one()]
            while peek() == ",":
                eat(",")
                args.append(parse_one())
            eat(")")
            arity = _FUNC_ARITY[fn]
            if arity is not None and len(args) != arity:
                raise ParseError(f"{fn} expects {arity} args, got {len(args)}")
            if arity is None and len(args) < 2:
                raise ParseError(f"{fn} expects >= 2 args")
            return (fn, *args)
        if tok in NUMERIC_FIELDS:
            return ("field", tok)
        raise ParseError(f"unknown value source {tok!r}")

    out = parse_one()
    if pos != len(toks):
        raise ParseError(f"trailing tokens {toks[pos:]!r}")
    return out


def calculate_min_should_match(optional_count: int, spec) -> int:
    """Solr mm spec → int (solr/core/src/java/org/apache/solr/util/
    SolrPluginUtils.java:673-709 calculateMinShouldMatch): plain int
    (negative = count-back), 'N%' (negative percent = count-back),
    conditional chains 'U<spec U<spec ...' (first upper bound >= the
    optional-clause count wins; below every bound -> all optional
    clauses required)."""
    if isinstance(spec, int):
        spec = str(spec)
    result = optional_count
    spec = spec.strip()
    if "<" in spec:
        spec = re.sub(r"(\s+<\s*)|(\s*<\s+)", "<", spec)
        for s_ in spec.split(" "):
            upper, _, sub = s_.partition("<")
            if optional_count <= int(upper):
                return result
            result = calculate_min_should_match(optional_count, sub)
        return result
    if spec.endswith("%"):
        pct = int(spec[:-1])
        calc = (result * pct) / 100.0
        result = result + int(calc) if calc < 0 else int(calc)
    else:
        calc = int(spec)
        result = result + calc if calc < 0 else calc
    return min(optional_count, max(result, 0))


_DISMAX_WORD = re.compile(r'([+-]?)("(?:[^"\\]|\\.)*"|\S+)')


def parse_dismax(
    text: str,
    qf: dict,
    tie: float = 0.0,
    mm: int | str = 0,
    pf: dict | None = None,
    ps: int = 0,
    bq: str | Query | None = None,
    bf: str | None = None,
    cfg: AnalyzerConfig = STANDARD,
    keyword_fields: tuple = KEYWORD_FIELDS,
) -> Query:
    """Solr DisMax/eDisMax query parser analog
    (solr/core/src/java/org/apache/solr/search/DisMaxQParser.java:182-266,
    ExtendedDismaxQParser.java; SolrPluginUtils.DisjunctionMaxQueryParser
    field aliasing): each whitespace word of the user query becomes a
    DisjunctionMaxQuery over the `qf` fields (field -> boost), the
    per-word dismaxes combine as SHOULD clauses under `mm`
    (SolrPluginUtils.setMinShouldMatch), and `pf` adds the whole query as
    a boosted SHOULD phrase (slop `ps`) per phrase field.

    Per-field analysis follows the engine's schema exactly like Solr's
    per-field analyzers: analyzed fields run the index analyzer chain on
    the word (0 tokens -> the field contributes no alternative; >1 token
    -> SHOULD-bool of the parts, Solr's autoGeneratePhraseQueries=false
    default); keyword fields take the word verbatim. Leading `+` / `-`
    make a word required / prohibited (DisMax's escaped-syntax subset);
    a quoted "..." word is a phrase on analyzed fields and a verbatim
    term on keyword fields. `mm` counts SHOULD words only and accepts
    the full Solr spec grammar (int, negative count-back, 'N%',
    conditional 'U<spec ...' chains — SolrPluginUtils
    .calculateMinShouldMatch). `bq` adds a boost QUERY as a SHOULD
    sibling of the mm bool (DisMaxQParser.addBoostQuery); `bf` is a
    boost FUNCTION (FunctionQParser syntax) folded as
    score = f32(main + bf(doc)) via FunctionExpr — the additive
    boost-function semantics (modern FunctionScoreQuery.boostByValue
    posture; classic Solr models bf as a match-all function clause,
    which scores identically on the match set)."""
    kw = frozenset(keyword_fields)

    def field_alt(word: str, field: str, boost: float, quoted: bool):
        if field in kw:
            leaf = Term(word, field=field)
        else:
            terms, _ = tokenize_one(word, cfg)
            if not terms:
                return None
            if len(terms) == 1:
                leaf = Term(terms[0], field=field)
            elif quoted:
                leaf = Phrase(tuple(terms), field=field)
            else:
                leaf = Bool.of(
                    *((Occur.SHOULD, Term(t, field=field)) for t in terms)
                )
        return Boost(leaf, boost) if boost != 1.0 else leaf

    clauses = []
    pf_words = []
    for sign, raw in _DISMAX_WORD.findall(text):
        quoted = raw.startswith('"') and raw.endswith('"') and len(raw) >= 2
        word = raw[1:-1] if quoted else raw
        if sign != "-":
            pf_words.append(word)
        alts = [
            a
            for f, b in qf.items()
            if (a := field_alt(word, f, b, quoted)) is not None
        ]
        if not alts:
            continue
        node = alts[0] if len(alts) == 1 else DisjunctionMax(tuple(alts), tie)
        occur = {"+": Occur.MUST, "-": Occur.MUST_NOT}.get(sign, Occur.SHOULD)
        clauses.append(Clause(occur, node))
    if not clauses:
        return MatchNone()
    n_opt = sum(1 for c in clauses if c.occur is Occur.SHOULD)
    msm = calculate_min_should_match(n_opt, mm) if not isinstance(mm, int) or mm else 0
    main = Bool(tuple(clauses), min_should_match=msm)
    # pf phrases join the main query as SHOULD siblings of the whole
    # mm-constrained user query (DisMaxQParser.addMainQuery: the parsed
    # user query and the phrase query are separate optional clauses of
    # the outer BooleanQuery, so pf boosts but never widens or narrows
    # the match set and never perturbs mm counting).
    phrase_clauses = []
    for f, b in (pf or {}).items():
        if f in kw:
            continue
        terms, _ = tokenize_one(" ".join(pf_words), cfg)
        if len(terms) >= 2:
            leaf = Phrase(tuple(terms), slop=ps, field=f)
            phrase_clauses.append(
                Clause(Occur.SHOULD, Boost(leaf, b) if b != 1.0 else leaf)
            )
    extra = list(phrase_clauses)
    if bq is not None:
        sub = parse(bq, cfg, keyword_fields) if isinstance(bq, str) else bq
        extra.append(Clause(Occur.SHOULD, sub))
    if extra:
        main = Bool((Clause(Occur.SHOULD, main), *extra))
    q: Query = main
    if bf is not None:
        from .query import FunctionExpr

        q = FunctionExpr(q, ("sum", ("score",), parse_function_expr(bf)))
    return rewrite(q)


def parse(
    text: str,
    cfg: AnalyzerConfig = STANDARD,
    keyword_fields: tuple = KEYWORD_FIELDS,
    synonyms: dict | None = None,
) -> Query:
    """Parse query text → rewritten Query tree (searcher.expand() handles
    the multi-term expansion step). `synonyms={"fast": ("quick",)}`
    applies query-time synonym expansion (SynonymGraphFilter placement:
    Term leaves in the default field become SynonymQuery)."""
    q = _Parser(_lex(text), cfg, keyword_fields).parse_query()
    if synonyms:
        from .query import apply_synonyms

        q = apply_synonyms(q, synonyms)
    return rewrite(q)


# ---------------------------------------------------------------------------
# Surround query parser (lucene/queryparser/src/java/org/apache/lucene/
# queryparser/surround/: QueryParser.jj grammar, query/DistanceQuery.java
# getSpanNearQuery — W/N distance operators over the span algebra).
# ---------------------------------------------------------------------------

_SURROUND_TOKEN = re.compile(
    r"\s*(\(|\)|,|(?:\d+)?[wWnN](?=[\s(])|[Aa][Nn][Dd]\b|[Oo][Rr]\b|"
    r"[Nn][Oo][Tt]\b|[^\s(),]+)"
)


def parse_surround(
    text: str,
    cfg: AnalyzerConfig = STANDARD,
) -> Query:
    """Surround syntax → query tree: `a W b` / `a 3W b` (ordered within
    distance, SpanNear slop = n-1 in_order — DistanceQuery.java:117
    getSpanNearQuery), `a N b` / `3N(a, b)` (unordered), AND / OR / NOT
    boolean composition, parentheses. OR inside a distance becomes
    SpanOr (the only composed query a distance operand admits —
    DistanceSubQuery); AND/NOT inside a distance raises, matching the
    reference's Test01Exceptions list. Truncation (`ab*`) is not
    supported here (SrndTruncQuery needs the live term dict — use
    searcher.complex_phrase for wildcard-in-proximity)."""
    toks = [t for t in _SURROUND_TOKEN.findall(text) if t.strip()]
    pos = 0

    def peek():
        return toks[pos] if pos < len(toks) else None

    def eat():
        nonlocal pos
        pos += 1
        return toks[pos - 1]

    def is_dist_op(t):
        return t is not None and re.fullmatch(r"\d*[wWnN]", t)

    def analyzed(t: str) -> str:
        terms, _ = tokenize_one(t, cfg)
        if len(terms) != 1:
            raise ParseError(f"surround term {t!r} analyzes to {terms}")
        return terms[0]

    def primary(in_dist: bool):
        t = peek()
        if t == "(":
            eat()
            q = orexpr(in_dist)
            if peek() != ")":
                raise ParseError("unbalanced parenthesis in surround query")
            eat()
            return q
        if is_dist_op(t):  # prefix form: 3W(a, b, c)
            op = eat()
            if peek() != "(":
                raise ParseError(f"{op} prefix operator needs (...)")
            eat()
            args = [orexpr(True)]
            while peek() == ",":
                eat()
                args.append(orexpr(True))
            if peek() != ")":
                raise ParseError("unbalanced parenthesis in surround query")
            eat()
            return _distance(op, args)
        tok = eat()
        if tok in (")", ","):
            raise ParseError(f"unexpected {tok!r}")
        return Term(analyzed(tok))

    def _as_span_operand(o: Query):
        """A distance operand must be a DistanceSubQuery (term, OR group,
        nested distance) — a pure-SHOULD OR of such operands converts to
        SpanOr; anything else matches the reference's parse exceptions."""
        if isinstance(o, Term):
            return o.text
        if isinstance(o, (SpanNear, SpanOr)):
            return o
        if (
            isinstance(o, Bool)
            and o.min_should_match <= 1
            and all(c.occur == Occur.SHOULD for c in o.clauses)
        ):
            return SpanOr(tuple(_as_span_operand(c.query) for c in o.clauses))
        raise ParseError(
            "distance operands must be terms, OR groups or nested "
            f"distances — got {type(o).__name__}"
        )

    def _distance(op: str, operands: list) -> Query:
        n = int(op[:-1]) if len(op) > 1 else 1
        ordered = op[-1].lower() == "w"
        subs = tuple(_as_span_operand(o) for o in operands)
        return SpanNear(subs, slop=n - 1, in_order=ordered)

    def distexpr(in_dist: bool):
        left = primary(in_dist)
        ops = []
        while is_dist_op(peek()):
            op = eat()
            right = primary(True)
            ops.append((op, right))
        if not ops:
            return left
        # a W b W c with ONE op spelling = one distance list (the
        # reference's ComposedQuery over all operands)
        if len({o for o, _ in ops}) == 1:
            return _distance(ops[0][0], [left] + [r for _, r in ops])
        q = left
        for op, right in ops:
            q = _distance(op, [q, right])
        return q

    def notexpr(in_dist: bool):
        q = distexpr(in_dist)
        while peek() is not None and peek().lower() == "not":
            eat()
            if in_dist:
                raise ParseError("NOT is not allowed inside a distance")
            rhs = distexpr(in_dist)
            q = Bool.of((Occur.MUST, q), (Occur.MUST_NOT, rhs))
        return q

    def andexpr(in_dist: bool):
        q = notexpr(in_dist)
        subs = [q]
        while peek() is not None and peek().lower() == "and":
            eat()
            if in_dist:
                raise ParseError("AND is not allowed inside a distance")
            subs.append(notexpr(in_dist))
        if len(subs) == 1:
            return q
        return Bool.of(*((Occur.MUST, s) for s in subs))

    def orexpr(in_dist: bool):
        q = andexpr(in_dist)
        subs = [q]
        while peek() is not None and peek().lower() == "or":
            eat()
            subs.append(andexpr(in_dist))
        if len(subs) == 1:
            return q
        if in_dist:
            # OR inside a distance: SpanOr over term/span operands
            clauses = []
            for s in subs:
                if isinstance(s, Term):
                    clauses.append(s.text)
                elif isinstance(s, (SpanNear,)) or s.__class__.__name__ in (
                    "SpanOr", "SpanTerm"
                ):
                    clauses.append(s)
                else:
                    raise ParseError("OR inside a distance admits only spans")
            return SpanOr(tuple(clauses))
        return Bool.of(*((Occur.SHOULD, s) for s in subs))

    q = orexpr(False)
    if pos != len(toks):
        raise ParseError(f"trailing surround tokens {toks[pos:]!r}")
    return rewrite(q)


# ---------------------------------------------------------------------------
# SimpleQueryParser (lucene/queryparser/src/java/org/apache/lucene/
# queryparser/simple/SimpleQueryParser.java) — the "do your best, never
# throw" end-user grammar: + AND, | OR, - NOT, "..." phrase (~N near),
# trailing * prefix, ~N fuzzy, ( ) precedence, \ escapes, whitespace as
# the implicit default operator. Any syntax error is decoded as literally
# as possible (parseSubQuery:164-223 error-recovery comments).
# ---------------------------------------------------------------------------

# feature flags (SimpleQueryParser.java:106-124)
AND_OPERATOR = 1 << 0
NOT_OPERATOR = 1 << 1
OR_OPERATOR = 1 << 2
PREFIX_OPERATOR = 1 << 3
PHRASE_OPERATOR = 1 << 4
PRECEDENCE_OPERATORS = 1 << 5
ESCAPE_OPERATOR = 1 << 6
WHITESPACE_OPERATOR = 1 << 7
FUZZY_OPERATOR = 1 << 8
NEAR_OPERATOR = 1 << 9

_MAX_FUZZY_DISTANCE = 2  # util/automaton/LevenshteinAutomata MAXIMUM_SUPPORTED_DISTANCE


class _SimpleState:
    __slots__ = ("data", "index", "length", "top", "current_op", "previous_op", "not_count")

    def __init__(self, data: str, start: int, length: int):
        self.data = data
        self.index = start
        self.length = length
        self.top: Query | None = None
        self.current_op: Occur | None = None
        self.previous_op: Occur | None = None
        self.not_count = 0


class SimpleParser:
    """Port of the public SimpleQueryParser algorithm. `weights` maps
    field → boost (SimpleQueryParser.java:135 multi-field constructor);
    leaves become per-field SHOULD bools with Boost wrappers, simplified
    when 0/1 clause (simplify:613-621)."""

    def __init__(
        self,
        cfg: AnalyzerConfig = STANDARD,
        weights: dict | None = None,
        flags: int = -1,
        default_operator: Occur = Occur.SHOULD,
    ):
        if default_operator not in (Occur.SHOULD, Occur.MUST):
            raise ValueError("default operator must be SHOULD or MUST")
        self.cfg = cfg
        self.weights = weights or {DEFAULT_FIELD: 1.0}
        self.flags = flags
        self.default_operator = default_operator

    # -- entry (parse:147-162) --
    def parse(self, text: str, do_rewrite: bool = True) -> Query:
        """`do_rewrite=False` returns the raw tree exactly as the reference
        builds it (golden tests compare against ported expectations);
        the engine path applies the standard rewrite fixpoint."""
        if text.strip() == "*":
            return MatchAll()
        state = _SimpleState(text, 0, len(text))
        self._parse_sub(state)
        if state.top is None:
            return MatchNone()
        return rewrite(state.top) if do_rewrite else state.top

    def _flag(self, f: int) -> bool:
        return bool(self.flags & f)

    # -- main loop (parseSubQuery:164-223) --
    def _parse_sub(self, st: _SimpleState) -> None:
        while st.index < st.length:
            c = st.data[st.index]
            if c == "(" and self._flag(PRECEDENCE_OPERATORS):
                self._consume_subquery(st)
            elif c == ")" and self._flag(PRECEDENCE_OPERATORS):
                st.index += 1  # extraneous
            elif c == '"' and self._flag(PHRASE_OPERATOR):
                self._consume_phrase(st)
            elif c == "+" and self._flag(AND_OPERATOR):
                if st.current_op is None and st.top is not None:
                    st.current_op = Occur.MUST
                st.index += 1
            elif c == "|" and self._flag(OR_OPERATOR):
                if st.current_op is None and st.top is not None:
                    st.current_op = Occur.SHOULD
                st.index += 1
            elif c == "-" and self._flag(NOT_OPERATOR):
                # two NOTs in a row negate each other; continue so the
                # count survives to the next token
                st.not_count += 1
                st.index += 1
                continue
            elif c in " \t\n\r" and self._flag(WHITESPACE_OPERATOR):
                st.index += 1
            else:
                self._consume_token(st)
            st.not_count = 0

    # -- ( ... ) (consumeSubQuery:225-281) --
    def _consume_subquery(self, st: _SimpleState) -> None:
        st.index += 1
        start = st.index
        depth = 1
        escaped = False
        while st.index < st.length:
            if not escaped:
                c = st.data[st.index]
                if c == "\\" and self._flag(ESCAPE_OPERATOR):
                    escaped = True
                    st.index += 1
                    continue
                if c == "(":
                    depth += 1
                elif c == ")":
                    depth -= 1
                    if depth == 0:
                        break
            escaped = False
            st.index += 1
        if st.index == st.length:
            # no closing paren: the opening one is extraneous
            st.index = start
        elif st.index == start:
            # "()": the pending operation would have applied to it — reset
            st.current_op = None
            st.index += 1
        else:
            sub = _SimpleState(st.data, start, st.index)
            self._parse_sub(sub)
            self._build_tree(st, sub.top)
            st.index += 1

    # -- "..." [~N] (consumePhrase:284-350) --
    def _consume_phrase(self, st: _SimpleState) -> None:
        st.index += 1
        start = st.index
        buf: list[str] = []
        escaped = False
        has_slop = False
        while st.index < st.length:
            if not escaped:
                c = st.data[st.index]
                if c == "\\" and self._flag(ESCAPE_OPERATOR):
                    escaped = True
                    st.index += 1
                    continue
                if c == '"':
                    if (
                        st.length > st.index + 1
                        and st.data[st.index + 1] == "~"
                        and self._flag(NEAR_OPERATOR)
                    ):
                        st.index += 1
                        if st.length > st.index + 1:
                            has_slop = True
                        break
                    break
            escaped = False
            buf.append(st.data[st.index])
            st.index += 1
        if st.index == st.length:
            st.index = start  # unclosed quote: opening quote extraneous
        elif st.index == start:
            st.current_op = None
            st.index += 1
        else:
            phrase = "".join(buf)
            slop = self._parse_fuzziness(st) if has_slop else 0
            self._build_tree(st, self._new_phrase(phrase, slop))
            st.index += 1

    # -- term [~N | *] (consumeToken:354-419) --
    def _consume_token(self, st: _SimpleState) -> None:
        buf: list[str] = []
        escaped = False
        prefix = False
        fuzzy = False
        while st.index < st.length:
            if not escaped:
                c = st.data[st.index]
                if c == "\\" and self._flag(ESCAPE_OPERATOR):
                    escaped = True
                    prefix = False
                    st.index += 1
                    continue
                if self._token_finished(st):
                    break
                if buf and c == "~" and self._flag(FUZZY_OPERATOR):
                    fuzzy = True
                    break
                prefix = bool(buf) and c == "*" and self._flag(PREFIX_OPERATOR)
            escaped = False
            buf.append(st.data[st.index])
            st.index += 1
        if not buf:
            return
        token = "".join(buf)
        if fuzzy:
            edits = min(self._parse_fuzziness(st), _MAX_FUZZY_DISTANCE)
            branch = (
                self._new_default(token) if edits == 0
                else self._new_fuzzy(token, edits)
            )
        elif prefix:
            branch = self._new_prefix(token[:-1])
        else:
            branch = self._new_default(token)
        self._build_tree(st, branch)

    # -- ~N (parseFuzziness:482-518) --
    def _parse_fuzziness(self, st: _SimpleState) -> int:
        if st.index >= st.length or st.data[st.index] != "~":
            return 0
        chars: list[str] = []
        while st.index < st.length:
            st.index += 1
            if st.index < st.length:
                if self._token_finished(st):
                    break
                chars.append(st.data[st.index])
        try:
            val = int("".join(chars)) if chars else 2  # bare ~ = auto ~2
        except ValueError:
            val = 0  # swallow, like the NumberFormatException branch
        return max(val, 0)

    # -- delimiters (tokenFinished:523-536) --
    def _token_finished(self, st: _SimpleState) -> bool:
        c = st.data[st.index]
        return (
            (c == '"' and self._flag(PHRASE_OPERATOR))
            or (c == "|" and self._flag(OR_OPERATOR))
            or (c == "+" and self._flag(AND_OPERATOR))
            or (c in "()" and self._flag(PRECEDENCE_OPERATORS))
            or (c in " \t\n\r" and self._flag(WHITESPACE_OPERATOR))
        )

    # -- tree assembly (buildQueryTree:435-477, addClause:422-429) --
    def _build_tree(self, st: _SimpleState, branch: Query | None) -> None:
        if branch is None:
            return
        if st.not_count % 2 == 1:
            branch = Bool.of((Occur.MUST_NOT, branch), (Occur.SHOULD, MatchAll()))
        if st.top is None:
            st.top = branch
        else:
            if st.current_op is None:
                st.current_op = self.default_operator
            if st.previous_op != st.current_op:
                # operational change: previous tree becomes one clause of a
                # new parent — this IS the right-to-left precedence rule
                st.top = Bool.of((st.current_op, st.top))
            assert isinstance(st.top, Bool)
            st.top = Bool(
                st.top.clauses + (Clause(st.current_op, branch),),
                st.top.min_should_match,
            )
            st.previous_op = st.current_op
        st.current_op = None

    # -- leaf factories (newDefaultQuery:561, newFuzzyQuery:576,
    #    newPhraseQuery:593, newPrefixQuery:610; simplify:613-621) --
    def _per_field(self, make) -> Query | None:
        clauses = []
        for fld, boost in self.weights.items():
            q = make(fld)
            if q is None:
                continue
            if boost != 1.0:
                q = Boost(q, boost)
            clauses.append(Clause(Occur.SHOULD, q))
        if not clauses:
            return None
        if len(clauses) == 1:
            return clauses[0].query
        return Bool(tuple(clauses))

    def _norm(self, raw: str) -> str:
        # Analyzer.normalize: the chain's per-char filters only (lowercase)
        return raw.lower() if self.cfg.lowercase else raw

    def _new_default(self, text: str) -> Query | None:
        def make(fld):
            terms, _ = tokenize_one(text, self.cfg)
            if not terms:
                return None
            if len(terms) == 1:
                return Term(terms[0], field=fld)
            # createBooleanQuery: analyzer-split tokens combine under the
            # DEFAULT operator (QueryBuilder.createBooleanQuery)
            return Bool.of(*((self.default_operator, Term(t, field=fld)) for t in terms))

        return self._per_field(make)

    def _new_fuzzy(self, text: str, edits: int) -> Query | None:
        return self._per_field(lambda fld: Fuzzy(self._norm(text), edits, field=fld))

    def _new_prefix(self, text: str) -> Query | None:
        return self._per_field(lambda fld: Prefix(self._norm(text), field=fld))

    def _new_phrase(self, text: str, slop: int) -> Query | None:
        def make(fld):
            terms, _ = tokenize_one(text, self.cfg)
            if not terms:
                return None
            if len(terms) == 1:
                return Term(terms[0], field=fld)
            return Phrase(tuple(terms), slop=slop, field=fld)

        return self._per_field(make)


def parse_simple(
    text: str,
    cfg: AnalyzerConfig = STANDARD,
    weights: dict | None = None,
    flags: int = -1,
    default_operator: Occur = Occur.SHOULD,
) -> Query:
    """SimpleQueryParser.parse analog — never raises on query syntax."""
    return SimpleParser(cfg, weights, flags, default_operator).parse(text)
