"""Classic query-parser: Lucene QueryParser syntax → query dataclasses.

Python recursive-descent analog of the reference's JavaCC grammar
(queryparser/classic/QueryParser.jj; QueryParserBase.java:105 parse(),
getFieldQuery/getRangeQuery/getFuzzyQuery/getPrefixQuery/getWildcardQuery/
getBooleanQuery at QueryParserBase.java:466-830). Term/phrase text runs
through the SAME analyzer as indexing (util/QueryBuilder.java), so query
tokens match index tokens exactly.

Supported syntax (single-field engine — field prefixes like `body:` are
accepted and ignored since our corpus indexes one content field):

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
  *:*                    match all
"""

from __future__ import annotations

import re

from ..kernels.analyzer import AnalyzerConfig, STANDARD, tokenize_one
from .query import (
    Bool, Boost, Clause, Fuzzy, MatchAll, MatchNone, Occur, Phrase, Prefix,
    Query, Regexp, Term, TermRange, Wildcard, rewrite,
)


class ParseError(ValueError):
    pass


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
    def __init__(self, tokens: list[tuple[str, str]], cfg: AnalyzerConfig):
        self.toks = tokens
        self.i = 0
        self.cfg = cfg

    def peek(self) -> str | None:
        return self.toks[self.i][0] if self.i < len(self.toks) else None

    def next(self) -> tuple[str, str]:
        t = self.toks[self.i]
        self.i += 1
        return t

    # ---- grammar: Query := ( Conjunction? Modifier? Clause )* -------------

    def parse_query(self) -> Query:
        clauses: list[Clause] = []
        pending_and = False
        while self.peek() not in (None, "RPAREN"):
            kind = self.peek()
            if kind == "AND":
                self.next()
                # retroactively require the previous clause (QueryParser.jj
                # Conjunction semantics: a AND b → +a +b)
                if clauses and clauses[-1].occur == Occur.SHOULD:
                    clauses[-1] = Clause(Occur.MUST, clauses[-1].query)
                pending_and = True
                continue
            if kind == "OR":
                self.next()
                pending_and = False
                continue
            occur = Occur.MUST if pending_and else Occur.SHOULD
            pending_and = False
            if kind in ("NOT", "MINUS"):
                self.next()
                occur = Occur.MUST_NOT
            elif kind == "PLUS":
                self.next()
                occur = Occur.MUST
            q = self.parse_clause()
            if q is not None:
                clauses.append(Clause(occur, q))
        if not clauses:
            return MatchNone()
        if len(clauses) == 1 and clauses[0].occur == Occur.SHOULD:
            return clauses[0].query
        return Bool(tuple(clauses))

    def parse_clause(self) -> Query | None:
        kind, text = self.next()
        if kind == "LPAREN":
            q = self.parse_query()
            if self.peek() != "RPAREN":
                raise ParseError("unbalanced parenthesis")
            self.next()
            return self._suffix(q, allow_fuzzy=False)
        if kind == "PHRASE":
            body = re.sub(r"\\(.)", r"\1", text[1:-1])
            terms, _ = tokenize_one(body, self.cfg)
            if not terms:
                return None
            slop = 0
            if self.peek() == "TILDE":
                _, tv = self.next()
                slop = int(float(tv[1:])) if len(tv) > 1 else 0
            q: Query = Phrase(tuple(terms), slop=slop) if len(terms) > 1 else Term(terms[0])
            return self._suffix(q, allow_fuzzy=False)
        if kind == "REGEX":
            return self._suffix(Regexp(re.sub(r"\\(.)", r"\1", text[1:-1])), False)
        if kind == "RANGE":
            return self._suffix(self._range(text), False)
        if kind == "TERM":
            # bare field prefix (`body:`) before a phrase/range/regex/group —
            # single-field engine: consume the prefix, parse what follows
            if (
                re.match(r"^[A-Za-z_][\w.]*:$", text)
                and self.peek() in ("PHRASE", "RANGE", "REGEX", "LPAREN")
            ):
                return self.parse_clause()
            return self._suffix(self._term(text), allow_fuzzy=True)
        raise ParseError(f"unexpected token {kind} {text!r}")

    def _suffix(self, q: Query, allow_fuzzy: bool) -> Query:
        """Trailing ~ (fuzzy) and ^boost."""
        while True:
            kind = self.peek()
            if kind == "TILDE" and allow_fuzzy and isinstance(q, Term):
                _, tv = self.next()
                max_e = int(float(tv[1:])) if len(tv) > 1 else 2
                q = Fuzzy(q.text, max_edits=max_e)
            elif kind == "CARAT":
                _, bv = self.next()
                q = Boost(q, float(bv[1:]))
            else:
                return q

    def _range(self, text: str) -> Query:
        inc_lo, inc_hi = text[0] == "[", text[-1] == "]"
        body = text[1:-1].strip()
        m = re.match(r"(\S+)\s+TO\s+(\S+)$", body)
        if not m:
            raise ParseError(f"bad range syntax: {text!r}")
        lo = None if m.group(1) == "*" else self._norm(m.group(1))
        hi = None if m.group(2) == "*" else self._norm(m.group(2))
        return TermRange(lo, hi, include_lower=inc_lo, include_upper=inc_hi)

    def _norm(self, raw: str) -> str:
        return raw.lower() if self.cfg.lowercase else raw

    def _term(self, raw: str) -> Query | None:
        if raw == "*:*":
            return MatchAll()
        # strip a field: prefix (single-field engine)
        m = re.match(r"^[A-Za-z_][\w.]*:(.*)$", raw)
        if m:
            raw = m.group(1)
            if raw == "":
                raise ParseError("empty field query")
            if raw == "*":
                return MatchAll()
        if "*" in raw or "?" in raw:
            pat = self._norm(raw)
            body = pat.rstrip("*")
            if "*" not in body and "?" not in body and pat.endswith("*") and body:
                return Prefix(body)  # PrefixQuery fast path
            return Wildcard(pat)
        terms, _ = tokenize_one(raw, self.cfg)
        if not terms:
            return None
        if len(terms) == 1:
            return Term(terms[0])
        # analyzer split one syntactic token (e.g. "foo-bar") → OR of parts
        return Bool.of(*((Occur.SHOULD, Term(t)) for t in terms))


def parse(text: str, cfg: AnalyzerConfig = STANDARD) -> Query:
    """Parse query text → rewritten Query tree (searcher.expand() handles
    the multi-term expansion step)."""
    q = _Parser(_lex(text), cfg).parse_query()
    return rewrite(q)
