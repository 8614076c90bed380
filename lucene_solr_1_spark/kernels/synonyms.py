"""SynonymGraphFilter + FlattenGraphFilter — index-time multi-word
synonyms, implemented from the reference's graph semantics (NOT a port):

  - SynonymMap / SolrSynonymParser rule format
    (analysis/common/src/java/org/apache/lucene/analysis/synonym/
     SynonymMap.java, SolrSynonymParser.java:1-180): "a, b, c" is an
    equivalence class (expand=true: every input maps to every member);
    "x y => z" maps each left-hand input to the right-hand outputs only.
    Multi-word members are whitespace-split and analyzed member-by-member.
  - SynonymGraphFilter match + node assignment
    (synonym/SynonymGraphFilter.java:426-545 bufferOutputTokens):
    greedy longest match at each token, matched spans spawn side paths;
    start node s, end node e = s + totalPathNodes + 1 where
    totalPathNodes = (M-1 if keepOrig else 0) + Σ(len(path_i)-1);
    path i's intermediate nodes are allocated in path order, the
    original's intermediates after all side paths; emission order is
    first-token-per-path, then the original's first token, then each
    path's tail, then the original's tail.
  - FlattenGraphFilter position mapping
    (core/FlattenGraphFilter.java:268-340): output nodes are numbered
    sequentially — processing tokens in emission order,
    out(dest) = max(out(dest), out(src) + 1); a token's flattened
    position is out(src). Release order is by output position (stable
    within a position). Golden tests mirror
    TestSynonymGraphFilter.testFlattenedGraph and
    TestFlattenGraphFilter.testWTF1 expectations.

The flattened stream is lossy exactly like the reference (index-time
graphs cannot carry posLength): e.g. with "wtf => what the fudge"
(keepOrig) a PhraseQuery("wtf","the") wrongly matches and
PhraseQuery("wtf","happened") wrongly misses — pinned in tests.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

_WS = re.compile(r"\s+")


@dataclass(frozen=True)
class SynEntry:
    """One matched-input entry: output paths + keepOrig flag."""

    paths: tuple  # tuple[tuple[str, ...], ...] in insertion order
    keep_orig: bool = False


class SynonymMap:
    """input token-tuple -> SynEntry, with a first-token trigger index
    for the greedy scan (SynonymMap.Builder semantics: duplicate outputs
    for one input dedupe, insertion order preserved)."""

    def __init__(self) -> None:
        self._map: dict[tuple, list] = {}       # input -> [paths...]
        self._keep: dict[tuple, bool] = {}
        self.by_first: dict[str, list] = {}     # trigger -> inputs (len desc)
        self.max_len = 0

    def add(self, inp, out, keep_orig: bool = False) -> None:
        """SynonymMap.Builder.add: inp/out are token tuples or
        whitespace-joined strings; keep_orig keeps the original tokens
        as a parallel path (SynonymGraphFilter's keepOrig bit)."""
        inp = tuple(_WS.split(inp.strip())) if isinstance(inp, str) else tuple(inp)
        out = tuple(_WS.split(out.strip())) if isinstance(out, str) else tuple(out)
        if not inp or not out:
            raise ValueError("empty synonym input/output")
        paths = self._map.setdefault(inp, [])
        if out not in paths:
            paths.append(out)
        self._keep[inp] = self._keep.get(inp, False) or keep_orig
        if inp not in self.by_first.get(inp[0], ()):
            self.by_first.setdefault(inp[0], []).append(inp)
            self.by_first[inp[0]].sort(key=len, reverse=True)
        self.max_len = max(self.max_len, len(inp))

    def entry(self, inp: tuple) -> SynEntry | None:
        paths = self._map.get(inp)
        if paths is None:
            return None
        return SynEntry(tuple(paths), self._keep[inp])

    def entries(self):
        """(input, SynEntry) pairs in insertion order (twin generator)."""
        for inp, paths in self._map.items():
            yield inp, SynEntry(tuple(paths), self._keep[inp])

    def __bool__(self) -> bool:
        return bool(self._map)


def parse_solr_rules(lines) -> SynonymMap:
    """SolrSynonymParser (solr format, expand=true, includeOrig=false):
      "a, b, c"      -> every member maps to every member (itself incl.)
      "x, y => z, w" -> each LHS maps to the RHS outputs only
    Members are lowercased and whitespace-split (the parser analyzes each
    member; our chain constraint pins the analyzer to lowercase+tokenize).
    """
    smap = SynonymMap()
    for line in lines:
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        if "=>" in line:
            lhs, rhs = line.split("=>", 1)
            inputs = [m.strip().lower() for m in lhs.split(",") if m.strip()]
            outputs = [m.strip().lower() for m in rhs.split(",") if m.strip()]
            for i in inputs:
                for o in outputs:
                    smap.add(i, o)
        else:
            members = [m.strip().lower() for m in line.split(",") if m.strip()]
            for i in members:
                for o in members:
                    smap.add(i, o)
    return smap


# the shipped "synonym_en" analyzer ruleset — corpus words of the shared
# testdata documents table; the DuckDB twin generator in
# sql/kernel_oracle.py derives its text rewrites/injections from THIS
# tuple (one spec, two engines — CLAUDE.md invariant)
SYN_RULES = (
    "merge, consolidate",        # equivalence class -> stacked tokens
    "fast sort => quicksort",    # multi-word input contraction
    "window => sliding window",  # multi-word output expansion
)

_PARSED: dict[tuple, SynonymMap] = {}


def rules_map(rules: tuple) -> SynonymMap:
    if rules not in _PARSED:
        _PARSED[rules] = parse_solr_rules(rules)
    return _PARSED[rules]


def _match_at(tokens, i: int, smap: SynonymMap):
    """Greedy longest match starting at token i (SynonymGraphFilter's FST
    scan keeps the LONGEST accepted input)."""
    cands = smap.by_first.get(tokens[i])
    if not cands:
        return None, 0
    n = len(tokens)
    for inp in cands:  # length-descending
        m = len(inp)
        if i + m <= n and tuple(tokens[i:i + m]) == inp:
            return smap.entry(inp), m
    return None, 0


def apply_synonym_graph(tokens, smap: SynonymMap):
    """One document's token sequence -> flattened (terms, positions).

    Implements SynonymGraphFilter.bufferOutputTokens node assignment
    followed by FlattenGraphFilter's sequential output-node renumbering
    (see module docstring for reference file:line). Unmatched tokens pass
    through; the scan resumes AFTER a matched input (matches never
    overlap). Output is stable-sorted by flattened position, preserving
    the buffer emission order within a position (the filter's release
    order)."""
    if not smap:
        return list(tokens), list(range(len(tokens)))
    buf = []  # (term, src_node, dest_node)
    next_node = 0
    i, n = 0, len(tokens)
    while i < n:
        ent, m = _match_at(tokens, i, smap)
        if ent is None:
            buf.append((tokens[i], next_node, next_node + 1))
            next_node += 1
            i += 1
            continue
        paths, keep_orig = ent.paths, ent.keep_orig
        total_path_nodes = (m - 1 if keep_orig else 0) + sum(
            len(p) - 1 for p in paths
        )
        s = next_node
        e = s + total_path_nodes + 1
        # fan out: first token of each side path, then the original's
        new_nodes = 0
        path_ends = []
        for p in paths:
            if len(p) == 1:
                pe = e
            else:
                pe = s + new_nodes + 1
                new_nodes += len(p) - 1
            buf.append((p[0], s, pe))
            path_ends.append(pe)
        if keep_orig:
            ie = e if m == 1 else s + new_nodes + 1
            buf.append((tokens[i], s, ie))
        # tails: each side path, then the original's
        for pi, p in enumerate(paths):
            if len(p) > 1:
                last = path_ends[pi]
                for t in p[1:-1]:
                    buf.append((t, last, last + 1))
                    last += 1
                buf.append((p[-1], last, e))
        if keep_orig and m > 1:
            last = ie
            for t in tokens[i + 1:i + m - 1]:
                buf.append((t, last, last + 1))
                last += 1
            buf.append((tokens[i + m - 1], last, e))
        next_node = e
        i += m
    # FlattenGraphFilter: out(dest) = max(out(dest), out(src)+1) in
    # emission order; token position = out(src). Sources are always
    # assigned before use (emission order is non-decreasing in src, and
    # every arc into a node precedes arcs out of it).
    out = {0: 0}
    for _t, src, dest in buf:
        oe = out[src] + 1
        if oe > out.get(dest, -1):
            out[dest] = oe
    order = sorted(range(len(buf)), key=lambda j: out[buf[j][1]])
    terms = [buf[j][0] for j in order]
    positions = [out[buf[j][1]] for j in order]
    return terms, positions


def expand_query_token(token: str, smap: SynonymMap):
    """Query-time expansion of ONE analyzed token: the path list the
    QueryBuilder sees (SynonymGraphFilter at query time, no flatten).
    Returns None when the token triggers no rule; else a list of token
    tuples — the original included when keepOrig (equivalence classes
    include it as an output already)."""
    ent = smap.entry((token,))
    if ent is None:
        return None
    paths = list(ent.paths)
    if ent.keep_orig and (token,) not in paths:
        paths.insert(0, (token,))
    return paths
