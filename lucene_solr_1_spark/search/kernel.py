"""Per-segment DAAT scoring kernels — pure NumPy, run inside Arrow UDFs.

Two physical strategies over the same logical plan (results identical,
equivalence-tested per TestBlockMaxConjunction/TestApproximationSearchEquivalence):

- exhaustive: decode every posting block of the query terms, vector-score,
  select top-k (the reference's non-TOP_SCORES path).
- block-max WAND: per-block score upper bounds from the stored impact
  metadata (block_max_freq, block_min_norm) let whole windows of the doc
  space be skipped once the top-k floor θ exceeds their UB
  (search/WANDScorer.java, search/ImpactsDISI.java:95-127,
  search/MaxScoreCache.java:61-124). Windows are processed in descending
  UB order, so the first non-competitive window ends the search (MaxScore).

Per-clause scores are float32 (kernels/bm25.py, bit-order-exact);
disjunction sums accumulate in float64 and cast to float32 at the end
(DisjunctionSumScorer's double accumulator).
"""

from __future__ import annotations

import numpy as np

from ..kernels import bm25
from ..kernels import similarity as simk
from ..kernels.forcodec import decode_all, decode_block
from .query import (
    Bool, Boost, ConstantScore, Covering, DisjunctionMax, FunctionExpr,
    FunctionScore, MatchAll,
    SpanPositionRange,
    IntervalsQuery, MultiPhrase,
    MatchNone, NumericRange, NumericSet, Occur, Phrase, Query,
    RangeField, SPAN_TYPES,
    SpanFirst,
    PayloadScore, SpanContaining, SpanNear, SpanNot, SpanOr, SpanTerm,
    SpanWithin, Synonym,
    Term, span_leaf_terms,
)

F32 = np.float32
_EMPTY_I = np.empty(0, dtype=np.int64)
_EMPTY_F = np.empty(0, dtype=np.float64)

# Sentinel term unioned into the kernel input so that segments holding NONE
# of the query's terms still dispatch a kernel (required whenever the plan
# can match docs without postings, e.g. a Bool containing MatchAll:
# '*:* -foo' must return docs from segments that contain no 'foo' at all).
SENTINEL_TERM = "\x00seg"


def _is_sentinel(term) -> bool:
    t = term[-1] if isinstance(term, tuple) else term
    return isinstance(t, str) and t.startswith("\x00")


def plan_node_types(plan: dict) -> set:
    """All node types appearing anywhere in a compiled plan."""
    out = {plan["type"]}
    for cl in plan.get("clauses", ()):
        out |= plan_node_types(cl["node"])
    for sub in plan.get("nodes", ()):
        out |= plan_node_types(sub)
    if "node" in plan:
        out |= plan_node_types(plan["node"])
    return out


# --------------------------------------------------------------------------
# plan compilation (driver side): Query tree + GLOBAL stats → picklable plan
# with per-term float32 weights baked in (the Weight tree of
# IndexSearcher.createWeight; global-stats barrier SURVEY.md §3.2 step 3)
# --------------------------------------------------------------------------

def _df_of(global_df: dict, field: str, term: str) -> int:
    """docFreq lookup: keys are (field, term); bare-string keys are accepted
    as the default content field (test/oracle convenience)."""
    v = global_df.get((field, term))
    if v is None and field == "content":
        v = global_df.get(term)
    return int(v or 0)


def _dc_of(doc_count, field: str) -> int:
    """Per-field docCount (CollectionStatistics.docCount); a plain int
    applies to every field."""
    if isinstance(doc_count, dict):
        return int(doc_count.get(field) or max(doc_count.values(), default=1))
    return int(doc_count)


def _sim_spec_for(sim: dict, field: str, boost: float,
                  df: int = 0, dc: int = 1, idf_sum=None, ttf: int = 0):
    """Per-node compiled spec for a non-default similarity.

    `idf_sum` (classic only) carries a pre-summed multi-term idf
    (synonym/phrase/span). LM sims are single-term: SimilarityBase builds
    one BasicStats per TermStatistics, so multi-term shapes must be
    rejected by the CALLER before reaching here."""
    name = sim["name"]
    if name == "multi":
        return {
            "name": "multi",
            "specs": [
                _sim_spec_for(sub, field, boost, df=df, dc=dc,
                              idf_sum=idf_sum, ttf=ttf)
                for sub in sim["subs"]
            ],
        }
    if name == "classic":
        if idf_sum is None:
            idf_sum = simk.classic_idf(df, dc) if df > 0 else F32(0.0)
        return {"name": "classic",
                "qw": simk.classic_query_weight(idf_sum, boost)}
    if name == "sweetspot":
        # SweetSpotSimilarity extends ClassicSimilarity: same idf /
        # queryWeight, its own tf + plateau lengthNorm. NOT WAND-safe:
        # the plateau makes lengthNorm non-monotone in doc length, so
        # score(maxFreq, minNormByte) is not an upper bound -> exhaustive.
        if idf_sum is None:
            idf_sum = simk.classic_idf(df, dc) if df > 0 else F32(0.0)
        ln_min, ln_max, steep = sim.get("ln", (1, 1, 0.5))
        tf_base, tf_min = sim.get("tf", (0.0, 0.0))
        return {"name": "sweetspot",
                "qw": simk.classic_query_weight(idf_sum, boost),
                "table": simk.sweetspot_norm_table(ln_min, ln_max, steep),
                "tf_base": tf_base, "tf_min": tf_min}
    if name == "boolean":
        return {"name": "boolean", "boost": F32(boost)}
    if name in ("lmd", "lmjm"):
        p = simk.lm_collection_probability(
            ttf, int(sim["field_tokens"].get(field, 1))
        )
        spec = {"name": name, "p": p, "boost": float(boost)}
        if name == "lmd":
            spec["mu"] = float(sim.get("mu", simk.LMD_MU_DEFAULT))
        else:
            spec["lam"] = float(sim.get("lam", simk.LMJM_LAMBDA_DEFAULT))
        return spec
    if name == "dfi":
        return {"name": "dfi", "ttf": int(ttf),
                "sum_ttf": int(sim["field_tokens"].get(field, 1)),
                "boost": float(boost)}
    if name == "f2exp":
        avgfl = float(sim["field_tokens"].get(field, 1)) / float(max(dc, 1))
        return {"name": "f2exp", "avgfl": avgfl, "df": int(max(df, 1)),
                "dc": int(dc), "s": float(sim.get("s", 0.25)),
                "k": float(sim.get("k", 0.35)), "boost": float(boost)}
    if name in ("dfr_inl2", "ib_ll"):
        avgfl = float(sim["field_tokens"].get(field, 1)) / float(max(dc, 1))
        spec = {"name": name, "avgfl": avgfl,
                "c": float(sim.get("c", 1.0)), "boost": float(boost)}
        if name == "dfr_inl2":
            spec["df"], spec["dc"] = int(df), int(dc)
        else:
            spec["lam"] = simk.ib_lambda(df, dc)
        return spec
    raise ValueError(f"unknown similarity {name!r}")


def _multi_term_sim(sim: dict, field: str, boost: float, dfs, dc: int) -> dict:
    """Sim spec for synonym/phrase/span shapes: classic sums per-term
    float idfs in double (TFIDFSimilarity.idfExplain over stats...);
    boolean is freq-independent; LM sims have no multi-term stats model
    (SimilarityBase: one BasicStats per term) — rejected."""
    if sim["name"] == "multi":
        return {
            "name": "multi",
            "specs": [
                _multi_term_sim(sub, field, boost, dfs, dc)
                for sub in sim["subs"]
            ],
        }
    if sim["name"] in ("classic", "sweetspot"):
        idfs = [simk.classic_idf(df, dc) for df in dfs if df > 0]
        idf_sum = simk.classic_idf_sum(idfs) if idfs else F32(0.0)
        return _sim_spec_for(sim, field, boost, idf_sum=idf_sum)
    if sim["name"] == "boolean":
        return _sim_spec_for(sim, field, boost)
    raise NotImplementedError(
        f"similarity {sim['name']!r} scores single-term stats only "
        "(SimilarityBase builds one BasicStats per term)"
    )


def compile_plan(q: Query, global_df: dict, doc_count, boost: float = 1.0,
                 sim: dict | None = None) -> dict:
    """`sim` selects a non-default similarity (kernels/similarity.py):
    {"name": "classic" | "boolean"} or {"name": "lmd" | "lmjm",
    "ttf": {(field, term): global ttf}, "field_tokens": {field: sum_ttf},
    "mu"/"lam": param}. None = BM25 (the index default). Sim plans prune
    under block-max WAND too (UBs scored through the sim over the stored
    impacts), except zero-clamping sims (lmd/dfi) which route exhaustive
    (wand_applicable / _WAND_SAFE_SIMS)."""
    if isinstance(q, Boost):
        return compile_plan(q.query, global_df, doc_count, boost * q.boost, sim)
    if isinstance(q, ConstantScore):
        return {
            "type": "const",
            "node": compile_plan(q.query, global_df, doc_count, 1.0, sim),
            "score": F32(boost * q.score),
        }
    if isinstance(q, Term):
        # BlendedTermQuery's adjusted TermStates (BlendedTermQuery.java:
        # 297-308): df_override substitutes the blended docFreq for idf.
        df = (q.df_override if q.df_override is not None
              else _df_of(global_df, q.field, q.text))
        dc = _dc_of(doc_count, q.field)
        idf = bm25.idf(df, dc) if df > 0 else F32(0.0)
        node = {
            "type": "term", "field": q.field, "term": q.text,
            "weight": bm25.term_weight(idf, boost),
        }
        if sim is not None:
            ttf = int(sim.get("ttf", {}).get((q.field, q.text), 0))
            node["sim"] = _sim_spec_for(sim, q.field, boost, df=df, dc=dc, ttf=ttf)
        return node
    if isinstance(q, (Synonym, Phrase)):
        dc = _dc_of(doc_count, q.field)
        dfs = [_df_of(global_df, q.field, t) for t in q.terms]
        idfs = [bm25.idf(df, dc) for df in dfs if df > 0]
        w = bm25.term_weight(bm25.synonym_idf(idfs), boost) if idfs else F32(0.0)
        node = {
            "field": q.field, "terms": list(q.terms), "weight": w,
        }
        if isinstance(q, Synonym):
            node["type"] = "synonym"
        else:
            node.update(type="phrase", slop=q.slop)
        if sim is not None:
            node["sim"] = _multi_term_sim(sim, q.field, boost, dfs, dc)
        return node
    if isinstance(q, MultiPhrase):
        # MultiPhraseQuery weight (MultiPhraseQuery.java:216-238): ONE
        # SimScorer over allTermStats — every term in every position with
        # df > 0 contributes its idf to the sum, like Synonym/Phrase.
        dc = _dc_of(doc_count, q.field)
        all_terms = [t for slot in q.positions for t in slot]
        dfs = [_df_of(global_df, q.field, t) for t in all_terms]
        idfs = [bm25.idf(df, dc) for df in dfs if df > 0]
        w = bm25.term_weight(bm25.synonym_idf(idfs), boost) if idfs else F32(0.0)
        node = {
            "type": "multiphrase", "field": q.field,
            "positions": [list(slot) for slot in q.positions],
            "slop": int(q.slop), "weight": w,
        }
        if sim is not None:
            node["sim"] = _multi_term_sim(sim, q.field, boost, dfs, dc)
        return node
    if isinstance(q, SPAN_TYPES):
        # span algebra (search/spans/): weight = summed idf over the leaf
        # terms (same shape as Phrase/SpanNear scoring), spans evaluated
        # compositionally per candidate doc in _eval_span
        leaves = sorted(span_leaf_terms(q))
        idfs = [
            bm25.idf(df, _dc_of(doc_count, f))
            for f, t in leaves
            if (df := _df_of(global_df, f, t)) > 0
        ]
        w = bm25.term_weight(bm25.synonym_idf(idfs), boost) if idfs else F32(0.0)
        node = {
            "type": "span",
            "field": q.field,
            "weight": w,
            "leaves": leaves,
            "span": _span_tree(q, q.field),
        }
        if sim is not None:
            dfs = [_df_of(global_df, f, t) for f, t in leaves]
            node["sim"] = _multi_term_sim(
                sim, q.field, boost, dfs, _dc_of(doc_count, q.field)
            )
        return node
    if isinstance(q, PayloadScore):
        # PayloadScoreQuery weight = the wrapped span's weight
        # (PayloadSpanWeight delegates to innerWeight); the payload
        # factor composes at score time
        if q.func not in ("min", "max", "sum", "avg"):
            raise ValueError(f"unknown payload function {q.func!r}")
        inner = compile_plan(
            q.query if isinstance(q.query, SPAN_TYPES) else SpanTerm(q.query, field=q.field),
            global_df, doc_count, boost, sim,
        )
        return {
            "type": "payload",
            "span": inner["span"],
            "leaves": inner["leaves"],
            "field": q.field,
            "weight": inner["weight"],
            **({"sim": inner["sim"]} if "sim" in inner else {}),
            "func": q.func,
            "include": bool(q.include_span_score),
        }
    if isinstance(q, Bool):
        return {
            "type": "bool",
            "msm": q.min_should_match,
            "clauses": [
                {"occur": c.occur.value,
                 "node": compile_plan(c.query, global_df, doc_count, boost, sim)}
                for c in q.clauses
            ],
        }
    if isinstance(q, DisjunctionMax):
        return {
            "type": "dismax",
            "tie": F32(q.tie_breaker),
            "nodes": [compile_plan(s, global_df, doc_count, boost, sim)
                      for s in q.queries],
        }
    if isinstance(q, MatchAll):
        return {"type": "matchall", "score": F32(boost)}
    if isinstance(q, MatchNone):
        return {"type": "matchnone"}
    if isinstance(q, IntervalsQuery):
        from .query import interval_min_extent, interval_source_terms

        if q.source is not None:
            src = _iv_normalize(q.source)
            terms = tuple(sorted(interval_source_terms(q.source)))
            min_extent = interval_min_extent(q.source)
        else:
            if len(q.terms) < 2:
                raise ValueError(
                    "IntervalsQuery needs at least two term sources")
            if not q.ordered and len(q.terms) != 2:
                raise ValueError(
                    "unordered IntervalsQuery supports exactly two sources"
                )
            src = {
                "kind": "ordered" if q.ordered else "unordered",
                "sources": [{"kind": "term", "text": t} for t in q.terms],
            }
            terms = tuple(q.terms)
            min_extent = len(q.terms)
        return {
            "type": "intervals",
            "terms": terms,
            "field": q.field,
            "source": src,
            "min_extent": int(min_extent),
            "max_gaps": None if q.max_gaps is None else int(q.max_gaps),
            "pivot": F32(q.pivot),
            "weight": F32(boost),
        }
    if isinstance(q, (NumericRange, NumericSet, RangeField)):
        return {
            "type": "docidset",
            "set_id": numeric_set_id(q),
            "score": F32(boost),
        }
    if isinstance(q, Covering):
        return {
            "type": "covering",
            "nodes": [compile_plan(s, global_df, doc_count, boost, sim)
                      for s in q.queries],
            "set_id": f"values:{q.field}",
            "scale": float(q.scale),
            "offset": float(q.offset),
        }
    if isinstance(q, FunctionExpr):
        from .query import expr_fields

        return {
            "type": "funcexpr",
            "node": compile_plan(q.query, global_df, doc_count, boost, sim),
            "expr": q.expr,
            "set_ids": {f: f"values:{f}" for f in sorted(expr_fields(q.expr))},
        }
    if isinstance(q, FunctionScore):
        return {
            "type": "func",
            "node": compile_plan(q.query, global_df, doc_count, boost, sim),
            "mode": q.mode,
            "weight": float(q.weight),
            "pivot": float(q.pivot),
            "origin": float(q.origin),
            "exp": float(q.exp),
            "scaling": float(q.scaling),
            "set_id": f"values:{q.field}",
        }
    raise TypeError(f"cannot compile {q!r} — expand multi-term queries first")


def numeric_set_id(q) -> str:
    """Stable channel key for a doc-values filter leaf (NumericRange,
    NumericSet or RangeField) — distinct filters get distinct cogroup
    set_ids (the key space stays injective across all three)."""
    if isinstance(q, NumericSet):
        return f"{q.field}:in:" + ",".join(str(v) for v in q.values)
    if isinstance(q, RangeField):
        dims = ";".join(
            f"{mn},{mx},{lo},{hi}"
            for (mn, mx), lo, hi in zip(q.dims, q.lower, q.upper)
        )
        return f"range:{q.relation}:{dims}"
    return f"{q.field}:{q.lower}:{q.upper}"


def _span_tree(q, field: str) -> dict:
    """Span query subtree → picklable dict (bare strings = term sugar in
    the enclosing field)."""
    if isinstance(q, str):
        return {"kind": "term", "field": field, "term": q}
    if isinstance(q, SpanTerm):
        return {"kind": "term", "field": q.field, "term": q.text}
    if isinstance(q, SpanOr):
        return {
            "kind": "or",
            "children": [_span_tree(c, q.field) for c in q.clauses],
        }
    if isinstance(q, SpanNear):
        return {
            "kind": "near",
            "children": [_span_tree(c, q.field) for c in q.terms],
            "slop": int(q.slop),
            "in_order": bool(q.in_order),
        }
    if isinstance(q, SpanNot):
        return {
            "kind": "not",
            "include": _span_tree(q.include, q.field),
            "exclude": _span_tree(q.exclude, q.field),
        }
    if isinstance(q, SpanPositionRange):
        return {
            "kind": "posrange",
            "match": _span_tree(q.match, q.field),
            "start": int(q.start),
            "end": int(q.end),
        }
    if isinstance(q, SpanFirst):
        return {
            "kind": "first",
            "match": _span_tree(q.match, q.field),
            "end": int(q.end),
        }
    if isinstance(q, (SpanContaining, SpanWithin)):
        return {
            "kind": "containing" if isinstance(q, SpanContaining) else "within",
            "big": _span_tree(q.big, q.field),
            "little": _span_tree(q.little, q.field),
        }
    raise TypeError(f"not a span query: {q!r}")


# --------------------------------------------------------------------------
# segment-side data access
# --------------------------------------------------------------------------

class SegmentData:
    """Decoded-on-demand view of one segment's postings for the query terms.

    Rows are keyed by (field, term) — the multi-field posting key
    (index/FieldInfos.java: every term belongs to a named field). Norm
    bytes ride inside each posting row (norms_enc, schemas.py), so scoring
    needs no side lookup into a norms table — the kernel's input is
    exactly the pruned posting rows. `allowed` optionally holds a sorted
    local-docID array from a doc-values FILTER (NumericRange)."""

    def __init__(self, postings_pdf, n_docs: int, allowed=None):
        if "field" in postings_pdf.columns:
            self.rows = {
                (r.field, r.term): r for r in postings_pdf.itertuples(index=False)
            }
        else:  # pre-multi-field frame (tests/back-compat): content only
            self.rows = {
                ("content", r.term): r
                for r in postings_pdf.itertuples(index=False)
            }
        self.n_docs = n_docs
        self.allowed = allowed
        self._decoded: dict = {}

    def postings(self, key):
        """(docs, freqs, norms) fully decoded, or empties. `key` is a
        (field, term) tuple; a bare term string means the content field."""
        if isinstance(key, str):
            key = ("content", key)
        if key in self._decoded:
            return self._decoded[key]
        r = self.rows.get(key)
        if r is None:
            out = (_EMPTY_I, _EMPTY_I, _EMPTY_I)
        else:
            docs = np.cumsum(decode_all(bytes(r.docs_enc), np.asarray(r.docs_offsets)))
            freqs = decode_all(bytes(r.freqs_enc), np.asarray(r.freqs_offsets))
            norms = np.frombuffer(bytes(r.norms_enc), dtype=np.uint8).astype(np.int64)
            out = (docs, freqs, norms)
        self._decoded[key] = out
        return out

    def positions(self, key):
        """list-like: flat position array + per-posting offsets (by freqs)."""
        if isinstance(key, str):
            key = ("content", key)
        r = self.rows.get(key)
        if r is None:
            return None
        docs, freqs, _norms = self.postings(key)
        pos_deltas = decode_all(bytes(r.pos_enc), np.asarray(r.pos_offsets))
        # positions are delta-coded per (term, doc) run; run starts are
        # absolute — rebuild via segmented cumsum
        starts = np.concatenate(([0], np.cumsum(freqs)[:-1]))
        pos = _segmented_cumsum(pos_deltas, starts)
        return docs, freqs, starts, pos

    def payloads(self, key):
        """float32 payload per occurrence, aligned with the flat position
        stream (the .pay stream; runs indexed by the same freqs/starts) —
        None when the index stores no payloads for this term."""
        if isinstance(key, str):
            key = ("content", key)
        r = self.rows.get(key)
        pay = getattr(r, "pay_enc", None) if r is not None else None
        if not pay:
            return None
        return np.frombuffer(bytes(pay), dtype="<f4")


def _segmented_cumsum(deltas: np.ndarray, starts: np.ndarray) -> np.ndarray:
    """Cumulative sum restarting at each index in `starts`."""
    out = np.cumsum(deltas)
    if len(starts) <= 1:
        return out
    corr = np.zeros(len(deltas), dtype=np.int64)
    # subtract the running total just before each segment start
    seg_base = out[starts[1:] - 1]
    corr[starts[1:]] = np.diff(np.concatenate(([0], seg_base)))
    return out - np.cumsum(corr)


# --------------------------------------------------------------------------
# exhaustive evaluation: node → (docs sorted asc, scores float64)
# --------------------------------------------------------------------------

def _cache_for(caches, field: str) -> np.ndarray:
    """Per-field norm cache (each field has its own avgdl). A plain
    ndarray applies to every field (single-field tests/back-compat)."""
    if isinstance(caches, dict):
        c = caches.get(field)
        return c if c is not None else caches["content"]
    return caches


def _node_key(node: dict, term: str):
    return (node.get("field", "content"), term)


def _feature_fn(mode: str, v: np.ndarray, node: dict) -> np.ndarray:
    """FeatureField scoring functions over a double doc-value array
    (document/FeatureField.java SaturationFunction/LogFunction/
    SigmoidFunction; LongDistanceFeatureQuery boost*pivot/(pivot+dist)).
    All double; the caller applies weight and the final float32 cast."""
    if mode == "saturation":
        return v / (v + node["pivot"])
    if mode == "log":
        return np.log(node["scaling"] + v)
    if mode == "sigmoid":
        va = v ** node["exp"]
        return va / (va + node["pivot"] ** node["exp"])
    if mode == "dist_feature":
        return node["pivot"] / (node["pivot"] + np.abs(v - node["origin"]))
    raise ValueError(f"unknown function-score mode {mode!r}")


def _score_postings(node: dict, freqs, norms, cache) -> np.ndarray:
    """freq/norm -> float32 score under the node's similarity: BM25 with
    the per-field quantized norm cache by default, else the compiled sim
    spec (kernels/similarity.py dispatch)."""
    spec = node.get("sim")
    if spec is not None:
        return simk.score(spec, freqs, norms)
    return bm25.score(
        freqs, norms, node["weight"], _cache_for(cache, node.get("field", "content"))
    )


def _eval_expr(expr, scores: np.ndarray, fields: dict):
    """FunctionExpr AST → float64 arrays (vectorized recursive eval).
    log is base 10 per Solr's LogDoubleFunction; recip(x,m,a,b) =
    a/(m*x+b) (ReciprocalFloatFunction)."""
    op = expr[0]
    if op == "lit":
        return np.float64(expr[1])
    if op == "score":
        return scores
    if op == "field":
        return fields[expr[1]]
    args = [_eval_expr(a, scores, fields) for a in expr[1:]]
    if op == "sum":
        out = args[0]
        for a in args[1:]:
            out = out + a
        return out
    if op == "sub":
        return args[0] - args[1]
    if op == "product":
        out = args[0]
        for a in args[1:]:
            out = out * a
        return out
    if op == "div":
        return args[0] / args[1]
    if op == "log":
        return np.log10(args[0])
    if op == "ln":
        return np.log(args[0])
    if op == "sqrt":
        return np.sqrt(args[0])
    if op == "abs":
        return np.abs(args[0])
    if op == "pow":
        return np.power(args[0], args[1])
    if op == "min":
        out = args[0]
        for a in args[1:]:
            out = np.minimum(out, a)
        return out
    if op == "max":
        out = args[0]
        for a in args[1:]:
            out = np.maximum(out, a)
        return out
    if op == "recip":
        x, m, a, b = args
        return a / (m * x + b)
    raise ValueError(f"unknown expr op {op!r}")


def eval_node(node: dict, seg: SegmentData, cache):
    t = node["type"]
    if t == "term":
        docs, freqs, norms = seg.postings(_node_key(node, node["term"]))
        if len(docs) == 0:
            return _EMPTY_I, _EMPTY_F
        s = _score_postings(node, freqs, norms, cache)
        return docs, s.astype(np.float64)
    if t == "synonym":
        # freqs summed across member terms, scored once (SynonymQuery.java)
        parts = [seg.postings(_node_key(node, term)) for term in node["terms"]]
        parts = [(d, f, n) for d, f, n in parts if len(d)]
        if not parts:
            return _EMPTY_I, _EMPTY_F
        alldocs = np.concatenate([d for d, _, _ in parts])
        allfreqs = np.concatenate([f for _, f, _ in parts])
        allnorms = np.concatenate([n for _, _, n in parts])
        docs, inv = np.unique(alldocs, return_inverse=True)
        freqs = np.zeros(len(docs), dtype=np.int64)
        np.add.at(freqs, inv, allfreqs)
        norms = np.zeros(len(docs), dtype=np.int64)
        norms[inv] = allnorms  # same doc ⇒ same norm byte
        s = _score_postings(node, freqs, norms, cache)
        return docs, s.astype(np.float64)
    if t == "phrase":
        return _eval_phrase(node, seg, cache)
    if t == "multiphrase":
        return _eval_multiphrase(node, seg, cache)
    if t == "span":
        return _eval_span(node, seg, cache)
    if t == "payload":
        return _eval_payload(node, seg, cache)
    if t == "intervals":
        return _eval_intervals(node, seg)
    if t == "bool":
        return _eval_bool(node, seg, cache)
    if t == "dismax":
        return _eval_dismax(node, seg, cache)
    if t == "const":
        docs, _ = eval_node(node["node"], seg, cache)
        return docs, np.full(len(docs), float(node["score"]), dtype=np.float64)
    if t == "docidset":
        # pre-resolved doc-values match set (NumericRange): sorted local
        # docIDs delivered via cogrouped norms rows (SegmentData.allowed,
        # keyed by set_id — one set per distinct range in the query).
        # Constant-score, like PointRangeQuery's ConstantScoreWeight.
        allowed = seg.allowed
        if isinstance(allowed, dict):
            allowed = allowed.get(node.get("set_id"))
        if allowed is None or len(allowed) == 0:
            return _EMPTY_I, _EMPTY_F
        return allowed, np.full(len(allowed), float(node["score"]), dtype=np.float64)
    if t == "anyterm":
        # constant-score union of the expansion's posting rows (multi-term
        # query CONSTANT_SCORE_REWRITE: score = boost, no per-term BM25).
        # Distributed path: the Spark-side predicate already selected the
        # rows, so default = every row shipped here. Local path: the
        # SegmentData holds the whole term CACHE, so the plan carries the
        # explicit expansion under "keys". Sentinel rows are skipped.
        term_keys = node.get("keys")
        if term_keys is None:
            term_keys = [term for term in seg.rows if not _is_sentinel(term)]
        parts = [seg.postings(tuple(term))[0] for term in term_keys]
        parts = [d for d in parts if len(d)]
        if not parts:
            return _EMPTY_I, _EMPTY_F
        docs = np.unique(np.concatenate(parts))
        return docs, np.full(len(docs), float(node["score"]), dtype=np.float64)
    if t == "covering":
        # CoveringQuery (CoveringScorer.java:120-160): disjunction whose
        # required match count is per-doc — min_match(doc) =
        # max(1, floor(value*scale + offset)) from the cogrouped
        # doc-values channel; score = sum of matching clauses.
        subs = [eval_node(s, seg, cache) for s in node["nodes"]]
        subs = [(d, sc) for d, sc in subs if len(d)]
        if not subs:
            return _EMPTY_I, _EMPTY_F
        alldocs = np.concatenate([d for d, _ in subs])
        allscores = np.concatenate([sc for _, sc in subs])
        docs, inv = np.unique(alldocs, return_inverse=True)
        scores = np.zeros(len(docs), dtype=np.float64)
        np.add.at(scores, inv, allscores)
        cnt = np.bincount(inv, minlength=len(docs))
        vs = seg.allowed.get(node["set_id"]) if isinstance(seg.allowed, dict) else None
        if vs is None:
            raise ValueError(
                f"covering values {node['set_id']!r} not shipped to kernel"
            )
        vdocs, vvals = vs
        idx = np.searchsorted(vdocs, docs)
        v = vvals[np.minimum(idx, len(vvals) - 1)].astype(np.float64)
        need = np.maximum(
            np.floor(v * np.float64(node["scale"]) + np.float64(node["offset"])),
            1.0,
        )
        keep = cnt >= need
        return docs[keep], scores[keep]
    if t == "funcexpr":
        # compiled score expression (lucene/expressions, Solr
        # FunctionQParser): eval the AST in double over (inner score,
        # doc-values arrays), one final f32 cast — the kernel twin of the
        # SQL generator in kernel_oracle.function_expr_sql
        docs, scores = eval_node(node["node"], seg, cache)
        if len(docs) == 0:
            return _EMPTY_I, _EMPTY_F
        fields = {}
        for f, set_id in node["set_ids"].items():
            vs = seg.allowed.get(set_id) if isinstance(seg.allowed, dict) else None
            if vs is None:
                raise ValueError(f"funcexpr values {set_id!r} not shipped to kernel")
            vdocs, vvals = vs
            idx = np.searchsorted(vdocs, docs)
            fields[f] = vvals[np.minimum(idx, len(vvals) - 1)].astype(np.float64)
        out = _eval_expr(node["expr"], scores, fields)
        return docs, np.broadcast_to(
            np.asarray(out, dtype=np.float64), scores.shape
        ).astype(F32).astype(np.float64)
    if t == "func":
        # FunctionScoreQuery: matching docs = inner's; score reshaped by a
        # numeric doc-value delivered via the cogrouped norms channel
        # (SegmentData.allowed["values:<field>"] = (sorted docs, values)).
        # Final rounding through float32 mirrors Lucene's float score and
        # is replayed bit-exactly by kernel_oracle.kernel_function_score_duck.
        docs, scores = eval_node(node["node"], seg, cache)
        if len(docs) == 0:
            return _EMPTY_I, _EMPTY_F
        vs = seg.allowed.get(node["set_id"]) if isinstance(seg.allowed, dict) else None
        if vs is None:
            raise ValueError(
                f"function-score values {node['set_id']!r} not shipped to kernel"
            )
        vdocs, vvals = vs
        idx = np.searchsorted(vdocs, docs)
        v = vvals[np.minimum(idx, len(vvals) - 1)].astype(np.float64)
        mode = node["mode"]
        if mode in ("multiply", "sum"):
            boost = np.float64(node["weight"]) * v
            out = scores * boost if mode == "multiply" else scores + boost
        else:
            # FeatureField scoring functions / distance feature query
            # (document/FeatureField.java:newSaturationQuery et al.,
            # document/LongDistanceFeatureQuery.java): fn in double,
            # combined as inner + weight*fn(v), one final f32 cast.
            out = scores + np.float64(node["weight"]) * _feature_fn(mode, v, node)
        return docs, out.astype(F32).astype(np.float64)
    if t == "matchall":
        docs = np.arange(seg.n_docs, dtype=np.int64)
        return docs, np.full(seg.n_docs, float(node["score"]), dtype=np.float64)
    if t == "matchnone":
        return _EMPTY_I, _EMPTY_F
    raise ValueError(f"unknown node {t}")


def _eval_bool(node, seg, cache):
    musts, shoulds, filters, must_nots = [], [], [], []
    for cl in node["clauses"]:
        sub = eval_node(cl["node"], seg, cache)
        {"MUST": musts, "SHOULD": shoulds, "FILTER": filters, "MUST_NOT": must_nots}[
            cl["occur"]
        ].append(sub)
    msm = node["msm"]

    if musts or filters:
        cand = None
        for d, _ in musts + filters:
            cand = d if cand is None else cand[np.isin(cand, d, assume_unique=True)]
        scores = np.zeros(len(cand), dtype=np.float64)
        for d, s in musts:
            idx = np.searchsorted(d, cand)
            scores += s[idx]
        if shoulds:
            scnt = np.zeros(len(cand), dtype=np.int64)
            for d, s in shoulds:
                m = np.isin(cand, d, assume_unique=True)
                idx = np.searchsorted(d, cand[m])
                scores[m] += s[idx]
                scnt[m] += 1
            if msm > 0:
                keep = scnt >= msm
                cand, scores = cand[keep], scores[keep]
        docs = cand
    else:
        # pure disjunction with minShouldMatch (MinShouldMatchSumScorer)
        eff_msm = max(msm, 1)
        if not shoulds:
            return _EMPTY_I, _EMPTY_F
        alldocs = np.concatenate([d for d, _ in shoulds])
        allscores = np.concatenate([s for _, s in shoulds])
        docs, inv = np.unique(alldocs, return_inverse=True)
        scores = np.zeros(len(docs), dtype=np.float64)
        np.add.at(scores, inv, allscores)
        cnt = np.bincount(inv, minlength=len(docs))
        keep = cnt >= eff_msm
        docs, scores = docs[keep], scores[keep]

    for d, _ in must_nots:
        m = ~np.isin(docs, d, assume_unique=True)
        docs, scores = docs[m], scores[m]
    return docs, scores


def _eval_dismax(node, seg, cache):
    subs = [eval_node(s, seg, cache) for s in node["nodes"]]
    subs = [(d, s) for d, s in subs if len(d)]
    if not subs:
        return _EMPTY_I, _EMPTY_F
    alldocs = np.concatenate([d for d, _ in subs])
    allscores = np.concatenate([s for _, s in subs])
    docs, inv = np.unique(alldocs, return_inverse=True)
    mx = np.zeros(len(docs), dtype=np.float64)
    np.maximum.at(mx, inv, allscores)
    sm = np.zeros(len(docs), dtype=np.float64)
    np.add.at(sm, inv, allscores)
    tie = float(node["tie"])
    return docs, mx + tie * (sm - mx)


def _run_take(starts: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """Flat indices for variable-length runs: concat of
    [starts[i], starts[i]+lengths[i]) — pure NumPy, no Python loop."""
    total = int(lengths.sum())
    if total == 0:
        return _EMPTY_I
    firsts = np.cumsum(lengths) - lengths
    within = np.arange(total, dtype=np.int64) - np.repeat(firsts, lengths)
    return np.repeat(starts, lengths) + within


_POS_SHIFT = np.int64(1) << np.int64(32)


def _eval_phrase(node, seg, cache):
    terms = node["terms"]
    field = node.get("field", "content")
    if not terms:
        return _EMPTY_I, _EMPTY_F
    post = [seg.positions((field, t)) for t in terms]
    if any(p is None for p in post):
        return _EMPTY_I, _EMPTY_F
    slop = int(node.get("slop", 0))
    # candidate docs: conjunction of all terms
    cand = post[0][0]
    for d, *_ in post[1:]:
        cand = cand[np.isin(cand, d, assume_unique=True)]
    if len(cand) == 0:
        return _EMPTY_I, _EMPTY_F
    if slop == 0:
        # vectorized ExactPhraseMatcher over ALL candidates at once: pack
        # (doc, position - i) into one int64 key per occurrence and
        # intersect the key sets across terms — no per-doc Python loop
        # (the 10^5-candidate hot-phrase case stays NumPy-bound).
        n_t = np.int64(len(terms))  # uniform shift keeps adjusted pos >= 0
        keys = None
        for i, (docs_i, freqs_i, starts_i, pos_i) in enumerate(post):
            idx = np.searchsorted(docs_i, cand)
            flat = _run_take(starts_i[idx], freqs_i[idx])
            rep_doc = np.repeat(cand, freqs_i[idx])
            k = rep_doc * _POS_SHIFT + (pos_i[flat] - np.int64(i) + n_t)
            keys = k if keys is None else keys[np.isin(keys, k, assume_unique=True)]
            if len(keys) == 0:
                return _EMPTY_I, _EMPTY_F
        docs, counts = np.unique(keys // _POS_SHIFT, return_counts=True)
        freqs = counts.astype(np.float64)
    else:
        # slots sharing a term ("a b a"): their alignments must use
        # DISTINCT token occurrences (SloppyPhraseMatcher repeat handling)
        by_term: dict = {}
        for i, t in enumerate(terms):
            by_term.setdefault(t, []).append(i)
        repeat_groups = tuple(
            tuple(v) for v in by_term.values() if len(v) > 1
        )
        totals = _batched_sloppy(post, cand, slop, repeat_groups)
        keep = totals > 0
        if not keep.any():
            return _EMPTY_I, _EMPTY_F
        docs = cand[keep]
        freqs = totals[keep]
    d0, _f0, n0 = seg.postings((field, terms[0]))
    norms = n0[np.searchsorted(d0, docs)]
    s = _score_postings(node, freqs, norms, cache)
    return docs, s.astype(np.float64)


def _eval_multiphrase(node, seg, cache):
    """MultiPhraseQuery evaluation (MultiPhraseQuery.java:285-294): a
    UnionPostingsEnum per position — each slot's alternative posting
    streams merge into ONE virtual posting (positions are unique per doc
    across a slot's terms: the index holds one token per position), then
    the PhraseQuery machinery runs unchanged — packed-key intersection
    for slop=0, the batched greedy sloppy matcher otherwise. Slots
    sharing ANY term form a repeat group (SloppyPhraseMatcher's repeat
    handling over union enums): their alignments must consume DISTINCT
    token occurrences."""
    slots = node["positions"]
    field = node.get("field", "content")
    if not slots:
        return _EMPTY_I, _EMPTY_F
    slot_posts = []
    for alts in slots:
        posts = [p for t in alts
                 if (p := seg.positions((field, t))) is not None]
        if not posts:
            return _EMPTY_I, _EMPTY_F
        slot_posts.append(posts)
    # candidates: docs where EVERY slot has at least one alternative
    cand = None
    for posts in slot_posts:
        docs_u = (posts[0][0] if len(posts) == 1
                  else np.unique(np.concatenate([p[0] for p in posts])))
        cand = docs_u if cand is None else cand[
            np.isin(cand, docs_u, assume_unique=True)
        ]
    if len(cand) == 0:
        return _EMPTY_I, _EMPTY_F
    # union virtual posting per slot over cand: (docs, freqs, starts, pos)
    union = []
    for posts in slot_posts:
        parts = []
        for p in posts:
            sub = cand[np.isin(cand, p[0], assume_unique=True)]
            if len(sub) == 0:
                continue
            flat, cnt, _off = _slices_for(p, sub)
            didx = np.repeat(np.searchsorted(cand, sub), cnt)
            parts.append(didx * _POS_SHIFT + flat)
        keys = parts[0] if len(parts) == 1 else np.concatenate(parts)
        keys.sort()
        cnts = np.bincount(keys // _POS_SHIFT, minlength=len(cand))
        starts = np.cumsum(cnts) - cnts
        union.append((cand, cnts, starts, (keys % _POS_SHIFT).astype(np.int64)))
    slop = int(node.get("slop", 0))
    if slop == 0:
        n_t = np.int64(len(slots))
        keys = None
        for i, (_d, cnts, _s, pos_all) in enumerate(union):
            didx = np.repeat(np.arange(len(cand), dtype=np.int64), cnts)
            k = didx * _POS_SHIFT + (pos_all - np.int64(i) + n_t)
            keys = k if keys is None else keys[np.isin(keys, k, assume_unique=True)]
            if len(keys) == 0:
                return _EMPTY_I, _EMPTY_F
        didx, counts = np.unique(keys // _POS_SHIFT, return_counts=True)
        docs = cand[didx]
        freqs = counts.astype(np.float64)
    else:
        # repeat groups: union-find slots on shared terms
        parent = list(range(len(slots)))

        def _find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        seen: dict = {}
        for i, alts in enumerate(slots):
            for t in alts:
                if t in seen:
                    parent[_find(i)] = _find(seen[t])
                else:
                    seen[t] = i
        groups: dict = {}
        for i in range(len(slots)):
            groups.setdefault(_find(i), []).append(i)
        repeat_groups = tuple(
            tuple(g) for g in groups.values() if len(g) > 1
        )
        totals = _batched_sloppy(union, cand, slop, repeat_groups)
        keep = totals > 0
        if not keep.any():
            return _EMPTY_I, _EMPTY_F
        docs = cand[keep]
        freqs = totals[keep]
    # norm byte: slot 0's union covers every result doc (same doc ⇒ same norm)
    nd = np.concatenate([seg.postings((field, t))[0] for t in slots[0]])
    nn = np.concatenate([seg.postings((field, t))[2] for t in slots[0]])
    order = np.argsort(nd, kind="stable")
    nd, nn = nd[order], nn[order]
    norms = nn[np.searchsorted(nd, docs)]
    s = _score_postings(node, freqs, norms, cache)
    return docs, s.astype(np.float64)


def _iv_normalize(src) -> dict:
    """Interval-source dataclass tree (query.ITerm/IOr/...) → the plain
    nested-dict plan nodes the worker-side evaluator consumes.
    Multi-term leaves must be expanded first (searcher.expand)."""
    from .query import (IAtLeast, IContainedBy, IContaining, IExtend,
                        IFixField, IMaxGaps, IMaxWidth, INonOverlapping,
                        INotContainedBy, INotContaining, IOffset, IOr,
                        IOrdered, IOverlapping, IPhrase, IPrefix, ITerm,
                        IUnordered, IWildcard, interval_min_extent)

    if isinstance(src, ITerm):
        return {"kind": "term", "text": src.text}
    if isinstance(src, (IPrefix, IWildcard)):
        raise ValueError(
            f"unexpanded multi-term interval source: {src!r} — "
            "call searcher.expand() first"
        )
    if isinstance(src, (IOrdered, IUnordered, IPhrase)):
        if len(src.sources) < 2:
            raise ValueError("ordered/unordered/phrase needs >= 2 sources")
        kind = {IOrdered: "ordered", IUnordered: "unordered",
                IPhrase: "phrase"}[type(src)]
        return {"kind": kind,
                "sources": [_iv_normalize(s) for s in src.sources]}
    if isinstance(src, IOr):
        if not src.sources:
            raise ValueError("or needs >= 1 source")
        return {"kind": "or",
                "sources": [_iv_normalize(s) for s in src.sources]}
    if isinstance(src, IContaining):
        return {"kind": "containing", "big": _iv_normalize(src.big),
                "small": _iv_normalize(src.small)}
    if isinstance(src, INotContaining):
        return {"kind": "not_containing",
                "big": _iv_normalize(src.minuend),
                "small": _iv_normalize(src.subtrahend)}
    if isinstance(src, IContainedBy):
        return {"kind": "contained_by", "small": _iv_normalize(src.small),
                "big": _iv_normalize(src.big)}
    if isinstance(src, INotContainedBy):
        return {"kind": "not_contained_by",
                "small": _iv_normalize(src.small),
                "big": _iv_normalize(src.big)}
    if isinstance(src, IOverlapping):
        return {"kind": "overlapping", "source": _iv_normalize(src.source),
                "reference": _iv_normalize(src.reference)}
    if isinstance(src, INonOverlapping):
        return {"kind": "non_overlapping",
                "source": _iv_normalize(src.minuend),
                "reference": _iv_normalize(src.subtrahend)}
    if isinstance(src, IMaxWidth):
        if src.width < 1:
            raise ValueError("maxwidth needs width >= 1")
        return {"kind": "max_width", "width": int(src.width),
                "source": _iv_normalize(src.source)}
    if isinstance(src, IMaxGaps):
        if src.gaps < 0:
            raise ValueError("maxgaps needs gaps >= 0")
        return {"kind": "max_gaps", "gaps": int(src.gaps),
                "sub_extent": int(interval_min_extent(src.source)),
                "source": _iv_normalize(src.source)}
    if isinstance(src, IExtend):
        if src.before < 0 or src.after < 0:
            raise ValueError("extend needs before/after >= 0")
        return {"kind": "extend", "before": int(src.before),
                "after": int(src.after),
                "source": _iv_normalize(src.source)}
    if isinstance(src, IOffset):
        return {"kind": "offset", "before": bool(src.before),
                "source": _iv_normalize(src.source)}
    if isinstance(src, IFixField):
        return {"kind": "fixfield", "field": src.field,
                "source": _iv_normalize(src.source)}
    if isinstance(src, IAtLeast):
        if not (1 <= src.min_should_match <= len(src.sources)):
            raise ValueError("atLeast needs 1 <= n <= len(sources)")
        if len(src.sources) > 8:
            raise ValueError(
                "atLeast supports at most 8 sources (subset expansion)")
        return {"kind": "at_least", "msm": int(src.min_should_match),
                "sources": [_iv_normalize(s) for s in src.sources]}
    raise TypeError(f"not an interval source: {src!r}")


_EMPTY_IV = (np.empty(0, dtype=np.int64),) * 3


def _iv_minimalize(d, s, e):
    """(doc, start, end) triples → the minimal set: drop every interval
    that contains another distinct member (Vigna semantics). Sorted by
    (doc, start); within a doc the survivors have strictly increasing
    starts AND ends."""
    if len(d) == 0:
        return d, s, e
    order = np.lexsort((e, s, d))
    d, s, e = d[order], s[order], e[order]
    # smallest end of each (doc, start) group wins (the others nest it)
    first = np.ones(len(d), dtype=bool)
    first[1:] = (d[1:] != d[:-1]) | (s[1:] != s[:-1])
    d, s, e = d[first], s[first], e[first]
    # starts now strictly increase per doc: i is non-minimal iff some
    # later same-doc interval has end <= end_i. Packed global suffix-min
    # works because doc majorizes the key (positions < _POS_SHIFT).
    packed = d * _POS_SHIFT + e
    suff = np.minimum.accumulate(packed[::-1])[::-1]
    keep = np.ones(len(d), dtype=bool)
    keep[:-1] = suff[1:] > packed[:-1]
    return d[keep], s[keep], e[keep]


def _iv_term_stream(seg: SegmentData, field: str, text: str, cand):
    """All [p, p] occurrence intervals of a term, restricted to the
    candidate docs; sorted by (doc, pos)."""
    p = seg.positions((field, text))
    if p is None:
        return _EMPTY_IV
    docs, freqs, starts, pos = p
    if cand is not None:
        m = np.isin(docs, cand, assume_unique=True)
        docs, freqs, starts = docs[m], freqs[m], starts[m]
    if len(docs) == 0:
        return _EMPTY_IV
    cnt = freqs.astype(np.int64)
    flat = pos[_run_take(starts, cnt)].astype(np.int64)
    d = np.repeat(docs.astype(np.int64), cnt)
    return d, flat, flat.copy()


def _iv_ordered_eval(children):
    """OrderedIntervalIterator: greedy chain from every first-source
    interval to the earliest following interval of each next source
    (minimal per-child streams have ends ascending with starts, so the
    first fit is the tightest), then the adjacent minimality cut (chain
    ends are non-decreasing in start order)."""
    d, s, e = children[0]
    if len(d) == 0:
        return _EMPTY_IV
    valid = np.ones(len(d), dtype=bool)
    for dj, sj, ej in children[1:]:
        if len(dj) == 0:
            return _EMPTY_IV
        pk = dj * _POS_SHIFT + sj
        tgt = d * _POS_SHIFT + e + 1
        idx = np.searchsorted(pk, tgt, side="left")
        ok = idx < len(pk)
        ic = np.minimum(idx, len(pk) - 1)
        ok &= dj[ic] == d
        e = np.where(ok, ej[ic], e)
        valid &= ok
    d, s, e = d[valid], s[valid], e[valid]
    if len(d):
        keep = np.ones(len(d), dtype=bool)
        keep[:-1] = (d[1:] != d[:-1]) | (e[:-1] < e[1:])
        d, s, e = d[keep], s[keep], e[keep]
    return d, s, e


def _iv_unordered_eval(children):
    """UnorderedIntervalIterator (overlaps allowed), n-ary: every
    stream element anchors a candidate window as its left edge; per
    source the completion is the first interval at-or-after the anchor
    (minimal streams ⇒ that is also the one with the smallest end);
    window end = max of the completions. Minimalizing the anchored
    candidates equals minimalizing all one-per-source combinations."""
    if any(len(c[0]) == 0 for c in children):
        return _EMPTY_IV
    d = np.concatenate([c[0] for c in children])
    s = np.concatenate([c[1] for c in children])
    e = np.concatenate([c[2] for c in children])
    lab = np.concatenate(
        [np.full(len(c[0]), i, dtype=np.int64)
         for i, c in enumerate(children)]
    )
    order = np.lexsort((s, d))
    d, s, e, lab = d[order], s[order], e[order], lab[order]
    pk = d * _POS_SHIFT + s
    n = len(d)
    big = np.full(n, -1, dtype=np.int64)
    ok = np.ones(n, dtype=bool)
    for i in range(len(children)):
        idxs = np.flatnonzero(lab == i)
        p = np.searchsorted(pk[idxs], pk, side="left")
        has = p < len(idxs)
        ic = idxs[np.minimum(p, len(idxs) - 1)]
        good = has & (d[ic] == d)
        ok &= good
        big = np.maximum(big, np.where(good, e[ic], -1))
    return _iv_minimalize(d[ok], s[ok], big[ok])


def _iv_containing_eval(big, small, negate: bool):
    """ContainingIntervalFunction / NonContainingIntervalFunction: keep
    the big intervals that do (containing) / do not (notContaining)
    have a small interval nested inside. The first small at-or-after
    the big's start has the smallest end among those (minimal stream),
    so one searchsorted decides."""
    db, sb, eb = big
    if len(db) == 0:
        return _EMPTY_IV
    ds, ss, es = small
    if len(ds) == 0:
        return (db, sb, eb) if negate else _EMPTY_IV
    pk_s = ds * _POS_SHIFT + ss
    idx = np.searchsorted(pk_s, db * _POS_SHIFT + sb, side="left")
    has = idx < len(pk_s)
    ic = np.minimum(idx, len(pk_s) - 1)
    contains = has & (ds[ic] == db) & (es[ic] <= eb)
    keep = ~contains if negate else contains
    return db[keep], sb[keep], eb[keep]


def _iv_at_least_eval(children, msm: int):
    """MinimumShouldMatchIntervalsSource: minimal spans over >= msm of
    the sources == the minimalized union of unordered(subset) over all
    msm-subsets (a span covering >= msm sources covers some subset
    fully; minimality transfers both ways)."""
    from itertools import combinations

    parts = [
        _iv_unordered_eval([children[i] for i in combo])
        if msm > 1 else children[combo[0]]
        for combo in combinations(range(len(children)), msm)
    ]
    return _iv_minimalize(
        np.concatenate([p[0] for p in parts]),
        np.concatenate([p[1] for p in parts]),
        np.concatenate([p[2] for p in parts]),
    )


def _iv_docs(src: dict, seg: SegmentData, field: str):
    """Candidate doc ids a source can match in (sorted): the scan-prune
    analog of ConjunctionDISI — conjunctions intersect, disjunctions
    union, atLeast counts, differences keep the minuend side."""
    kind = src["kind"]
    if kind == "term":
        p = seg.positions((field, src["text"]))
        return p[0].astype(np.int64) if p is not None else _EMPTY_IV[0]
    if kind in ("ordered", "unordered", "phrase"):
        out = None
        for c in src["sources"]:
            dc = _iv_docs(c, seg, field)
            out = dc if out is None else np.intersect1d(
                out, dc, assume_unique=True)
        return out
    if kind == "or":
        out = _EMPTY_IV[0]
        for c in src["sources"]:
            out = np.union1d(out, _iv_docs(c, seg, field))
        return out
    if kind == "containing":
        return np.intersect1d(
            _iv_docs(src["big"], seg, field),
            _iv_docs(src["small"], seg, field), assume_unique=True)
    if kind == "not_containing":
        return _iv_docs(src["big"], seg, field)
    if kind == "contained_by":
        return np.intersect1d(
            _iv_docs(src["small"], seg, field),
            _iv_docs(src["big"], seg, field), assume_unique=True)
    if kind == "not_contained_by":
        return _iv_docs(src["small"], seg, field)
    if kind == "overlapping":
        return np.intersect1d(
            _iv_docs(src["source"], seg, field),
            _iv_docs(src["reference"], seg, field), assume_unique=True)
    if kind == "non_overlapping":
        return _iv_docs(src["source"], seg, field)
    if kind in ("max_width", "max_gaps", "extend", "offset"):
        return _iv_docs(src["source"], seg, field)
    if kind == "fixfield":
        return _iv_docs(src["source"], seg, src["field"])
    if kind == "at_least":
        allc = np.concatenate(
            [_iv_docs(c, seg, field) for c in src["sources"]])
        uniq, cnt = np.unique(allc, return_counts=True)
        return uniq[cnt >= src["msm"]]
    raise ValueError(f"unknown interval source kind {kind!r}")


def _iv_phrase_eval(children):
    """BLOCK IntervalFunction (Intervals.phrase): exact adjacency —
    each next child interval must start at the previous end + 1 (in a
    minimal stream starts are unique per doc, so one searchsorted
    equality probe decides)."""
    d, s, e = children[0]
    if len(d) == 0:
        return _EMPTY_IV
    valid = np.ones(len(d), dtype=bool)
    for dj, sj, ej in children[1:]:
        if len(dj) == 0:
            return _EMPTY_IV
        pk = dj * _POS_SHIFT + sj
        tgt = d * _POS_SHIFT + e + 1
        idx = np.searchsorted(pk, tgt, side="left")
        ok = idx < len(pk)
        ic = np.minimum(idx, len(pk) - 1)
        ok &= pk[ic] == tgt
        e = np.where(ok, ej[ic], e)
        valid &= ok
    return _iv_minimalize(d[valid], s[valid], e[valid])


def _iv_contained_by_eval(small, big, negate: bool):
    """ContainedByIntervalFunction / NOT_CONTAINED_BY: keep the small
    intervals nested inside (not nested inside) some big interval. The
    big side may be a RAW (non-minimal) mapped stream — extend/offset
    envelopes must not be minimalized away (the before/after
    construction depends on them) — so the exists-test is a per-doc
    prefix-max: among bigs with start <= s.start, is the max end
    >= s.end? (doc majorizes the packed key, so a global running max
    never crosses docs upward.)"""
    ds, ss, es = small
    if len(ds) == 0:
        return _EMPTY_IV
    db, sb, eb = big
    if len(db) == 0:
        return (ds, ss, es) if negate else _EMPTY_IV
    pk_start = db * _POS_SHIFT + sb
    prefmax = np.maximum.accumulate(db * _POS_SHIFT + eb)
    idx = np.searchsorted(pk_start, ds * _POS_SHIFT + ss, side="right") - 1
    has = idx >= 0
    pm = prefmax[np.maximum(idx, 0)]
    inside = has & (pm >= ds * _POS_SHIFT + es)
    keep = ~inside if negate else inside
    return ds[keep], ss[keep], es[keep]


def _iv_overlapping_eval(source, reference, negate: bool):
    """OVERLAPPING / NON_OVERLAPPING IntervalFunctions: keep source
    intervals that share (don't share) >= 1 position with a reference
    interval. The reference may be RAW (see _iv_contained_by_eval), so
    the exists-test is the prefix-max form: among refs with start <=
    s.end, is the max end >= s.start?"""
    d, s, e = source
    if len(d) == 0:
        return _EMPTY_IV
    dr, sr, er = reference
    if len(dr) == 0:
        return (d, s, e) if negate else _EMPTY_IV
    pk_start = dr * _POS_SHIFT + sr
    prefmax = np.maximum.accumulate(dr * _POS_SHIFT + er)
    idx = np.searchsorted(pk_start, d * _POS_SHIFT + e, side="right") - 1
    has = idx >= 0
    pm = prefmax[np.maximum(idx, 0)]
    overlaps = has & (pm >= d * _POS_SHIFT + s)
    keep = ~overlaps if negate else overlaps
    return d[keep], s[keep], e[keep]


def _iv_eval_raw(src: dict, seg: SegmentData, field: str, cand):
    """Filter-side stream evaluation: extend/offset map their
    underlying intervals 1:1 WITHOUT re-minimalizing, exactly like
    ExtendedIntervalsSource/OffsetIntervalsSource (dropping an envelope
    that contains another would weaken the exists-tests — the
    before/after construction depends on the widest ones surviving).
    Output sorted by (doc, start, end); every other node is evaluated
    minimally as usual."""
    kind = src["kind"]
    if kind == "extend":
        d, s, e = _iv_eval_raw(src["source"], seg, field, cand)
        s2 = np.maximum(s - src["before"], 0)
        e2 = e + src["after"]
        order = np.lexsort((e2, s2, d))
        return d[order], s2[order], e2[order]
    if kind == "offset":
        d, s, e = _iv_eval_raw(src["source"], seg, field, cand)
        p = np.maximum(s - 1, 0) if src["before"] else e + 1
        order = np.lexsort((p, d))
        return d[order], p[order], p[order].copy()
    return _iv_eval(src, seg, field, cand)


def _iv_eval(src: dict, seg: SegmentData, field: str, cand):
    """Recursive minimal-interval evaluation → (doc, start, end) arrays
    sorted by (doc, start). Term streams restrict to the root's
    candidate docs; every combinator preserves minimality (re-running
    _iv_minimalize where an operation could break it)."""
    kind = src["kind"]
    if kind == "term":
        return _iv_term_stream(seg, field, src["text"], cand)
    if kind in ("ordered", "unordered", "phrase", "or", "at_least"):
        children = [_iv_eval(c, seg, field, cand) for c in src["sources"]]
        if kind == "ordered":
            return _iv_ordered_eval(children)
        if kind == "unordered":
            return _iv_unordered_eval(children)
        if kind == "phrase":
            return _iv_phrase_eval(children)
        if kind == "or":
            return _iv_minimalize(
                np.concatenate([c[0] for c in children]),
                np.concatenate([c[1] for c in children]),
                np.concatenate([c[2] for c in children]),
            )
        return _iv_at_least_eval(children, src["msm"])
    if kind in ("containing", "not_containing"):
        big = _iv_eval(src["big"], seg, field, cand)
        small = _iv_eval(src["small"], seg, field, cand)
        return _iv_containing_eval(big, small, kind == "not_containing")
    if kind in ("contained_by", "not_contained_by"):
        small = _iv_eval(src["small"], seg, field, cand)
        big = _iv_eval_raw(src["big"], seg, field, cand)
        return _iv_contained_by_eval(small, big, kind == "not_contained_by")
    if kind in ("overlapping", "non_overlapping"):
        source = _iv_eval(src["source"], seg, field, cand)
        ref = _iv_eval_raw(src["reference"], seg, field, cand)
        return _iv_overlapping_eval(source, ref, kind == "non_overlapping")
    if kind == "max_width":
        d, s, e = _iv_eval(src["source"], seg, field, cand)
        keep = (e - s + 1) <= src["width"]
        return d[keep], s[keep], e[keep]
    if kind == "max_gaps":
        d, s, e = _iv_eval(src["source"], seg, field, cand)
        keep = (e - s + 1) - src["sub_extent"] <= src["gaps"]
        return d[keep], s[keep], e[keep]
    if kind in ("extend", "offset"):
        # positional consumption (conjunctions, scoring) re-minimalizes
        # the mapped stream; the filter sides above take the RAW stream
        return _iv_minimalize(*_iv_eval_raw(src, seg, field, cand))
    if kind == "fixfield":
        # the wrapped source reads its own field's postings; term
        # streams still restrict to the ROOT candidate docs
        return _iv_eval(src["source"], seg, src["field"], cand)
    raise ValueError(f"unknown interval source kind {kind!r}")


def _eval_intervals(node: dict, seg: SegmentData):
    """IntervalQuery evaluation, batched across ALL candidate docs
    (sandbox intervals module; no per-doc Python — same packed-key
    idioms as the phrase/span paths). The source tree evaluates
    bottom-up through the minimal-interval combinators above; the
    legacy flat shapes compile to ordered/unordered trees over term
    leaves and take exactly the code path they always did.

    freq accumulates in float32 in interval order
    (IntervalScorer.java:62-70: freq += 1/max(length − minExtent + 1, 1),
    minExtent = IntervalsSource.minExtent of the root); score =
    f32(weight · (1 − pivot / (pivot + freq))) — the saturation function
    (IntervalScoreFunction.java), all-float32 op order."""
    field = node.get("field", "content")
    src = node["source"]
    cand = _iv_docs(src, seg, field)
    if len(cand) == 0:
        return _EMPTY_I, _EMPTY_F
    d0, s0, e0 = _iv_eval(src, seg, field, cand)
    if len(d0) == 0:
        return _EMPTY_I, _EMPTY_F
    length = e0 - s0 + 1
    mex = np.int64(node["min_extent"])
    if node["max_gaps"] is not None:
        m = (length - mex) <= node["max_gaps"]
        d0, length = d0[m], length[m]
        if len(d0) == 0:
            return _EMPTY_I, _EMPTY_F
    contrib = (
        1.0 / np.maximum(length - mex + 1, 1).astype(np.float64)
    ).astype(F32)
    first = np.ones(len(d0), dtype=bool)
    first[1:] = d0[1:] != d0[:-1]
    uniq = d0[first]
    inv = np.cumsum(first) - 1
    freq = np.zeros(len(uniq), dtype=F32)
    np.add.at(freq, inv, contrib)  # index order == interval order per doc
    pivot, w = node["pivot"], node["weight"]
    score = (w * (F32(1.0) - pivot / (pivot + freq))).astype(F32)
    return uniq, score.astype(np.float64)


def _slices_for(post_i, cand: np.ndarray):
    """Per-candidate-doc flattened positions for one phrase slot:
    returns (flat, cnt, off) where flat concatenates each candidate doc's
    raw positions and cnt/off index the per-doc runs."""
    docs_i, freqs_i, starts_i, pos_i = post_i
    j = np.searchsorted(docs_i, cand)
    cnt = freqs_i[j].astype(np.int64)
    flat = pos_i[_run_take(starts_i[j], cnt)].astype(np.int64)
    off = np.cumsum(cnt) - cnt
    return flat, cnt, off


def _batched_sloppy(
    post: list, cand: np.ndarray, slop: int, repeat_groups: tuple
) -> np.ndarray:
    """_sloppy_freq for ALL candidate docs at once — the same greedy
    algorithm (same contract, pinned equivalent by
    tests/test_sloppy_phrase.py::test_batched_sloppy_equals_scalar) with
    the doc dimension vectorized: each outer iteration advances every
    still-alive doc one greedy step in NumPy, and the repeat-group
    cascades are packed-key searchsorted jumps instead of inner while
    loops. Iteration count = max per-doc steps; per-iteration work is
    O(n_slots * alive_docs) — no per-doc Python (VERDICT r2 weak #2)."""
    n = len(post)
    D = len(cand)
    offs_n = np.int64(n)  # uniform shift keeps adjusted positions >= 0
    flats, cnts, offs, pks = [], [], [], []
    for i, p in enumerate(post):
        flat, cnt, off = _slices_for(p, cand)
        flat = flat - np.int64(i) + offs_n
        flats.append(flat)
        cnts.append(cnt)
        offs.append(off)
        pks.append(np.repeat(np.arange(D, dtype=np.int64), cnt) * _POS_SHIFT + flat)
    ptr = np.zeros((n, D), dtype=np.int64)
    total = np.zeros(D, dtype=np.float64)
    alive = np.ones(D, dtype=bool)
    for i in range(n):
        alive &= cnts[i] > 0  # conjunction guarantees this, but stay safe
    while True:
        ad = np.flatnonzero(alive)
        if ad.size == 0:
            break
        # repeat-group cascade: same-term slots must sit on distinct raw
        # positions in slot order; advance the later slot past collisions
        # (one full searchsorted jump == the scalar inner while loop)
        for group in repeat_groups:
            for gi in range(1, len(group)):
                if ad.size == 0:
                    break
                a, b = group[gi - 1], group[gi]
                val_a = flats[a][offs[a][ad] + ptr[a, ad]]
                # advance b to first flat_b > val_a + (a - b)
                tgt = np.searchsorted(
                    pks[b], ad * _POS_SHIFT + (val_a + np.int64(a - b)),
                    side="right",
                )
                ptr[b, ad] = np.maximum(ptr[b, ad], tgt - offs[b][ad])
                died = ptr[b, ad] >= cnts[b][ad]
                if died.any():
                    alive[ad[died]] = False
                    ad = ad[~died]
        if ad.size == 0:
            continue
        vals = np.empty((n, ad.size), dtype=np.int64)
        for i in range(n):
            vals[i] = flats[i][offs[i][ad] + ptr[i, ad]]
        lo = np.argmin(vals, axis=0)  # first-tie, like min(range(n), key=..)
        dist = vals.max(axis=0) - vals.min(axis=0)
        match = dist <= slop
        md = ad[match]
        total[md] += 1.0 / (1.0 + dist[match])
        ptr[:, md] += 1
        nm = ad[~match]
        ptr[lo[~match], nm] += 1
        for i in range(n):
            alive[ad] &= ptr[i, ad] < cnts[i][ad]
    return total


def _span_docs(span: dict, seg: SegmentData) -> np.ndarray:
    """Candidate docs of a span subtree (sorted): union for OR, sorted
    intersect for NEAR, include side for NOT, match side for FIRST."""
    k = span["kind"]
    if k == "term":
        return seg.postings((span["field"], span["term"]))[0]
    if k == "or":
        parts = [_span_docs(c, seg) for c in span["children"]]
        parts = [p for p in parts if len(p)]
        if not parts:
            return _EMPTY_I
        return np.unique(np.concatenate(parts))
    if k == "near":
        cand = None
        for c in span["children"]:
            d = _span_docs(c, seg)
            cand = d if cand is None else cand[np.isin(cand, d, assume_unique=True)]
            if len(cand) == 0:
                return _EMPTY_I
        return cand if cand is not None else _EMPTY_I
    if k == "not":
        return _span_docs(span["include"], seg)
    if k in ("first", "posrange"):
        return _span_docs(span["match"], seg)
    if k in ("containing", "within"):
        # ConjunctionSpans (ContainSpans.java): both sides must be present
        b = _span_docs(span["big"], seg)
        l = _span_docs(span["little"], seg)
        return b[np.isin(b, l, assume_unique=True)]
    raise ValueError(f"unknown span kind {k}")


def _doc_spans(span: dict, seg: SegmentData, doc: int) -> list:
    """SCALAR CONTRACT REFERENCE (not on the engine hot path — the engine
    runs the batched twin _seg_span_stream; equivalence is pinned by
    tests/test_spans.py::test_batched_stream_equals_scalar; change
    semantics HERE first, then mirror in the batched twin).

    All spans (start, end) of a span subtree in one doc, sorted by
    (start, end). NEAR emits its greedy non-overlapping matches (the
    documented SpanNear contract); OR merges child streams; NOT drops
    include-spans overlapping any exclude-span; FIRST keeps end <= n."""
    k = span["kind"]
    if k == "term":
        p = seg.positions((span["field"], span["term"]))
        if p is None:
            return []
        docs_i, freqs_i, starts_i, pos_i = p
        j = int(np.searchsorted(docs_i, doc))
        if j >= len(docs_i) or docs_i[j] != doc:
            return []
        lo, hi = int(starts_i[j]), int(starts_i[j]) + int(freqs_i[j])
        return [(int(x), int(x) + 1) for x in pos_i[lo:hi]]
    if k == "or":
        out: list = []
        for c in span["children"]:
            out.extend(_doc_spans(c, seg, doc))
        out.sort()
        return out
    if k == "near":
        lists = [_doc_spans(c, seg, doc) for c in span["children"]]
        if any(not l for l in lists):
            return []
        return _near_spans(lists, int(span["slop"]), bool(span["in_order"]))
    if k == "not":
        inc = _doc_spans(span["include"], seg, doc)
        exc = _doc_spans(span["exclude"], seg, doc)
        if not exc:
            return inc
        return [
            (s, e) for s, e in inc
            if not any(es < e and ee > s for es, ee in exc)
        ]
    if k == "first":
        return [(s, e) for s, e in _doc_spans(span["match"], seg, doc)
                if e <= span["end"]]
    if k == "posrange":
        return [(s, e) for s, e in _doc_spans(span["match"], seg, doc)
                if s >= span["start"] and e <= span["end"]]
    if k == "containing":
        big = _doc_spans(span["big"], seg, doc)
        little = _doc_spans(span["little"], seg, doc)
        return [(s, e) for s, e in big
                if any(ls >= s and le <= e for ls, le in little)]
    if k == "within":
        big = _doc_spans(span["big"], seg, doc)
        little = _doc_spans(span["little"], seg, doc)
        return [(s, e) for s, e in little
                if any(bs <= s and be >= e for bs, be in big)]
    raise ValueError(f"unknown span kind {k}")


def _near_spans(lists: list, slop: int, in_order: bool) -> list:
    """Greedy NearSpans combination (NearSpansOrdered/Unordered analog):
    one span per clause; width = (max_end - min_start) - Σ child lengths;
    match when width <= slop. in_order additionally requires each child
    span to start at or after the previous child's end (non-overlapping,
    in clause order). Matches are consumed greedily without reuse."""
    n = len(lists)
    idx = [0] * n
    out = []
    while all(idx[i] < len(lists[i]) for i in range(n)):
        if in_order:
            ok = True
            for i in range(1, n):
                while (
                    idx[i] < len(lists[i])
                    and lists[i][idx[i]][0] < lists[i - 1][idx[i - 1]][1]
                ):
                    idx[i] += 1
                if idx[i] >= len(lists[i]):
                    ok = False
                    break
            if not ok:
                break
        cur = [lists[i][idx[i]] for i in range(n)]
        min_s = min(c[0] for c in cur)
        max_e = max(c[1] for c in cur)
        width = (max_e - min_s) - sum(c[1] - c[0] for c in cur)
        if width <= slop:
            out.append((min_s, max_e))
            for i in range(n):
                idx[i] += 1
        else:
            lo_i = min(range(n), key=lambda i: cur[i][0])
            idx[lo_i] += 1
    return out


def _seg_span_stream(span: dict, seg: SegmentData, cand: np.ndarray):
    """Batched _doc_spans: the span streams of ALL candidate docs at once
    as (docidx, start, end) arrays — docidx indexes into cand, rows are
    grouped by docidx with each doc's spans in the documented stream
    order (the exact per-doc order _doc_spans produces; pinned equivalent
    by tests/test_spans.py::test_batched_stream_equals_scalar)."""
    k = span["kind"]
    D = len(cand)
    if k == "term":
        p = seg.positions((span["field"], span["term"]))
        if p is None:
            return (_EMPTY_I, _EMPTY_I, _EMPTY_I)
        docs_i, freqs_i, starts_i, pos_i = p
        j = np.searchsorted(docs_i, cand)
        present = (j < len(docs_i)) & (docs_i[np.minimum(j, len(docs_i) - 1)] == cand)
        cnt = np.where(present, freqs_i[np.minimum(j, len(docs_i) - 1)], 0).astype(np.int64)
        starts = pos_i[
            _run_take(starts_i[np.minimum(j, len(docs_i) - 1)], cnt)
        ].astype(np.int64)
        di = np.repeat(np.arange(D, dtype=np.int64), cnt)
        return di, starts, starts + 1
    if k == "or":
        parts = [_seg_span_stream(c, seg, cand) for c in span["children"]]
        di = np.concatenate([p[0] for p in parts])
        s = np.concatenate([p[1] for p in parts])
        e = np.concatenate([p[2] for p in parts])
        order = np.lexsort((e, s, di))  # per-doc sorted (start, end)
        return di[order], s[order], e[order]
    if k == "near":
        streams = [_seg_span_stream(c, seg, cand) for c in span["children"]]
        return _batched_near(streams, int(span["slop"]), bool(span["in_order"]), D)
    if k == "not":
        inc = _seg_span_stream(span["include"], seg, cand)
        exc = _seg_span_stream(span["exclude"], seg, cand)
        di, s, e = inc
        xdi, xs, xe = exc
        if len(xdi) == 0 or len(di) == 0:
            return inc
        # overlap(include i) <=> exists exclude with es < e_i and ee > s_i
        # in the same doc. Excludes are per-doc start-sorted; a packed
        # running max of (docidx << 32 | ee) makes "max ee among excludes
        # with es < e_i in MY doc" one global searchsorted + gather: the
        # running max can only exceed docidx*SHIFT + s_i if it comes from
        # this doc's own prefix (earlier docs pack strictly lower).
        xorder = np.lexsort((xs, xdi))
        xdi, xs, xe = xdi[xorder], xs[xorder], xe[xorder]
        run_max = np.maximum.accumulate(xdi * _POS_SHIFT + xe)
        jx = np.searchsorted(xdi * _POS_SHIFT + xs, di * _POS_SHIFT + e, side="left")
        has_prev = jx > 0
        overlap = np.zeros(len(di), dtype=bool)
        overlap[has_prev] = (
            run_max[jx[has_prev] - 1] > di[has_prev] * _POS_SHIFT + s[has_prev]
        )
        keep = ~overlap
        return di[keep], s[keep], e[keep]
    if k == "first":
        di, s, e = _seg_span_stream(span["match"], seg, cand)
        keep = e <= span["end"]
        return di[keep], s[keep], e[keep]
    if k == "posrange":
        di, s, e = _seg_span_stream(span["match"], seg, cand)
        keep = (s >= span["start"]) & (e <= span["end"])
        return di[keep], s[keep], e[keep]
    if k in ("containing", "within"):
        # SpanContaining: keep big spans containing >= 1 little span;
        # SpanWithin: keep little spans inside >= 1 big span
        # (ContainSpans.java). Same packed-key trick family as NOT:
        # containing needs "min little END among littles with start >= my
        # start in MY doc" — a SUFFIX min over littles sorted by
        # (doc, start); within needs "max big END among bigs with start <=
        # my start in MY doc" — a PREFIX max. Cross-doc contamination is
        # impossible: other docs' packed keys land outside
        # [doc<<32, doc<<32 + 2^32).
        big = _seg_span_stream(span["big"], seg, cand)
        little = _seg_span_stream(span["little"], seg, cand)
        bdi, bs, be = big
        ldi, ls, le = little
        if k == "containing":
            out_di, out_s, out_e = bdi, bs, be
            if len(ldi) == 0 or len(bdi) == 0:
                return (_EMPTY_I, _EMPTY_I, _EMPTY_I)
            lorder = np.lexsort((ls, ldi))
            lk_start = (ldi * _POS_SHIFT + ls)[lorder]
            lk_end = (ldi * _POS_SHIFT + le)[lorder]
            suf_min = np.minimum.accumulate(lk_end[::-1])[::-1]
            j = np.searchsorted(lk_start, bdi * _POS_SHIFT + bs, side="left")
            ok = j < len(lk_start)
            jc = np.minimum(j, len(lk_start) - 1)
            keep = ok & (suf_min[jc] <= bdi * _POS_SHIFT + be)
        else:
            out_di, out_s, out_e = ldi, ls, le
            if len(ldi) == 0 or len(bdi) == 0:
                return (_EMPTY_I, _EMPTY_I, _EMPTY_I)
            border = np.lexsort((bs, bdi))
            bk_start = (bdi * _POS_SHIFT + bs)[border]
            bk_end = (bdi * _POS_SHIFT + be)[border]
            pre_max = np.maximum.accumulate(bk_end)
            j = np.searchsorted(bk_start, ldi * _POS_SHIFT + ls, side="right")
            keep = (j > 0) & (
                pre_max[np.maximum(j, 1) - 1] >= ldi * _POS_SHIFT + le
            )
        return out_di[keep], out_s[keep], out_e[keep]
    raise ValueError(f"unknown span kind {k}")


def _batched_near(streams: list, slop: int, in_order: bool, D: int):
    """_near_spans for ALL docs at once: the same greedy NearSpans
    combination with the doc dimension vectorized. Each outer iteration
    runs the full in-order cascade (packed-key searchsorted jump per
    clause == the scalar inner while) then one greedy evaluate/advance
    step for every alive doc. Emission order per doc == scalar order
    (min-start is non-decreasing, iteration batches stable-sorted)."""
    n = len(streams)
    cnts, offs, Ss, Es, pks = [], [], [], [], []
    for di, s, e in streams:
        cnt = np.bincount(di, minlength=D).astype(np.int64)
        off = np.cumsum(cnt) - cnt
        cnts.append(cnt)
        offs.append(off)
        Ss.append(s)
        Es.append(e)
        pks.append(di * _POS_SHIFT + s)  # per-doc start-sorted -> global sorted
    alive = np.ones(D, dtype=bool)
    for c in range(n):
        alive &= cnts[c] > 0
    ptr = np.zeros((n, D), dtype=np.int64)
    out_di, out_s, out_e = [], [], []
    while True:
        ad = np.flatnonzero(alive)
        if ad.size == 0:
            break
        if in_order:
            # cascade: clause c starts at/after clause c-1's (updated) end
            for c in range(1, n):
                if ad.size == 0:
                    break
                prev_end = Es[c - 1][offs[c - 1][ad] + ptr[c - 1, ad]]
                tgt = np.searchsorted(
                    pks[c], ad * _POS_SHIFT + prev_end, side="left"
                )
                ptr[c, ad] = np.maximum(ptr[c, ad], tgt - offs[c][ad])
                died = ptr[c, ad] >= cnts[c][ad]
                if died.any():
                    alive[ad[died]] = False
                    ad = ad[~died]
            if ad.size == 0:
                continue
        scur = np.empty((n, ad.size), dtype=np.int64)
        ecur = np.empty((n, ad.size), dtype=np.int64)
        for c in range(n):
            scur[c] = Ss[c][offs[c][ad] + ptr[c, ad]]
            ecur[c] = Es[c][offs[c][ad] + ptr[c, ad]]
        min_s = scur.min(axis=0)
        lo = scur.argmin(axis=0)  # first-tie, like min(range(n), key=..)
        max_e = ecur.max(axis=0)
        width = (max_e - min_s) - (ecur - scur).sum(axis=0)
        match = width <= slop
        md = ad[match]
        if md.size:
            out_di.append(md)
            out_s.append(min_s[match])
            out_e.append(max_e[match])
        ptr[:, md] += 1
        nm = ad[~match]
        ptr[lo[~match], nm] += 1
        for c in range(n):
            alive[ad] &= ptr[c, ad] < cnts[c][ad]
    if not out_di:
        return (_EMPTY_I, _EMPTY_I, _EMPTY_I)
    di = np.concatenate(out_di)
    s = np.concatenate(out_s)
    e = np.concatenate(out_e)
    order = np.argsort(di, kind="stable")  # keep per-doc emission order
    return di[order], s[order], e[order]


def _eval_span(node, seg, cache):
    """Span-query scoring: freq = span count per doc, weight = summed leaf
    idf, scored like Phrase (SpanWeight/SpanScorer shape). The whole span
    algebra evaluates BATCHED across candidate docs (_seg_span_stream /
    _batched_near): every combinator is array ops over all docs at once —
    the per-doc Python loop (r1's 29.7 s SpanNear cliff, r2's residual
    generic-evaluator tail) is gone entirely."""
    span = node["span"]
    cand = _span_docs(span, seg)
    if len(cand) == 0:
        return _EMPTY_I, _EMPTY_F
    di, _s, _e = _seg_span_stream(span, seg, cand)
    if len(di) == 0:
        return _EMPTY_I, _EMPTY_F
    u, counts = np.unique(di, return_counts=True)
    docs = cand[u]
    freqs = counts.astype(np.float64)
    norms = _span_norms(node, seg, docs)
    s = _score_postings(node, freqs, norms, cache)
    return docs, s.astype(np.float64)


def _span_norms(node: dict, seg: SegmentData, docs: np.ndarray) -> np.ndarray:
    """Norm byte per doc from whichever leaf posting holds it (every
    candidate contains >= 1 leaf; same doc => same norm byte per field)."""
    norms = np.zeros(len(docs), dtype=np.int64)
    filled = np.zeros(len(docs), dtype=bool)
    for key in node["leaves"]:
        if filled.all():
            break
        d, _f, n = seg.postings(tuple(key))
        if len(d) == 0:
            continue
        idx = np.searchsorted(d, docs)
        ok = (idx < len(d)) & (d[np.minimum(idx, len(d) - 1)] == docs)
        take = ok & ~filled
        norms[take] = n[idx[take]]
        filled |= ok
    return norms


def _eval_payload(node, seg, cache):
    """PayloadScoreQuery evaluation (PayloadScoreQuery.java:185-235
    PayloadSpans.collectLeaf + PayloadSpanScorer.scoreCurrentDoc):
    span stream batched as usual; per matched span, every leaf-term
    occurrence inside [start, end) contributes its float32 payload
    (missing payload -> 1.0, the FLOAT_DECODER null convention); per doc
    the payloads fold through Min/Max/Sum/AveragePayloadFunction (float32
    accumulation in collection order, docScore default 1 when none seen);
    final score = f32(span_score * factor) under include_span_score, else
    the factor alone."""
    span = node["span"]
    cand = _span_docs(span, seg)
    if len(cand) == 0:
        return _EMPTY_I, _EMPTY_F
    di, s, e = _seg_span_stream(span, seg, cand)
    if len(di) == 0:
        return _EMPTY_I, _EMPTY_F
    # leaf occurrence stream with payloads, sorted by packed (doc, pos)
    key_parts, pay_parts = [], []
    for key in node["leaves"]:
        p = seg.positions(tuple(key))
        if p is None:
            continue
        docs_i, freqs_i, starts_i, pos_i = p
        sub = cand[np.isin(cand, docs_i, assume_unique=True)]
        if len(sub) == 0:
            continue
        j = np.searchsorted(docs_i, sub)
        cnt = freqs_i[j].astype(np.int64)
        take = _run_take(starts_i[j], cnt)
        didx = np.repeat(np.searchsorted(cand, sub), cnt)
        key_parts.append(didx * _POS_SHIFT + pos_i[take].astype(np.int64))
        pv = seg.payloads(tuple(key))
        pay_parts.append(
            pv[take].astype(F32) if pv is not None
            else np.ones(len(take), dtype=F32)
        )
    if not key_parts:
        return _EMPTY_I, _EMPTY_F
    keys = np.concatenate(key_parts)
    pays = np.concatenate(pay_parts)
    order = np.argsort(keys, kind="stable")
    keys, pays = keys[order], pays[order]
    lo = np.searchsorted(keys, di * _POS_SHIFT + s, side="left")
    hi = np.searchsorted(keys, di * _POS_SHIFT + e, side="left")
    cnts = (hi - lo).astype(np.int64)
    cov = _run_take(lo, cnts)  # collection order: span order, then position
    span_doc = np.repeat(di, cnts)
    vals = pays[cov]
    D = len(cand)
    seen = np.bincount(span_doc, minlength=D)
    factor = np.ones(D, dtype=F32)
    hasp = seen > 0
    if node["func"] in ("sum", "avg"):
        sums = np.zeros(D, dtype=F32)
        np.add.at(sums, span_doc, vals)  # float32, collection order
        if node["func"] == "sum":
            factor[hasp] = sums[hasp]
        else:
            factor[hasp] = (sums[hasp] / seen[hasp].astype(F32)).astype(F32)
    elif node["func"] == "min":
        mins = np.full(D, np.inf, dtype=F32)
        np.minimum.at(mins, span_doc, vals)
        factor[hasp] = mins[hasp]
    else:  # max
        maxs = np.full(D, -np.inf, dtype=F32)
        np.maximum.at(maxs, span_doc, vals)
        factor[hasp] = maxs[hasp]
    # docs with >= 1 span; span freq scores like SpanScorer
    u, counts = np.unique(di, return_counts=True)
    docs = cand[u]
    if node["include"]:
        norms = _span_norms(node, seg, docs)
        span_scores = _score_postings(
            node, counts.astype(np.float64), norms, cache
        )
        out = (span_scores * factor[u]).astype(F32)
    else:
        out = factor[u]
    return docs, out.astype(np.float64)


def _sloppy_freq(term_pos: list, slop: int, repeat_groups: tuple = ()) -> float:
    """SCALAR CONTRACT REFERENCE (the engine runs the batched twin
    _batched_sloppy; equivalence pinned by tests/test_sloppy_phrase.py::
    test_batched_sloppy_equals_scalar — change semantics HERE first).

    Sloppy phrase freq = Σ 1/(distance+1) over greedy minimal windows
    (model: search/SloppyPhraseMatcher.java + PhraseScorer sloppyFreq
    1/(slop-distance+1)-family; we use Lucene's 1/(1+matchLength) form).

    CONTRACT (pinned by tests/test_sloppy_phrase.py's independent
    reference implementation):
    - an alignment picks one occurrence per phrase slot; its distance is
      max(adjusted pos) - min(adjusted pos) with adjusted = raw - slot;
      valid when distance <= slop;
    - slots that repeat the same term must align to DISTINCT token
      occurrences (SloppyPhraseMatcher.java repeat handling — "a b a"
      cannot match a single 'a'); ties advance the LATER slot;
    - windows are consumed greedily left-to-right without reusing
      occurrences (two-pointer over the merged position lists)."""
    n = len(term_pos)
    idx = [0] * n
    total = 0.0
    while all(idx[i] < len(term_pos[i]) for i in range(n)):
        # repeats: same-term slots must sit on distinct raw positions, in
        # slot order — advance the later slot past collisions
        # (raw = adjusted + slot)
        for group in repeat_groups:
            for gi in range(1, len(group)):
                a, b = group[gi - 1], group[gi]
                while (
                    idx[b] < len(term_pos[b])
                    and term_pos[b][idx[b]] + b <= term_pos[a][idx[a]] + a
                ):
                    idx[b] += 1
                if idx[b] >= len(term_pos[b]):
                    return total
        vals = [term_pos[i][idx[i]] for i in range(n)]
        lo_i = min(range(n), key=lambda i: vals[i])
        dist = int(max(vals) - vals[lo_i])
        if dist <= slop:
            total += 1.0 / (1.0 + dist)
            # consume every occurrence in this window
            for i in range(n):
                idx[i] += 1
        else:
            idx[lo_i] += 1  # advance the lagging term
    return total


# --------------------------------------------------------------------------
# top-k selection with reference tie-break: score desc, docID asc
# (search/HitQueue.java:76-81)
# --------------------------------------------------------------------------

def top_k(docs: np.ndarray, scores64: np.ndarray, k: int):
    """Returns (docs, scores float32) of the top k."""
    scores = scores64.astype(F32)
    if len(docs) == 0:
        return docs, scores
    if len(docs) > k * 4:
        # pre-prune before the exact sort: keep every doc scoring >= the
        # kth-largest score (ties included so docID tie-break stays exact)
        kth = np.partition(scores, len(scores) - k)[len(scores) - k]
        keep = scores >= kth
        docs, scores = docs[keep], scores[keep]
    order = np.lexsort((docs, -scores))
    return docs[order][:k], scores[order][:k]


def apply_live(docs: np.ndarray, scores64: np.ndarray, deleted):
    """Live-docs mask (Lucene liveDocs bitset; LeafReader.getLiveDocs):
    `deleted` is a sorted int64 array of tombstoned local docIDs."""
    if deleted is None or len(deleted) == 0 or len(docs) == 0:
        return docs, scores64
    keep = ~np.isin(docs, deleted, assume_unique=True)
    return docs[keep], scores64[keep]


def apply_after(docs: np.ndarray, scores64: np.ndarray, after, doc_base: int):
    """searchAfter(ScoreDoc) paging filter (IndexSearcher.java:391-420,
    TopScoreDocCollector.java:95-158): keep hits strictly after the
    (score, global docID) mark in (score desc, docID asc) order. Compared
    in float32 — the reported score dtype — so page boundaries are exact."""
    if after is None:
        return docs, scores64
    a_score, a_gdoc = after
    s32 = scores64.astype(F32)
    a32 = F32(a_score)
    keep = (s32 < a32) | ((s32 == a32) & (docs + doc_base > a_gdoc))
    return docs[keep], scores64[keep]


def score_exhaustive(plan: dict, seg: SegmentData, cache: np.ndarray, k: int,
                     after=None, doc_base: int = 0, deleted=None):
    docs, scores64 = eval_node(plan, seg, cache)
    docs, scores64 = apply_live(docs, scores64, deleted)
    docs, scores64 = apply_after(docs, scores64, after, doc_base)
    total = len(docs)
    d, s = top_k(docs, scores64, k)
    return d, s, total, "EQUAL_TO"


# --------------------------------------------------------------------------
# block-max WAND (flat disjunction / single term / flat top-level of terms)
# --------------------------------------------------------------------------

# Sims whose per-posting score is STRICTLY positive (given a positive
# weight/boost) and monotone ↑freq / ↓dl — the preconditions for scoring
# the stored (block_max_freq, block_min_norm) impacts through the sim to
# get a valid window upper bound (Lucene's generic
# SimScorer.score(maxFreq, minNorm) impacts shortcut, ImpactsDISI).
# lmd/dfi clamp to 0 (zero-score matches ⇒ UB-0 windows would be pruned,
# dropping legitimate hits) — they stay exhaustive.
_WAND_SAFE_SIMS = frozenset({"classic", "boolean", "lmjm", "dfr_inl2", "ib_ll", "f2exp"})


def _spec_wand_ok(spec: dict) -> bool:
    if spec["name"] == "multi":
        # a float32 sum of per-member monotone positive scores is
        # monotone positive — safe iff every member is
        return all(_spec_wand_ok(sub) for sub in spec["specs"])
    return spec["name"] in _WAND_SAFE_SIMS


def _sim_wand_ok(node: dict) -> bool:
    spec = node.get("sim")
    return spec is None or _spec_wand_ok(spec)


def _dismax_wandable(node: dict) -> bool:
    """A DisjunctionMax node prunes when every alternative is a term
    under a WAND-safe similarity and 0 <= tie <= 1: the per-doc combiner
    f(s) = (1-tie)*max(s) + tie*sum(s) is then monotone non-decreasing
    in every member score, so member block UBs bound the group
    (WANDScorer.java handles DisjunctionMax the same way — its leaf
    maxScore just folds through the combiner)."""
    return (
        node["type"] == "dismax"
        and 0.0 <= float(node["tie"]) <= 1.0
        and all(sub["type"] == "term" and _sim_wand_ok(sub)
                for sub in node["nodes"])
    )


def _clause_wandable(node: dict) -> bool:
    if node["type"] in ("term", "synonym"):
        return _sim_wand_ok(node)
    return _dismax_wandable(node)


def wand_applicable(plan: dict) -> bool:
    """Flat term/dismax queries run under block-max pruning: pure
    disjunctions (WANDScorer.java), conjunctions / MUST+SHOULD mixes
    (BlockMaxConjunctionScorer.java, Boolean2ScorerSupplier.java:156-193),
    and DisjunctionMax-of-terms clauses (the eDisMax per-word shape) —
    a dismax group's window UB is (1-tie)*max + tie*sum of its members'
    window UBs, valid because the combiner is monotone per member.
    MUST_NOT / minShouldMatch>1 / deeper nesting use the exhaustive path.
    Non-default similarities prune too, with window UBs scored through the
    sim itself (monotone ↑freq/↓dl ⇒ impacts bound every doc in the
    block) — except zero-clamping sims (lmd/dfi), which stay exhaustive."""
    if plan["type"] in ("term", "synonym"):
        # synonym prunes too: window UBs from MERGED impacts — per window
        # sum of member max-freqs scored against the member-min norm
        # (SynonymQuery's impact merging, ImpactsMergingUtils analog)
        return _sim_wand_ok(plan)
    if plan["type"] == "dismax":
        return _dismax_wandable(plan)
    if plan["type"] == "bool":
        if any(not _clause_wandable(cl["node"]) for cl in plan["clauses"]):
            return False
        occurs = {cl["occur"] for cl in plan["clauses"]}
        # FILTER is excluded: it matches with score 0, but window upper
        # bounds come only from SCORING clauses — UB-0 windows holding
        # FILTER-only matches would be pruned, dropping legitimate
        # zero-score hits. FILTER shapes take the exhaustive path.
        if not occurs <= {"MUST", "SHOULD"}:
            return False
        has_must = "MUST" in occurs
        return plan["msm"] == 0 if has_must else plan["msm"] <= 1
    return False


def _wand_groups(plan: dict):
    """[(required, scoring, mode, param, [((field, term), node), ...])] —
    one group per clause. mode "dismax" combines member SCORES under
    param = tie ((1-tie)·max + tie·sum; a plain term is the tie-0
    singleton degenerate); mode "syn" merges member IMPACTS (freqs sum,
    norms agree) and scores ONCE through param = the synonym node
    (SynonymQuery.java impact merging). required: conjunction member
    (MUST/FILTER); scoring: contributes to the sum (not FILTER)."""
    def entry(nd):
        return (_node_key(nd, nd["term"]), nd)

    def syn_group(required, scoring, nd):
        members = [(_node_key(nd, t), nd) for t in nd["terms"]]
        return (required, scoring, "syn", nd, members)

    if plan["type"] == "term":
        return [(False, True, "dismax", 0.0, [entry(plan)])]
    if plan["type"] == "dismax":
        return [(False, True, "dismax", float(plan["tie"]),
                 [entry(sub) for sub in plan["nodes"]])]
    if plan["type"] == "synonym":
        return [syn_group(False, True, plan)]
    out = []
    for cl in plan["clauses"]:
        nd = cl["node"]
        required = cl["occur"] in ("MUST", "FILTER")
        scoring = cl["occur"] != "FILTER"
        if nd["type"] == "dismax":
            out.append((required, scoring, "dismax", float(nd["tie"]),
                        [entry(sub) for sub in nd["nodes"]]))
        elif nd["type"] == "synonym":
            out.append(syn_group(required, scoring, nd))
        else:
            out.append((required, scoring, "dismax", 0.0, [entry(nd)]))
    return out


def _wand_weight_positive(node: dict) -> bool:
    """True iff every posting of this node scores STRICTLY > 0 — the
    safety condition for pruning UB-0 windows. BM25: weight > 0 (idf > 0
    always; boost can zero it). classic: qw > 0 (norm table positive).
    boolean/lmjm/dfr/ib: positive boost ⇒ positive score (log of >1)."""
    spec = node.get("sim")
    if spec is None:
        return node["weight"] > 0
    return _spec_positive(spec)


def _spec_positive(spec: dict) -> bool:
    if spec["name"] == "multi":
        # every safe sub-sim scores >= 0; ONE strictly positive member
        # makes the float32 sum strictly positive
        return any(_spec_positive(sub) for sub in spec["specs"])
    if spec["name"] == "classic":
        return spec["qw"] > 0
    return spec["boost"] > 0


def score_wand(plan: dict, seg: SegmentData, cache: np.ndarray, k: int,
               window: int = 4096, after=None, doc_base: int = 0, deleted=None):
    """Block-max pruned top-k — identical results to score_exhaustive.

    Doc space is cut into fixed windows; each window's UB = Σ_t max UB of
    the blocks of t overlapping it (from stored impacts). Windows are
    visited in UB-descending order; once θ (kth score so far) ≥ next UB,
    the remaining windows can never contribute — stop (MaxScore/BMW hybrid,
    safe because UB bounds every doc score in the window).
    """
    groups = _wand_groups(plan)
    if groups is None or any(
        not _wand_weight_positive(nd)
        for req, sc, mode, param, members in groups if sc
        for _, nd in members
    ):
        # zero-weight scoring terms (boost 0) produce UB-0 windows whose
        # legitimate zero-score matches pruning would drop — exhaustive
        return score_exhaustive(
            plan, seg, cache, k, after=after, doc_base=doc_base, deleted=deleted
        )
    n_win = max(1, -(-seg.n_docs // window))
    win_ub = np.zeros(n_win, dtype=np.float64)
    group_info = []
    for required, scoring, mode, param, members in groups:
        present = []
        # dismax accumulators (scored member UBs)
        gmax = gsum = None
        # synonym accumulators (merged impacts: Σ max-freq, min norm)
        fsum = nmin = None
        gcov = None
        for key, node in members:
            r = seg.rows.get(key)
            if r is None:
                continue
            blk_last = np.asarray(r.block_last_doc, dtype=np.int64)
            blk_maxf = np.asarray(r.block_max_freq, dtype=np.int64)
            blk_minn = np.asarray(r.block_min_norm, dtype=np.int64)
            # block b covers (blk_last[b-1], blk_last[b]] → window range
            blk_first = np.concatenate(([0], blk_last[:-1] + 1))
            w_lo = blk_first // window
            w_hi = blk_last // window
            covered = np.zeros(n_win, dtype=bool)
            covered[w_lo] = True
            covered[w_hi] = True
            span = w_hi - w_lo - 1  # interior windows of blocks spanning >= 3
            m = span > 0
            interior = (
                _run_take((w_lo + 1)[m], span[m]) if m.any() else None
            )
            if interior is not None:
                covered[interior] = True

            def scatter(vals, init, op):
                # per-term per-window reduce over block values — vectorized
                # scatter over window endpoints + (rare) interiors: a hot
                # term's ~78k blocks/segment must not become a Python loop
                out = np.full(n_win, init, dtype=np.float64)
                op(out, w_lo, vals)
                op(out, w_hi, vals)
                if interior is not None:
                    op(out, interior, np.repeat(vals[m], span[m]))
                return out

            if mode == "dismax":
                # UB scored through the node's OWN similarity over the
                # impact pair (max freq, min norm): valid because every
                # supported sim is monotone ↑freq/↓dl and float-rounded
                # compositions of monotone ops stay monotone
                # (SimScorer.score(maxFreq, minNorm) analog)
                ub = _score_postings(node, blk_maxf, blk_minn, cache).astype(
                    np.float64
                )
                tmax = scatter(ub, 0.0, np.maximum.at)
                if gmax is None:
                    gmax, gsum = tmax.copy(), tmax.copy()
                else:
                    np.maximum(gmax, tmax, out=gmax)
                    gsum += tmax
            else:  # "syn": merge impacts, score once afterwards
                tf_w = scatter(blk_maxf.astype(np.float64), 0.0, np.maximum.at)
                tn_w = scatter(blk_minn.astype(np.float64), 255.0, np.minimum.at)
                if fsum is None:
                    fsum, nmin = tf_w.copy(), tn_w.copy()
                else:
                    fsum += tf_w
                    np.minimum(nmin, tn_w, out=nmin)
            present.append((key, node, r))
            gcov = covered.copy() if gcov is None else (gcov | covered)
        if not present:
            if required:
                # a MUST group with no member in the segment ⇒ no matches
                return _EMPTY_I, np.empty(0, dtype=F32), 0, "EQUAL_TO"
            continue
        if scoring:
            if mode == "dismax":
                # group window UB = (1-tie)*max + tie*sum of member UBs —
                # monotone combiner, so it bounds every doc in the window
                win_ub += gmax + param * (gsum - gmax)
            else:
                # merged-impacts UB: Σ member max-freqs scored against the
                # member-min norm bounds every doc's summed-freq score
                # (freq-monotone ↑, dl-monotone ↓)
                gub = _score_postings(
                    param, fsum.astype(np.int64), nmin.astype(np.int64), cache
                ).astype(np.float64)
                gub[~gcov] = 0.0
                win_ub += gub
        if required:
            # conjunction member: windows where NO member has a block can
            # never match (BlockMaxConjunctionScorer lead-iterator skip)
            win_ub[~gcov] = 0.0
        group_info.append((required, scoring, mode, param, present))
    if not group_info:
        return _EMPTY_I, np.empty(0, dtype=F32), 0, "EQUAL_TO"

    order = np.argsort(-win_ub, kind="stable")
    best_docs = _EMPTY_I
    best_scores = np.empty(0, dtype=F32)
    theta = -np.inf
    total = 0
    pruned = False
    for w in order:
        if win_ub[w] <= 0:
            pruned = True
            break
        # strict <: a window whose UB equals θ may still hold an equal-score
        # doc with a SMALLER docID, which wins the tie-break (HitQueue.java)
        if len(best_docs) >= k and win_ub[w] < theta:
            pruned = True
            break
        lo_doc, hi_doc = w * window, (w + 1) * window
        # gather (doc, score) within this window across groups
        req_parts, opt_parts = [], []
        window_dead = False
        for required, scoring, mode, param, present in group_info:
            if mode == "syn":
                # merge member impacts inside the window, score ONCE —
                # the same unique + freq-sum ops as the exhaustive
                # synonym eval, so WAND stays bit-identical
                mdocs, mfreqs, mnorms = [], [], []
                for key, node, r in present:
                    docs, freqs, norms = seg.postings(key)
                    a = np.searchsorted(docs, lo_doc)
                    b = np.searchsorted(docs, hi_doc)
                    if a == b:
                        continue
                    mdocs.append(docs[a:b])
                    mfreqs.append(freqs[a:b])
                    mnorms.append(norms[a:b])
                if not mdocs:
                    if required:
                        window_dead = True
                        break
                    continue
                alld = np.concatenate(mdocs)
                dd, inv = np.unique(alld, return_inverse=True)
                fr = np.zeros(len(dd), dtype=np.int64)
                np.add.at(fr, inv, np.concatenate(mfreqs))
                nr = np.zeros(len(dd), dtype=np.int64)
                nr[inv] = np.concatenate(mnorms)  # same doc ⇒ same norm
                if scoring:
                    sgrp = _score_postings(param, fr, nr, cache).astype(
                        np.float64
                    )
                else:
                    sgrp = np.zeros(len(dd), dtype=np.float64)
                (req_parts if required else opt_parts).append((dd, sgrp))
                continue
            mdocs, mscores = [], []
            for key, node, r in present:
                docs, freqs, norms = seg.postings(key)
                a = np.searchsorted(docs, lo_doc)
                b = np.searchsorted(docs, hi_doc)
                if a == b:
                    continue
                dd = docs[a:b]
                if scoring:
                    sc = _score_postings(
                        node, freqs[a:b], norms[a:b], cache
                    ).astype(np.float64)
                else:
                    sc = np.zeros(len(dd), dtype=np.float64)  # FILTER: no score
                mdocs.append(dd)
                mscores.append(sc)
            if not mdocs:
                if required:
                    window_dead = True
                    break
                continue
            if len(mdocs) == 1:
                dd, sgrp = mdocs[0], mscores[0]
            else:
                # dismax combine inside the window — the same unique +
                # scatter max/sum ops as _eval_dismax, so WAND stays
                # bit-identical to the exhaustive path
                alld = np.concatenate(mdocs)
                alls = np.concatenate(mscores)
                dd, inv = np.unique(alld, return_inverse=True)
                mx = np.zeros(len(dd), dtype=np.float64)
                np.maximum.at(mx, inv, alls)
                sm = np.zeros(len(dd), dtype=np.float64)
                np.add.at(sm, inv, alls)
                sgrp = mx + param * (sm - mx)
            (req_parts if required else opt_parts).append((dd, sgrp))
        if window_dead or (not req_parts and not opt_parts):
            continue
        if req_parts:
            # conjunction inside the window: leapfrog = sorted intersect
            docs_u = req_parts[0][0]
            for dd, _ in req_parts[1:]:
                docs_u = docs_u[np.isin(docs_u, dd, assume_unique=True)]
            if len(docs_u) == 0:
                continue
            ssum = np.zeros(len(docs_u), dtype=np.float64)
            for dd, s in req_parts:
                ssum += s[np.searchsorted(dd, docs_u)]
            for dd, s in opt_parts:
                m = np.isin(docs_u, dd, assume_unique=True)
                ssum[m] += s[np.searchsorted(dd, docs_u[m])]
        else:
            alld = np.concatenate([dd for dd, _ in opt_parts])
            alls = np.concatenate([s for _, s in opt_parts])
            docs_u, inv = np.unique(alld, return_inverse=True)
            ssum = np.zeros(len(docs_u), dtype=np.float64)
            np.add.at(ssum, inv, alls)
        docs_u, ssum = apply_live(docs_u, ssum, deleted)
        docs_u, ssum = apply_after(docs_u, ssum, after, doc_base)
        total += len(docs_u)
        cd = np.concatenate((best_docs, docs_u))
        cs = np.concatenate((best_scores.astype(np.float64), ssum))
        best_docs, best_scores = top_k(cd, cs, k)
        if len(best_docs) >= k:
            theta = float(best_scores[-1])
    relation = "GREATER_THAN_OR_EQUAL_TO" if pruned else "EQUAL_TO"
    return best_docs, best_scores, total, relation
