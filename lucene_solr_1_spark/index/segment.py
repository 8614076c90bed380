"""Partition-local segment construction — pure pandas/NumPy (no Spark).

This is the DWPT analog: each Spark input partition independently inverts
its documents into one immutable segment (SURVEY.md §2.3;
index/DocumentsWriterPerThread.java, index/TermsHashPerField.java:147-185,
index/FreqProxTermsWriter.java:69-103, Lucene50PostingsWriter.java:207-380).
The inversion is a vectorized sort + run-length pass instead of a per-doc
hash insert; encoding produces our own FOR-block format (kernels/forcodec).

Multi-field data model (document/Field.java, index/FieldInfos.java): the
`content` field is analyzed (TextField analog — positions + freqs + norms);
the metadata columns (repo, path, commit, lang) are indexed as atomic
single-term-per-doc keyword fields (StringField analog — not analyzed,
freq 1, dl 1), so field-qualified queries (`lang:python`) and metadata
FILTER clauses run on the same postings kernel as scored text queries.
"""

from __future__ import annotations

import hashlib
import time

import numpy as np
import pandas as pd

from ..kernels.analyzer import AnalyzerConfig, STANDARD, _TOKEN_RE, flatten_tokens
from ..kernels.forcodec import BLOCK_SIZE, encode_blocks, encode_doc_deltas
from ..kernels.smallfloat import int_to_byte4

DOC_KEY = ["repo", "path", "commit"]

# StringField-analog keyword fields indexed alongside `content`
# (document/Field.java Store.YES + StringField; index/FieldInfos.java).
KEYWORD_FIELDS = ("repo", "path", "commit", "lang")
CONTENT_FIELD = "content"

POSTINGS_COLS = [
    "field", "term", "doc_freq", "ttf",
    "docs_enc", "docs_offsets", "freqs_enc", "freqs_offsets",
    "pos_enc", "pos_offsets", "norms_enc",
    "block_last_doc", "block_max_freq", "block_min_norm",
    "pay_enc",
]


def content_sha(texts: pd.Series) -> pd.Series:
    """Per-row sha256 hex of content — the ingest invariant
    (BASELINE.json input_hint); equals Spark's sha2(content, 256)."""
    return texts.fillna("").map(lambda t: hashlib.sha256(t.encode("utf-8")).hexdigest())


def _enc8_batch(vals: np.ndarray) -> list[bytes]:
    """Vectorized single-value ALL_EQUAL block encodings: for each v,
    the exact bytes encode_blocks([v]) produces — [count-1=0][255][v le8]."""
    n = len(vals)
    arr = np.empty((n, 10), dtype=np.uint8)
    arr[:, 0] = 0
    arr[:, 1] = 255
    arr[:, 2:] = vals.astype("<u8").view(np.uint8).reshape(n, 8)
    flat = arr.tobytes()
    return [flat[i * 10:(i + 1) * 10] for i in range(n)]


def _invert_rows(
    field: str,
    terms: np.ndarray,
    doc_ids: np.ndarray,
    positions: np.ndarray,
    norms_by_doc: np.ndarray,
    payloads: np.ndarray | None = None,
) -> list[tuple]:
    """Invert one field's flattened token stream into posting rows.

    Input: parallel arrays (term, doc, position) + per-doc norm bytes.
    Output: one tuple per distinct term in POSTINGS_COLS order — sorted
    terms (UTF-8 order via pd.factorize(sort=True), the BytesRef term
    order), delta-encoded doc/pos streams, per-block skip + impact
    metadata (CompetitiveImpactAccumulator simplified to one competitive
    pair (max_freq, min_norm) per block — a valid, slightly looser
    upper bound for block-max WAND)."""
    if len(terms) == 0:
        return []
    codes, uniq_terms = pd.factorize(pd.Series(terms), sort=True)
    order = np.lexsort((positions, doc_ids, codes))
    c, d, p = codes[order], doc_ids[order], positions[order]
    # payload stream rides parallel to positions (the .pay alignment):
    # pay[i] is the float32 payload of occurrence i in stream order
    pay = payloads[order].astype("<f4") if payloads is not None else None

    # run-length over (term, doc): one posting per run
    pair_start = np.flatnonzero(
        np.concatenate(([True], (c[1:] != c[:-1]) | (d[1:] != d[:-1])))
    )
    pair_end = np.concatenate((pair_start[1:], [len(c)]))
    pair_term = c[pair_start]
    pair_doc = d[pair_start]
    pair_freq = (pair_end - pair_start).astype(np.int64)

    # position deltas within each (term, doc) run (prox deltas,
    # FreqProxTermsWriterPerField.java:79-96 semantics, our encoding)
    prev = np.concatenate(([0], p[:-1]))
    is_run_start = np.zeros(len(p), dtype=bool)
    is_run_start[pair_start] = True
    pos_delta = np.where(is_run_start, p, p - prev)

    # term boundaries over pairs
    term_start = np.flatnonzero(
        np.concatenate(([True], pair_term[1:] != pair_term[:-1]))
    )
    term_end = np.concatenate((term_start[1:], [len(pair_term)]))

    # singleton fast path: a term with ONE posting of freq 1 (the Zipf
    # tail of content terms + unique keyword values like path/commit)
    # always encodes to the fixed 10-byte ALL_EQUAL block [0, 255, v_le8]
    # — build those byte strings vectorized instead of calling
    # encode_blocks 4x per term (the round-1 verdict's per-term row loop).
    is_single = (term_end - term_start) == 1
    is_single &= pair_freq[term_start] == 1
    sel = np.flatnonzero(is_single)
    fast_j = {int(k): j for j, k in enumerate(sel)}
    if len(sel):
        ts_sel = term_start[sel]
        s_docs = pair_doc[ts_sel]
        s_pos = p[pair_start[ts_sel]]  # run start: absolute position
        s_docs_b = _enc8_batch(s_docs)
        s_pos_b = _enc8_batch(s_pos)
        s_norms = norms_by_doc[s_docs].astype(np.uint8)
        s_norm_flat = s_norms.tobytes()
        s_pay_flat = (
            pay[pair_start[ts_sel]].tobytes() if pay is not None else b""
        )
    _FREQ1 = b"\x00\xff" + (1).to_bytes(8, "little")

    rows = []
    for k, (ts, te) in enumerate(zip(term_start, term_end)):
        j = fast_j.get(k)
        if j is not None:
            rows.append(
                (
                    field,
                    uniq_terms[pair_term[ts]],
                    1, 1,
                    s_docs_b[j], [0], _FREQ1, [0], s_pos_b[j], [0],
                    s_norm_flat[j:j + 1],
                    [int(s_docs[j])], [1], [int(s_norms[j])],
                    s_pay_flat[4 * j:4 * j + 4] if pay is not None else b"",
                )
            )
            continue
        docs = pair_doc[ts:te]
        freqs = pair_freq[ts:te]
        docs_enc, docs_off = encode_doc_deltas(docs)
        freqs_enc, freqs_off = encode_blocks(freqs)
        # flattened position-delta stream across this term's occurrences
        occ_lo, occ_hi = pair_start[ts], pair_end[te - 1]
        pos_enc, pos_off = encode_blocks(pos_delta[occ_lo:occ_hi])
        # norm byte per posting doc (schemas.py norms_enc rationale)
        doc_norms = norms_by_doc[docs]
        n_pairs = len(docs)
        blk_idx = np.arange(0, n_pairs, BLOCK_SIZE)
        blk_last = docs[np.minimum(blk_idx + BLOCK_SIZE - 1, n_pairs - 1)]
        blk_maxf = np.maximum.reduceat(freqs, blk_idx)
        blk_minn = np.minimum.reduceat(doc_norms, blk_idx)
        rows.append(
            (
                field,
                uniq_terms[pair_term[ts]],
                int(te - ts),
                int(freqs.sum()),
                docs_enc, docs_off.tolist(),
                freqs_enc, freqs_off.tolist(),
                pos_enc, pos_off.tolist(),
                doc_norms.astype(np.uint8).tobytes(),
                blk_last.tolist(), blk_maxf.tolist(), blk_minn.tolist(),
                pay[occ_lo:occ_hi].tobytes() if pay is not None else b"",
            )
        )
    return rows


def _token_span_columns(content_s: pd.Series) -> tuple[list, list]:
    """Per-doc character spans of every RAW token (pre-filter, aligned
    with postings positions), as little-endian int32 byte blobs — the
    offsets payload (Lucene IndexOptions ..._AND_OFFSETS analog; stored
    per DOC in the docmap instead of per posting in a .pay stream, the
    columnar equivalent). Spans are computed on the ORIGINAL stored
    content (\\w matches both cases, so boundaries equal the lowered
    text's for any case-preserving script) — offsets index straight into
    the stored `content` column."""
    starts_col, ends_col = [], []
    for text in content_s:
        spans = [m.span() for m in _TOKEN_RE.finditer(text)]
        a = np.asarray(spans, dtype=np.int32).reshape(-1, 2)
        starts_col.append(a[:, 0].tobytes())
        ends_col.append(a[:, 1].tobytes())
    return starts_col, ends_col


def build_segment_frames(
    pdf: pd.DataFrame, cfg: AnalyzerConfig = STANDARD,
    store_offsets: bool = False,
    presorted: bool = False,
    store_payloads: bool = False,
) -> tuple[pd.DataFrame, pd.DataFrame, dict]:
    """Invert one partition of corpus rows into (postings, norms) frames.

    Rows are sorted by (repo, path, commit) so per-segment docIDs are
    deterministic for any partitioning (SURVEY.md §7 'hard parts' (5)).
    `presorted=True` keeps the CALLER's row order as the docID order —
    the index-sort path (IndexSorter), where the builder already sorted
    by (sort value, doc key).

    `store_offsets=True` additionally stores per-doc token character
    spans (off_starts/off_ends docmap columns) so highlighting can cut
    snippets WITHOUT re-tokenizing stored content — opt-in, like the
    reference's offsets IndexOption (costs ~1.4x tokenization time and
    8 bytes/token of storage).
    """
    t0 = time.monotonic()
    if (cfg.word_delimiter or cfg.html_strip
            or getattr(cfg, "char_filters", ())
            or getattr(cfg, "token_pattern", "")
            # synonym graph flatten RENUMBERS positions and multi-word
            # insertion EXTENDS them past the raw token count, so the
            # per-raw-token offset/payload arrays no longer align
            # (stacked-injection chains — phonetic/stem_keep/compound/
            # common_grams — keep positions within the raw range and
            # stay aligned)
            or getattr(cfg, "synonyms", ())
            # the CJK bigram expansion renumbers positions over the
            # expanded stream (a run's width != its raw token count)
            or getattr(cfg, "cjk_bigram", 0)) and (
            store_offsets or store_payloads):
        # offsets/payloads align 1:1 with RAW token positions in the
        # ORIGINAL content; the word-delimiter graph renumbers positions
        # and the HTML char filter changes the character stream, so these
        # IndexOptions are mutually exclusive with them (the reference
        # pairs these filters with offset-correction state we don't store)
        raise ValueError(
            "word_delimiter/html_strip/char_filters/token_pattern/"
            "synonyms/cjk_bigram analyzers do not support "
            "store_offsets/store_payloads"
        )
    if not presorted:
        pdf = pdf.sort_values(DOC_KEY, kind="mergesort").reset_index(drop=True)
    n_docs = len(pdf)
    pay_tok = None
    if store_payloads:
        # DelimitedPayloadTokenFilter at index time: strip `tok|<float>`
        # annotations, record a float32 per RAW token position (default
        # 1.0 = the null-payload convention). The CLEAN text is what gets
        # analyzed, stored and sha'd — payloads are metadata, not content.
        from ..kernels.analyzer import parse_delimited_payloads

        cleaned, pay_docs = [], []
        for text in pdf["content"].fillna(""):
            c, pv = parse_delimited_payloads(text)
            cleaned.append(c)
            pay_docs.append(pv)
        pdf = pdf.assign(content=pd.Series(cleaned, index=pdf.index))
        pay_flat = (
            np.concatenate(pay_docs) if pay_docs else np.empty(0, dtype=np.float32)
        )
        pay_counts = np.asarray([len(v) for v in pay_docs], dtype=np.int64)
        pay_doc_off = np.cumsum(pay_counts) - pay_counts
    terms, doc_ids, positions, doc_len = flatten_tokens(pdf["content"], cfg)
    if store_payloads:
        # payload of each KEPT token = its raw position's entry
        pay_tok = pay_flat[pay_doc_off[doc_ids] + positions] if len(terms) else (
            np.empty(0, dtype=np.float32)
        )
    norms = int_to_byte4(doc_len)
    content_s = pdf["content"].fillna("")

    norms_pdf = pd.DataFrame(
        {
            "doc_id": np.arange(n_docs, dtype=np.int64),
            "norm": norms.astype(np.int64),
            "dl": doc_len,
            "n_chars": content_s.str.len().to_numpy(dtype=np.int64)
            if n_docs
            else np.empty(0, dtype=np.int64),
            "repo": pdf["repo"].to_numpy(),
            "path": pdf["path"].to_numpy(),
            "commit": pdf["commit"].to_numpy(),
            "lang": pdf["lang"].to_numpy(),
            "content_sha": content_sha(pdf["content"]).to_numpy(),
            "content": content_s.to_numpy(),
        }
    )
    if store_offsets:
        off_starts, off_ends = _token_span_columns(content_s)
        norms_pdf["off_starts"] = off_starts
        norms_pdf["off_ends"] = off_ends

    field_stats = {
        CONTENT_FIELD: {"sum_ttf": int(doc_len.sum()), "doc_count": int(n_docs)},
    }
    stats = {
        "doc_count": int(n_docs),
        "sum_ttf": int(doc_len.sum()),
        "min_key": "|".join(pdf.iloc[0][DOC_KEY]) if n_docs else "",
        "max_key": "|".join(pdf.iloc[-1][DOC_KEY]) if n_docs else "",
    }

    rows = _invert_rows(CONTENT_FIELD, terms, doc_ids, positions,
                        norms.astype(np.int64), payloads=pay_tok)
    content_postings = len(rows)

    # keyword fields: one atomic term per doc, freq 1, position 0, dl 1
    # (StringField: indexed, not analyzed, no norms → norm byte for dl=1)
    if n_docs:
        kw_doc_ids = np.arange(n_docs, dtype=np.int64)
        kw_pos = np.zeros(n_docs, dtype=np.int64)
        kw_norms = np.full(n_docs, int(int_to_byte4(np.asarray([1]))[0]),
                           dtype=np.int64)
        for kw in KEYWORD_FIELDS:
            vals = pdf[kw].fillna("").to_numpy(dtype=object)
            rows.extend(_invert_rows(kw, vals, kw_doc_ids, kw_pos, kw_norms))
            field_stats[kw] = {"sum_ttf": int(n_docs), "doc_count": int(n_docs)}

    if not rows:
        empty = pd.DataFrame({c: pd.Series(dtype=object) for c in POSTINGS_COLS})
        stats.update(
            distinct_terms=0, total_postings=0,
            build_wall_s=time.monotonic() - t0, field_stats=field_stats,
        )
        return empty, norms_pdf, stats

    postings_pdf = pd.DataFrame(rows, columns=POSTINGS_COLS)
    stats.update(
        distinct_terms=int(content_postings),
        total_postings=int(
            postings_pdf.loc[postings_pdf["field"] == CONTENT_FIELD, "doc_freq"].sum()
        ),
        build_wall_s=time.monotonic() - t0,
        field_stats=field_stats,
    )
    return postings_pdf, norms_pdf, stats


def segment_fingerprint(norms_pdf: pd.DataFrame) -> str:
    """Input fingerprint for resume: sha256 over the sorted row shas."""
    h = hashlib.sha256()
    for s in norms_pdf["content_sha"]:
        h.update(s.encode())
    return h.hexdigest()
