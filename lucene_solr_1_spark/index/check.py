"""CheckIndex analog — full-structure index verification
(index/CheckIndex.java; postings ↔ norms cross-check per LUCENE-8279).

Distributed: every posting row is decoded and validated in an Arrow UDF
(docID monotonicity, df/ttf consistency, position counts, block skip +
impact metadata); per-segment aggregates are then cross-checked against
the norms table and the manifest on the driver. Returns a report dict;
`errors` empty ⇔ index is sound.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import SparkSession, functions as F

from . import manifest as mf
from .builder import norms_paths, postings_paths

_ROW_DDL = (
    "segment_id string, field string, term string, err string, "
    "ttf bigint, max_doc bigint"
)


def _check_rows(batches):
    from ..kernels.forcodec import BLOCK_SIZE, decode_all

    for pdf in batches:
        out = []
        for r in pdf.itertuples(index=False):
            errs = []
            docs = np.cumsum(decode_all(bytes(r.docs_enc), np.asarray(r.docs_offsets)))
            freqs = decode_all(bytes(r.freqs_enc), np.asarray(r.freqs_offsets))
            pos = decode_all(bytes(r.pos_enc), np.asarray(r.pos_offsets))
            if len(docs) != r.doc_freq:
                errs.append(f"df={r.doc_freq} != decoded {len(docs)}")
            if len(freqs) != len(docs):
                errs.append("freqs length != docs length")
            if len(docs) and (np.diff(docs) <= 0).any():
                errs.append("docIDs not strictly ascending")
            if len(freqs) and (freqs < 1).any():
                errs.append("freq < 1")
            if int(freqs.sum()) != r.ttf:
                errs.append(f"ttf={r.ttf} != sum(freqs)={int(freqs.sum())}")
            if len(pos) != int(freqs.sum()):
                errs.append("position count != sum(freqs)")
            # skip/impact block metadata
            blk_idx = np.arange(0, len(docs), BLOCK_SIZE)
            blk_last = docs[np.minimum(blk_idx + BLOCK_SIZE - 1, len(docs) - 1)]
            if not np.array_equal(blk_last, np.asarray(r.block_last_doc)):
                errs.append("block_last_doc mismatch")
            blk_maxf = np.maximum.reduceat(freqs, blk_idx) if len(docs) else []
            if not np.array_equal(blk_maxf, np.asarray(r.block_max_freq)):
                errs.append("block_max_freq mismatch")
            norms = np.frombuffer(bytes(r.norms_enc), dtype=np.uint8)
            if len(norms) != len(docs):
                errs.append("norms_enc length != doc_freq")
            elif len(docs):
                blk_minn = np.minimum.reduceat(norms.astype(np.int64), blk_idx)
                if not np.array_equal(blk_minn, np.asarray(r.block_min_norm)):
                    errs.append("block_min_norm mismatch")
            out.append(
                (
                    r.segment_id,
                    r.field,
                    r.term,
                    "; ".join(errs),
                    int(freqs.sum()),
                    int(docs[-1]) if len(docs) else -1,
                )
            )
        yield pd.DataFrame(
            out,
            columns=["segment_id", "field", "term", "err", "ttf", "max_doc"],
        )


def check_index(spark: SparkSession, index_dir: str) -> dict:
    manifest = mf.read_manifest(index_dir)
    if manifest is None:
        return {"errors": ["no committed manifest"], "segments": 0}
    post = spark.read.parquet(*postings_paths(index_dir, manifest))
    checked = post.mapInPandas(_check_rows, schema=_ROW_DDL)
    # postings <-> norms ttf cross-check applies to the analyzed content
    # field; keyword fields have the separate one-term-per-doc invariant
    agg = (
        checked.where(F.col("field") == "content")
        .groupBy("segment_id")
        .agg(
            F.count("*").alias("terms"),
            F.sum("ttf").alias("sum_ttf"),
            F.max("max_doc").alias("max_doc"),
            F.sum(F.when(F.col("err") != "", 1).otherwise(0)).alias("bad_rows"),
            F.max(F.when(F.col("err") != "", F.concat_ws("/", "term", "err"))).alias(
                "first_err"
            ),
        )
        .toPandas()
        .set_index("segment_id")
    )
    kwagg = (
        checked.where(F.col("field") != "content")
        .groupBy("segment_id", "field")
        .agg(
            F.sum("ttf").alias("ttf"),
            F.sum(F.when(F.col("err") != "", 1).otherwise(0)).alias("bad_rows"),
            F.max(F.when(F.col("err") != "", F.concat_ws("/", "term", "err"))).alias(
                "first_err"
            ),
        )
        .toPandas()
    )
    norms = spark.read.parquet(*norms_paths(index_dir, manifest))
    nagg = (
        norms.groupBy("segment_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("dl").alias("sum_dl"),
            F.max("doc_id").alias("max_doc_id"),
            F.count_distinct("doc_id").alias("distinct_docs"),
        )
        .toPandas()
        .set_index("segment_id")
    )

    errors: list[str] = []
    if manifest.get("offsets"):
        # offsets IndexOption: every doc must carry span arrays with
        # start/end parity, non-negative monotone starts, end > start,
        # and at least dl entries (spans cover RAW tokens, dl counts the
        # post-filter subset) — all validated distributed
        if "off_starts" not in norms.columns:
            errors.append("manifest says offsets=true but docmap lacks span columns")
        else:
            def _check_offsets(batches):
                for pdf in batches:
                    rows = []
                    for r in pdf.itertuples(index=False):
                        errs = []
                        st = np.frombuffer(r.off_starts or b"", dtype=np.int32)
                        en = np.frombuffer(r.off_ends or b"", dtype=np.int32)
                        if len(st) != len(en):
                            errs.append("span start/end length mismatch")
                        elif len(st):
                            if (en <= st).any() or (st < 0).any():
                                errs.append("invalid span")
                            if (np.diff(st) <= 0).any():
                                errs.append("spans not ascending")
                        if len(st) < r.dl:
                            errs.append(f"{len(st)} spans < dl {r.dl}")
                        rows.append((r.segment_id, int(r.doc_id), "; ".join(errs)))
                    yield pd.DataFrame(rows, columns=["segment_id", "doc_id", "err"])

            bad = (
                norms.select("segment_id", "doc_id", "dl", "off_starts", "off_ends")
                .mapInPandas(_check_offsets,
                             schema="segment_id string, doc_id bigint, err string")
                .where(F.col("err") != "")
                .limit(5)
                .toPandas()
            )
            for r in bad.itertuples(index=False):
                errors.append(f"{r.segment_id}/doc {r.doc_id}: offsets {r.err}")
    for s in manifest["segments"]:
        sid = s["segment_id"]
        n = nagg.loc[sid] if sid in nagg.index else None
        if n is None:
            errors.append(f"{sid}: no norms rows")
            continue
        if int(n["n_docs"]) != s["doc_count"]:
            errors.append(f"{sid}: norms rows {n['n_docs']} != manifest doc_count {s['doc_count']}")
        if int(n["distinct_docs"]) != int(n["n_docs"]) or (
            s["doc_count"] and int(n["max_doc_id"]) != s["doc_count"] - 1
        ):
            errors.append(f"{sid}: docIDs not dense 0..{s['doc_count'] - 1}")
        if sid in agg.index:
            a = agg.loc[sid]
            if int(a["bad_rows"]) > 0:
                errors.append(f"{sid}: {a['bad_rows']} bad posting rows ({a['first_err']})")
            # postings ↔ norms cross-check (LUCENE-8279): total term freq
            # must equal the sum of exact field lengths
            if int(a["sum_ttf"]) != int(n["sum_dl"]):
                errors.append(f"{sid}: postings ttf {a['sum_ttf']} != norms sum_dl {n['sum_dl']}")
            if s["doc_count"] and int(a["max_doc"]) > s["doc_count"] - 1:
                errors.append(f"{sid}: posting docID {a['max_doc']} out of range")
        elif s["sum_ttf"]:
            errors.append(f"{sid}: no posting rows but manifest sum_ttf {s['sum_ttf']}")
        # keyword fields: exactly one atomic term posting per doc
        for kr in kwagg[kwagg["segment_id"] == sid].itertuples(index=False):
            if int(kr.bad_rows) > 0:
                errors.append(
                    f"{sid}: {kr.bad_rows} bad {kr.field} posting rows ({kr.first_err})"
                )
            if int(kr.ttf) != s["doc_count"]:
                errors.append(
                    f"{sid}: keyword field {kr.field} ttf {kr.ttf} != doc_count {s['doc_count']}"
                )
    total_ttf = int(agg["sum_ttf"].sum()) if len(agg) else 0
    if total_ttf != manifest["sum_ttf"]:
        errors.append(f"global sum_ttf {total_ttf} != manifest {manifest['sum_ttf']}")
    return {
        "segments": len(manifest["segments"]),
        "terms_checked": int(agg["terms"].sum()) if len(agg) else 0,
        "errors": errors,
    }


def _segment_ok(spark: SparkSession, index_dir: str, seg: dict) -> str:
    """Validate ONE segment in isolation. Returns "" when sound, else the
    first error (unreadable files count as errors — the exorcise case)."""
    import os

    from .builder import _NORMS_FILE, _POSTINGS_FILE

    sdir = mf.segment_dir(index_dir, seg["segment_id"])
    try:
        post = spark.read.parquet(os.path.join(sdir, _POSTINGS_FILE))
        checked = post.mapInPandas(_check_rows, schema=_ROW_DDL)
        bad = checked.where(F.col("err") != "").select("term", "err").limit(1).collect()
        if bad:
            return f"bad posting row ({bad[0]['term']}: {bad[0]['err']})"
        stats = (
            checked.where(F.col("field") == "content")
            .agg(F.sum("ttf").alias("ttf"), F.max("max_doc").alias("max_doc"))
            .collect()[0]
        )
        norms = spark.read.parquet(
            os.path.join(sdir, seg.get("norms_file", _NORMS_FILE))
        )
        n = norms.agg(
            F.count("*").alias("n"), F.sum("dl").alias("sum_dl")
        ).collect()[0]
        if int(n["n"]) != seg["doc_count"]:
            return f"norms rows {n['n']} != manifest doc_count {seg['doc_count']}"
        if stats["ttf"] is not None and int(stats["ttf"]) != int(n["sum_dl"] or 0):
            return f"postings ttf {stats['ttf']} != norms sum_dl {n['sum_dl']}"
        if stats["max_doc"] is not None and int(stats["max_doc"]) >= seg["doc_count"]:
            return f"posting docID {stats['max_doc']} out of range"
        return ""
    except Exception as e:  # unreadable parquet, missing files, ...
        return f"unreadable: {type(e).__name__}"


def exorcise(spark: SparkSession, index_dir: str) -> dict:
    """CheckIndex -exorcise (index/CheckIndex.java doExorcise / the
    `-exorcise` CLI flag): validate every segment IN ISOLATION and
    republish the manifest WITHOUT the broken ones. Like the reference,
    this is a last-resort repair — documents in dropped segments are
    LOST. Global stats re-aggregate from the surviving segments on the
    next commit; docID bases recompute, so global docIDs shift exactly
    as they would after a reference exorcise (segments renumber).

    Returns {"manifest": new_or_unchanged, "dropped": [(sid, err), ...]}.
    """
    manifest = mf.read_manifest(index_dir)
    if manifest is None:
        raise ValueError(f"{index_dir} has no committed manifest")
    keep, dropped = [], []
    for s in sorted(manifest["segments"], key=lambda x: x["partition_id"]):
        err = _segment_ok(spark, index_dir, s)
        if err:
            dropped.append((s["segment_id"], err))
        else:
            keep.append(dict(s))
    if not dropped:
        return {"manifest": manifest, "dropped": []}
    if not keep:
        raise ValueError("exorcise would drop every segment — refusing")
    # tombstone_files is NOT in commit_manifest's sticky set (a merge that
    # reclaims deletes must be able to drop it), so every recommit that
    # keeps deletes alive must carry it explicitly — exorcise keeps the
    # surviving segments' masks intact. Rows naming dropped segment_ids
    # are inert: read_tombstones keys masks by segment_id and searchers
    # only look up live segments.
    extra: dict = {"exorcised": [sid for sid, _ in dropped]}
    if manifest.get("tombstone_files"):
        extra["tombstone_files"] = manifest["tombstone_files"]
    new = mf.commit_manifest(index_dir, keep, extra=extra)
    return {"manifest": new, "dropped": dropped}
