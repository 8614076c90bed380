"""Segment manifest — the `segments_N` analog (index/SegmentInfos.java).

Two-phase commit: segment directories (with per-segment meta.json commit
markers) are durable first; then the driver atomically publishes a new
manifest generation via tmp-file + rename. Readers always open the highest
generation, so a crashed build never exposes partial segments — and a
re-run resumes from the per-partition checkpoints (meta.json files) it
finds (north_rule: resumable from per-partition checkpoints with lineage
and token/posting-count metrics).
"""

from __future__ import annotations

import json
import os
import re
import time
import uuid

_GEN_RE = re.compile(r"manifest-(\d+)\.json$")


def segments_dir(index_dir: str) -> str:
    return os.path.join(index_dir, "segments")


def segment_dir(index_dir: str, segment_id: str) -> str:
    return os.path.join(segments_dir(index_dir), segment_id)


def latest_generation(index_dir: str) -> int:
    if not os.path.isdir(index_dir):
        return 0
    gens = [
        int(m.group(1))
        for f in os.listdir(index_dir)
        if (m := _GEN_RE.match(f))
    ]
    return max(gens, default=0)


def read_manifest(index_dir: str) -> dict | None:
    gen = latest_generation(index_dir)
    if gen == 0:
        return None
    with open(os.path.join(index_dir, f"manifest-{gen}.json")) as f:
        return json.load(f)


def _sum_field_stats(segs: list[dict]) -> dict:
    """Aggregate per-segment field_stats (JSON string or dict) into global
    per-field CollectionStatistics: {field: {sum_ttf, doc_count}}."""
    out: dict = {}
    for s in segs:
        fs = s.get("field_stats")
        if fs is None:
            # pre-multi-field segment: content stats only
            fs = {"content": {"sum_ttf": s["sum_ttf"], "doc_count": s["doc_count"]}}
        elif isinstance(fs, str):
            fs = json.loads(fs)
        for field, st in fs.items():
            agg = out.setdefault(field, {"sum_ttf": 0, "doc_count": 0})
            agg["sum_ttf"] += int(st["sum_ttf"])
            agg["doc_count"] += int(st["doc_count"])
    return out


def commit_manifest(index_dir: str, segments: list[dict], extra: dict | None = None) -> dict:
    """Atomically publish a new generation listing `segments` as live."""
    os.makedirs(index_dir, exist_ok=True)
    # sticky index-level settings survive every re-commit (merge, delete,
    # append): the analyzer and the offsets IndexOption are properties of
    # the INDEX, like IndexWriterConfig — readers must always see them
    sticky = ("analyzer", "offsets", "index_sort", "payloads")
    if not extra or any(k not in (extra or {}) for k in sticky):
        prior = read_manifest(index_dir)
        if prior:
            carry = {
                k: prior[k]
                for k in sticky
                if prior.get(k) is not None and k not in (extra or {})
            }
            if carry:
                extra = {**(extra or {}), **carry}
    gen = latest_generation(index_dir) + 1
    # global docID bases: segments ordered by partition_id (LeafReaderContext
    # docBase analog)
    segs = sorted(segments, key=lambda s: s["partition_id"])
    base = 0
    for s in segs:
        s["doc_base"] = base
        base += s["doc_count"]
    manifest = {
        "generation": gen,
        "committed_at": time.time(),
        "doc_count": base,
        "sum_ttf": sum(s["sum_ttf"] for s in segs),
        "field_stats": _sum_field_stats(segs),
        "segments": segs,
        **(extra or {}),
    }
    tmp = os.path.join(index_dir, f".manifest-{gen}.{uuid.uuid4().hex}.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, os.path.join(index_dir, f"manifest-{gen}.json"))
    return manifest


def read_segment_meta(index_dir: str, segment_id: str) -> dict | None:
    """Per-partition checkpoint marker; present ⇒ segment files are complete."""
    p = os.path.join(segment_dir(index_dir, segment_id), "meta.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def write_segment_meta(index_dir: str, segment_id: str, meta: dict) -> None:
    """Atomic per-segment commit marker — written LAST, after parquet files."""
    d = segment_dir(index_dir, segment_id)
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, f".meta.{uuid.uuid4().hex}.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=1)
    os.replace(tmp, os.path.join(d, "meta.json"))


def list_commits(index_dir: str) -> list[dict]:
    """DirectoryReader.listCommits analog (index/DirectoryReader.java
    listCommits, index/IndexCommit.java): every retained manifest
    generation with its commit metadata, oldest first. Generations are
    never deleted by commit_manifest — the SnapshotDeletionPolicy
    posture (index/SnapshotDeletionPolicy.java): old commit points stay
    openable until explicitly removed."""
    out = []
    for f in sorted(os.listdir(index_dir)):
        m = _GEN_RE.match(f)
        if not m:
            continue
        with open(os.path.join(index_dir, f)) as fh:
            man = json.load(fh)
        out.append(
            {
                "generation": man["generation"],
                "committed_at": man.get("committed_at"),
                "doc_count": man["doc_count"],
                "num_segments": len(man["segments"]),
            }
        )
    return sorted(out, key=lambda c: c["generation"])


def rollback_to(index_dir: str, generation: int) -> dict:
    """Open-an-old-commit + make it current (IndexWriterConfig
    setIndexCommit / IndexWriter rollback semantics): republish the
    snapshot manifest of `generation` as a NEW highest generation, so
    every reader atomically sees the old view. Segment files written
    after the snapshot are left on disk (retained like files referenced
    by a snapshotted commit) — a vacuum pass may reclaim unreferenced
    directories later."""
    p = os.path.join(index_dir, f"manifest-{generation}.json")
    if not os.path.exists(p):
        raise ValueError(f"no manifest generation {generation} in {index_dir}")
    with open(p) as f:
        snap = json.load(f)
    segs = [dict(s) for s in snap["segments"]]
    extra = {
        k: snap[k]
        for k in ("analyzer", "offsets", "index_sort", "payloads",
                  "tombstone_files", "num_segments")
        if snap.get(k) is not None
    }
    extra["rolled_back_from"] = generation
    return commit_manifest(index_dir, segs, extra=extra)
