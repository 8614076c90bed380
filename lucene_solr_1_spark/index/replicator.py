"""Index replication — the lucene/replicator module's pull model
(replicator/ReplicationClient.java:63-160 update cycle,
replicator/IndexRevision.java: a revision = one commit point's files,
replicator/http/ReplicationService.java): a replica pulls the source's
LATEST commit point by copying the segment files it does not already
have, then atomically publishes the copied view as its own next
manifest generation. Segment directories are immutable per segment_id
(content-fingerprinted), so "which files to fetch" is a set difference —
exactly the revision-diff the reference computes — and a re-run with no
source change is a no-op.

Scale: replication is file transfer, not recompute; on a cluster the
copies are object-store server-side copies per segment directory.
"""

from __future__ import annotations

import os
import shutil

from . import manifest as mf


def replicate(src_index: str, dst_index: str) -> dict:
    """Pull src's latest commit into dst. Returns
    {status: 'up_to_date' | 'replicated', copied_segments, generation}."""
    src = mf.read_manifest(src_index)
    if src is None:
        raise ValueError(f"source {src_index} has no committed manifest")
    dst = mf.read_manifest(dst_index)
    if dst is not None and dst.get("replicated_src_generation") == src["generation"] \
            and dst.get("doc_count") == src["doc_count"]:
        return {
            "status": "up_to_date",
            "copied_segments": 0,
            "generation": dst["generation"],
        }
    copied = 0
    for s in src["segments"]:
        sid = s["segment_id"]
        dst_seg = mf.segment_dir(dst_index, sid)
        if os.path.isdir(dst_seg) and mf.read_segment_meta(dst_index, sid):
            # Posting/docmap files are immutable per id, but doc-values
            # updates write NEW norms generations (norms-g<N>.parquet)
            # into the existing dir (docvalues.py copy-on-write) — the
            # revision diff must still fetch any file the manifest entry
            # references that the replica lacks, or the published entry
            # points at a norms_file that was never copied.
            nf = s.get("norms_file")
            if nf:
                dst_nf = os.path.join(dst_seg, nf)
                if not os.path.exists(dst_nf):
                    shutil.copy2(
                        os.path.join(mf.segment_dir(src_index, sid), nf),
                        dst_nf,
                    )
                    copied += 1
            continue
        shutil.copytree(
            mf.segment_dir(src_index, sid), dst_seg, dirs_exist_ok=True
        )
        copied += 1
    # tombstones: small id files, copied whole (revision includes deletes)
    tfiles = src.get("tombstone_files", [])
    for rel in tfiles:
        dst_path = os.path.join(dst_index, rel)
        if not os.path.exists(dst_path):
            os.makedirs(os.path.dirname(dst_path), exist_ok=True)
            shutil.copy2(os.path.join(src_index, rel), dst_path)
    extra = {
        k: src[k]
        for k in ("analyzer", "offsets", "index_sort", "payloads",
                  "num_segments")
        if src.get(k) is not None
    }
    if tfiles:
        extra["tombstone_files"] = tfiles
    extra["replicated_src_generation"] = src["generation"]
    man = mf.commit_manifest(
        dst_index, [dict(s) for s in src["segments"]], extra=extra
    )
    return {
        "status": "replicated",
        "copied_segments": copied,
        "generation": man["generation"],
    }
