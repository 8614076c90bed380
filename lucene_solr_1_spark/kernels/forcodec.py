"""FOR (Frame-of-Reference) block codec — vectorized NumPy bit-packing.

Semantics modeled on the reference's 128-int postings blocks
(/root/reference/lucene/core/src/java/org/apache/lucene/codecs/lucene50/
ForUtil.java:157-204 — per-block bit-width = max required, all-values-equal
fast path; Lucene50PostingsWriter.java:223-255 — docID deltas, 128-doc
blocks). Byte layout is OUR OWN (exact Lucene byte compatibility is not a
goal — this is a from-scratch format with the same structure: fixed-size
blocks, per-block width, random block access via an offset array).

Layout per block: [count-1: u8][width: u8][payload]
  width == 255 : ALL_EQUAL marker; payload = 8-byte LE value
  width ∈ 0..64: payload = ceil(count*width/8) bytes, LSB-first packing
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128  # Lucene50PostingsFormat.BLOCK_SIZE (ForUtil.java / format docs)
_ALL_EQUAL = 255


def _pack_bits(vals: np.ndarray, width: int) -> bytes:
    """Pack uint64 values LSB-first into a little-endian bitstream."""
    if width == 0:
        return b""
    v = vals.astype(np.uint64)
    shifts = np.arange(width, dtype=np.uint64)
    bits = ((v[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits.ravel(), bitorder="little").tobytes()


def _unpack_bits(buf: memoryview, count: int, width: int) -> np.ndarray:
    if width == 0:
        return np.zeros(count, dtype=np.int64)
    nbytes = (count * width + 7) // 8
    raw = np.frombuffer(buf[:nbytes], dtype=np.uint8)
    bits = np.unpackbits(raw, count=count * width, bitorder="little")
    bits = bits.reshape(count, width).astype(np.uint64)
    weights = np.uint64(1) << np.arange(width, dtype=np.uint64)
    return (bits * weights).sum(axis=1).astype(np.int64)


def encode_blocks(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """Encode non-negative int64s into BLOCK_SIZE blocks.

    Returns (payload bytes, int64 array of per-block byte offsets) — the
    offset array is the skip structure: random access to block b without
    decoding blocks < b (replaces MultiLevelSkipListWriter file pointers).
    """
    values = np.asarray(values, dtype=np.int64)
    out = bytearray()
    offsets = []
    for start in range(0, len(values), BLOCK_SIZE):
        blk = values[start : start + BLOCK_SIZE]
        offsets.append(len(out))
        count = len(blk)
        first = blk[0]
        if np.all(blk == first):
            out.append(count - 1)
            out.append(_ALL_EQUAL)
            out += int(first).to_bytes(8, "little")
        else:
            width = int(blk.max()).bit_length()
            out.append(count - 1)
            out.append(width)
            out += _pack_bits(blk, width)
    return bytes(out), np.asarray(offsets, dtype=np.int64)


def decode_block(buf: bytes, offset: int) -> np.ndarray:
    """Decode a single block starting at byte `offset`."""
    mv = memoryview(buf)
    count = mv[offset] + 1
    width = mv[offset + 1]
    body = mv[offset + 2 :]
    if width == _ALL_EQUAL:
        val = int.from_bytes(bytes(body[:8]), "little")
        return np.full(count, val, dtype=np.int64)
    return _unpack_bits(body, count, width)


def decode_all(buf: bytes, offsets: np.ndarray) -> np.ndarray:
    """Decode every block (exhaustive path)."""
    if len(buf) == 0:
        return np.empty(0, dtype=np.int64)
    parts = [decode_block(buf, int(o)) for o in offsets]
    return np.concatenate(parts) if parts else np.empty(0, dtype=np.int64)


def encode_doc_deltas(doc_ids: np.ndarray) -> tuple[bytes, np.ndarray]:
    """Delta-encode a strictly-increasing docID list then block-pack it
    (Lucene50PostingsWriter.startDoc doc-delta semantics)."""
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    deltas = np.diff(doc_ids, prepend=np.int64(0))
    deltas[0] = doc_ids[0] if len(doc_ids) else 0
    return encode_blocks(deltas)


def decode_doc_deltas(buf: bytes, offsets: np.ndarray) -> np.ndarray:
    """Inverse of encode_doc_deltas → absolute docIDs."""
    return np.cumsum(decode_all(buf, offsets))


def decode_doc_block(buf: bytes, offsets: np.ndarray, block_idx: int, first_doc_minus1: int) -> np.ndarray:
    """Random-access decode of doc block `block_idx` given the docID just
    before the block (from the skip metadata) — the skip-list seek analog."""
    deltas = decode_block(buf, int(offsets[block_idx]))
    return np.cumsum(deltas) + first_doc_minus1
