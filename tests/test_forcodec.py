"""FOR codec round-trip tests — mirrors BasePostingsFormatTestCase /
TestForUtil randomized round-trips (FIXTURES.md §4)."""

import numpy as np
import pytest

from lucene_solr_1_spark.kernels import forcodec as fc


@pytest.mark.parametrize("n", [1, 2, 127, 128, 129, 255, 256, 1000, 100_000])
def test_roundtrip_random_sorted_docids(n):
    rng = np.random.default_rng(n)
    doc_ids = np.sort(rng.choice(np.arange(n * 10, dtype=np.int64), size=n, replace=False))
    buf, offsets = fc.encode_doc_deltas(doc_ids)
    assert len(offsets) == (n + fc.BLOCK_SIZE - 1) // fc.BLOCK_SIZE
    back = fc.decode_doc_deltas(buf, offsets)
    np.testing.assert_array_equal(back, doc_ids)


@pytest.mark.parametrize("n", [1, 128, 129, 1000])
def test_roundtrip_freqs_zipf(n):
    rng = np.random.default_rng(n + 7)
    freqs = np.minimum(rng.zipf(1.5, size=n), 10**6).astype(np.int64)
    buf, offsets = fc.encode_blocks(freqs)
    np.testing.assert_array_equal(fc.decode_all(buf, offsets), freqs)


def test_all_equal_block_fast_path():
    vals = np.full(fc.BLOCK_SIZE, 7, dtype=np.int64)
    buf, offsets = fc.encode_blocks(vals)
    # marker layout: 2 header bytes + 8-byte value
    assert len(buf) == 10
    np.testing.assert_array_equal(fc.decode_all(buf, offsets), vals)


def test_all_zero_block():
    vals = np.zeros(130, dtype=np.int64)
    buf, offsets = fc.encode_blocks(vals)
    np.testing.assert_array_equal(fc.decode_all(buf, offsets), vals)


def test_random_block_access():
    rng = np.random.default_rng(3)
    doc_ids = np.sort(rng.choice(np.arange(10**6, dtype=np.int64), size=1000, replace=False))
    buf, offsets = fc.encode_doc_deltas(doc_ids)
    # decode block 3 alone, seeded with last doc of block 2 (skip-list seek)
    prev = doc_ids[3 * fc.BLOCK_SIZE - 1]
    blk = fc.decode_doc_block(buf, offsets, 3, int(prev))
    np.testing.assert_array_equal(blk, doc_ids[3 * fc.BLOCK_SIZE : 4 * fc.BLOCK_SIZE])
    # block 0 is seeded with 0
    blk0 = fc.decode_doc_block(buf, offsets, 0, 0)
    np.testing.assert_array_equal(blk0, doc_ids[: fc.BLOCK_SIZE])


def test_wide_values():
    vals = np.array([0, 1, 2**40, 2**52 + 3], dtype=np.int64)
    buf, offsets = fc.encode_blocks(vals)
    np.testing.assert_array_equal(fc.decode_all(buf, offsets), vals)


def test_empty():
    buf, offsets = fc.encode_blocks(np.empty(0, dtype=np.int64))
    assert fc.decode_all(buf, offsets).size == 0
