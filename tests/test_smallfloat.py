"""SmallFloat kernel tests — mirrors the reference's exhaustive encode/decode
contract (util/SmallFloat.java; FIXTURES.md §3)."""

import numpy as np
import pytest

from lucene_solr_1_spark.kernels import smallfloat as sf


def _long_to_int4_scalar(i: int) -> int:
    """Direct transliteration of the algorithm spec for cross-checking the
    vectorized implementation (SmallFloat.java:101-120 semantics)."""
    assert i >= 0
    num_bits = i.bit_length()
    if num_bits < 4:
        return i
    shift = num_bits - 4
    return ((i >> shift) & 0x07) | ((shift + 1) << 3)


def _int4_to_long_scalar(i: int) -> int:
    bits = i & 0x07
    shift = (i >> 3) - 1
    return bits if shift == -1 else (bits | 0x08) << shift


def test_constants():
    assert sf.MAX_INT4 == _long_to_int4_scalar(2**31 - 1)
    assert sf.NUM_FREE_VALUES == 255 - sf.MAX_INT4
    assert sf.NUM_FREE_VALUES > 0


def test_long_to_int4_matches_scalar():
    xs = list(range(0, 5000)) + [2**k + d for k in range(4, 62) for d in (-1, 0, 1)]
    xs = np.array(sorted(set(xs)), dtype=np.int64)
    got = sf.long_to_int4(xs)
    want = np.array([_long_to_int4_scalar(int(x)) for x in xs])
    np.testing.assert_array_equal(got, want)


def test_int4_roundtrip_order_preserving():
    xs = np.array(sorted(set(list(range(0, 100000)) + [2**k for k in range(4, 40)])), dtype=np.int64)
    enc = sf.long_to_int4(xs)
    # order-preserving (non-decreasing)
    assert np.all(np.diff(enc) >= 0)
    dec = sf.int4_to_long(enc)
    # decode(encode(x)) <= x and same int4 bucket
    assert np.all(dec <= xs)
    np.testing.assert_array_equal(sf.long_to_int4(dec), enc)


def test_byte4_roundtrip_all_256():
    bs = np.arange(256)
    ints = sf.byte4_to_int(bs)
    back = sf.int_to_byte4(ints)
    np.testing.assert_array_equal(back, bs.astype(np.uint8))
    # strictly increasing decoded lengths
    assert np.all(np.diff(ints) > 0)


def test_int_to_byte4_low_values_exact():
    xs = np.arange(sf.NUM_FREE_VALUES)
    np.testing.assert_array_equal(sf.byte4_to_int(sf.int_to_byte4(xs)), xs)


def test_int_to_byte4_monotone_lossy():
    xs = np.arange(0, 200000, dtype=np.int64)
    enc = sf.int_to_byte4(xs)
    assert np.all(np.diff(enc.astype(np.int64)) >= 0)
    dec = sf.byte4_to_int(enc)
    assert np.all(dec <= xs)
    np.testing.assert_array_equal(sf.int_to_byte4(dec), enc)


def test_negative_raises():
    with pytest.raises(ValueError):
        sf.int_to_byte4(np.array([-1]))


def test_length_table():
    assert sf.LENGTH_TABLE.dtype == np.float32
    assert sf.LENGTH_TABLE[0] == 0.0
    assert len(sf.LENGTH_TABLE) == 256
