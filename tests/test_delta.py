"""DELTA_BINARY_PACKED tests, including the spec-derived golden stream the
reference also asserts (delta-binary-packed-decoder_test.go:120-140) and
its error paths (:59-107)."""

import numpy as np
import pytest

from parquet_go_ray.functions.delta import delta_decode, delta_encode


def roundtrip(values, dtype):
    values = np.asarray(values, dtype=dtype)
    enc = delta_encode(values, dtype=dtype)
    dec, pos = delta_decode(enc, dtype=dtype)
    assert pos == len(enc)
    assert dec.dtype == np.dtype(dtype)
    assert (dec == values).all()
    return enc


def test_golden_sawtooth():
    # header: uvarint(128) uvarint(4) uvarint(8) zigzag(7)=14
    # block: zigzag(-2)=3, widths [2,0,0,0], miniblock0 deltas
    # [-2,-2,-2,1,1,1,1]-(-2) = [0,0,0,3,3,3,3] -> bytes 192,63 + 6 zero pad.
    enc = roundtrip([7, 5, 3, 1, 2, 3, 4, 5], np.int32)
    golden = bytes([128, 1, 4, 8, 14, 3, 2, 0, 0, 0, 192, 63, 0, 0, 0, 0, 0, 0])
    assert enc == golden


def test_multi_block_ramp():
    roundtrip(np.arange(140), np.int32)  # crosses one block boundary
    roundtrip(np.arange(1000), np.int64)


def test_int32_overflow_wraparound():
    # INT32_MIN/MAX adjacent — delta arithmetic wraps at 32 bits
    # (ref delta-binary-packed-encoder.go:173-175).
    roundtrip([2**31 - 1, -(2**31), 5, -6, 2**31 - 1], np.int32)


def test_int64_extremes():
    roundtrip([2**63 - 1, -(2**63), 17, -1], np.int64)


def test_empty_and_single():
    roundtrip([], np.int64)
    roundtrip([42], np.int64)
    roundtrip([-42], np.int32)


def test_timestamps_micro():
    rng = np.random.default_rng(1)
    ts = np.cumsum(rng.integers(1, 300_000_000, 5000)) + 1_600_000_000_000_000
    roundtrip(ts, np.int64)


@pytest.mark.parametrize("seed", range(5))
def test_random_roundtrip(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(0, 5000))
    vals = rng.integers(-(2**40), 2**40, size=n)
    roundtrip(vals, np.int64)


def test_invalid_block_size():
    with pytest.raises(ValueError):
        delta_encode(np.arange(10), block_size=100)
    # decoder: block size not multiple of 128 (ref decoder :34)
    bad = bytes([100]) + delta_encode(np.arange(10))[2:]
    with pytest.raises(ValueError):
        delta_decode(bad)


def test_invalid_miniblock_width():
    # Build a stream claiming a 33-bit miniblock width for int32.
    enc = bytearray(delta_encode(np.arange(200, dtype=np.int32), dtype=np.int32))
    # header = uvarint(128)=2B, uvarint(4)=1B, uvarint(200)=2B, zigzag(0)=1B
    # then block: min_delta zigzag(1)=1B, widths at offset 7..10
    enc[7] = 40
    with pytest.raises(ValueError):
        delta_decode(bytes(enc), dtype=np.int32)


def test_truncated_stream():
    enc = delta_encode(np.arange(1000))
    with pytest.raises(ValueError):
        delta_decode(enc[: len(enc) // 2])
