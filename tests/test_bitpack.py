"""Bit-pack kernel tests — the engine's stand-in for the reference's
table-driven width tests (encoding/bitpacking32_test.go,
bitpacking64_test.go; see SURVEY.md §5.2)."""

import numpy as np
import pytest

from parquet_go_ray.functions.bitpack import bit_length_array, pack, unpack


@pytest.mark.parametrize("width", list(range(0, 65)))
def test_roundtrip_all_widths(width, rng):
    n = 37  # deliberately not a multiple of 8
    hi = (1 << width) if width < 64 else (1 << 63)
    vals = rng.integers(0, max(hi, 1), size=n, dtype=np.uint64)
    if width == 64:
        vals = vals * 2 + 1  # exercise the top bit
    out = unpack(pack(vals, width), width, n)
    assert (out == vals).all()


def test_golden_width1():
    # 8 alternating bits -> one byte 0b10101010 LSB-first.
    vals = np.array([0, 1, 0, 1, 0, 1, 0, 1], dtype=np.uint64)
    assert pack(vals, 1) == bytes([0b10101010])


def test_golden_width3():
    # Parquet spec's worked example: values 0..7 at width 3 ->
    # 10001000 11000110 11111010 (LSB-first packing).
    vals = np.arange(8, dtype=np.uint64)
    assert pack(vals, 3) == bytes([0b10001000, 0b11000110, 0b11111010])


def test_underflow_raises():
    with pytest.raises(ValueError):
        unpack(b"\x01", 8, 10)


def test_width_range():
    with pytest.raises(ValueError):
        pack(np.array([1], dtype=np.uint64), 65)
    with pytest.raises(ValueError):
        unpack(b"", 65, 1)


def test_bit_length_array():
    x = np.array(
        [0, 1, 2, 3, 4, 255, 256, 2**52, 2**53, 2**53 + 1, 2**63, 2**64 - 1],
        dtype=np.uint64,
    )
    assert list(bit_length_array(x)) == [int(v).bit_length() for v in x]
