"""PLAIN fixed-width + boolean codec tests (FIXTURES.md F5)."""

import numpy as np
import pytest

from parquet_go_ray.functions.plain import (
    plain_decode_bool,
    plain_decode_numeric,
    plain_encode_bool,
    plain_encode_numeric,
    rle_decode_bool,
    rle_encode_bool,
)


@pytest.mark.parametrize("dtype", [np.int32, np.int64, np.float32, np.float64])
def test_numeric_roundtrip(dtype, rng):
    vals = rng.integers(-1000, 1000, 100).astype(dtype)
    enc = plain_encode_numeric(vals)
    out = plain_decode_numeric(enc, dtype, 100)
    assert (out == vals).all()


def test_float_special_values_bit_exact():
    vals = np.array([1.0, np.nan, np.inf, -np.inf, -0.0, 2.5e-308], dtype=np.float64)
    out = plain_decode_numeric(plain_encode_numeric(vals), np.float64, len(vals))
    # Bitwise equality (NaN-safe), per the north rule's bit-identical decode.
    assert out.view(np.uint64).tolist() == vals.view(np.uint64).tolist()


def test_bool_bitpack_roundtrip():
    vals = np.array([True] * 10 + [False] * 7 + [True, False] * 5)
    out = plain_decode_bool(plain_encode_bool(vals), len(vals))
    assert (out == vals).all()


def test_bool_rle_roundtrip():
    vals = np.array([True] * 100 + [False] * 50 + [True, False] * 4)
    enc = rle_encode_bool(vals)
    out, pos = rle_decode_bool(enc, len(vals))
    assert pos == len(enc) and (out == vals).all()
    # Long runs compress far below 1 bit/value.
    assert len(enc) < len(vals) // 8
