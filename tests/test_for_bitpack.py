"""Frame-of-reference + bitpack tests (engine-new; SURVEY.md §2.7)."""

import numpy as np
import pytest

from parquet_go_ray.functions.for_bitpack import for_decode, for_encode


@pytest.mark.parametrize(
    "values,dtype",
    [
        ([], np.int64),
        ([7], np.int32),
        ([5, 6, 7, 5, 6], np.int32),
        ([-100, 100, 0, -50], np.int64),
        ([2**31 - 1, -(2**31)], np.int32),
        ([2**63 - 1, -(2**63)], np.int64),
        (list(range(500)), np.int32),
    ],
)
def test_roundtrip(values, dtype):
    vals = np.array(values, dtype=dtype)
    enc = for_encode(vals, dtype=dtype)
    out, pos = for_decode(enc, dtype=dtype)
    assert pos == len(enc)
    assert out.dtype == np.dtype(dtype)
    assert (out == vals).all()


def test_small_range_is_compact():
    # turn_idx-style column: values 0..499 need 9 bits -> ~563 bytes + header.
    vals = np.arange(500, dtype=np.int32)
    enc = for_encode(vals, dtype=np.int32)
    assert len(enc) < 500 * 9 // 8 + 16


def test_constant_column_is_tiny():
    enc = for_encode(np.full(10_000, 1234567, dtype=np.int64))
    assert len(enc) < 16  # width 0: count + min + width byte only
