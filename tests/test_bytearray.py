"""Byte-array codec tests (PLAIN / DELTA_LENGTH / DELTA prefix), mirroring
the reference's types/byte-array.go coverage over FIXTURES.md F4
distributions."""

import numpy as np
import pyarrow as pa
import pytest

from parquet_go_ray.functions.bytearray import (
    arrow_strings_to_parts,
    delta_length_decode,
    delta_length_encode,
    delta_prefix_decode,
    delta_prefix_encode,
    parts_to_arrow_strings,
    plain_decode_bytes,
    plain_encode_bytes,
)
from tests.conftest import make_string_parts

CASES = {
    "low_card": ["red", "green", "blue", "green"] * 50,
    "varlen": ["", "x", "hello world", "α β γ 🎉", "z" * 4000, ""],
    "sorted_keys": [f"conv-{i:08d}" for i in range(500)],
    "empty": [],
    "all_empty": ["", "", ""],
    "binary_ff": [bytes([255] * k) for k in range(5)],
}


@pytest.mark.parametrize("name", list(CASES))
def test_plain_roundtrip(name):
    lens, data = make_string_parts(CASES[name])
    enc = plain_encode_bytes(lens, data)
    dl, dd = plain_decode_bytes(enc, len(lens))
    assert (dl == lens).all() and dd.tobytes() == data.tobytes()


def test_plain_golden():
    # 4-byte LE length prefix + raw bytes (ref types/byte-array.go:21-114).
    lens, data = make_string_parts(["ab", "c"])
    assert plain_encode_bytes(lens, data) == b"\x02\x00\x00\x00ab\x01\x00\x00\x00c"


@pytest.mark.parametrize("name", list(CASES))
def test_delta_length_roundtrip(name):
    lens, data = make_string_parts(CASES[name])
    enc = delta_length_encode(lens, data)
    dl, dd, pos = delta_length_decode(enc, len(lens))
    assert pos == len(enc)
    assert (dl == lens).all() and dd.tobytes() == data.tobytes()


@pytest.mark.parametrize("name", list(CASES))
def test_delta_prefix_roundtrip(name):
    lens, data = make_string_parts(CASES[name])
    enc = delta_prefix_encode(lens, data)
    dl, dd, pos = delta_prefix_decode(enc, len(lens))
    assert pos == len(enc)
    assert (dl == lens).all() and dd.tobytes() == data.tobytes()


def test_prefix_beats_delta_length_on_sorted_keys():
    lens, data = make_string_parts(CASES["sorted_keys"])
    assert len(delta_prefix_encode(lens, data)) < len(delta_length_encode(lens, data))


def test_arrow_parts_zero_copy_roundtrip():
    arr = pa.array(["a", "bb", "", "ccc", "ddd🎉"])
    lens, data = arrow_strings_to_parts(arr)
    back = parts_to_arrow_strings(lens, data)
    assert back.equals(arr.cast(pa.string()))


def test_arrow_parts_sliced_array():
    arr = pa.array(["junk", "a", "bb", "cc"]).slice(1, 3)
    lens, data = arrow_strings_to_parts(arr)
    assert parts_to_arrow_strings(lens, data).to_pylist() == ["a", "bb", "cc"]


def test_arrow_parts_rejects_nulls():
    with pytest.raises(ValueError):
        arrow_strings_to_parts(pa.array(["a", None]))
