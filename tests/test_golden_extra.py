"""Additional byte-exact golden pins — regression anchors for the wire
formats beyond the primary goldens in test_hybrid/test_delta (the
reference's test style, SURVEY.md §5.1)."""

import numpy as np

from parquet_go_ray.functions.delta import delta_encode
from parquet_go_ray.functions.for_bitpack import for_encode
from parquet_go_ray.functions.hybrid import hybrid_encode, hybrid_encode_sized
from parquet_go_ray.functions.plain import plain_encode_bool, rle_encode_bool
from parquet_go_ray.functions.varint import (
    svarint_encode,
    uvarint_encode,
    zigzag_decode,
    zigzag_encode,
)


def test_uvarint_goldens():
    assert uvarint_encode(0) == b"\x00"
    assert uvarint_encode(127) == b"\x7f"
    assert uvarint_encode(128) == b"\x80\x01"
    assert uvarint_encode(300) == b"\xac\x02"


def test_zigzag_goldens():
    # The (0,-1,1,-2,2,...) spiral from the protobuf/Parquet spec.
    assert [zigzag_encode(v) for v in (0, -1, 1, -2, 2)] == [0, 1, 2, 3, 4]
    assert [zigzag_decode(v) for v in (0, 1, 2, 3, 4)] == [0, -1, 1, -2, 2]
    assert svarint_encode(-1) == b"\x01"
    assert svarint_encode(63) == b"\x7e"


def test_bool_plain_golden():
    # 8 true bits -> 0xFF; [t,f,t,f,...] -> 0b01010101 LSB-first.
    assert plain_encode_bool(np.array([True] * 8)) == b"\xff"
    assert plain_encode_bool(np.array([True, False] * 4)) == bytes([0b01010101])


def test_bool_rle_golden():
    # 100 x true at bit-width 1: 4-byte size prefix + varint(100<<1)=200 + value 1.
    enc = rle_encode_bool(np.array([True] * 100))
    assert enc == b"\x03\x00\x00\x00" + bytes([0xC8, 0x01, 0x01])


def test_hybrid_sized_prefix_golden():
    enc = hybrid_encode_sized(np.full(100, 4), 3)
    assert enc[:4] == b"\x03\x00\x00\x00"  # payload is the 3-byte RLE run
    assert enc[4:] == bytes([0xC8, 0x01, 0x04])


def test_rle_value_width_rule():
    # RLE run value occupies ceil(width/8) LE bytes (ref hybrid-encoder.go:196-237).
    enc = hybrid_encode(np.full(10, 0x1234), 13)
    assert enc == bytes([0x14]) + (0x1234).to_bytes(2, "little")


def test_delta_header_golden():
    # Header for a single value: uvarint(128) uvarint(4) uvarint(1) zigzag(-1).
    assert delta_encode(np.array([-1], dtype=np.int64)) == bytes([128, 1, 4, 1, 1])


def test_for_constant_golden():
    # 10 x 7: uvarint(10) zigzag(7)=14 width 0, no payload.
    assert for_encode(np.full(10, 7), dtype=np.int64) == bytes([10, 14, 0])
