"""Frame-of-reference + bit-packing (engine-new; SURVEY.md §2.7).

The reference only applies FOR to deltas inside DELTA_BINARY_PACKED
(/root/reference/encoding/delta-binary-packed-encoder.go:176-178); plain
FOR — subtract the block minimum, bit-pack the residuals — is the better
codec for small-range non-monotonic ints like ``turn_idx``
("Can Delta Compete with Frame-of-Reference…", VLDB 2024).

Stream: ``uvarint(count) svarint(min) [1 byte width] [bitpacked residuals]``.
"""

from __future__ import annotations

import numpy as np

from .bitpack import bit_length_array, pack, unpack
from .varint import svarint_decode, uvarint_decode, uvarint_encode

__all__ = ["for_encode", "for_decode"]


def for_encode(values: np.ndarray, dtype=np.int64) -> bytes:
    dtype = np.dtype(dtype)
    udt = np.dtype(np.uint32) if dtype == np.int32 else np.dtype(np.uint64)
    v = np.ascontiguousarray(values, dtype=dtype)
    n = len(v)
    out = bytearray()
    out += uvarint_encode(n)
    if n == 0:
        return bytes(out)
    mn = int(v.min())
    out += _svarint(mn)
    rel = (v.view(udt) - np.array(mn, dtype=dtype).view(udt)).astype(np.uint64)
    width = int(bit_length_array(rel.max(keepdims=True))[0])
    out.append(width)
    out += pack(rel, width)
    return bytes(out)


def for_decode(
    data, pos: int = 0, dtype=np.int64, expect: int | None = None
) -> tuple[np.ndarray, int]:
    dtype = np.dtype(dtype)
    udt = np.dtype(np.uint32) if dtype == np.int32 else np.dtype(np.uint64)
    count, pos = uvarint_decode(data, pos)
    if expect is not None and count != expect:
        raise ValueError(f"value count mismatch: stored {count}, expected {expect}")
    if count == 0:
        return np.empty(0, dtype=dtype), pos
    mn, pos = svarint_decode(data, pos)
    if pos >= len(data):
        raise ValueError("truncated FOR stream")
    width = data[pos]
    pos += 1
    if width > 64:
        raise ValueError(f"FOR width {width} out of range")
    # A width-0 stream carries no residual bytes, so an adversarial count
    # could otherwise drive an unbounded allocation (fuzz hardening; for
    # width > 0 unpack's underflow check bounds the allocation).
    if width == 0 and expect is None and count > (1 << 26):
        raise ValueError(f"implausible width-0 count {count}")
    nbytes = (count * width + 7) // 8
    rel = unpack(data[pos : pos + nbytes], width, count)
    pos += nbytes
    mn_u = np.uint64(np.int64(mn).view(np.uint64))
    return ((rel + mn_u).astype(udt)).view(dtype), pos


def _svarint(value: int) -> bytes:
    zz = (value << 1) ^ (value >> 63) if value < 0 else value << 1
    return uvarint_encode(zz & 0xFFFFFFFFFFFFFFFF)
