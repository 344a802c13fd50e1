"""PLAIN encodings for fixed-width types and booleans, plus boolean RLE.

Matches the reference's plain codecs (SURVEY.md E10/E13):
- little-endian raw buffers for int32/int64/float/double
  (/root/reference/types/{int32,int64,float,double}.go)
- LSB-first bit-packed booleans (/root/reference/types/boolean.go:13-127)
- boolean RLE = bit-width-1 hybrid stream with 4-byte size prefix
  (/root/reference/types/boolean.go:133-196)

Arrow buffers already ARE plain little-endian, so numeric encode/decode is
a zero-copy ``tobytes`` / ``frombuffer``.
"""

from __future__ import annotations

import numpy as np

from .hybrid import hybrid_decode_sized, hybrid_encode_sized

__all__ = [
    "plain_encode_numeric",
    "plain_decode_numeric",
    "plain_encode_bool",
    "plain_decode_bool",
    "bss_encode",
    "bss_decode",
    "rle_encode_bool",
    "rle_decode_bool",
    "int96_decode_timestamps",
    "int96_encode_timestamps",
]

_JULIAN_UNIX_EPOCH = 2440588  # Julian day number of 1970-01-01
_NS_PER_DAY = 86_400_000_000_000


def int96_decode_timestamps(data, count: int) -> np.ndarray:
    """Decode legacy INT96 timestamps to int64 epoch-nanoseconds.

    Decode-only compatibility, matching the reference's INT96 handling
    (/root/reference/datastore/int96.go:12-34 stores raw 12-byte values;
    SURVEY.md §1.2: decode-only, never emit). Layout per the Parquet
    legacy convention: 8 LE bytes of in-day nanoseconds + 4 LE bytes of
    Julian day number.
    """
    raw = np.frombuffer(data, dtype=np.uint8, count=count * 12).reshape(count, 12)
    nanos = raw[:, :8].copy().view("<u8").reshape(count)
    days = raw[:, 8:].copy().view("<u4").reshape(count).astype(np.int64)
    return (days - _JULIAN_UNIX_EPOCH) * _NS_PER_DAY + nanos.astype(np.int64)


def int96_encode_timestamps(values: np.ndarray) -> bytes:
    """Encode int64 epoch-nanoseconds as legacy INT96 (12 LE bytes per
    value: 8 bytes in-day nanoseconds + 4 bytes Julian day number).

    The reference implements both directions
    (/root/reference/types/int96.go:13-37 encoder, :40-75 decoder);
    SURVEY §1.2 keeps the engine's own blobs INT96-free (never
    auto-selected), so this exists for wire parity and interop tests
    only. Floor division keeps pre-1970 timestamps correct: the day
    rounds down and the in-day nanos stay non-negative, matching the
    spec's day-number + nanos-within-day convention.
    """
    v = np.ascontiguousarray(values, dtype=np.int64)
    days = v // _NS_PER_DAY
    nanos = (v - days * _NS_PER_DAY).astype("<u8")
    out = np.empty((len(v), 12), dtype=np.uint8)
    out[:, :8] = nanos.view(np.uint8).reshape(len(v), 8)
    out[:, 8:] = (
        (days + _JULIAN_UNIX_EPOCH).astype("<u4").view(np.uint8).reshape(len(v), 4)
    )
    return out.tobytes()


def plain_encode_numeric(values: np.ndarray) -> bytes:
    return np.ascontiguousarray(values).tobytes()


def plain_decode_numeric(data, dtype, count: int) -> np.ndarray:
    dtype = np.dtype(dtype)
    buf = np.frombuffer(data, dtype=dtype, count=count)
    return buf


def bss_encode(plain: bytes, width: int) -> bytes:
    """BYTE_STREAM_SPLIT (Parquet encoding 9): scatter the k-th byte of
    every ``width``-byte value into the k-th of ``width`` contiguous
    streams. A pure transpose of the PLAIN buffer — values are unchanged,
    but same-position bytes (float exponents, high-order int bytes)
    become runs the block compressor can exploit. Format v2.8 defines it
    for FLOAT/DOUBLE; v2.11 extends it to INT32/INT64/FLBA."""
    n = len(plain)
    if n % width:
        raise ValueError(f"BSS payload of {n} bytes is not a multiple of {width}")
    return (
        np.frombuffer(plain, dtype=np.uint8)
        .reshape(n // width, width)
        .T.tobytes()
    )


def bss_decode(data, width: int, count: int) -> bytes:
    """Inverse of :func:`bss_encode`: gather ``count`` values back from
    the ``width`` byte streams into a PLAIN little-endian buffer."""
    need = count * width
    buf = np.frombuffer(data, dtype=np.uint8, count=need)
    return buf.reshape(width, count).T.tobytes()


def plain_encode_bool(values: np.ndarray) -> bytes:
    return np.packbits(
        np.ascontiguousarray(values, dtype=np.uint8), bitorder="little"
    ).tobytes()


def plain_decode_bool(data, count: int) -> np.ndarray:
    bits = np.unpackbits(
        np.frombuffer(data, dtype=np.uint8), bitorder="little", count=count
    )
    return bits.astype(np.bool_)


def rle_encode_bool(values: np.ndarray) -> bytes:
    return hybrid_encode_sized(
        np.ascontiguousarray(values, dtype=np.uint8), 1
    )


def rle_decode_bool(data, count: int, pos: int = 0) -> tuple[np.ndarray, int]:
    out, pos = hybrid_decode_sized(data, 1, count, pos)
    return out.astype(np.bool_), pos
