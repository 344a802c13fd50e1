"""ULEB128 varints and zigzag coding (scalar + vectorized batch forms).

Matches the wire format the reference consumes via Go's ``binary.Uvarint``
(/root/reference/encoding/delta-binary-packed-decoder.go:23-56 reads the
block header this way).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "uvarint_encode",
    "uvarint_decode",
    "zigzag_encode",
    "zigzag_decode",
    "svarint_encode",
    "svarint_decode",
    "uvarint_encode_array",
]


def uvarint_encode(value: int) -> bytes:
    if value < 0:
        raise ValueError("uvarint requires non-negative value")
    out = bytearray()
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def uvarint_decode(data, pos: int = 0) -> tuple[int, int]:
    """Returns (value, new_pos)."""
    result = 0
    shift = 0
    while True:
        if pos >= len(data):
            raise ValueError("truncated uvarint")
        b = data[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 70:
            raise ValueError("uvarint overflow")


def zigzag_encode(value: int) -> int:
    return (value << 1) ^ (value >> 63) if value < 0 else value << 1


def zigzag_decode(value: int) -> int:
    return (value >> 1) ^ -(value & 1)


def svarint_encode(value: int) -> bytes:
    return uvarint_encode(zigzag_encode(value) & 0xFFFFFFFFFFFFFFFF)


def svarint_decode(data, pos: int = 0) -> tuple[int, int]:
    u, pos = uvarint_decode(data, pos)
    return zigzag_decode(u), pos


def uvarint_encode_array(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized ULEB128 for a uint64 array.

    Returns (bytes_flat, lengths) where ``bytes_flat`` is a uint8 array of
    the concatenated varints and ``lengths[i]`` the byte length of value i.
    """
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = len(v)
    if n == 0:
        return np.empty(0, dtype=np.uint8), np.empty(0, dtype=np.int64)
    # 10 groups of 7 bits each cover 64 bits.
    shifts = (np.arange(10, dtype=np.uint64) * np.uint64(7))
    groups = ((v[:, None] >> shifts[None, :]) & np.uint64(0x7F)).astype(np.uint8)
    # Byte length = index of highest non-zero group + 1 (min 1).
    nz = groups != 0
    lengths = np.where(
        nz.any(axis=1), 10 - np.argmax(nz[:, ::-1], axis=1), 1
    ).astype(np.int64)
    cont = np.arange(10)[None, :] < (lengths - 1)[:, None]
    groups = np.where(cont, groups | 0x80, groups)
    keep = np.arange(10)[None, :] < lengths[:, None]
    return groups[keep], lengths
