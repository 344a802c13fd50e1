"""Byte-array codecs: PLAIN, DELTA_LENGTH_BYTE_ARRAY, DELTA_BYTE_ARRAY.

Wire formats match the reference (/root/reference/types/byte-array.go):
- PLAIN: 4-byte LE length prefix + raw bytes per value (:21-114)
- DELTA_LENGTH: lengths as DELTA_BINARY_PACKED int32 (block 128, 4
  miniblocks — :13-15,149-151) followed by concatenated value bytes
- DELTA (incremental front coding): shared-prefix lengths vs the previous
  value as DELTA_BINARY_PACKED, then the suffixes as DELTA_LENGTH
  (:225-348; prefix computation ref types/helpers.go:58-71)

All kernels work on (lengths, data) numpy views of Arrow string/binary
buffers — no per-row Python in encode paths. Front-coding caps the probed
prefix at 64 bytes (a shorter-than-maximal prefix is still a valid
encoding) so the pairwise compare stays one fixed-width numpy matrix.
"""

from __future__ import annotations

import numpy as np

from .delta import delta_decode, delta_encode

__all__ = [
    "plain_encode_bytes",
    "plain_decode_bytes",
    "delta_length_encode",
    "delta_length_decode",
    "delta_prefix_encode",
    "delta_prefix_decode",
    "arrow_strings_to_parts",
    "parts_to_arrow_strings",
]

_PREFIX_CAP = 64


def arrow_strings_to_parts(arr) -> tuple[np.ndarray, np.ndarray]:
    """Zero-copy (lengths:int64, data:uint8) from a pa.StringArray/BinaryArray
    with nulls already removed (drop_null) and offset-compacted."""
    import pyarrow as pa

    if arr.null_count:
        raise ValueError("value stream must be null-free")
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    # Normalize to large types so offsets are int64 and slices are exact.
    typ = arr.type
    if pa.types.is_string(typ):
        arr = arr.cast(pa.large_string())
    elif pa.types.is_binary(typ) or pa.types.is_fixed_size_binary(typ):
        arr = arr.cast(pa.large_binary())
    buffers = arr.buffers()
    offsets = np.frombuffer(buffers[1], dtype=np.int64)[
        arr.offset : arr.offset + len(arr) + 1
    ]
    data = (
        np.frombuffer(buffers[2], dtype=np.uint8)
        if buffers[2] is not None
        else np.empty(0, dtype=np.uint8)
    )
    lengths = np.diff(offsets)
    start, stop = int(offsets[0]), int(offsets[-1])
    return lengths, data[start:stop]


def parts_to_arrow_strings(lengths: np.ndarray, data: np.ndarray, binary=False):
    import pyarrow as pa

    offsets = np.concatenate(([0], np.cumsum(lengths, dtype=np.int64)))
    typ = pa.large_binary() if binary else pa.large_string()
    arr = pa.Array.from_buffers(
        typ,
        len(lengths),
        [None, pa.py_buffer(offsets.astype(np.int64)), pa.py_buffer(data)],
    )
    return arr.cast(pa.binary() if binary else pa.string())


def plain_encode_bytes(lengths: np.ndarray, data: np.ndarray) -> bytes:
    n = len(lengths)
    if n == 0:
        return b""
    lengths = lengths.astype(np.int64)
    out_starts = np.concatenate(([0], np.cumsum(lengths + 4)))[:-1]
    total = int(out_starts[-1] + lengths[-1] + 4)
    out = np.empty(total, dtype=np.uint8)
    # Scatter the 4-byte LE length prefixes.
    len_le = lengths.astype("<u4").view(np.uint8).reshape(n, 4)
    out[(out_starts[:, None] + np.arange(4)[None, :]).reshape(-1)] = len_le.reshape(-1)
    # Ragged scatter of the value bytes.
    if len(data):
        data_starts = np.concatenate(([0], np.cumsum(lengths)))[:-1]
        intra = np.arange(len(data), dtype=np.int64) - np.repeat(data_starts, lengths)
        out[np.repeat(out_starts + 4, lengths) + intra] = data
    return out.tobytes()


def plain_decode_bytes(data, count: int) -> tuple[np.ndarray, np.ndarray]:
    """Returns (lengths, data). Sequential by construction (each length
    prefix positions the next); kept for format parity — the engine's fast
    string paths are delta-length / dict / FSST."""
    mv = memoryview(data)
    lengths = np.empty(count, dtype=np.int64)
    chunks = []
    pos = 0
    for i in range(count):
        if pos + 4 > len(mv):
            raise ValueError("truncated PLAIN length prefix")
        ln = int.from_bytes(mv[pos : pos + 4], "little")
        pos += 4
        if pos + ln > len(mv):
            raise ValueError("truncated PLAIN value bytes")
        chunks.append(bytes(mv[pos : pos + ln]))
        pos += ln
        lengths[i] = ln
    blob = b"".join(chunks)
    return lengths, np.frombuffer(blob, dtype=np.uint8)


def delta_length_encode(lengths: np.ndarray, data: np.ndarray) -> bytes:
    enc_lens = delta_encode(lengths.astype(np.int32), dtype=np.int32)
    return enc_lens + data.tobytes()


def delta_length_decode(data, count: int, pos: int = 0):
    lengths, pos = delta_decode(data, pos, dtype=np.int32, expect=count)
    lengths = lengths.astype(np.int64)
    if len(lengths) and int(lengths.min()) < 0:
        raise ValueError("negative value length in stream")
    total = int(lengths.sum())
    if total > len(data) - pos:
        raise ValueError("truncated byte-array data")
    blob = np.frombuffer(data, dtype=np.uint8, count=total, offset=pos)
    return lengths, blob, pos + total


def _common_prefix_lengths(lengths: np.ndarray, data: np.ndarray) -> np.ndarray:
    """prefix_len[i] = shared prefix of value i with value i-1 (0 for i=0),
    capped at _PREFIX_CAP bytes; vectorized via a fixed-width compare matrix."""
    n = len(lengths)
    prefix = np.zeros(n, dtype=np.int64)
    if n <= 1:
        return prefix
    cap = min(_PREFIX_CAP, int(lengths.max()) if n else 0)
    if cap == 0:
        return prefix
    starts = np.concatenate(([0], np.cumsum(lengths)))[:-1]
    # Fixed-width padded view: row i = first `cap` bytes of value i.
    take = np.minimum(lengths, cap)
    mat = np.zeros((n, cap), dtype=np.int16)  # -1 pad never equals a byte
    mat[:] = -1
    idx_rows = np.repeat(np.arange(n), take)
    intra = np.arange(int(take.sum()), dtype=np.int64) - np.repeat(
        np.concatenate(([0], np.cumsum(take)))[:-1], take
    )
    mat[idx_rows, intra] = data[np.repeat(starts, take) + intra]
    eq = mat[1:] == mat[:-1]
    # Common prefix = run of equality from column 0.
    neq_cum = np.cumprod(eq, axis=1)
    prefix[1:] = neq_cum.sum(axis=1)
    np.minimum(prefix, lengths, out=prefix)
    prefix[1:] = np.minimum(prefix[1:], lengths[:-1])
    return prefix


def delta_prefix_encode(lengths: np.ndarray, data: np.ndarray) -> bytes:
    lengths = lengths.astype(np.int64)
    prefix = _common_prefix_lengths(lengths, data)
    suffix_lens = lengths - prefix
    # Gather suffix bytes.
    starts = np.concatenate(([0], np.cumsum(lengths)))[:-1]
    suf_starts = starts + prefix
    intra = (
        np.arange(int(suffix_lens.sum()), dtype=np.int64)
        - np.repeat(np.concatenate(([0], np.cumsum(suffix_lens)))[:-1], suffix_lens)
    )
    suffix_data = data[np.repeat(suf_starts, suffix_lens) + intra]
    enc_prefix = delta_encode(prefix.astype(np.int32), dtype=np.int32)
    return enc_prefix + delta_length_encode(suffix_lens, suffix_data)


def delta_prefix_decode(data, count: int, pos: int = 0):
    prefix, pos = delta_decode(data, pos, dtype=np.int32, expect=count)
    if len(prefix) and int(prefix.min()) < 0:
        raise ValueError("negative prefix length")
    suffix_lens, suffix_data, pos = delta_length_decode(data, count, pos)
    # Sequential front-coding reconstruction (each value needs the previous).
    lengths = prefix.astype(np.int64) + suffix_lens
    if count:
        if int(prefix[0]) != 0:
            raise ValueError("first value cannot share a prefix")
        if count > 1 and bool((prefix[1:] > lengths[:-1]).any()):
            raise ValueError("prefix longer than previous value")
    out = np.empty(int(lengths.sum()), dtype=np.uint8)
    suf_starts = np.concatenate(([0], np.cumsum(suffix_lens)))[:-1]
    out_starts = np.concatenate(([0], np.cumsum(lengths)))[:-1]
    prev_start = 0
    for i in range(count):
        p = int(prefix[i])
        o = int(out_starts[i])
        if p:
            out[o : o + p] = out[prev_start : prev_start + p]
        sl = int(suffix_lens[i])
        if sl:
            s = int(suf_starts[i])
            out[o + p : o + p + sl] = suffix_data[s : s + sl]
        prev_start = o
    return lengths, out, pos


def const_string_array(n: int, s: str) -> "pa.Array":
    """A length-``n`` Arrow string column of the constant ``s``,
    built straight from buffers (offsets = an arange, data = the
    utf-8 bytes tiled by C-level bytes multiplication) — no
    output-sized Python list. The tag/source columns union-shaped
    results stamp per batch go through this."""
    import pyarrow as pa

    b = s.encode()
    total = n * len(b)
    if total > np.iinfo(np.int32).max - 8:
        # int32 offsets would silently wrap negative; no real block
        # gets here (2 GiB of one tag), so fail loudly instead
        raise ValueError(
            f"const_string_array: {n} x {len(b)}-byte value overflows"
            " 32-bit string offsets; split the batch"
        )
    off = (np.arange(0, (n + 1) * len(b), len(b), dtype=np.int32)
           if b else np.zeros(n + 1, np.int32))
    return pa.StringArray.from_buffers(
        n, pa.py_buffer(off.tobytes()), pa.py_buffer(b * n)
    )
