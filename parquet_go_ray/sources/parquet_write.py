"""Engine-native writer for real Parquet files.

The round-3 page reader (``parquet_pages.py``) proved the engine's wire
codecs read what standard writers emit; this module closes the loop in
the other direction: it EMITS standard Parquet files — thrift-compact
``PageHeader``/``FileMetaData``, v1 data pages, dictionary pages — from
the engine's own encoders (``hybrid_encode_sized`` levels,
``hybrid_encode`` dictionary indices, ``plain_*``/``delta_encode``
values), verified by pyarrow and DuckDB reading them back bit-equal
(``tests/test_parquet_write.py``).

This goes past the reference, whose file writer is unfinished
(``layout/rowgroup.go`` is empty and ``PageWriter`` is unimplemented at
``layout/page.go:24-27``); the page shapes follow what its reader
expects (``layout/page-v1.go:69-116`` level+value streams,
``types/dict.go:61-117`` dictionary indices) so a parquet-go user gets
the write half the reference never shipped.

Scope (mirrors the native reader): flat columns —
bool / int32 / int64 / float / double / string / binary /
fixed-size-binary / date32 / timestamp(ms|us|ns), nullable via v1
definition levels — plus ARBITRARY struct/list nesting: one-level
lists/structs take vectorized fast paths (3-level LIST groups / named
groups with multi-level def streams), deeper shapes go through the
general Dremel shredder (``sources/dremel.py`` — fuzz-tested
assemble∘shred identity over random shapes to depth 4), and ``map``
columns as MAP-annotated key_value repeated groups (shredded through
their list<struct<key,value>> view). Encodings per column: ``plain``,
``dict`` (RLE_DICTIONARY data pages + PLAIN dictionary page),
``delta`` (DELTA_BINARY_PACKED, integer columns), ``delta_length``
(DELTA_LENGTH_BYTE_ARRAY) or ``delta_prefix`` (DELTA_BYTE_ARRAY front
coding) for byte-array columns, ``byte_stream_split`` (encoding 9,
fixed-width types; ``auto`` upgrades plain floats only when a sampled
compress-both trial wins). Every page header carries a CRC-32 of its
on-wire payload by default (``write_page_checksum=False`` to drop it);
the native reader verifies whatever CRCs are present. Page compression:
any ``functions/block.py`` codec that Parquet names (snappy / gzip /
brotli / zstd) or none (deep-shredded leaves write PLAIN values).

Each column chunk carries footer ``Statistics`` (min_value / max_value
/ null_count under declared TypeDefinedOrder) mirroring the engine's
blob stats policy (booleans excluded, NaN disables float stats), so
standard readers prune row groups of engine-written files — the
write-side counterpart of the blob zone maps (``pipelines/decode.py``).

At scale the writer is a Ray Data sink: ``write_parquet_files_native``
maps one file per input block (resumable layout — a rerun skips
existing shard files), so 100 TB writes stream with no driver
involvement beyond the task graph.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.block import compress
from ..functions.bytearray import arrow_strings_to_parts, plain_encode_bytes
from ..functions.delta import delta_encode
from ..functions.hybrid import hybrid_encode, hybrid_encode_sized
from ..functions.plain import bss_encode, plain_encode_numeric

__all__ = ["write_parquet_native", "write_parquet_files_native"]

MAGIC = b"PAR1"

# --- thrift compact protocol writer (inverse of parquet_pages._Compact) --

_T_TRUE = 1
_T_FALSE = 2
_T_BYTE = 3
_T_I16 = 4
_T_I32 = 5
_T_I64 = 6
_T_BINARY = 8
_T_LIST = 9
_T_STRUCT = 12


def _uvarint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag(v: int) -> bytes:
    return _uvarint((v << 1) ^ (v >> 63))


class _CompactWriter:
    """Emits thrift compact structs from ``[(field_id, type, value)]``
    lists, sorted by field id as the protocol's delta encoding wants.
    Covers exactly the types Parquet footers use."""

    def __init__(self):
        self.buf = bytearray()

    def struct(self, fields: list[tuple[int, int, object]]) -> None:
        last = 0
        for fid, typ, val in sorted(fields, key=lambda f: f[0]):
            if val is None:
                continue
            wire = typ
            if typ == _T_TRUE:  # bool value lives in the field header
                wire = _T_TRUE if val else _T_FALSE
            delta = fid - last
            if 0 < delta <= 15:
                self.buf.append((delta << 4) | wire)
            else:
                self.buf.append(wire)
                self.buf += _zigzag(fid)
            last = fid
            if typ != _T_TRUE:
                self.value(typ, val)
        self.buf.append(0)  # STOP

    def value(self, typ: int, val) -> None:
        if typ in (_T_BYTE,):
            self.buf.append(val & 0xFF)
        elif typ in (_T_I16, _T_I32, _T_I64):
            self.buf += _zigzag(int(val))
        elif typ == _T_BINARY:
            raw = val.encode() if isinstance(val, str) else bytes(val)
            self.buf += _uvarint(len(raw))
            self.buf += raw
        elif typ == _T_LIST:
            etype, items = val  # (element thrift type, list)
            n = len(items)
            if n < 15:
                self.buf.append((n << 4) | etype)
            else:
                self.buf.append(0xF0 | etype)
                self.buf += _uvarint(n)
            for it in items:
                if etype == _T_STRUCT:
                    self.struct(it)
                elif etype in (_T_TRUE, _T_FALSE):
                    # compact bool LIST elements: one byte, 1=true 2=false
                    self.buf.append(1 if it else 2)
                else:
                    self.value(etype, it)
        elif typ == _T_STRUCT:
            self.struct(val)
        else:
            raise ValueError(f"unsupported thrift type {typ}")


def _struct_bytes(fields: list[tuple[int, int, object]]) -> bytes:
    w = _CompactWriter()
    w.struct(fields)
    return bytes(w.buf)


# --- parquet enums (parquet.thrift) --------------------------------------

BOOLEAN, INT32, INT64, INT96, FLOAT, DOUBLE, BYTE_ARRAY, FLBA = range(8)
PLAIN, PLAIN_DICT, RLE, DELTA_BINARY_PACKED, RLE_DICTIONARY = 0, 2, 3, 5, 8
DELTA_LENGTH_BYTE_ARRAY, DELTA_BYTE_ARRAY, BYTE_STREAM_SPLIT = 6, 7, 9
DATA_PAGE, DICTIONARY_PAGE, DATA_PAGE_V2 = 0, 2, 3
REQUIRED, OPTIONAL = 0, 1

# lz4_raw is parquet's LZ4_RAW (enum 7, block-level LZ4 without frame
# headers — what modern writers emit); the deprecated Hadoop-framed
# LZ4 (enum 5) is read-side only.
_CODEC_ENUM = {"none": 0, "snappy": 1, "gzip": 2, "brotli": 4,
               "zstd": 6, "lz4_raw": 7}

# converted_type enum values (legacy, still what DuckDB keys logical
# strings/timestamps off) + LogicalType union field ids.
_CT_UTF8, _CT_DATE = 0, 6
_CT_TS_MILLIS, _CT_TS_MICROS = 9, 10
_CT_UINT8, _CT_UINT16, _CT_UINT32, _CT_UINT64 = 11, 12, 13, 14


def _timestamp_logical(unit: str, utc: bool) -> list:
    unit_field = {"ms": 1, "us": 2, "ns": 3}[unit]
    # TIMESTAMP = union field 8: {1: isAdjustedToUTC, 2: TimeUnit}.
    # isAdjustedToUTC mirrors Arrow tz-awareness: tz-aware columns are
    # instants (true), tz-naive columns are local semantics (false).
    return [(8, _T_STRUCT, [
        (1, _T_TRUE, utc),
        (2, _T_STRUCT, [(unit_field, _T_STRUCT, [])]),
    ])]


def _column_plan(field: pa.Field) -> dict:
    """Physical type + schema annotations for one Arrow field."""
    t = field.type
    plan = {"phys": None, "type_length": None, "converted": None,
            "logical": None, "cast": None, "list": None, "struct": None}
    if pa.types.is_boolean(t):
        plan["phys"] = BOOLEAN
    elif pa.types.is_int32(t):
        plan["phys"] = INT32
    elif pa.types.is_int64(t):
        plan["phys"] = INT64
    elif pa.types.is_unsigned_integer(t) or pa.types.is_int8(t) \
            or pa.types.is_int16(t):
        # Sub-32-bit and unsigned ints: same-width signed physical type
        # carrying the unsigned bit pattern (uint32 ≥ 2^31 / uint64 ≥
        # 2^63 store as negative INT32/INT64), annotated with both the
        # legacy converted_type (UINT_8..INT_64 = 11..16, what the
        # reference keys decode off at layout/page-dict.go:208-235) and
        # the IntType logical annotation.
        bits = t.bit_width
        signed = not pa.types.is_unsigned_integer(t)
        plan["phys"] = INT64 if bits == 64 else INT32
        plan["converted"] = {
            (False, 8): 11, (False, 16): 12, (False, 32): 13,
            (False, 64): 14, (True, 8): 15, (True, 16): 16,
        }[(signed, bits)]
        plan["logical"] = [(10, _T_STRUCT, [      # INTEGER = union 10
            (1, _T_BYTE, bits), (2, _T_TRUE, signed),
        ])]
    elif pa.types.is_float32(t):
        plan["phys"] = FLOAT
    elif pa.types.is_float64(t):
        plan["phys"] = DOUBLE
    elif pa.types.is_string(t) or pa.types.is_large_string(t):
        plan["phys"] = BYTE_ARRAY
        plan["converted"] = _CT_UTF8
        plan["logical"] = [(1, _T_STRUCT, [])]  # STRING
    elif pa.types.is_binary(t) or pa.types.is_large_binary(t):
        plan["phys"] = BYTE_ARRAY
    elif pa.types.is_fixed_size_binary(t):
        plan["phys"] = FLBA
        plan["type_length"] = t.byte_width
    elif pa.types.is_date32(t):
        plan["phys"] = INT32
        plan["converted"] = _CT_DATE
        plan["logical"] = [(6, _T_STRUCT, [])]  # DATE
    elif pa.types.is_timestamp(t):
        plan["phys"] = INT64
        plan["logical"] = _timestamp_logical(t.unit, utc=t.tz is not None)
        # Legacy converted_type has no UTC flag and most readers take it
        # as instant semantics — only emit it for tz-aware columns.
        if t.unit == "ms" and t.tz is not None:
            plan["converted"] = _CT_TS_MILLIS
        elif t.unit == "us" and t.tz is not None:
            plan["converted"] = _CT_TS_MICROS
        elif t.unit not in ("ms", "us", "ns"):
            raise NotImplementedError(f"timestamp unit {t.unit}")
    elif pa.types.is_struct(t):
        # Parquet group of named leaves; one level of struct over
        # primitive children (deeper nesting delegated to pyarrow).
        children = []
        for i in range(t.num_fields):
            ch = t.field(i)
            if pa.types.is_nested(ch.type):
                raise NotImplementedError(
                    f"column {field.name}.{ch.name}: nested child {ch.type}"
                )
            children.append((ch.name, _column_plan(ch), ch.nullable))
        plan["struct"] = children
    elif pa.types.is_list(t) or pa.types.is_large_list(t):
        # Standard 3-level LIST group; one level of repetition over a
        # primitive element (deeper nesting delegated to pyarrow).
        elem = t.value_field
        if pa.types.is_nested(elem.type):
            raise NotImplementedError(
                f"column {field.name}: nested element type {elem.type}"
            )
        plan["list"] = _column_plan(elem)
        plan["list_elem_nullable"] = elem.nullable
        plan["phys"] = plan["list"]["phys"]
        plan["type_length"] = plan["list"]["type_length"]
        plan["converted"] = 3  # LIST
        plan["logical"] = [(3, _T_STRUCT, [])]  # LIST
    else:
        raise NotImplementedError(
            f"column {field.name}: type {t} (nested/other types are "
            "delegated to pyarrow per SURVEY §2.3)"
        )
    return plan


# --- value encoding -------------------------------------------------------

_NP_BY_PHYS = {INT32: np.int32, INT64: np.int64, FLOAT: np.float32,
               DOUBLE: np.float64}


def _plain_values(arr: pa.Array, phys: int, type_length: int | None) -> bytes:
    """PLAIN-encode a null-free array."""
    if phys == BOOLEAN:
        bits = arr.to_numpy(zero_copy_only=False)
        return np.packbits(bits.astype(np.uint8), bitorder="little").tobytes()
    if phys == BYTE_ARRAY:
        lens, data = arrow_strings_to_parts(arr)
        return plain_encode_bytes(lens, data)
    if phys == FLBA:
        lens, data = arrow_strings_to_parts(arr)
        if len(arr) and not (lens == type_length).all():
            raise ValueError("fixed-size-binary length mismatch")
        return data.tobytes()
    np_vals = arr.to_numpy(zero_copy_only=False)
    return plain_encode_numeric(np_vals.astype(_NP_BY_PHYS[phys], copy=False))


def _stat_bytes(val, phys: int) -> bytes:
    """Plain-encode one statistics value (parquet Statistics min_value /
    max_value convention: LE numerics, raw bytes for BYTE_ARRAY/FLBA)."""
    if phys in _NP_BY_PHYS:
        return np.asarray([val], dtype=_NP_BY_PHYS[phys]).tobytes()
    raw = val.encode() if isinstance(val, str) else bytes(val)
    return raw


def _chunk_statistics(arr: pa.Array, phys: int) -> dict | None:
    """min/max/null_count for one column chunk, mirroring the engine's
    blob stats policy (functions/column.py: booleans excluded, NaN
    disables numeric stats) plus parquet-specific guards: ±0.0
    normalized to (-0.0 min, +0.0 max), long string min/max omitted
    rather than truncated (a truncated max is not an upper bound)."""
    null_count = arr.null_count
    stats = {"null_count": null_count, "min": None, "max": None}
    if phys == BOOLEAN or len(arr) == null_count:
        return stats
    dense = arr.drop_null()
    if phys in (FLOAT, DOUBLE):
        vals = dense.to_numpy(zero_copy_only=False)
        if np.isnan(vals).any():
            return stats
        lo, hi = vals.min(), vals.max()
        if lo == 0.0:
            lo = -0.0
        if hi == 0.0:
            hi = 0.0
        stats["min"], stats["max"] = _stat_bytes(lo, phys), _stat_bytes(hi, phys)
        return stats
    if phys in (INT32, INT64):
        if pa.types.is_unsigned_integer(dense.type):
            # Unsigned logical order: min/max in the uint domain, stat
            # bytes are the (same-width) physical LE bit pattern.
            vals = dense.to_numpy(zero_copy_only=False)
            w = np.uint32 if phys == INT32 else np.uint64
            stats["min"] = np.asarray([vals.min()], dtype=w).tobytes()
            stats["max"] = np.asarray([vals.max()], dtype=w).tobytes()
            return stats
        # Work on the physical representation (date32 -> int32,
        # timestamp -> int64): stats bytes are physical-type plain values.
        dense = dense.cast(pa.int32() if phys == INT32 else pa.int64())
        vals = dense.to_numpy(zero_copy_only=False)
        stats["min"] = _stat_bytes(vals.min(), phys)
        stats["max"] = _stat_bytes(vals.max(), phys)
        return stats
    # BYTE_ARRAY / FLBA: unsigned byte-wise order == Arrow's codepoint
    # order for UTF-8; cap at 64 bytes (omit, never truncate).
    mm = pc.min_max(dense)
    lo, hi = mm["min"].as_py(), mm["max"].as_py()
    if lo is None:
        return stats
    lo_b, hi_b = _stat_bytes(lo, phys), _stat_bytes(hi, phys)
    if len(lo_b) <= 64 and len(hi_b) <= 64:
        stats["min"], stats["max"] = lo_b, hi_b
    return stats


def _boundary_order(page_stats: list, phys: int, unsigned: bool) -> int:
    """ColumnIndex.boundary_order: 1 = ASCENDING / 2 = DESCENDING when
    both the page min and max sequences are monotone in the column's
    declared order (readers may then binary-search the index), else
    0 = UNORDERED. Null pages are skipped (their min/max are empty).
    Unsigned-annotated ints compare in the unsigned domain; strings
    and FLBA compare as raw bytes (their TypeDefinedOrder)."""
    vals = [(mn, mx) for null_page, mn, mx, _nc in page_stats
            if not null_page]
    if len(vals) < 2:
        return 1  # trivially ascending
    if phys in (INT32, INT64, FLOAT, DOUBLE):
        dt = {INT32: "<i4", INT64: "<i8",
              FLOAT: "<f4", DOUBLE: "<f8"}[phys]
        if unsigned:
            dt = {"<i4": "<u4", "<i8": "<u8"}[dt]
        dec = [(np.frombuffer(mn, dt)[0], np.frombuffer(mx, dt)[0])
               for mn, mx in vals]
    else:
        dec = vals  # bytes compare in the declared unsigned-byte order
    mins = [d[0] for d in dec]
    maxs = [d[1] for d in dec]
    if all(a <= b for a, b in zip(mins, mins[1:])) and             all(a <= b for a, b in zip(maxs, maxs[1:])):
        return 1
    if all(a >= b for a, b in zip(mins, mins[1:])) and             all(a >= b for a, b in zip(maxs, maxs[1:])):
        return 2
    return 0


def _truncated_page_bounds(arr: pa.Array, phys: int) -> dict | None:
    """Truncated min/max for a ColumnIndex entry when exact bounds are
    too long (>64 B strings). Unlike chunk Statistics (omit, never
    truncate — a reader treats those as exact), the ColumnIndex is
    pruning-only, so the spec allows a 64-byte PREFIX as the lower
    bound and a prefix with its last byte incremented as the upper
    bound. None when no upper bound exists (max prefix is all 0xFF) —
    the chunk then drops its ColumnIndex as before."""
    if phys not in (BYTE_ARRAY, FLBA):
        return None
    dense = arr.drop_null() if arr.null_count else arr
    if len(dense) == 0:
        return None
    mm = pc.min_max(dense)
    lo, hi = mm["min"].as_py(), mm["max"].as_py()
    if lo is None:
        return None
    lo_b, hi_b = _stat_bytes(lo, phys), _stat_bytes(hi, phys)
    lo_t = lo_b[:64]  # a prefix byte-wise sorts <= the full string
    if len(hi_b) <= 64:
        hi_t = hi_b
    else:
        pre = bytearray(hi_b[:64])
        while pre and pre[-1] == 0xFF:
            pre.pop()  # 0xFF can't increment: shorten, bump earlier byte
        if not pre:
            return None  # all-0xFF prefix has no short upper bound
        pre[-1] += 1
        hi_t = bytes(pre)
    return {"min": lo_t, "max": hi_t}


# Engine codec -> the Parquet wire encoding this writer can emit for it.
# Codecs with no standard wire shape (fsst, for_bitpack, rle_bool, …)
# fall back to PLAIN and let the page compressor take the entropy.
_SELECTOR_TO_WIRE = {
    "dict": "dict",
    "delta": "delta",
    "delta_length": "delta_length",
    "delta_prefix": "delta_prefix",
}


def _page_crc(wire_payload: bytes) -> int:
    """PageHeader.crc (field 4): CRC-32 of the page's on-wire payload —
    everything between the header and the next page, levels included
    for v2 — as the signed i32 thrift carries (matches what pyarrow
    emits with write_page_checksum=True, verified byte-for-byte)."""
    crc = zlib.crc32(wire_payload) & 0xFFFFFFFF
    return crc - (1 << 32) if crc >= (1 << 31) else crc


def _bloom_hash_values(arr: pa.Array, phys: int,
                       type_length: int | None) -> "np.ndarray":
    """XXH64 of each value's PLAIN representation — exactly the bytes
    the file stores (logical ints/timestamps hash their physical
    encoding; byte arrays hash raw bytes, no length prefix)."""
    from ..functions.bloom import _xxh64_matrix, xxh64_bytes

    if phys in (INT32, FLOAT, INT64, DOUBLE):
        width = 4 if phys in (INT32, FLOAT) else 8
        plain = _plain_values(arr, phys, None)
        return _xxh64_matrix(
            np.frombuffer(plain, np.uint8).reshape(-1, width)
        )
    if phys == FLBA:
        plain = _plain_values(arr, phys, type_length)
        return _xxh64_matrix(
            np.frombuffer(plain, np.uint8).reshape(-1, type_length)
        )
    if phys == BYTE_ARRAY:
        lens, data = arrow_strings_to_parts(arr)
        return xxh64_bytes(lens, np.frombuffer(data, np.uint8))
    raise ValueError(
        "bloom filters cover INT32/INT64/FLOAT/DOUBLE/BYTE_ARRAY/FLBA"
        f" columns, not physical type {phys}"
    )


def _maybe_bss(wire: str, dense: pa.Array, phys: int, codec: str) -> str:
    """Upgrade a ``plain`` float column to BYTE_STREAM_SPLIT only when a
    sampled compress-both trial says so. BSS is NOT a universal win:
    it groups exponent bytes into runs (great for smooth physical
    series), but it also destroys whole-value repeats that the block
    codec would otherwise match (decimal-ish prices: measured 1.8x
    WORSE on lineitem doubles) — so measure, don't guess, same posture
    as functions/selector.py."""
    if wire != "plain" or phys not in (FLOAT, DOUBLE) or codec == "none":
        return wire
    sample = dense.slice(0, 4096)
    plain = _plain_values(sample, phys, None)
    split = bss_encode(plain, 4 if phys == FLOAT else 8)
    if len(compress(split, codec)) < 0.98 * len(compress(plain, codec)):
        return "byte_stream_split"
    return wire


def _auto_encoding(arr: pa.Array, phys: int, codec: str = "none") -> str:
    """Column encoding choice for ``auto``: the engine's sampled-stats
    trial selector (functions/selector.py — the realized `allowDict`
    heuristic of the reference), mapped onto the Parquet encodings this
    writer emits; falls back to a cardinality check if the selector
    can't price the type. Float columns that land on ``plain`` get a
    sampled BYTE_STREAM_SPLIT-vs-PLAIN compression trial."""
    if phys == BOOLEAN:
        return "plain"
    n = len(arr)
    if n == 0:
        return "plain"
    dense = arr.drop_null() if arr.null_count else arr
    if len(dense):
        try:
            from ..functions.selector import select_codec

            sel, _comp, _stats = select_codec(dense)
            wire = _SELECTOR_TO_WIRE.get(sel, "plain")
            # The engine's container is laxer than Parquet's wire
            # legality matrix: DELTA_* byte-array encodings exist only
            # for the BYTE_ARRAY physical type (not FLBA), delta-BP
            # only for INT32/INT64.
            if wire in ("delta_length", "delta_prefix") and phys != BYTE_ARRAY:
                wire = "plain"
            if wire == "delta" and phys not in (INT32, INT64):
                wire = "plain"
            return _maybe_bss(wire, dense, phys, codec)
        except (TypeError, ValueError):
            pass
    nunique = pc.count_distinct(arr).as_py()
    if nunique > max(1, n // 2):
        return _maybe_bss("plain", dense, phys, codec)
    return "dict"


class _ColumnChunkWriter:
    """Accumulates the page stream + metadata for one column chunk."""

    def __init__(self, name: str, plan: dict, encoding: str, codec: str,
                 nullable: bool, path: list[str] | None = None,
                 page_version: int = 1, page_checksum: bool = True,
                 bloom_fpp: float | None = None):
        self.name = name
        self.plan = plan
        self.encoding = encoding
        self.codec = codec
        self.nullable = nullable
        if page_version not in (1, 2):
            raise ValueError(f"page_version must be 1 or 2, got {page_version}")
        self.page_version = page_version
        self.page_checksum = page_checksum
        self.bloom_fpp = bloom_fpp
        self.bloom_bytes: bytes | None = None
        self.nullable_elem = bool(plan.get("list_elem_nullable", False))
        self.path = ([name, "list", "element"] if plan.get("list")
                     else [name])
        if path is not None:
            self.path = path
        self.pages = bytearray()
        self.dict_page_len = 0
        self.num_values = 0
        self.uncompressed = 0
        self.encodings: list[int] = []
        self.stats: dict | None = None
        # Page index records (ColumnIndex / OffsetIndex, parquet.thrift
        # optional structures): per DATA page (rel_offset, size,
        # first_row) and (null_page, min, max, null_count). stats_ok
        # drops the ColumnIndex when any page lacks min/max (NaN floats,
        # booleans, >64B strings) — OffsetIndex is emitted regardless.
        self.page_locs: list[tuple[int, int, int]] = []
        # PageEncodingStats (ColumnMetaData field 13): how many pages of
        # each (page_type, encoding) — lets readers decide e.g. that a
        # chunk is fully dictionary-encoded without walking headers.
        self.enc_counts: dict[tuple[int, int], int] = {}
        self.page_stats: list[tuple[bool, bytes, bytes, int]] = []
        self.stats_ok = True
        self.rows_emitted = 0

    def _page(self, header_fields: list, payload: bytes) -> None:
        comp = compress(payload, self.codec) if self.codec != "none" else payload
        # compress() may return the input unchanged marker-free; Parquet
        # requires the declared codec's framing, so fall back to "none"
        # only at the chunk level (codec fixed per chunk) — here comp is
        # always the declared codec's stream.
        hdr = _struct_bytes(header_fields + [
            (2, _T_I32, len(payload)),
            (3, _T_I32, len(comp)),
            (4, _T_I32, _page_crc(comp) if self.page_checksum else None),
        ])
        self.pages += hdr
        self.pages += comp
        self.uncompressed += len(hdr) + len(payload)

    def _finish_bloom(self, values: pa.Array) -> None:
        """Build this chunk's split-block bloom filter over the DISTINCT
        non-null values (one pass: pc.unique sizes the filter and
        bounds the hash work). Serialized shape per parquet-format:
        thrift-compact BloomFilterHeader {numBytes, BLOCK, XXHASH,
        UNCOMPRESSED} followed by the raw bitset."""
        if self.bloom_fpp is None:
            return
        from ..functions.bloom import (
            SplitBlockBloomFilter,
            optimal_num_blocks,
        )

        dense = values.drop_null() if values.null_count else values
        if isinstance(dense, pa.ChunkedArray):
            dense = dense.combine_chunks()
        uniq = pc.unique(dense)
        bf = SplitBlockBloomFilter(
            optimal_num_blocks(len(uniq), self.bloom_fpp)
        )
        if len(uniq):
            bf.insert_hashes(_bloom_hash_values(
                uniq, self.plan["phys"], self.plan["type_length"]
            ))
        bitset = bf.to_bytes()
        self.bloom_bytes = _struct_bytes([
            (1, _T_I32, len(bitset)),
            (2, _T_STRUCT, [(1, _T_STRUCT, [])]),  # algorithm: BLOCK
            (3, _T_STRUCT, [(1, _T_STRUCT, [])]),  # hash: XXHASH
            (4, _T_STRUCT, [(1, _T_STRUCT, [])]),  # compression: UNCOMPRESSED
        ]) + bitset

    def _bss_width(self) -> int:
        phys = self.plan["phys"]
        if phys in (INT32, FLOAT):
            return 4
        if phys in (INT64, DOUBLE):
            return 8
        if phys == FLBA:
            return int(self.plan["type_length"])
        raise ValueError("byte_stream_split needs a fixed-width column "
                         f"(INT32/INT64/FLOAT/DOUBLE/FLBA), not phys {phys}")

    def _dense_payload(self, dense: pa.Array) -> tuple[bytes, int]:
        """Value bytes + wire encoding for a dense (null-free) slice on
        the paths that otherwise emit PLAIN (lists, Dremel leaves, the
        flat byte_stream_split branch)."""
        plain = _plain_values(dense, self.plan["phys"], self.plan["type_length"])
        if self.encoding == "byte_stream_split":
            return bss_encode(plain, self._bss_width()), BYTE_STREAM_SPLIT
        return plain, PLAIN

    def write_dictionary(self, dictionary: pa.Array) -> None:
        payload = _plain_values(
            dictionary, self.plan["phys"], self.plan["type_length"]
        )
        before = len(self.pages)
        self._page(
            [(1, _T_I32, DICTIONARY_PAGE),
             (7, _T_STRUCT, [(1, _T_I32, len(dictionary)),
                             (2, _T_I32, PLAIN)])],
            payload,
        )
        self.dict_page_len = len(self.pages) - before
        self.enc_counts[(DICTIONARY_PAGE, PLAIN)] = (
            self.enc_counts.get((DICTIONARY_PAGE, PLAIN), 0) + 1
        )

    def _emit_data_page(self, n_entries: int, n_rows: int, enc: int,
                        value_bytes: bytes,
                        rep: np.ndarray | None, rep_w: int,
                        defs: np.ndarray | None, def_w: int,
                        n_nulls: int,
                        stats_arr: pa.Array | None = None) -> None:
        """One data page in the chunk's page_version dialect.

        v1 (DATA_PAGE): 4-byte-size-framed hybrid rep + def streams and
        values, compressed as one region. v2 (DATA_PAGE_V2, the read
        shape of ref layout/page-v2.go:12-20): UNFRAMED level streams
        sit uncompressed OUTSIDE the compressed region, their byte
        lengths + per-page num_nulls/num_rows live in the header, and
        only the value bytes pass through the codec.

        ``stats_arr``: the page's value array (nulls included) used for
        the per-page ColumnIndex entry; None drops the chunk's
        ColumnIndex (OffsetIndex still tracks the page)."""
        rel = len(self.pages)
        # Per-page Statistics, computed BEFORE header emission so they
        # can ride in the page header itself (VERDICT r4 item 8; the
        # reference thrift carries DataPageHeader.statistics /
        # DataPageHeaderV2.statistics — /root/reference/parquet/
        # parquet.go DataPageHeader — for Impala-era readers that prune
        # from headers instead of the ColumnIndex). Header stats carry
        # null_count always, min/max only when EXACT — the header
        # Statistics struct predates is_*_value_exact support in most
        # readers, so truncated long-string bounds stay ColumnIndex-only.
        null_page = n_nulls == n_entries
        st_page = None
        st_exact = False
        if not null_page and stats_arr is not None:
            st_page = _chunk_statistics(stats_arr, self.plan["phys"])
            st_exact = st_page is not None and st_page["min"] is not None
            if not st_exact:
                st_page = _truncated_page_bounds(
                    stats_arr, self.plan["phys"]
                )
        hdr_stats: list = [(3, _T_I64, n_nulls)]
        if st_exact:
            hdr_stats += [
                (5, _T_BINARY, st_page["max"]),
                (6, _T_BINARY, st_page["min"]),
            ]
        if self.page_version == 2:
            rl = hybrid_encode(rep, rep_w) if rep is not None else b""
            dl = hybrid_encode(defs, def_w) if defs is not None else b""
            comp = (compress(value_bytes, self.codec)
                    if self.codec != "none" else value_bytes)
            hdr = _struct_bytes([
                (1, _T_I32, DATA_PAGE_V2),
                (2, _T_I32, len(rl) + len(dl) + len(value_bytes)),
                (3, _T_I32, len(rl) + len(dl) + len(comp)),
                (4, _T_I32, (_page_crc(rl + dl + comp)
                             if self.page_checksum else None)),
                (8, _T_STRUCT, [
                    (1, _T_I32, n_entries),
                    (2, _T_I32, n_nulls),
                    (3, _T_I32, n_rows),
                    (4, _T_I32, enc),
                    (5, _T_I32, len(dl)),
                    (6, _T_I32, len(rl)),
                    (7, _T_TRUE, self.codec != "none"),
                    (8, _T_STRUCT, hdr_stats),
                ]),
            ])
            self.pages += hdr
            self.pages += rl
            self.pages += dl
            self.pages += comp
            self.uncompressed += (len(hdr) + len(rl) + len(dl)
                                  + len(value_bytes))
        else:
            body = bytearray()
            if rep is not None:
                body += hybrid_encode_sized(rep, rep_w)
            if defs is not None:
                body += hybrid_encode_sized(defs, def_w)
            body += value_bytes
            self._page(
                [(1, _T_I32, DATA_PAGE),
                 (5, _T_STRUCT, [(1, _T_I32, n_entries), (2, _T_I32, enc),
                                 (3, _T_I32, RLE), (4, _T_I32, RLE),
                                 (5, _T_STRUCT, hdr_stats)])],
                bytes(body),
            )
        self.num_values += n_entries
        if enc not in self.encodings:
            self.encodings.append(enc)
        page_type = DATA_PAGE_V2 if self.page_version == 2 else DATA_PAGE
        self.enc_counts[(page_type, enc)] = (
            self.enc_counts.get((page_type, enc), 0) + 1
        )
        self.page_locs.append((rel, len(self.pages) - rel, self.rows_emitted))
        self.rows_emitted += n_rows
        if not self.stats_ok:
            return
        if null_page:
            self.page_stats.append((True, b"", b"", n_nulls))
        elif st_page is None or st_page["min"] is None:
            self.stats_ok = False
        else:
            self.page_stats.append(
                (False, st_page["min"], st_page["max"], n_nulls)
            )

    def write_data_page(self, arr: pa.Array, value_bytes: bytes,
                        enc: int, defs: np.ndarray | None = None,
                        max_def: int | None = None) -> None:
        """One flat/struct-leaf data page. Default def levels come from
        the array's validity (flat nullable column, max_def 1); struct
        leaves pass precomputed multi-level defs instead."""
        n = len(arr)
        if defs is not None:
            def_w = max(1, int(max_def).bit_length())
            n_nulls = n - int((defs == max_def).sum())
        elif self.nullable:
            defs = np.ones(n, dtype=np.uint8) if arr.null_count == 0 else (
                ~np.asarray(pc.is_null(arr))).astype(np.uint8)
            def_w = 1
            n_nulls = n - int(defs.sum())
        else:
            def_w = 0
            n_nulls = 0
        self._emit_data_page(n, n, enc, value_bytes, None, 0,
                             defs, def_w, n_nulls, stats_arr=arr)

    def _add_list_rows(self, arr, page_rows: int) -> None:
        """Shred a one-level list column into v1 pages: rep levels +
        def levels (both 4-byte-size-framed hybrid) + PLAIN dense
        element values. Level semantics per the 3-level LIST group:
        def = max for a present element, max-1 for a null element (when
        the element is optional), then empty list, then null list."""
        elem_opt = self.nullable_elem
        max_def = (1 if self.nullable else 0) + 1 + (1 if elem_opt else 0)
        def_empty = max_def - 1 - (1 if elem_opt else 0)
        def_width = max(1, int(max_def).bit_length())
        phys = self.plan["phys"]

        offsets = np.asarray(arr.offsets, dtype=np.int64)
        list_valid = (
            np.ones(len(arr), dtype=bool) if arr.null_count == 0
            else ~np.asarray(pc.is_null(arr))
        )
        lens = offsets[1:] - offsets[:-1]
        lens_eff = np.where(list_valid, lens, 0)
        child = arr.values

        n_rows = len(arr)
        for s in range(0, max(1, n_rows), page_rows):
            e = min(s + page_rows, n_rows)
            pl = lens_eff[s:e]
            pvalid = list_valid[s:e]
            slots = np.maximum(pl, 1)
            total = int(slots.sum())
            starts = np.zeros(len(slots), dtype=np.int64)
            np.cumsum(slots[:-1], out=starts[1:])
            rep = np.ones(total, dtype=np.uint8)
            rep[starts] = 0
            row_id = np.repeat(np.arange(len(slots)), slots)
            elem_slot = pl[row_id] > 0  # rows with >=1 element fill all slots

            # Gather this page's elements (valid, non-empty lists only).
            m = pvalid & (pl > 0)
            lm = pl[m]
            if lm.size:
                base = np.repeat(offsets[s:e][m], lm)
                intra = np.arange(int(lm.sum())) - np.repeat(
                    np.concatenate(([0], np.cumsum(lm[:-1]))), lm
                )
                elems = child.take(pa.array(base + intra, pa.int64()))
            else:
                elems = child.slice(0, 0)

            defs = np.empty(total, dtype=np.uint8)
            defs[~elem_slot] = np.where(
                pvalid, def_empty, max(def_empty - 1, 0)
            )[row_id[~elem_slot]]
            if elem_opt:
                evalid = (
                    np.ones(len(elems), dtype=np.uint8)
                    if elems.null_count == 0
                    else (~np.asarray(pc.is_null(elems))).astype(np.uint8)
                )
                defs[elem_slot] = (max_def - 1) + evalid
            else:
                if elems.null_count:
                    raise ValueError("null element in non-nullable list")
                defs[elem_slot] = max_def

            dense = elems.drop_null()
            value_bytes, enc = self._dense_payload(dense)
            self._emit_data_page(
                total, e - s, enc, value_bytes,
                rep, 1, defs, def_width,
                total - int((defs == max_def).sum()),
                stats_arr=elems,
            )

    def add_shredded(self, leaf, page_rows: int) -> None:
        """Write a general Dremel leaf (sources/dremel.py): v1 pages of
        rep stream + def stream + PLAIN dense values, split on row
        boundaries (rep == 0). Used for depth >= 2 columns."""
        rep_w = max(1, int(leaf.max_rep).bit_length())
        def_w = max(1, int(leaf.max_def).bit_length())
        phys = self.plan["phys"]
        row_starts = np.flatnonzero(leaf.rep == 0)
        self.stats = _chunk_statistics(leaf.dense, phys)
        self._finish_bloom(leaf.dense)
        self.stats["null_count"] = len(leaf.de) - len(leaf.dense)
        cum = np.zeros(len(leaf.de) + 1, dtype=np.int64)
        np.cumsum(leaf.de == leaf.max_def, out=cum[1:])
        for s in range(0, max(1, len(row_starts)), page_rows):
            a = int(row_starts[s]) if len(row_starts) else 0
            e = s + page_rows
            b = (int(row_starts[e]) if e < len(row_starts)
                 else len(leaf.rep))
            rep_sl = leaf.rep[a:b]
            de_sl = leaf.de[a:b]
            v0 = int(cum[a])
            nv = int(cum[b] - cum[a])
            dense_sl = leaf.dense.slice(v0, nv)
            value_bytes, enc = self._dense_payload(dense_sl)
            self._emit_data_page(
                len(rep_sl), int((rep_sl == 0).sum()), enc, value_bytes,
                rep_sl if leaf.max_rep > 0 else None, rep_w,
                de_sl, def_w, len(de_sl) - nv,
                stats_arr=dense_sl,
            )

    def add_rows(self, arr: pa.Array, page_rows: int,
                 defs: np.ndarray | None = None,
                 max_def: int | None = None) -> None:
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        enc_name = self.encoding
        phys = self.plan["phys"]
        if self.plan["list"] is not None:
            if pa.types.is_large_list(arr.type):
                arr = arr.cast(pa.list_(arr.type.value_field))
            flat = arr.flatten()
            st = _chunk_statistics(flat, phys)
            # Parquet null_count over a repeated leaf counts every level
            # entry that carries no value (null/empty lists included).
            n_entries = int(np.maximum(
                np.diff(np.asarray(arr.offsets, dtype=np.int64))
                * (~np.asarray(pc.is_null(arr)) if arr.null_count else 1),
                1,
            ).sum()) if len(arr) else 0
            st["null_count"] = n_entries - (len(flat) - flat.null_count)
            self.stats = st
            self._finish_bloom(flat)
            self._add_list_rows(arr, page_rows)
            return
        self.stats = _chunk_statistics(arr, phys)
        self._finish_bloom(arr)
        if enc_name == "auto":
            enc_name = _auto_encoding(arr, phys, self.codec)
        if enc_name == "dict":
            # One dictionary for the whole chunk (Parquet requirement:
            # the dictionary page precedes all data pages).
            denc = pc.dictionary_encode(
                arr.cast(pa.large_string())
                if pa.types.is_string(arr.type) else arr
            )
            dictionary = denc.dictionary
            if pa.types.is_large_string(dictionary.type):
                dictionary = dictionary.cast(pa.string())
            self.write_dictionary(dictionary)
            idx = denc.indices
            width = max(1, (max(1, len(dictionary)) - 1).bit_length())
            for s in range(0, max(1, len(arr)), page_rows):
                sl = arr.slice(s, page_rows)
                isl = idx.slice(s, page_rows)
                ivals = np.asarray(isl.drop_null(), dtype=np.uint64)
                self.write_data_page(
                    sl, bytes([width]) + hybrid_encode(ivals, width),
                    RLE_DICTIONARY,
                    defs=None if defs is None else defs[s:s + page_rows],
                    max_def=max_def,
                )
            return
        for s in range(0, max(1, len(arr)), page_rows):
            sl = arr.slice(s, page_rows)
            dense = sl.drop_null()
            pd_ = None if defs is None else defs[s:s + page_rows]
            if enc_name == "delta":
                if phys not in (INT32, INT64):
                    raise ValueError("delta encoding needs int32/int64")
                # Logical ints (date32, timestamps) delta-encode on the
                # physical representation; unsigned ints reinterpret the
                # bit pattern (an Arrow value cast would overflow).
                if pa.types.is_unsigned_integer(dense.type):
                    vals = dense.to_numpy(zero_copy_only=False).astype(
                        _NP_BY_PHYS[phys], copy=False
                    )
                else:
                    ivals = dense.cast(
                        pa.int32() if phys == INT32 else pa.int64()
                    )
                    vals = np.asarray(
                        ivals.to_numpy(zero_copy_only=False),
                        dtype=_NP_BY_PHYS[phys],
                    )
                self.write_data_page(
                    sl, delta_encode(vals, dtype=vals.dtype),
                    DELTA_BINARY_PACKED, defs=pd_, max_def=max_def,
                )
            elif enc_name in ("delta_length", "delta_prefix"):
                if phys != BYTE_ARRAY:
                    raise ValueError(f"{enc_name} needs a byte-array column")
                from ..functions.bytearray import (
                    delta_length_encode,
                    delta_prefix_encode,
                )

                lens, data = arrow_strings_to_parts(dense)
                if enc_name == "delta_length":
                    payload = delta_length_encode(lens, data)
                    wire = DELTA_LENGTH_BYTE_ARRAY
                else:
                    payload = delta_prefix_encode(lens, data)
                    wire = DELTA_BYTE_ARRAY
                self.write_data_page(
                    sl, payload, wire, defs=pd_, max_def=max_def,
                )
            elif enc_name == "byte_stream_split":
                plain = _plain_values(dense, phys, self.plan["type_length"])
                self.write_data_page(
                    sl, bss_encode(plain, self._bss_width()),
                    BYTE_STREAM_SPLIT, defs=pd_, max_def=max_def,
                )
            elif enc_name == "plain":
                self.write_data_page(
                    sl,
                    _plain_values(dense, phys, self.plan["type_length"]),
                    PLAIN, defs=pd_, max_def=max_def,
                )
            else:
                raise ValueError(f"unknown encoding {enc_name!r}")

    def metadata_fields(self, file_offset: int) -> list:
        encs = [RLE] + self.encodings + (
            [PLAIN] if self.dict_page_len else []
        )
        fields = [
            (1, _T_I32, self.plan["phys"]),
            (2, _T_LIST, (_T_I32, encs)),
            (3, _T_LIST, (_T_BINARY, self.path)),
            (4, _T_I32, _CODEC_ENUM[self.codec]),
            (5, _T_I64, self.num_values),
            (6, _T_I64, self.uncompressed),
            (7, _T_I64, len(self.pages)),
            (9, _T_I64, file_offset + self.dict_page_len),
        ]
        if self.dict_page_len:
            fields.append((11, _T_I64, file_offset))
        if self.enc_counts:
            fields.append((13, _T_LIST, (_T_STRUCT, [
                [(1, _T_I32, pt), (2, _T_I32, enc), (3, _T_I32, cnt)]
                for (pt, enc), cnt in sorted(self.enc_counts.items())
            ])))
        if self.stats is not None:
            # Statistics struct: 3=null_count, 5=max_value, 6=min_value
            # (the modern TYPE_DEFINED_ORDER pair; legacy 1/2 omitted —
            # readers that predate min_value/max_value assumed an
            # ill-defined sort order for them).
            st = [(3, _T_I64, self.stats["null_count"])]
            if self.stats["min"] is not None:
                st.append((5, _T_BINARY, self.stats["max"]))
                st.append((6, _T_BINARY, self.stats["min"]))
            fields.append((12, _T_STRUCT, st))
        return fields


REPEATED = 2


def _leaf_element(name: str, repetition: int, plan: dict) -> list:
    el = [
        (1, _T_I32, plan["phys"]),
        (3, _T_I32, repetition),
        (4, _T_BINARY, name),
    ]
    if plan["type_length"] is not None:
        el.append((2, _T_I32, plan["type_length"]))
    if plan["converted"] is not None:
        el.append((6, _T_I32, plan["converted"]))
    if plan["logical"] is not None:
        el.append((10, _T_STRUCT, plan["logical"]))
    return el


def _emit_field(out: list, field: pa.Field) -> None:
    """Recursive SchemaElement emission for any struct/list nesting."""
    t = field.type
    rep = OPTIONAL if field.nullable else REQUIRED
    if pa.types.is_struct(t):
        out.append([
            (3, _T_I32, rep),
            (4, _T_BINARY, field.name),
            (5, _T_I32, t.num_fields),
        ])
        for i in range(t.num_fields):
            _emit_field(out, t.field(i))
    elif pa.types.is_map(t):
        # optional group f (MAP) { repeated group key_value {
        #   required key; value } }
        out.append([
            (3, _T_I32, rep),
            (4, _T_BINARY, field.name),
            (5, _T_I32, 1),
            (6, _T_I32, 1),              # ConvertedType MAP
            (10, _T_STRUCT, [(2, _T_STRUCT, [])]),  # LogicalType MAP
        ])
        out.append([(3, _T_I32, REPEATED), (4, _T_BINARY, "key_value"),
                    (5, _T_I32, 2)])
        _emit_field(out, pa.field("key", t.key_type, nullable=False))
        iv = t.item_field
        _emit_field(out, pa.field("value", iv.type, iv.nullable))
    elif pa.types.is_list(t) or pa.types.is_large_list(t):
        # optional group f (LIST) { repeated group list { element } }
        out.append([
            (3, _T_I32, rep),
            (4, _T_BINARY, field.name),
            (5, _T_I32, 1),
            (6, _T_I32, 3),              # ConvertedType LIST
            (10, _T_STRUCT, [(3, _T_STRUCT, [])]),  # LogicalType LIST
        ])
        out.append([(3, _T_I32, REPEATED), (4, _T_BINARY, "list"),
                    (5, _T_I32, 1)])
        elem = t.value_field
        _emit_field(out, pa.field("element", elem.type, elem.nullable))
    else:
        out.append(_leaf_element(field.name, rep, _column_plan(field)))


def _count_leaves(t: pa.DataType) -> int:
    if pa.types.is_map(t):
        return _count_leaves(t.key_type) + _count_leaves(t.item_type)
    if pa.types.is_struct(t):
        return sum(_count_leaves(t.field(i).type) for i in range(t.num_fields))
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return _count_leaves(t.value_type)
    return 1


def _map_as_list(arr: pa.Array) -> tuple[pa.Field, pa.Array]:
    """View a MapArray as list<struct<key, value>> for Dremel shredding
    (same physical layout; the MAP annotations live in the schema)."""
    t = arr.type
    entry = pa.struct([
        pa.field("key", t.key_type, nullable=False),
        pa.field("value", t.item_field.type, t.item_field.nullable),
    ])
    entries = pa.StructArray.from_arrays(
        [arr.keys, arr.items], fields=list(entry),
    )
    mask = None
    if arr.null_count:
        mask = pc.is_null(arr)
    offsets = np.asarray(arr.offsets, dtype=np.int32)
    return (
        pa.field("kv", pa.list_(pa.field("element", entry, nullable=False))),
        pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), entries,
            type=pa.list_(pa.field("element", entry, nullable=False)),
            mask=mask,
        ),
    )


def _schema_elements(schema: pa.Schema, plans: list[dict]) -> list:
    root = [(4, _T_BINARY, "schema"), (5, _T_I32, len(schema))]
    out = [root]
    for field in schema:
        _emit_field(out, field)
    return out


def _bloom_for(bloom_columns: dict | None, path: list[str]) -> float | None:
    """fpp for a leaf: bloom_filter_columns entries match the top-level
    column name or the dotted leaf path (struct children, map leaves)."""
    if not bloom_columns:
        return None
    return bloom_columns.get(path[0], bloom_columns.get(".".join(path)))


def _field_chunk_writers(field: pa.Field, plan: dict, col, encodings: dict,
                         codec: str, data_page_rows: int,
                         page_version: int = 1, page_checksum: bool = True,
                         bloom_columns: dict | None = None):
    """Encode one top-level field into its leaf column-chunk writers:
    one chunk for flat/list fields, one per child for struct fields
    (each child leaf gets multi-level def levels: 0 = struct null,
    parent level = child null, max = value present)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    from .dremel import column_depth, shred_column

    if pa.types.is_map(field.type):
        # Shred the list<struct<key,value>> view; schema carries the
        # MAP group shape, so leaf paths rewrite to f.key_value.{key,value}.
        lfield, larr = _map_as_list(col)
        lfield = pa.field(lfield.name, lfield.type, field.nullable)
        for leaf in shred_column(lfield, larr):
            path = [field.name, "key_value"] + leaf.path[3:]
            cw = _ColumnChunkWriter(
                path[-1], _column_plan(leaf.field), "plain", codec,
                nullable=leaf.field.nullable, path=path,
                page_version=page_version, page_checksum=page_checksum,
                bloom_fpp=_bloom_for(bloom_columns, path),
            )
            cw.add_shredded(leaf, data_page_rows)
            yield cw
        return
    if plan is None or column_depth(field.type) >= 2:
        # General Dremel shredding for multi-level nesting; leaf order
        # == depth-first schema order (what the footer declares).
        for leaf in shred_column(field, col):
            cw = _ColumnChunkWriter(
                leaf.path[-1], _column_plan(leaf.field), "plain", codec,
                nullable=leaf.field.nullable, path=leaf.path,
                page_version=page_version, page_checksum=page_checksum,
                bloom_fpp=_bloom_for(bloom_columns, leaf.path),
            )
            cw.add_shredded(leaf, data_page_rows)
            yield cw
        return
    if plan["struct"] is None:
        cw = _ColumnChunkWriter(
            field.name, plan, encodings.get(field.name, "auto"), codec,
            field.nullable, page_version=page_version,
            page_checksum=page_checksum,
            bloom_fpp=_bloom_for(bloom_columns, [field.name]),
        )
        cw.add_rows(col, data_page_rows)
        yield cw
        return

    struct_opt = field.nullable
    svalid = (
        np.ones(len(col), dtype=bool) if col.null_count == 0
        else ~np.asarray(pc.is_null(col))
    )
    svalid_arr = pa.array(svalid)
    for ci, (ch_name, ch_plan, ch_nullable) in enumerate(plan["struct"]):
        child = col.field(ci)
        # Mask child slots under null structs (Arrow children keep
        # independent validity there; Parquet has no value at all).
        if col.null_count:
            child = pc.if_else(
                svalid_arr, child, pa.nulls(len(child), child.type)
            )
        max_def = (1 if struct_opt else 0) + (1 if ch_nullable else 0)
        cvalid = (
            np.ones(len(child), dtype=bool) if child.null_count == 0
            else ~np.asarray(pc.is_null(child))
        )
        if ch_nullable:
            defs = svalid.astype(np.uint8) + (svalid & cvalid)
        else:
            if not bool((cvalid | ~svalid).all()):
                raise ValueError(
                    f"null value in non-nullable child {field.name}.{ch_name}"
                )
            defs = svalid.astype(np.uint8) * max_def
        cw = _ColumnChunkWriter(
            ch_name, ch_plan,
            encodings.get(f"{field.name}.{ch_name}", "auto"), codec,
            nullable=max_def > 0, path=[field.name, ch_name],
            page_version=page_version, page_checksum=page_checksum,
            bloom_fpp=_bloom_for(bloom_columns, [field.name, ch_name]),
        )
        cw.add_rows(
            child, data_page_rows,
            defs=defs if max_def > 0 else None,
            max_def=max_def if max_def > 0 else None,
        )
        yield cw


def write_parquet_native(
    table: pa.Table,
    path: str,
    *,
    codec: str = "zstd",
    encodings: dict[str, str] | None = None,
    row_group_rows: int = 1_000_000,
    data_page_rows: int = 20_000,
    page_version: int = 1,
    write_page_checksum: bool = True,
    bloom_filter_columns=None,
    bloom_filter_fpp: float = 0.01,
) -> dict:
    """Write ``table`` as a standard Parquet file using the engine's
    wire encoders. ``encodings`` maps column name → ``plain`` / ``dict``
    / ``delta`` (default ``auto``: dictionary when ≤50% unique).
    ``page_version=2`` emits DATA_PAGE_V2 pages (uncompressed unframed
    level streams, per-page num_nulls/num_rows — the read shape of ref
    layout/page-v2.go:12-20). Returns ``{path, rows, bytes,
    row_groups}``."""
    if codec not in _CODEC_ENUM:
        raise ValueError(f"parquet has no codec {codec!r}")
    if bloom_filter_columns and not isinstance(bloom_filter_columns, dict):
        bloom_filter_columns = {
            c: bloom_filter_fpp for c in bloom_filter_columns
        }
    from .dremel import column_depth

    # depth >= 2 columns and maps go through the general Dremel
    # shredder; their leaf plans are built per leaf in
    # _field_chunk_writers.
    plans = [None if (column_depth(f.type) >= 2 or pa.types.is_map(f.type))
             else _column_plan(f) for f in table.schema]
    encodings = encodings or {}
    row_groups: list[list] = []
    with open(path, "wb") as f:
        f.write(MAGIC)
        offset = len(MAGIC)
        index_chunks: list[tuple[list, _ColumnChunkWriter, int]] = []
        for rg_start in range(0, max(1, table.num_rows), row_group_rows):
            rg = table.slice(rg_start, row_group_rows)
            chunk_fields = []
            total_comp = 0
            rg_offset = offset
            for i, field in enumerate(table.schema):
                for cw in _field_chunk_writers(
                    field, plans[i], rg.column(i), encodings, codec,
                    data_page_rows, page_version=page_version,
                    page_checksum=write_page_checksum,
                    bloom_columns=bloom_filter_columns,
                ):
                    meta = cw.metadata_fields(offset)
                    fields = [
                        (2, _T_I64, offset),
                        (3, _T_STRUCT, meta),
                    ]
                    chunk_fields.append(fields)
                    index_chunks.append((fields, cw, offset))
                    f.write(cw.pages)
                    offset += len(cw.pages)
                    total_comp += len(cw.pages)
                    # free the compressed pages now that they're on disk;
                    # the bloom/index/footer loops below only need
                    # page_locs/page_stats/bloom_bytes/plan (ADVICE r4:
                    # keeping them retained the whole file in memory)
                    cw.pages = b""
            row_groups.append([
                (1, _T_LIST, (_T_STRUCT, chunk_fields)),
                (2, _T_I64, sum(
                    fld[2] for ch in chunk_fields
                    for fld in ch[1][2] if fld[0] == 6
                )),
                (3, _T_I64, rg.num_rows),
                (5, _T_I64, rg_offset),
                (6, _T_I64, total_comp),
            ])
        # Bloom filter region (parquet-format BloomFilter.md): each
        # chunk's thrift BloomFilterHeader + raw SBBF bitset, pointed at
        # by ColumnMetaData.bloom_filter_offset/_length (fields 14/15).
        for fields, cw, _choff in index_chunks:
            if cw.bloom_bytes:
                meta = fields[1][2]  # the (3, STRUCT, ColumnMetaData) list
                meta.append((14, _T_I64, offset))
                meta.append((15, _T_I32, len(cw.bloom_bytes)))
                f.write(cw.bloom_bytes)
                offset += len(cw.bloom_bytes)
        # Page index (optional ColumnIndex/OffsetIndex structures, the
        # spec's layout: all column indexes, then all offset indexes,
        # between the last data page and the footer). ColumnIndex is
        # omitted for chunks where any page lacks min/max (NaN floats,
        # booleans, >64B strings — same policy as chunk Statistics);
        # OffsetIndex (page locations + first_row_index) always emits.
        for fields, cw, _choff in index_chunks:
            if cw.stats_ok and cw.page_stats:
                unsigned = (cw.plan.get("converted") or 0) in (
                    _CT_UINT8, _CT_UINT16, _CT_UINT32, _CT_UINT64
                )
                ci = _struct_bytes([
                    (1, _T_LIST, (_T_TRUE, [s[0] for s in cw.page_stats])),
                    (2, _T_LIST, (_T_BINARY, [s[1] for s in cw.page_stats])),
                    (3, _T_LIST, (_T_BINARY, [s[2] for s in cw.page_stats])),
                    (4, _T_I32, _boundary_order(
                        cw.page_stats, cw.plan["phys"], unsigned
                    )),
                    (5, _T_LIST, (_T_I64, [s[3] for s in cw.page_stats])),
                ])
                f.write(ci)
                fields.append((6, _T_I64, offset))
                fields.append((7, _T_I32, len(ci)))
                offset += len(ci)
        for fields, cw, choff in index_chunks:
            oi = _struct_bytes([
                (1, _T_LIST, (_T_STRUCT, [
                    [(1, _T_I64, choff + rel),
                     (2, _T_I32, size),
                     (3, _T_I64, frow)]
                    for rel, size, frow in cw.page_locs
                ])),
            ])
            f.write(oi)
            fields.append((4, _T_I64, offset))
            fields.append((5, _T_I32, len(oi)))
            offset += len(oi)
        footer = _struct_bytes([
            (1, _T_I32, 2),  # format version
            (2, _T_LIST, (_T_STRUCT, _schema_elements(table.schema, plans))),
            (3, _T_I64, table.num_rows),
            (4, _T_LIST, (_T_STRUCT, row_groups)),
            (6, _T_BINARY, "parquet_go_ray native writer"),
            # column_orders: TYPE_ORDER for every leaf — without this,
            # readers must ignore Statistics min_value/max_value.
            (7, _T_LIST, (_T_STRUCT, [
                [(1, _T_STRUCT, [])]
                for f in table.schema
                for _ in range(_count_leaves(f.type))
            ])),
        ])
        f.write(footer)
        f.write(len(footer).to_bytes(4, "little"))
        f.write(MAGIC)
        size = f.tell()
    return {"path": path, "rows": table.num_rows, "bytes": size,
            "row_groups": len(row_groups)}


def write_parquet_files_native(
    ds,
    out_dir: str,
    *,
    codec: str = "zstd",
    encodings: dict[str, str] | None = None,
    data_page_rows: int = 20_000,
    rows_per_file: int | None = 250_000,
    page_version: int = 1,
    write_page_checksum: bool = True,
    bloom_filter_columns=None,
):
    """Ray Data sink: one engine-written Parquet file per ~rows_per_file
    rows (consecutive input blocks coalesce into a batch — no shuffle;
    ``rows_per_file=None`` writes one file per input block). Coalescing
    keeps shards file-sized at 100 TB instead of emitting one tiny file
    per upstream block, and amortizes the per-file codec selection.

    Shard names are deterministic per (batch content hash), so a rerun
    over the same input skips files that already exist — the same
    resumable-output contract as the blob pipeline. Two DISTINCT batches
    with identical content do not collapse (ADVICE r3): each task claims
    one ``-<k>`` suffix slot per content hash via an O_EXCL marker in a
    per-run scratch dir, so the second batch lands on the next suffix
    instead of silently dropping its rows. Returns a Dataset of
    ``{path, rows, bytes}`` manifest rows."""
    import hashlib
    import os
    import shutil
    import uuid

    os.makedirs(out_dir, exist_ok=True)
    # Per-run slot markers: "<stem>-<k>" exists ⇔ a task of THIS run owns
    # suffix k for that content hash. Older runs' marker dirs are dead
    # weight (their final files speak for themselves) — prune them now;
    # concurrent runs into one out_dir are not a supported contract.
    for d in os.listdir(out_dir):
        if d.startswith(".run-"):
            shutil.rmtree(os.path.join(out_dir, d), ignore_errors=True)
    run_dir = os.path.join(out_dir, f".run-{uuid.uuid4().hex[:12]}")
    os.makedirs(run_dir, exist_ok=True)

    def _write(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"path": pa.array([], pa.string()),
                             "rows": pa.array([], pa.int64()),
                             "bytes": pa.array([], pa.int64())})
        h = hashlib.sha1()
        for col in batch.columns:
            for buf in col.combine_chunks().buffers():
                if buf is not None:
                    h.update(buf)
        stem = f"part-{h.hexdigest()[:16]}"
        k = 0
        while True:
            try:  # claim suffix slot k for this content hash, race-safe
                fd = os.open(os.path.join(run_dir, f"{stem}-{k}"),
                             os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            except FileExistsError:
                k += 1  # a same-content sibling of THIS run owns slot k
                continue
            os.close(fd)
            name = f"{stem}.parquet" if k == 0 else f"{stem}-{k}.parquet"
            path = os.path.join(out_dir, name)
            if os.path.exists(path):  # prior completed run: resume-skip
                size = os.path.getsize(path)
            else:
                tmp = path + ".tmp"
                info = write_parquet_native(
                    batch, tmp, codec=codec, encodings=encodings,
                    data_page_rows=data_page_rows,
                    page_version=page_version,
                    write_page_checksum=write_page_checksum,
                    bloom_filter_columns=bloom_filter_columns,
                )
                os.replace(tmp, path)
                size = info["bytes"]
            break
        return pa.table({"path": [path], "rows": [batch.num_rows],
                         "bytes": [size]})

    return ds.map_batches(
        _write, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=rows_per_file,
    )
