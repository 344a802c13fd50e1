"""Partition blob: the engine's file format.

Where the reference assembles pages → chunks → row groups → a footer'd
Parquet file (the part left unimplemented in the snapshot —
/root/reference/layout/rowgroup.go is empty, PageWriter unimplemented at
layout/page.go:24-27), our container is deliberately simple: one blob per
encoded partition, header-first (we write once, never append):

    b"PGRB1" | uint32 header_len | header JSON (utf-8) | segment bytes

The header carries the Arrow schema (IPC-serialized, exact round-trip),
row count, and per column: codec id, block compression, segment offsets
and lengths, null count, min/max stats, and the dictionary symbol-table
hash — the same metadata surface as the reference's column chunk +
statistics thrift structs (parquet.ColumnMetaData), minus thrift.
"""

from __future__ import annotations

import base64
import json
import zlib

import pyarrow as pa

from ..functions.column import decode_column, encode_column
from ..functions.selector import select_codec

MAGIC = b"PGRB1"

__all__ = ["encode_table", "decode_table", "read_header", "MAGIC"]


def encode_table(
    table: pa.Table,
    choices: dict[str, tuple[str, str]] | None = None,
    page_rows: int | None = None,
) -> tuple[bytes, dict]:
    """Encode a pyarrow Table into a blob.

    ``choices`` maps column name → (codec, compression); unlisted columns
    go through the sampled-stats auto-selector. ``page_rows`` splits each
    column into independently decodable pages (the reference's
    page-within-chunk granularity, layout/chunk.go:129-217) so row-range
    decodes touch only the overlapping pages. Returns (blob, meta) where
    meta is the manifest-ready summary (rows, per-column codec/sizes/hash).
    """
    table = table.combine_chunks()
    columns_meta = []
    segments: list[bytes] = []
    offset = 0
    for name in table.column_names:
        arr = table.column(name)
        if isinstance(arr, pa.ChunkedArray):
            arr = (
                arr.combine_chunks()
                if arr.num_chunks != 1
                else arr.chunk(0)
            )
        sel_note = None
        if choices and name in choices:
            codec, compression = choices[name]
        elif pa.types.is_nested(arr.type):
            # list/struct/map: Dremel-style recursive encode; each nested
            # child picks its own codec inside encode_column, so the
            # container itself stays uncompressed.
            codec, compression = "nested", "none"
        else:
            values = arr.drop_null()
            codec, compression, sel_stats = select_codec(values)
            sel_note = sel_stats.get("codec_note")
        validity_seg, value_seg, colmeta = encode_column(
            arr, codec, compression, page_rows=page_rows
        )
        colmeta["name"] = name
        if sel_note:
            colmeta["codec_note"] = sel_note
        # Per-column segment checksum (the integrity role of Parquet's
        # optional page CRC): a bit flip in raw value bytes would
        # otherwise decode silently.
        colmeta["crc32"] = zlib.crc32(value_seg, zlib.crc32(validity_seg))
        colmeta["validity_offset"] = offset
        colmeta["validity_len"] = len(validity_seg)
        offset += len(validity_seg)
        colmeta["value_offset"] = offset
        colmeta["value_len"] = len(value_seg)
        offset += len(value_seg)
        segments.append(validity_seg)
        segments.append(value_seg)
        columns_meta.append(colmeta)

    header = {
        "rows": table.num_rows,
        "schema_ipc": base64.b64encode(
            table.schema.serialize().to_pybytes()
        ).decode(),
        "columns": columns_meta,
    }
    header_bytes = json.dumps(header, separators=(",", ":")).encode()
    blob = b"".join(
        [MAGIC, len(header_bytes).to_bytes(4, "little"), header_bytes, *segments]
    )
    meta = {
        "rows": table.num_rows,
        "blob_bytes": len(blob),
        "columns": {
            c["name"]: {
                "codec": c["codec"],
                "compression": c["compression"],
                "value_bytes": c["value_len"],
                "null_count": c["null_count"],
                "stats": c.get("stats", {}),
                **(
                    {"symtab_hash": c["symtab_hash"]} if "symtab_hash" in c else {}
                ),
                **(
                    {"codec_note": c["codec_note"]} if "codec_note" in c else {}
                ),
            }
            for c in columns_meta
        },
    }
    return blob, meta


def read_header(blob: bytes) -> tuple[dict, int]:
    if blob[:5] != MAGIC:
        raise ValueError("bad blob magic")
    hlen = int.from_bytes(blob[5:9], "little")
    header = json.loads(blob[9 : 9 + hlen].decode())
    return header, 9 + hlen


def decode_table(
    blob: bytes,
    columns: list[str] | None = None,
    row_offset: int = 0,
    row_count: int | None = None,
) -> pa.Table:
    """Decode a blob, optionally projecting columns — the engine analogue
    of the reference's selected-column chunk skipping
    (/root/reference/schema/schema.go:212-232, layout/chunk.go:28-51):
    unselected columns' segments are never touched. ``row_offset`` /
    ``row_count`` select a row range; paged columns decode only the
    overlapping pages."""
    header, seg_base = read_header(blob)
    try:
        schema = pa.ipc.read_schema(
            pa.BufferReader(base64.b64decode(header["schema_ipc"]))
        )
    except (OSError, pa.ArrowException) as e:
        raise ValueError(f"corrupt blob schema: {e}") from e
    mv = memoryview(blob)
    arrays = []
    fields = []
    for colmeta in header["columns"]:
        name = colmeta["name"]
        if columns is not None and name not in columns:
            continue
        vo = seg_base + colmeta["validity_offset"]
        validity_seg = bytes(mv[vo : vo + colmeta["validity_len"]])
        so = seg_base + colmeta["value_offset"]
        value_seg = bytes(mv[so : so + colmeta["value_len"]])
        if "crc32" in colmeta:
            crc = zlib.crc32(value_seg, zlib.crc32(validity_seg))
            if crc != colmeta["crc32"]:
                raise ValueError(
                    f"checksum mismatch in column {name!r}: blob is corrupt"
                )
        field = schema.field(name)
        arrays.append(
            decode_column(
                validity_seg,
                value_seg,
                colmeta,
                field.type,
                row_offset=row_offset,
                row_count=row_count,
            )
        )
        fields.append(field)
    if columns is not None:
        missing = set(columns) - {f.name for f in fields}
        if missing:
            raise KeyError(f"columns not in blob: {sorted(missing)}")
        # Preserve requested order.
        order = {f.name: i for i, f in enumerate(fields)}
        arrays = [arrays[order[c]] for c in columns]
        fields = [fields[order[c]] for c in columns]
    return pa.Table.from_arrays(arrays, schema=pa.schema(fields))
