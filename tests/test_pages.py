"""Intra-blob page granularity: paged column segments, row-range decode,
page skipping, per-page stats rollup — the reference's page-within-chunk
model (layout/chunk.go:129-217) in blob form."""

import numpy as np
import pyarrow as pa
import pytest

import parquet_go_ray.functions.column as col
from parquet_go_ray.sources.transcripts import generate_transcripts
from parquet_go_ray.state.blob import decode_table, encode_table


def _table(n=1000):
    rng = np.random.default_rng(4)
    return pa.table(
        {
            "i": pa.array(range(n), pa.int64()),
            "s": pa.array(
                [None if x % 13 == 0 else f"v{x % 50}x{x}" for x in range(n)]
            ),
            "f": pa.array(rng.normal(size=n)),
            "l": pa.array([[x, x + 1] if x % 3 else [] for x in range(n)],
                          pa.list_(pa.int64())),
        }
    )


def test_paged_roundtrip_equals_unpaged():
    t = _table()
    paged, meta_p = encode_table(t, page_rows=128)
    plain, meta_u = encode_table(t)
    out_p = decode_table(paged)
    out_u = decode_table(plain)
    for c in t.column_names:
        a = t.column(c).combine_chunks()
        assert out_p.column(c).combine_chunks().equals(a), c
        assert out_u.column(c).combine_chunks().equals(a), c
    assert meta_p["columns"]["i"]["codec"] == "paged"
    # Column stats roll up from page stats.
    hdr_stats = meta_p["columns"]["i"]["stats"]
    assert hdr_stats["min"] == 0 and hdr_stats["max"] == 999


def test_row_range_decode():
    t = _table()
    blob, _ = encode_table(t, page_rows=128)
    out = decode_table(blob, row_offset=250, row_count=300)
    exp = t.slice(250, 300)
    for c in t.column_names:
        assert out.column(c).combine_chunks().equals(
            exp.column(c).combine_chunks()
        ), c
    # Edges and degenerate ranges.
    assert decode_table(blob, row_offset=990, row_count=100).num_rows == 10
    assert decode_table(blob, row_offset=0, row_count=1).num_rows == 1
    # Unpaged blobs honor the same API (slice after decode).
    blob_u, _ = encode_table(t)
    out_u = decode_table(blob_u, row_offset=250, row_count=300)
    assert out_u.column("i").combine_chunks().equals(
        exp.column("i").combine_chunks()
    )


def test_row_range_touches_only_overlapping_pages(monkeypatch):
    t = _table(1024)
    blob, _ = encode_table(t, page_rows=128, choices={"i": ("plain", "none")})
    calls = []
    real = col.decode_values

    def spy(payload, codec, typ, count):
        calls.append(count)
        return real(payload, codec, typ, count)

    monkeypatch.setattr(col, "decode_values", spy)
    out = decode_table(blob, columns=["i"], row_offset=300, row_count=50)
    assert out.column("i").to_pylist() == list(range(300, 350))
    # 1024 rows / 128-page → 8 pages; the range overlaps exactly one.
    assert len(calls) == 1 and calls[0] == 128


def test_paged_transcripts_projection():
    t = generate_transcripts(3000, seed=9)
    blob, meta = encode_table(t, page_rows=512)
    out = decode_table(blob, columns=["conv_id", "text"], row_offset=1000,
                       row_count=512)
    assert out.column_names == ["conv_id", "text"]
    assert out.column("text").combine_chunks().equals(
        t.slice(1000, 512).column("text").combine_chunks()
    )
    # Every column paged; per-page stats present on the int column.
    pages = None
    import json, base64
    from parquet_go_ray.state.blob import read_header

    header, _ = read_header(blob)
    for c in header["columns"]:
        if c["name"] == "turn_idx":
            pages = c["pages"]
    assert pages and len(pages) >= 2
    assert all("stats" in p["meta"] for p in pages)


def test_page_level_predicate_pruning(monkeypatch):
    """Pages whose stats exclude the predicate are never decoded; the
    surviving spans produce the exact filtered rows."""
    from parquet_go_ray.pipelines.decode import BlobDecoder, matching_page_spans
    from parquet_go_ray.state.blob import read_header

    n = 1024
    t = pa.table(
        {
            "k": pa.array(range(n), pa.int64()),  # sorted: page stats disjoint
            "v": pa.array([f"s{x}" for x in range(n)]),
        }
    )
    blob, _ = encode_table(t, page_rows=128)
    header, _ = read_header(blob)
    spans = matching_page_spans(header, ("k", ">=", 900))
    assert spans == [(896, 128)]  # only the last page can match
    assert matching_page_spans(header, ("k", ">", 5000)) == []
    # Through the BlobDecoder stage with a decode spy.
    calls = []
    real = col.decode_values

    def spy(payload, codec, typ, count):
        calls.append(count)
        return real(payload, codec, typ, count)

    monkeypatch.setattr(col, "decode_values", spy)
    dec = BlobDecoder(predicate=("k", ">=", 900))
    out = pa.concat_tables(list(dec(pa.table({"bytes": pa.array([blob])}))))
    assert out.column("k").to_pylist() == list(range(900, 1024))
    # Exactly one page span decoded (2 columns x 1 page), not 8 pages.
    assert len(calls) == 2


def test_page_pruning_unpaged_fallback():
    from parquet_go_ray.pipelines.decode import BlobDecoder

    t = pa.table({"k": pa.array(range(100), pa.int64())})
    blob, _ = encode_table(t)  # unpaged
    dec = BlobDecoder(predicate=("k", "<", 10))
    out = pa.concat_tables(list(dec(pa.table({"bytes": pa.array([blob])}))))
    assert out.column("k").to_pylist() == list(range(10))
