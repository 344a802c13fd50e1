"""Wire-compatibility against REAL Parquet files (VERDICT r2 item 4).

Every test writes a file with ``pyarrow.parquet`` (encodings forced)
and reads it back through the ENGINE's page walker + wire decoders
(``sources/parquet_pages.py``) — hybrid levels, RLE_DICTIONARY
indices, PLAIN / DELTA_* values — asserting byte-level agreement with
``pq.read_table``. This is the interop proof the golden vectors only
sample: the reference reads these same streams at
``layout/page-v1.go:69-116`` / ``types/dict.go:61-117``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from parquet_go_ray.sources.parquet_pages import (
    read_page_header,
    read_parquet_native,
    read_row_group_native,
)


def roundtrip(tmp_path, table: pa.Table, name="t.parquet", **write_kw):
    path = str(tmp_path / name)
    pq.write_table(table, path, **write_kw)
    expect = pq.read_table(path)
    pf = pq.ParquetFile(path)
    got = pa.concat_tables(
        read_row_group_native(path, g)
        for g in range(pf.metadata.num_row_groups)
    )
    return got, expect


def assert_tables_equal(got: pa.Table, expect: pa.Table):
    assert got.num_rows == expect.num_rows
    for name in expect.column_names:
        g = got.column(name).combine_chunks()
        e = expect.column(name).combine_chunks()
        if pa.types.is_dictionary(e.type):
            e = e.cast(e.type.value_type)
        if g.type != e.type:
            g = g.cast(e.type)
        assert g.equals(e), name


@pytest.fixture()
def mixed_table(rng):
    n = 5_000
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    text = [
        " ".join(rng.choice(words, size=rng.integers(1, 8)))
        for _ in range(n)
    ]
    return pa.table(
        {
            "i32": pa.array(rng.integers(-(2**28), 2**28, n), pa.int32()),
            "i64": pa.array(rng.integers(-(2**40), 2**40, n), pa.int64()),
            "f64": pa.array(rng.normal(size=n)),
            "f32": pa.array(rng.normal(size=n).astype(np.float32)),
            "b": pa.array(rng.random(n) < 0.5),
            "s": pa.array(text),
        }
    )


def test_dictionary_pages_v1(tmp_path, mixed_table):
    """RLE_DICTIONARY indices + PLAIN dict pages, v1 data pages, two
    row groups, multiple pages per chunk."""
    got, expect = roundtrip(
        tmp_path,
        mixed_table,
        use_dictionary=True,
        compression="NONE",
        data_page_version="1.0",
        row_group_size=3_000,
        data_page_size=4_096,
    )
    assert_tables_equal(got, expect)


def test_plain_pages_v1(tmp_path, mixed_table):
    got, expect = roundtrip(
        tmp_path,
        mixed_table,
        use_dictionary=False,
        compression="NONE",
        data_page_version="1.0",
    )
    assert_tables_equal(got, expect)


@pytest.mark.parametrize("codec", ["SNAPPY", "ZSTD", "GZIP"])
def test_compressed_pages(tmp_path, mixed_table, codec):
    got, expect = roundtrip(
        tmp_path, mixed_table, use_dictionary=True, compression=codec
    )
    assert_tables_equal(got, expect)


def test_nulls_v1(tmp_path, rng):
    """Definition levels (4-byte-framed hybrid) scatter values back to
    row positions."""
    n = 4_000
    mask = rng.random(n) < 0.3
    t = pa.table(
        {
            "x": pa.array(
                np.where(mask, None, rng.integers(0, 1000, n)).tolist(),
                pa.int64(),
            ),
            "s": pa.array(
                [None if m else f"v{i % 97}" for i, m in enumerate(mask)]
            ),
        }
    )
    got, expect = roundtrip(
        tmp_path, t, use_dictionary=True, compression="NONE",
        data_page_version="1.0",
    )
    assert_tables_equal(got, expect)


def test_data_page_v2(tmp_path, mixed_table, rng):
    """v2 pages: unframed level streams outside the compressed region."""
    n = mixed_table.num_rows
    mask = rng.random(n) < 0.25
    t = mixed_table.set_column(
        0,
        "i32",
        pa.array(
            np.where(mask, None, np.arange(n)).tolist(), pa.int32()
        ),
    )
    got, expect = roundtrip(
        tmp_path,
        t,
        use_dictionary=True,
        compression="ZSTD",
        data_page_version="2.0",
        data_page_size=8_192,
    )
    assert_tables_equal(got, expect)


def test_delta_binary_packed(tmp_path, rng):
    """DELTA_BINARY_PACKED column written by pyarrow, decoded by the
    engine's delta_decode (ref encoding/delta-binary-packed-*.go)."""
    n = 10_000
    t = pa.table(
        {
            "ts": pa.array(
                np.cumsum(rng.integers(0, 1000, n)).astype(np.int64)
            ),
            "small": pa.array(rng.integers(-50, 50, n), pa.int32()),
        }
    )
    got, expect = roundtrip(
        tmp_path,
        t,
        use_dictionary=False,
        compression="NONE",
        column_encoding={"ts": "DELTA_BINARY_PACKED",
                         "small": "DELTA_BINARY_PACKED"},
    )
    assert_tables_equal(got, expect)


def test_delta_byte_array(tmp_path):
    """DELTA_BYTE_ARRAY (front coding) + DELTA_LENGTH_BYTE_ARRAY."""
    n = 3_000
    t = pa.table(
        {
            "path": pa.array([f"/data/shard={i % 17:04d}/file-{i:06d}" for i in range(n)]),
            "raw": pa.array([f"payload-{i * 7919 % 1000}" for i in range(n)]),
        }
    )
    got, expect = roundtrip(
        tmp_path,
        t,
        use_dictionary=False,
        compression="NONE",
        column_encoding={"path": "DELTA_BYTE_ARRAY",
                         "raw": "DELTA_LENGTH_BYTE_ARRAY"},
    )
    assert_tables_equal(got, expect)


def test_dict_fallback_to_plain(tmp_path, rng):
    """High-cardinality strings overflow the dict-page budget: later
    pages switch to PLAIN mid-chunk; the reader follows per-page
    encodings."""
    n = 20_000
    t = pa.table(
        {"u": pa.array([f"user-{rng.integers(0, 10**9):012d}-{i}" for i in range(n)])}
    )
    got, expect = roundtrip(
        tmp_path,
        t,
        use_dictionary=True,
        compression="NONE",
        dictionary_pagesize_limit=16_384,
        data_page_size=16_384,
    )
    assert_tables_equal(got, expect)


def test_int96_timestamps(tmp_path):
    """INT96 decode-only path (SURVEY §1.2) against a real writer."""
    ts = pa.array(
        np.arange(0, 10**6, 1000, dtype="datetime64[us]").astype("datetime64[ns]")
    )
    t = pa.table({"ts": ts})
    got, expect = roundtrip(
        tmp_path, t, use_deprecated_int96_timestamps=True, compression="NONE"
    )
    assert_tables_equal(got, expect)


def test_fixed_len_byte_array(tmp_path, rng):
    vals = [bytes(rng.integers(0, 256, 16, dtype=np.uint8)) for _ in range(500)]
    t = pa.table({"h": pa.array(vals, pa.binary(16))})
    got, expect = roundtrip(tmp_path, t, use_dictionary=False, compression="NONE")
    assert_tables_equal(got, expect)


def test_page_header_parser_roundtrip(tmp_path, mixed_table):
    """The thrift-compact header parser agrees with pyarrow's metadata
    about the first data page of each chunk."""
    path = str(tmp_path / "h.parquet")
    pq.write_table(mixed_table, path, compression="NONE", use_dictionary=False)
    pf = pq.ParquetFile(path)
    for i in range(pf.metadata.num_columns):
        md = pf.metadata.row_group(0).column(i)
        with open(path, "rb") as f:
            f.seek(md.data_page_offset)
            buf = f.read(min(md.total_compressed_size, 1 << 20))
        hdr, pos = read_page_header(buf, 0)
        assert hdr["type"] == 0  # DATA_PAGE
        assert hdr["compressed_size"] > 0
        assert hdr["num_values"] > 0
        assert pos > 0


def test_deeply_nested_now_reads(tmp_path):
    """Depth-2 lists read natively via general Dremel assembly (the
    one-level-only restriction was lifted; maps remain delegated)."""
    t = pa.table({
        "l": pa.array([[[1], [2]], [[3]]], pa.list_(pa.list_(pa.int64())))
    })
    path = str(tmp_path / "n.parquet")
    pq.write_table(t, path)
    got = read_row_group_native(path, 0)
    assert got.column("l").combine_chunks().equals(
        t.column("l").combine_chunks()
    )


@pytest.mark.parametrize("version,use_dict", [("1.0", True), ("2.6", False)])
def test_map_columns_read_natively(tmp_path, version, use_dict):
    """MAP groups assemble through the list<struct<key,value>> view —
    null maps, empty maps, null values, nested list values."""
    t = pa.table({
        "m": pa.array([{"a": 1, "b": None}, None, {}, {"c": 3}],
                      pa.map_(pa.string(), pa.int64())),
        "mm": pa.array([{"x": [1, 2]}, {}, None, {"y": []}],
                       pa.map_(pa.string(), pa.list_(pa.int64()))),
    })
    path = str(tmp_path / "m.parquet")
    pq.write_table(t, path, version=version, use_dictionary=use_dict)
    got = read_row_group_native(path, 0)
    for name in t.column_names:
        assert got.column(name).combine_chunks().equals(
            t.column(name).combine_chunks()
        ), (version, use_dict, name)


@pytest.mark.parametrize("version,use_dict", [("1.0", True), ("2.6", False)])
def test_struct_columns_pyarrow_written(tmp_path, version, use_dict):
    """One-level structs from a standard writer: struct assembly from
    per-leaf def levels matches pq.read_table (null structs + null and
    required children)."""
    s_type = pa.struct([
        pa.field("a", pa.int64()),
        pa.field("b", pa.string()),
        pa.field("c", pa.float64(), nullable=False),
    ])
    t = pa.table({
        "id": pa.array([1, 2, 3, 4], pa.int64()),
        "s": pa.array(
            [{"a": 1, "b": "x", "c": 0.5}, None,
             {"a": None, "b": "y", "c": 1.5},
             {"a": 4, "b": None, "c": 2.5}],
            s_type,
        ),
    })
    path = str(tmp_path / "s.parquet")
    pq.write_table(t, path, version=version, use_dictionary=use_dict,
                   compression="snappy")
    got = read_row_group_native(path, 0)
    for name in t.column_names:
        assert got.column(name).combine_chunks().equals(
            t.column(name).combine_chunks()
        ), (version, use_dict, name)


@pytest.mark.parametrize("version,use_dict", [("1.0", True), ("1.0", False),
                                              ("2.6", True), ("2.6", False)])
def test_list_columns_pyarrow_written(tmp_path, version, use_dict):
    """One-level lists from a standard writer (v1 + v2 pages, dict and
    plain element encodings): rep-level record assembly matches
    pq.read_table, incl. null/empty lists and null elements."""
    t = pa.table({
        "id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "emb": pa.array(
            [[1.0, 2.0], [], None, [3.5], [None, 4.0, 5.0]],
            pa.list_(pa.float32()),
        ),
        "tags": pa.array(
            [["a", "b"], None, [], ["c"], ["d", "d", "d"]],
            pa.list_(pa.string()),
        ),
    })
    path = str(tmp_path / "l.parquet")
    pq.write_table(t, path, version=version, use_dictionary=use_dict,
                   compression="snappy", data_page_size=64)
    got = read_row_group_native(path, 0)
    for name in t.column_names:
        assert got.column(name).combine_chunks().equals(
            t.column(name).combine_chunks()
        ), (version, use_dict, name)


def test_row_range_page_skipping(tmp_path):
    """row_range decode skips non-overlapping pages and stitches back
    exactly — flat, struct and list columns across page boundaries."""
    s_type = pa.struct([pa.field("a", pa.int64()), pa.field("b", pa.string())])
    t = pa.table({
        "id": pa.array(range(100), pa.int64()),
        "s": pa.array(
            [{"a": i, "b": f"v{i % 3}"} if i % 7 else None for i in range(100)],
            s_type,
        ),
        "l": pa.array(
            [[float(i)] * (i % 4) if i % 5 else None for i in range(100)],
            pa.list_(pa.float32()),
        ),
    })
    path = str(tmp_path / "rr.parquet")
    pq.write_table(t, path, data_page_size=128)  # many tiny pages
    parts = [
        read_row_group_native(path, 0, row_range=(s, min(100, s + 13)))
        for s in range(0, 100, 13)
    ]
    got = pa.concat_tables(parts)
    for name in t.column_names:
        assert got.column(name).combine_chunks().equals(
            t.column(name).combine_chunks()
        ), name
    # Out-of-bounds ranges clamp.
    assert read_row_group_native(path, 0, row_range=(90, 500)).num_rows == 10


def test_filter_pushdown_prunes_row_groups(ray_session, tmp_path):
    """filters= prunes row groups via footer Statistics (writer's zone
    maps) and still returns exactly the WHERE rows; absent stats never
    prune."""
    import numpy as np

    from parquet_go_ray.sources.parquet_pages import (
        _rg_may_match,
        read_parquet_native,
    )
    from parquet_go_ray.sources.parquet_write import write_parquet_native

    rng = np.random.default_rng(5)
    t = pa.table({
        "k": pa.array(np.sort(rng.integers(0, 10_000, 8000))),
        "v": pa.array(rng.normal(size=8000)),
    })
    path = str(tmp_path / "z.parquet")
    write_parquet_native(t, path, row_group_rows=1000)
    md = pq.ParquetFile(path).metadata
    hi = int(t.column("k")[7500].as_py())
    n2i = {md.row_group(0).column(i).path_in_schema: i for i in range(2)}
    kept = sum(
        _rg_may_match(md.row_group(g), n2i, [("k", ">=", hi)])
        for g in range(md.num_row_groups)
    )
    assert kept <= 2  # sorted column: stats exclude most groups
    ds = read_parquet_native(path, filters=[("k", ">=", hi)])
    got = pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow")))
    import pyarrow.compute as pc

    expect = t.filter(pc.greater_equal(t.column("k"), hi))
    assert got.sort_by("v").equals(expect.sort_by("v"))


def test_native_read_distributed(ray_session, tmp_path, mixed_table):
    """read_parquet_native: one Ray task per row group, same rows as
    pq.read_table."""
    path = str(tmp_path / "d.parquet")
    pq.write_table(mixed_table, path, row_group_size=1_000)
    ds = read_parquet_native(path)
    got = pa.concat_tables(
        b for b in ds.iter_batches(batch_format="pyarrow", batch_size=None)
    )
    got = got.sort_by("i64")
    expect = pq.read_table(path).sort_by("i64")
    assert_tables_equal(got, expect)


def test_native_read_testdata_events(ray_session):
    """Real driver-generated table (sf0.001 events) through the native
    page reader, hash-compared to pyarrow's own read."""
    import os

    path = "/root/testdata/sf0.001/events.parquet"
    if not os.path.exists(path):
        pytest.skip("testdata missing")
    ds = read_parquet_native(path)
    got = pa.concat_tables(
        b for b in ds.iter_batches(batch_format="pyarrow", batch_size=None)
    )
    expect = pq.read_table(path)
    got = got.sort_by([("user_id", "ascending"), ("ts", "ascending"),
                       ("event_type", "ascending"), ("value", "ascending")])
    expect = expect.sort_by([("user_id", "ascending"), ("ts", "ascending"),
                             ("event_type", "ascending"), ("value", "ascending")])
    assert_tables_equal(got, expect)


def test_all_null_flat_chunk(tmp_path):
    """An all-null column chunk must not crash record assembly
    (ADVICE r3: finish() scattered via values.take on an EMPTY dense
    array). Covers flat, list-element, and engine-written cases."""
    t = pa.table({
        "id": pa.array(range(50), pa.int64()),
        "gone": pa.nulls(50, pa.int64()),
        "gone_str": pa.nulls(50, pa.string()),
    })
    got, expect = roundtrip(tmp_path, t, use_dictionary=False)
    assert_tables_equal(got, expect)


def test_all_null_list_elements(tmp_path):
    """list<int64> whose element stream is entirely null."""
    t = pa.table({
        "ls": pa.array([[None, None], [], None, [None]] * 25,
                       pa.list_(pa.int64())),
    })
    got, expect = roundtrip(tmp_path, t, use_dictionary=False)
    assert_tables_equal(got, expect)


def test_all_null_row_range_window(tmp_path):
    """A row_range window whose kept pages are all null hits the same
    empty-dense-values path via page skipping."""
    vals = [None] * 100 + list(range(100))
    t = pa.table({"x": pa.array(vals, pa.int64())})
    path = str(tmp_path / "w.parquet")
    pq.write_table(t, path, use_dictionary=False,
                   data_page_size=64, write_batch_size=50)
    got = read_row_group_native(path, 0, row_range=(0, 80))
    assert got.column("x").null_count == 80


def test_all_null_engine_written(tmp_path):
    """File written by the engine's own writer with an all-null column
    reads back through the native reader."""
    from parquet_go_ray.sources.parquet_write import write_parquet_native

    t = pa.table({
        "id": pa.array(range(30), pa.int64()),
        "gone": pa.nulls(30, pa.float64()),
    })
    path = str(tmp_path / "eng.parquet")
    write_parquet_native(t, path)
    got = read_row_group_native(path, 0)
    assert_tables_equal(got, pq.read_table(path))
    assert got.column("gone").null_count == 30


def test_native_filter_on_unprojected_column(tmp_path, ray_session):
    """filters= on a column outside columns= must auto-include it for
    the predicate and drop it from the result (ADVICE r3)."""
    t = pa.table({
        "a": pa.array(range(200), pa.int64()),
        "b": pa.array([i % 7 for i in range(200)], pa.int64()),
    })
    path = str(tmp_path / "f.parquet")
    pq.write_table(t, path, use_dictionary=False)
    out = read_parquet_native(
        path, columns=["a"], filters=[("b", "=", 3)]
    ).take_all()
    expect = [i for i in range(200) if i % 7 == 3]
    assert sorted(r["a"] for r in out) == expect
    assert all(set(r) == {"a"} for r in out)


class TestUnsignedIntegers:
    """Unsigned converted-type parity (VERDICT r3 item 4; ref
    layout/page-dict.go:208-235 special-cases UINT_8/16/32 decode).
    Same-width reinterpretation means uint32 ≥ 2^31 and uint64 ≥ 2^63
    travel as negative INT32/INT64 bit patterns."""

    def utable(self, n=300) -> pa.Table:
        rng = np.random.default_rng(7)
        u8 = rng.integers(0, 2**8, n, dtype=np.uint8)
        u16 = rng.integers(0, 2**16, n, dtype=np.uint16)
        u32 = rng.integers(0, 2**32, n, dtype=np.uint32)
        u64 = rng.integers(0, 2**64, n, dtype=np.uint64)
        u64[:5] = [2**64 - 1, 2**63, 2**63 - 1, 0, 2**63 + 12345]
        u32[:3] = [2**32 - 1, 2**31, 0]
        t = pa.table({
            "u8": pa.array(u8), "u16": pa.array(u16),
            "u32": pa.array(u32), "u64": pa.array(u64),
            "i8": pa.array(rng.integers(-128, 128, n, dtype=np.int8)),
            "i16": pa.array(
                rng.integers(-2**15, 2**15, n, dtype=np.int16)
            ),
        })
        # sprinkle nulls
        mask = pa.array(rng.random(n) < 0.1)
        return pa.table({
            c: pc.if_else(mask, pa.nulls(n, t.column(c).type), t.column(c))
            for c in t.column_names
        })

    @pytest.mark.parametrize("use_dict", [False, True])
    def test_pyarrow_written_uints_native_read(self, tmp_path, use_dict):
        t = self.utable()
        got, expect = roundtrip(
            tmp_path, t, name="u.parquet", use_dictionary=use_dict
        )
        for c in expect.column_names:
            g = got.column(c).combine_chunks()
            e = expect.column(c).combine_chunks()
            assert g.type == e.type, c  # uint type preserved, not int
            assert g.equals(e), c

    def test_native_written_uints_everyone_reads(self, tmp_path):
        from parquet_go_ray.sources.parquet_write import (
            write_parquet_native,
        )

        t = self.utable()
        path = str(tmp_path / "nu.parquet")
        write_parquet_native(t, path, codec="zstd")
        back = pq.read_table(path)
        assert back.schema.equals(t.schema), back.schema
        assert back.equals(t)
        got = read_row_group_native(path, 0)
        for c in t.column_names:
            assert got.column(c).combine_chunks().equals(
                t.column(c).combine_chunks()
            ), c
        import duckdb
        mx = duckdb.sql(
            f"SELECT max(u64), max(u32) FROM read_parquet('{path}')"
        ).fetchone()
        assert mx[0] == 2**64 - 1 and mx[1] == 2**32 - 1

    def test_native_written_uint_delta_and_dict(self, tmp_path):
        from parquet_go_ray.sources.parquet_write import (
            write_parquet_native,
        )

        n = 200
        t = pa.table({
            "u64d": pa.array(
                (2**63 + np.arange(n, dtype=np.uint64) * 7)
            ),
            "u32k": pa.array(
                np.tile(np.array([2**31, 5, 2**32 - 1], np.uint32),
                        n)[:n]
            ),
        })
        path = str(tmp_path / "enc.parquet")
        write_parquet_native(
            t, path, encodings={"u64d": "delta", "u32k": "dict"}
        )
        assert pq.read_table(path).equals(t)
        got = read_row_group_native(path, 0)
        for c in t.column_names:
            assert got.column(c).combine_chunks().equals(
                t.column(c).combine_chunks()
            ), c

    def test_uint_list_column(self, tmp_path):
        t = pa.table({
            "ls": pa.array(
                [[2**63, 1], None, [], [2**64 - 1, None, 7]],
                pa.list_(pa.uint64()),
            ),
        })
        got, expect = roundtrip(
            tmp_path, t, name="ul.parquet", use_dictionary=False
        )
        assert_tables_equal(got, expect)
        assert got.column("ls").combine_chunks().type == pa.list_(pa.uint64())

    def test_uint_zone_map_order(self, tmp_path):
        """Statistics on a native-written uint64 column must be in
        UNSIGNED order: a reader pruning on them sees max 2^64-1, not a
        negative bit pattern."""
        from parquet_go_ray.sources.parquet_write import (
            write_parquet_native,
        )

        t = pa.table({"u": pa.array([1, 2**63, 5, 2**64 - 1],
                                    pa.uint64())})
        path = str(tmp_path / "zs.parquet")
        write_parquet_native(t, path)
        st = pq.ParquetFile(path).metadata.row_group(0).column(0).statistics
        assert st.min == 1 and st.max == 2**64 - 1
