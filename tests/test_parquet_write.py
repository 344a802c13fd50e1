"""Engine-native Parquet WRITER interop: files emitted by
``sources/parquet_write.py`` must read back bit-equal through pyarrow,
DuckDB, and the engine's own native page reader — the write-direction
counterpart of tests/test_parquet_interop.py (reference writer is
unfinished: layout/rowgroup.go empty, PageWriter stub page.go:24-27)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from parquet_go_ray.sources.parquet_write import write_parquet_native


def sample_table(n=1000, seed=1) -> pa.Table:
    rng = np.random.default_rng(seed)
    ints = rng.integers(-(2**40), 2**40, n)
    mask = rng.random(n) < 0.15
    strs = [
        None if m else f"doc-{v % 97}" for m, v in zip(mask, ints)
    ]
    return pa.table(
        {
            "i32": pa.array(rng.integers(-(2**31), 2**31, n, dtype=np.int64).astype(np.int32)),
            "i64": pa.array(ints),
            "f32": pa.array(rng.random(n, dtype=np.float32)),
            "f64": pa.array(rng.normal(size=n)),
            "flag": pa.array(rng.random(n) < 0.5),
            "text": pa.array(strs, pa.string()),
            "raw": pa.array([bytes([i % 256, (i * 7) % 256]) for i in range(n)], pa.binary()),
            "ts": pa.array(
                rng.integers(0, 2**44, n), pa.int64()
            ).cast(pa.timestamp("us")),
        }
    )


def roundtrip(table: pa.Table, tmp_path, **kw) -> pa.Table:
    path = str(tmp_path / "native.parquet")
    info = write_parquet_native(table, path, **kw)
    assert info["rows"] == table.num_rows
    got = pq.read_table(path)
    return got


@pytest.mark.parametrize("codec", ["none", "zstd", "snappy", "gzip"])
def test_pyarrow_reads_native_file(tmp_path, codec):
    t = sample_table()
    got = roundtrip(t, tmp_path, codec=codec)
    assert got.schema.equals(t.schema), (got.schema, t.schema)
    assert got.equals(t)


def test_forced_encodings(tmp_path):
    t = sample_table()
    got = roundtrip(
        t,
        tmp_path,
        encodings={"i64": "delta", "text": "dict", "f64": "plain",
                   "i32": "plain"},
    )
    assert got.equals(t)
    # Encoding enums visible in the footer metadata.
    path = str(tmp_path / "native.parquet")
    md = pq.ParquetFile(path).metadata.row_group(0)
    by_name = {
        md.column(i).path_in_schema: md.column(i).encodings
        for i in range(md.num_columns)
    }
    assert "DELTA_BINARY_PACKED" in by_name["i64"]
    assert "RLE_DICTIONARY" in by_name["text"] or "PLAIN_DICTIONARY" in by_name["text"]


def list_table() -> pa.Table:
    return pa.table({
        "id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "emb": pa.array(
            [[1.0, 2.0], [], None, [3.5], [None, 4.0, 5.0]],
            pa.list_(pa.float32()),
        ),
        "tags": pa.array(
            [["a", "b"], None, [], ["c"], ["d", "e", "f"]],
            pa.list_(pa.string()),
        ),
    })


@pytest.mark.parametrize("codec", ["none", "zstd"])
def test_list_columns_roundtrip(tmp_path, codec):
    """3-level LIST groups: null/empty lists, null elements, page splits
    mid-column — read back by pyarrow, DuckDB and the native reader."""
    t = list_table()
    path = str(tmp_path / "lists.parquet")
    write_parquet_native(t, path, codec=codec, data_page_rows=2)
    assert pq.read_table(path).equals(t)

    duckdb = pytest.importorskip("duckdb")
    rows = duckdb.sql(
        f"SELECT emb, tags FROM read_parquet('{path}') ORDER BY id"
    ).fetchall()
    assert rows[0] == ([1.0, 2.0], ["a", "b"])
    assert rows[1] == ([], None)
    assert rows[2] == (None, [])
    assert rows[4][1] == ["d", "e", "f"]

    from parquet_go_ray.sources.parquet_pages import read_row_group_native

    got = read_row_group_native(path, 0)
    for name in t.column_names:
        assert got.column(name).combine_chunks().equals(
            t.column(name).combine_chunks()
        ), name


def test_list_required_elements_and_large_list(tmp_path):
    t = pa.table({
        "v": pa.array(
            [[1, 2], [3]],
            pa.large_list(pa.field("element", pa.int64(), nullable=False)),
        ),
    })
    path = str(tmp_path / "req.parquet")
    write_parquet_native(t, path)
    back = pq.read_table(path)
    assert back.column("v").to_pylist() == [[1, 2], [3]]
    assert not back.schema.field("v").type.value_field.nullable


def test_embeddings_table_native_loop(tmp_path):
    """The real driver-written embeddings file: native read of the
    pyarrow file, native write, pyarrow + native read of our file."""
    src = "/root/testdata/sf0.001/embeddings.parquet"
    from parquet_go_ray.sources.parquet_pages import read_row_group_native

    t = pq.read_table(src)
    got = read_row_group_native(src, 0)
    n0 = pq.ParquetFile(src).metadata.row_group(0).num_rows
    sl = t.slice(0, n0)
    for name in t.column_names:
        assert got.column(name).combine_chunks().equals(
            sl.column(name).combine_chunks()
        ), name
    path = str(tmp_path / "emb.parquet")
    write_parquet_native(t, path)
    assert pq.read_table(path).equals(t)
    got2 = read_row_group_native(path, 0)
    for name in t.column_names:
        assert got2.column(name).combine_chunks().equals(
            t.column(name).combine_chunks()
        ), name


def struct_table() -> pa.Table:
    s_type = pa.struct([
        pa.field("a", pa.int64()),
        pa.field("b", pa.string()),
        pa.field("c", pa.float64(), nullable=False),
    ])
    return pa.table({
        "id": pa.array([1, 2, 3, 4], pa.int64()),
        "s": pa.array(
            [{"a": 1, "b": "x", "c": 0.5}, None,
             {"a": None, "b": "y", "c": 1.5},
             {"a": 4, "b": None, "c": 2.5}],
            s_type,
        ),
    })


def test_struct_columns_roundtrip(tmp_path):
    """One-level struct groups: null structs, null children, required
    children — multi-level def streams read back by pyarrow, DuckDB
    and the native reader's struct assembly."""
    t = struct_table()
    path = str(tmp_path / "structs.parquet")
    write_parquet_native(t, path, codec="zstd", data_page_rows=2)
    assert pq.read_table(path).equals(t)

    duckdb = pytest.importorskip("duckdb")
    rows = duckdb.sql(
        f"SELECT s FROM read_parquet('{path}') ORDER BY id"
    ).fetchall()
    assert rows[0][0] == {"a": 1, "b": "x", "c": 0.5}
    assert rows[1][0] is None
    assert rows[2][0] == {"a": None, "b": "y", "c": 1.5}

    from parquet_go_ray.sources.parquet_pages import read_row_group_native

    got = read_row_group_native(path, 0)
    for name in t.column_names:
        assert got.column(name).combine_chunks().equals(
            t.column(name).combine_chunks()
        ), name


def test_struct_null_child_in_required_struct_raises(tmp_path):
    s_type = pa.struct([pa.field("a", pa.int64(), nullable=False)])
    t = pa.table({"s": pa.array([{"a": 1}, {"a": None}], s_type)})
    with pytest.raises(ValueError, match="non-nullable child"):
        write_parquet_native(t, str(tmp_path / "bad.parquet"))


def test_mixed_nested_multi_row_group(tmp_path):
    """Struct + list + flat columns in one file across row groups and
    page splits; the full native write→read loop matches slice-exact."""
    s_type = pa.struct([pa.field("a", pa.int64()), pa.field("b", pa.string())])
    t = pa.table({
        "id": pa.array(range(100), pa.int64()),
        "s": pa.array(
            [{"a": i, "b": f"v{i % 3}"} if i % 7 else None for i in range(100)],
            s_type,
        ),
        "l": pa.array(
            [[float(i), float(i + 1)] if i % 5 else None for i in range(100)],
            pa.list_(pa.float32()),
        ),
    })
    path = str(tmp_path / "mixed.parquet")
    write_parquet_native(t, path, row_group_rows=30, data_page_rows=10)
    assert pq.read_table(path).equals(t)

    from parquet_go_ray.sources.parquet_pages import read_row_group_native

    for g in range(4):
        got = read_row_group_native(path, g)
        sl = t.slice(g * 30, 30)
        for name in t.column_names:
            assert got.column(name).combine_chunks().equals(
                sl.column(name).combine_chunks()
            ), (g, name)


def test_deep_nesting_full_loop(tmp_path):
    """Arbitrary-depth nesting (list<struct>, list<list>, depth-4) via
    the general Dremel shredder: pyarrow + DuckDB + the native reader
    all read engine-written deep files; page splits mid-column."""
    s2 = pa.struct([pa.field("x", pa.int64()), pa.field("y", pa.string())])
    deep = pa.list_(pa.struct([pa.field("m", pa.list_(
        pa.struct([pa.field("q", pa.int64())])))]))
    t = pa.table({
        "a": pa.array([[{"x": 1, "y": "a"}, {"x": None, "y": "b"}], None,
                       [], [{"x": 3, "y": None}]], pa.list_(s2)),
        "b": pa.array([[[1, 2], [], None], [], None, [[3]]],
                      pa.list_(pa.list_(pa.int64()))),
        "d": pa.array([[{"m": [{"q": 1}, {"q": None}]}, {"m": None}], None,
                       [{"m": []}], [{"m": [{"q": 7}]}]], deep),
    })
    path = str(tmp_path / "deep.parquet")
    write_parquet_native(t, path, codec="zstd", data_page_rows=2)
    assert pq.read_table(path).equals(t)

    duckdb = pytest.importorskip("duckdb")
    rows = duckdb.sql(f"SELECT a FROM read_parquet('{path}')").fetchall()
    assert rows[0][0] == [{"x": 1, "y": "a"}, {"x": None, "y": "b"}]
    assert rows[1][0] is None

    from parquet_go_ray.sources.parquet_pages import read_row_group_native

    got = read_row_group_native(path, 0)
    for name in t.column_names:
        assert got.column(name).combine_chunks().equals(
            t.column(name).combine_chunks()
        ), name
    # row-range slices stitch back
    parts = [read_row_group_native(path, 0, row_range=(s, s + 2))
             for s in (0, 2)]
    assert pa.concat_tables(parts).equals(pa.table(got.to_pydict(),
                                                   schema=got.schema)) or \
        pa.concat_tables(parts).to_pylist() == t.to_pylist()


def test_deep_nesting_reads_pyarrow_files(tmp_path):
    s2 = pa.struct([pa.field("x", pa.int64()), pa.field("y", pa.string())])
    t = pa.table({
        "a": pa.array([[{"x": 1, "y": "a"}], None, [], [{"x": 3, "y": None}]],
                      pa.list_(s2)),
    })
    path = str(tmp_path / "pad.parquet")
    pq.write_table(t, path, version="2.6", compression="zstd")

    from parquet_go_ray.sources.parquet_pages import read_row_group_native

    got = read_row_group_native(path, 0)
    assert got.column("a").combine_chunks().equals(
        t.column("a").combine_chunks()
    )


def test_map_columns_full_loop(tmp_path):
    """MAP groups written as key_value repeated groups: pyarrow, DuckDB
    and the native reader all read engine-written maps (null/empty
    maps, null values, nested list values)."""
    t = pa.table({
        "id": pa.array([1, 2, 3, 4], pa.int64()),
        "m": pa.array([{"a": 1, "b": None}, None, {}, {"c": 3}],
                      pa.map_(pa.string(), pa.int64())),
        "mm": pa.array([{"x": [1, 2]}, {}, None, {"y": []}],
                       pa.map_(pa.string(), pa.list_(pa.int64()))),
    })
    path = str(tmp_path / "maps.parquet")
    write_parquet_native(t, path, codec="zstd", data_page_rows=2)
    assert pq.read_table(path).equals(t)

    duckdb = pytest.importorskip("duckdb")
    rows = duckdb.sql(
        f"SELECT m['a'] FROM read_parquet('{path}') ORDER BY id"
    ).fetchall()
    # duckdb map extraction yields a list of matches
    assert rows[0][0] in (1, [1]) and rows[1][0] in (None, [])

    from parquet_go_ray.sources.parquet_pages import read_row_group_native

    got = read_row_group_native(path, 0)
    for name in t.column_names:
        assert got.column(name).combine_chunks().equals(
            t.column(name).combine_chunks()
        ), name


def test_column_chunk_statistics(tmp_path):
    """Footer Statistics (min_value/max_value/null_count) are emitted per
    column chunk and read back by pyarrow — the zone-map contract that
    lets standard readers prune row groups of engine-written files."""
    t = sample_table(5000, seed=3)
    path = str(tmp_path / "native.parquet")
    write_parquet_native(t, path, row_group_rows=1000)
    pf = pq.ParquetFile(path)
    import pyarrow.compute as pc

    for rg in range(pf.metadata.num_row_groups):
        sl = t.slice(rg * 1000, 1000)
        md = pf.metadata.row_group(rg)
        for i, name in enumerate(t.column_names):
            col = sl.column(name)
            st = md.column(i).statistics
            assert st is not None, name
            assert st.null_count == col.null_count, name
            if name == "flag":  # booleans excluded, as the engine's blobs
                assert not st.has_min_max
                continue
            assert st.has_min_max, name
            mm = pc.min_max(col)
            assert st.min == mm["min"].as_py(), name
            assert st.max == mm["max"].as_py(), name

    # DuckDB prunes row groups off these stats: a selective filter on a
    # sorted column still returns exactly the right rows.
    duckdb = pytest.importorskip("duckdb")
    srt = t.sort_by("i64")
    path2 = str(tmp_path / "sorted.parquet")
    write_parquet_native(srt, path2, row_group_rows=1000)
    lo = srt.column("i64")[4800].as_py()
    n = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{path2}') WHERE i64 >= {lo}"
    ).fetchone()[0]
    assert n == 200
    stats_seen = duckdb.sql(
        f"SELECT count(*) FROM parquet_metadata('{path2}')"
        " WHERE stats_min_value IS NOT NULL AND stats_max_value IS NOT NULL"
    ).fetchone()[0]
    assert stats_seen >= 5 * 7  # every non-bool column chunk

    # NaN disables float stats; all-null chunks carry only null_count.
    import numpy as np

    weird = pa.table({
        "f": pa.array([1.0, float("nan"), 2.0], pa.float64()),
        "z": pa.array([None, None, None], pa.int64()),
        "s": pa.array(["x" * 100, "y"], pa.string()).take([0, 1, 1]),
    })
    path3 = str(tmp_path / "weird.parquet")
    write_parquet_native(weird, path3)
    md = pq.ParquetFile(path3).metadata.row_group(0)
    by = {md.column(i).path_in_schema: md.column(i).statistics for i in range(3)}
    assert not by["f"].has_min_max
    assert by["z"].null_count == 3 and not by["z"].has_min_max
    assert not by["s"].has_min_max  # >64-byte min omitted, never truncated


def test_timestamp_tz_awareness(tmp_path):
    # tz-aware -> isAdjustedToUTC=true (reads back tz=UTC); naive -> false.
    vals = pa.array([0, 10**12, None], pa.int64())
    t = pa.table({
        "utc": vals.cast(pa.timestamp("us", tz="UTC")),
        "naive": vals.cast(pa.timestamp("ms")),
        "ns": vals.cast(pa.timestamp("ns", tz="UTC")),
    })
    got = roundtrip(t, tmp_path)
    assert got.schema.equals(t.schema), (got.schema, t.schema)
    assert got.equals(t)


@pytest.mark.parametrize("enc,wire", [("delta_length", "DELTA_LENGTH_BYTE_ARRAY"),
                                      ("delta_prefix", "DELTA_BYTE_ARRAY")])
def test_delta_byte_array_encodings(tmp_path, enc, wire):
    """The engine's delta-length and front-coding byte-array encoders
    (E11/E12) emitted into standard files; pyarrow, DuckDB and the
    native reader all read them back."""
    t = pa.table({
        "a": pa.array([f"doc-{i:06d}" for i in range(5000)] + [None]),
        "b": pa.array([b"k" * (i % 9) for i in range(5001)], pa.binary()),
    })
    path = str(tmp_path / "d.parquet")
    write_parquet_native(t, path, encodings={"a": enc, "b": enc},
                         data_page_rows=700)
    got = pq.read_table(path)
    assert got.equals(t)
    md = pq.ParquetFile(path).metadata.row_group(0)
    assert wire in md.column(0).encodings

    duckdb = pytest.importorskip("duckdb")
    n = duckdb.sql(f"SELECT count(a) FROM read_parquet('{path}')").fetchone()[0]
    assert n == 5000

    from parquet_go_ray.sources.parquet_pages import read_row_group_native

    got2 = read_row_group_native(path, 0)
    for name in t.column_names:
        assert got2.column(name).combine_chunks().equals(
            t.column(name).combine_chunks()
        ), name


def test_duckdb_reads_native_file(tmp_path):
    duckdb = pytest.importorskip("duckdb")
    t = sample_table()
    path = str(tmp_path / "native.parquet")
    write_parquet_native(t, path)
    con = duckdb.connect()
    n, s, tot = con.execute(
        f"SELECT count(*), count(text), sum(i64) FROM read_parquet('{path}')"
    ).fetchone()
    assert n == t.num_rows
    assert s == t.num_rows - t.column("text").null_count
    assert tot == sum(v for v in t.column("i64").to_pylist())


def test_native_reader_reads_native_file(tmp_path):
    from parquet_go_ray.sources.parquet_pages import read_row_group_native

    t = sample_table()
    path = str(tmp_path / "native.parquet")
    write_parquet_native(t, path, codec="zstd")
    got = read_row_group_native(path, 0)
    assert got.num_rows == t.num_rows
    for name in t.column_names:
        g = got.column(name).combine_chunks()
        e = t.column(name).combine_chunks()
        assert g.equals(e), name


def test_multiple_row_groups_and_pages(tmp_path):
    t = sample_table(5000, seed=3)
    path = str(tmp_path / "native.parquet")
    write_parquet_native(t, path, row_group_rows=1200, data_page_rows=300)
    pf = pq.ParquetFile(path)
    assert pf.metadata.num_row_groups == 5  # ceil(5000/1200)
    assert pq.read_table(path).equals(t)


def test_all_null_and_empty_columns(tmp_path):
    t = pa.table(
        {
            "a": pa.array([None, None, None], pa.string()),
            "b": pa.array([1, None, 3], pa.int64()),
        }
    )
    assert roundtrip(t, tmp_path).equals(t)
    empty = pa.table({"a": pa.array([], pa.string()), "b": pa.array([], pa.int64())})
    got = roundtrip(empty, tmp_path)
    assert got.num_rows == 0
    assert got.schema.equals(empty.schema)


def test_date_and_fixed_binary(tmp_path):
    t = pa.table(
        {
            "d": pa.array([0, 1, 18262, None], pa.date32()),
            "fb": pa.array([b"abcd", b"efgh", b"ijkl", None], pa.binary(4)),
        }
    )
    assert roundtrip(t, tmp_path).equals(t)


def test_required_columns_have_no_levels(tmp_path):
    t = pa.table(
        {"k": pa.array([1, 2, 3], pa.int64())},
        schema=pa.schema([pa.field("k", pa.int64(), nullable=False)]),
    )
    got = roundtrip(t, tmp_path)
    assert got.column("k").to_pylist() == [1, 2, 3]
    assert not got.schema.field("k").nullable


def test_auto_encoding_uses_selector(tmp_path):
    """`auto` runs the engine's sampled-stats trial selector mapped to
    Parquet wire encodings — real testdata comes out smaller than the
    pyarrow-written source and reads back equal."""
    import os

    src = "/root/testdata/sf0.001/events.parquet"
    t = pq.read_table(src)
    path = str(tmp_path / "auto.parquet")
    info = write_parquet_native(t, path)
    assert pq.read_table(path).equals(t)
    assert info["bytes"] < os.path.getsize(src)
    md = pq.ParquetFile(path).metadata.row_group(0)
    encs = {md.column(i).path_in_schema: set(md.column(i).encodings)
            for i in range(md.num_columns)}
    # Monotone ids + timestamps: the selector picks delta-BP; the
    # low-cardinality event_type picks the dictionary.
    assert "DELTA_BINARY_PACKED" in encs["event_id"]
    assert "DELTA_BINARY_PACKED" in encs["ts"]
    assert "RLE_DICTIONARY" in encs["event_type"] or "PLAIN_DICTIONARY" in encs["event_type"]


def test_ray_sink_resumable(ray_session, tmp_path):
    import ray

    from parquet_go_ray.sources.parquet_write import write_parquet_files_native

    t = sample_table(4000, seed=9)
    ds = ray.data.from_arrow(t).repartition(4)
    out = str(tmp_path / "sink")
    manifest = write_parquet_files_native(ds, out).take_all()
    assert sum(r["rows"] for r in manifest) == 4000
    paths = sorted(r["path"] for r in manifest)
    back = pq.read_table(paths)
    assert back.num_rows == 4000
    assert sum(back.column("i64").to_pylist()) == sum(t.column("i64").to_pylist())
    # Rerun: deterministic shard names -> all files skipped, none rewritten.
    mtimes = {p: __import__("os").path.getmtime(p) for p in paths}
    manifest2 = write_parquet_files_native(
        ray.data.from_arrow(t).repartition(4), out
    ).take_all()
    assert sorted(r["path"] for r in manifest2) == paths
    for p in paths:
        assert __import__("os").path.getmtime(p) == mtimes[p]


def test_sink_duplicate_content_batches_not_collapsed(tmp_path, ray_session):
    """Two distinct input batches with IDENTICAL content must both land
    on disk (ADVICE r3: content-hash shard names silently collapsed
    them); a rerun over the same input must still resume-skip."""
    import os

    import ray

    from parquet_go_ray.sources.parquet_write import (
        write_parquet_files_native,
    )

    block = pa.table({"x": pa.array(range(100), pa.int64())})
    ds = ray.data.from_arrow([block, block, block])  # 3 identical blocks
    out = str(tmp_path / "sink")
    man = write_parquet_files_native(
        ds, out, rows_per_file=None
    ).take_all()
    files = sorted(f for f in os.listdir(out) if f.endswith(".parquet"))
    assert len(files) == 3, files
    assert sum(r["rows"] for r in man) == 300
    assert len({r["path"] for r in man}) == 3
    total = sum(
        pq.read_table(os.path.join(out, f)).num_rows for f in files
    )
    assert total == 300
    # no tmp turds left behind
    assert not [f for f in os.listdir(out) if f.endswith(".tmp")]
    # resume: an immediate rerun over the same input rewrites nothing
    mtimes = {f: os.stat(os.path.join(out, f)).st_mtime for f in files}
    ds2 = ray.data.from_arrow([block, block, block])
    man2 = write_parquet_files_native(
        ds2, out, rows_per_file=None
    ).take_all()
    files2 = sorted(f for f in os.listdir(out) if f.endswith(".parquet"))
    assert files2 == files
    assert sum(r["rows"] for r in man2) == 300
    for f in files:
        assert os.stat(os.path.join(out, f)).st_mtime == mtimes[f]


def test_delta_int32_full_range_spec_width(tmp_path):
    """INT32 delta pages must wrap arithmetic at 32 bits: full-range
    int32 values (deltas spanning > 2^32 in the int64 domain) previously
    emitted 33-bit miniblocks, which the spec forbids and readers
    reject."""
    from parquet_go_ray.sources.parquet_pages import read_row_group_native

    vals = ((np.arange(2000, dtype=np.uint64) * 2654435761) % (2**32))
    t = pa.table({
        "i": pa.array(vals.astype(np.uint32).astype(np.int32)),
        "u": pa.array(vals.astype(np.uint32)),
    })
    path = str(tmp_path / "d32.parquet")
    write_parquet_native(t, path, encodings={"i": "delta", "u": "delta"})
    assert pq.read_table(path).equals(t)
    got = read_row_group_native(path, 0)
    for c in t.column_names:
        assert got.column(c).combine_chunks().equals(
            t.column(c).combine_chunks()
        ), c


class TestDataPageV2:
    """DATA_PAGE_V2 emission (VERDICT r3 item 5; the read shape of ref
    layout/page-v2.go:12-20): unframed uncompressed level streams
    outside the compressed region, per-page num_nulls/num_rows,
    is_compressed flag."""

    @pytest.mark.parametrize("codec", ["none", "zstd", "snappy"])
    def test_flat_v2_roundtrip(self, tmp_path, codec):
        t = sample_table(3000, seed=3)
        path = str(tmp_path / "v2.parquet")
        write_parquet_native(t, path, codec=codec, page_version=2,
                             data_page_rows=700)
        assert pq.read_table(path).equals(t)

        import duckdb
        n = duckdb.sql(
            f"SELECT count(*), count(text) FROM read_parquet('{path}')"
        ).fetchone()
        assert n[0] == 3000
        assert n[1] == 3000 - t.column("text").null_count

        from parquet_go_ray.sources.parquet_pages import (
            read_row_group_native,
        )
        got = read_row_group_native(path, 0)
        for c in t.column_names:
            g = got.column(c).combine_chunks()
            e = t.column(c).combine_chunks()
            assert g.equals(e), c

    def test_v2_forced_encodings(self, tmp_path):
        t = sample_table(2000, seed=5)
        path = str(tmp_path / "v2e.parquet")
        write_parquet_native(
            t, path, page_version=2,
            encodings={"i64": "delta", "text": "dict"},
        )
        assert pq.read_table(path).equals(t)

    def test_v2_lists_structs_map(self, tmp_path):
        t = list_table()
        path = str(tmp_path / "v2l.parquet")
        write_parquet_native(t, path, page_version=2, data_page_rows=2)
        assert pq.read_table(path).equals(t)

        st = struct_table()
        path2 = str(tmp_path / "v2s.parquet")
        write_parquet_native(st, path2, page_version=2, data_page_rows=2)
        assert pq.read_table(path2).equals(st)

        mt = pa.table({
            "m": pa.array(
                [[("a", 1)], None, [], [("b", 2), ("c", None)]],
                pa.map_(pa.string(), pa.int64()),
            ),
        })
        path3 = str(tmp_path / "v2m.parquet")
        write_parquet_native(mt, path3, page_version=2)
        assert pq.read_table(path3).equals(mt)

        from parquet_go_ray.sources.parquet_pages import (
            read_row_group_native,
        )
        got = read_row_group_native(path, 0)
        for c in t.column_names:
            assert got.column(c).combine_chunks().equals(
                t.column(c).combine_chunks()
            ), c

    def test_v2_header_fields(self, tmp_path):
        """The emitted pages really are DATA_PAGE_V2 with correct level
        lengths and null counts — walk headers with the engine's own
        thrift reader."""
        from parquet_go_ray.sources.parquet_pages import read_page_header

        t = pa.table({
            "x": pa.array([1, None, 3, None, 5, 6] * 50, pa.int64()),
        })
        path = str(tmp_path / "v2h.parquet")
        write_parquet_native(t, path, codec="zstd", page_version=2,
                             data_page_rows=100)
        pf = pq.ParquetFile(path)
        md = pf.metadata.row_group(0).column(0)
        with open(path, "rb") as f:
            f.seek(md.data_page_offset)
            buf = f.read(md.total_compressed_size)
        pos, rows, pages, nulls = 0, 0, 0, 0
        while rows < md.num_values:
            hdr, pos = read_page_header(buf, pos)
            assert hdr["type"] == 3  # DATA_PAGE_V2
            assert hdr["def_levels_len"] > 0
            assert hdr.get("rep_levels_len", 0) == 0
            assert hdr["values_compressed"] is True
            rows += hdr["num_values"]
            nulls += hdr["num_nulls"]
            pages += 1
            pos += hdr["compressed_size"]
        assert pages == 3  # 300 rows / 100 per page
        assert nulls == t.column("x").null_count


class TestPageIndex:
    """ColumnIndex / OffsetIndex emission (VERDICT r3 'missing' #3):
    per-page min/max/null_count + page locations, parsed back with the
    engine's own thrift reader and cross-checked against the real page
    stream; files stay readable by pyarrow and DuckDB."""

    def test_offset_index_points_at_real_pages(self, tmp_path):
        from parquet_go_ray.sources.parquet_pages import (
            read_page_header,
            read_page_index,
        )

        t = pa.table({
            "x": pa.array([i if i % 5 else None for i in range(1000)],
                          pa.int64()),
            "s": pa.array([f"v{i % 37}" for i in range(1000)]),
        })
        path = str(tmp_path / "pi.parquet")
        write_parquet_native(t, path, codec="zstd", data_page_rows=120)
        assert pq.read_table(path).equals(t)  # standard readers fine

        raw = open(path, "rb").read()
        for col in (0, 1):
            idx = read_page_index(path, 0, col)
            oi = idx["offset_index"]
            assert len(oi) == 9  # ceil(1000 / 120)
            assert oi[0]["first_row_index"] == 0
            rows = 0
            for loc in oi:
                assert loc["first_row_index"] == rows
                hdr, _ = read_page_header(raw, loc["offset"])
                assert hdr["type"] in (0, 3)
                rows += hdr["num_values"]
            assert rows == 1000

    def test_column_index_matches_page_stats(self, tmp_path):
        import struct

        from parquet_go_ray.sources.parquet_pages import read_page_index

        vals = [i * 3 if (i // 120) != 2 else None for i in range(600)]
        t = pa.table({"x": pa.array(vals, pa.int64())})
        path = str(tmp_path / "ci.parquet")
        write_parquet_native(t, path, data_page_rows=120)
        ci = read_page_index(path)["column_index"]
        assert ci["null_pages"] == [False, False, True, False, False]
        # i*3 is monotone across the non-null pages -> ASCENDING (the
        # null page's empty min/max is skipped by the order check)
        assert ci["boundary_order"] == 1
        for p, (mn, mx) in enumerate(zip(ci["min_values"],
                                         ci["max_values"])):
            if ci["null_pages"][p]:
                assert mn == b"" and mx == b""
                assert ci["null_counts"][p] == 120
            else:
                lo = struct.unpack("<q", mn)[0]
                hi = struct.unpack("<q", mx)[0]
                assert lo == p * 120 * 3 and hi == (p * 120 + 119) * 3
                assert ci["null_counts"][p] == 0

    def test_column_index_omitted_for_nan_pages(self, tmp_path):
        from parquet_go_ray.sources.parquet_pages import read_page_index

        t = pa.table({
            "f": pa.array([1.0, float("nan"), 3.0, 4.0], pa.float64()),
        })
        path = str(tmp_path / "nan.parquet")
        write_parquet_native(t, path)
        idx = read_page_index(path)
        assert "column_index" not in idx  # NaN page -> no ColumnIndex
        assert len(idx["offset_index"]) == 1

    def test_page_index_v2_and_lists(self, tmp_path):
        from parquet_go_ray.sources.parquet_pages import read_page_index

        t = list_table()
        path = str(tmp_path / "piv2.parquet")
        write_parquet_native(t, path, page_version=2, data_page_rows=2)
        assert pq.read_table(path).equals(t)
        for col in range(3):
            idx = read_page_index(path, 0, col)
            assert idx and "offset_index" in idx

    def test_duckdb_reads_indexed_file(self, tmp_path):
        import duckdb

        t = sample_table(2000, seed=13)
        path = str(tmp_path / "dd.parquet")
        write_parquet_native(t, path, data_page_rows=300)
        n, smin = duckdb.sql(
            f"SELECT count(*), min(i64) FROM read_parquet('{path}')"
        ).fetchone()
        assert n == 2000
        assert smin == min(v for v in t.column("i64").to_pylist())


class TestByteStreamSplit:
    """BYTE_STREAM_SPLIT (encoding 9, format v2.8; v2.11 extends it to
    INT32/INT64/FLBA). The reference only carries the enum in its
    generated thrift (/root/reference/parquet/parquet.go) — the codec
    itself is beyond-reference surface, interop-tested both directions."""

    def _mixed(self, n=4000, seed=5):
        rng = np.random.default_rng(seed)
        mask = rng.random(n) < 0.25
        vals = np.cumsum(rng.normal(size=n)) * 1e-3
        return pa.table({
            "f32": pa.array(
                np.where(mask, 0, vals).astype(np.float32), mask=mask
            ),
            "f64": pa.array(vals + 7.0),
            "i64": pa.array(rng.integers(-(2**62), 2**62, n)),
        })

    def test_unit_roundtrip_and_errors(self):
        from parquet_go_ray.functions.plain import bss_decode, bss_encode

        raw = np.arange(40, dtype=np.float64).tobytes()
        for w in (4, 8):
            assert bss_decode(bss_encode(raw, w), w, len(raw) // w) == raw
        # streams are contiguous: byte k of value j lands at k*n + j
        enc = bss_encode(np.array([1, 2], dtype=np.uint32).tobytes(), 4)
        assert enc == bytes([1, 2, 0, 0, 0, 0, 0, 0])
        with pytest.raises(ValueError):
            bss_encode(b"12345", 4)

    @pytest.mark.parametrize("page_version", [1, 2])
    def test_native_writer_all_readers(self, tmp_path, page_version):
        t = self._mixed()
        path = str(tmp_path / f"bss{page_version}.parquet")
        write_parquet_native(
            t, path, page_version=page_version,
            encodings={c: "byte_stream_split" for c in t.schema.names},
        )
        md = pq.ParquetFile(path).metadata.row_group(0)
        for i in range(md.num_columns):
            assert "BYTE_STREAM_SPLIT" in md.column(i).encodings
        assert pq.read_table(path).equals(t)
        from parquet_go_ray.sources.parquet_pages import read_row_group_native

        assert read_row_group_native(path, 0).equals(t)

    def test_duckdb_reads_float_bss(self, tmp_path):
        import duckdb

        t = self._mixed()
        path = str(tmp_path / "dd_bss.parquet")
        # DuckDB 1.0 predates the v2.11 INT32/INT64/FLBA extension, so
        # only the float columns go BSS (same subset `auto` considers).
        write_parquet_native(
            t, path, encodings={"f32": "byte_stream_split",
                                "f64": "byte_stream_split"},
        )
        n, s = duckdb.sql(
            f"SELECT count(*), sum(f64) FROM read_parquet('{path}')"
        ).fetchone()
        assert n == t.num_rows
        assert abs(s - sum(t.column("f64").to_pylist())) < 1e-6

    def test_pyarrow_written_bss_native_read(self, tmp_path):
        t = self._mixed()
        path = str(tmp_path / "pa_bss.parquet")
        pq.write_table(
            t.select(["f32", "f64"]), path, compression="zstd",
            use_dictionary=False, use_byte_stream_split=["f32", "f64"],
        )
        from parquet_go_ray.sources.parquet_pages import read_row_group_native

        assert read_row_group_native(path, 0).equals(t.select(["f32", "f64"]))

    def test_list_leaf_and_flba(self, tmp_path):
        rng = np.random.default_rng(11)
        t = pa.table({
            "emb": pa.array(
                [None if i % 7 == 0 else
                 [float(v) for v in rng.normal(size=4)]
                 for i in range(500)],
                pa.list_(pa.float32()),
            ),
            "b6": pa.array(
                [bytes(rng.integers(0, 256, 6, dtype=np.uint8))
                 for _ in range(500)],
                pa.binary(6),
            ),
        })
        path = str(tmp_path / "bss_nested.parquet")
        write_parquet_native(
            t, path, encodings={"emb": "byte_stream_split",
                                "b6": "byte_stream_split"},
        )
        assert pq.read_table(path).equals(t)
        from parquet_go_ray.sources.parquet_pages import read_row_group_native

        assert read_row_group_native(path, 0).equals(t)

    def test_auto_trial_measures_not_guesses(self, tmp_path):
        # Decimal-ish prices: BSS splits whole-value repeats apart and
        # LOSES to plain+zstd (measured 1.8x) -> trial keeps PLAIN.
        li = pq.read_table(
            "/root/testdata/sf0.001/lineitem.parquet",
            columns=["l_extendedprice"],
        )
        p1 = str(tmp_path / "li.parquet")
        write_parquet_native(li, p1)
        encs = pq.ParquetFile(p1).metadata.row_group(0).column(0).encodings
        assert "BYTE_STREAM_SPLIT" not in encs
        # Smooth physical series: shared exponent bytes -> BSS wins.
        sm = pa.table({"v": pa.array(
            np.cumsum(np.random.default_rng(1).normal(size=20000)) * 1e-3
            + 1000.0
        )})
        p2 = str(tmp_path / "smooth.parquet")
        write_parquet_native(sm, p2)
        encs = pq.ParquetFile(p2).metadata.row_group(0).column(0).encodings
        assert "BYTE_STREAM_SPLIT" in encs
        assert pq.read_table(p2).equals(sm)


class TestPageChecksums:
    """PageHeader.crc (field 4): CRC-32 of the on-wire page payload,
    emitted by default and verified on read. Interop pinned against
    pyarrow's write_page_checksum / page_checksum_verification."""

    @pytest.mark.parametrize("page_version", [1, 2])
    def test_pyarrow_verifies_native_crc(self, tmp_path, page_version):
        t = sample_table(3000, seed=21)
        path = str(tmp_path / "crc.parquet")
        write_parquet_native(t, path, page_version=page_version)
        got = pq.ParquetFile(path, page_checksum_verification=True).read()
        assert got.equals(t)

    def test_native_reader_verifies_pyarrow_crc(self, tmp_path):
        t = sample_table(2000, seed=22)
        path = str(tmp_path / "pa_crc.parquet")
        pq.write_table(t, path, write_page_checksum=True, compression="zstd")
        from parquet_go_ray.sources.parquet_pages import read_row_group_native

        assert read_row_group_native(path, 0).equals(t)

    @pytest.mark.parametrize("page_version", [1, 2])
    def test_corrupt_page_detected_both_readers(self, tmp_path, page_version):
        from parquet_go_ray.sources.parquet_pages import (
            read_page_header,
            read_row_group_native,
        )

        t = sample_table(2000, seed=23)
        path = str(tmp_path / "c.parquet")
        write_parquet_native(t, path, page_version=page_version)
        buf = bytearray(open(path, "rb").read())
        md = pq.ParquetFile(path).metadata.row_group(0).column(0)
        off = (md.dictionary_page_offset if md.has_dictionary_page
               else md.data_page_offset)
        _, p = read_page_header(buf, off)
        buf[p + 5] ^= 0xFF
        bad = str(tmp_path / "bad.parquet")
        open(bad, "wb").write(bytes(buf))
        with pytest.raises(ValueError, match="page CRC mismatch"):
            read_row_group_native(bad, 0)
        with pytest.raises(OSError):
            pq.ParquetFile(bad, page_checksum_verification=True).read()

    def test_checksum_off_omits_field(self, tmp_path):
        from parquet_go_ray.sources.parquet_pages import (
            read_page_header,
            read_row_group_native,
        )

        t = sample_table(500, seed=24)
        path = str(tmp_path / "nocrc.parquet")
        write_parquet_native(t, path, write_page_checksum=False)
        hdr, _ = read_page_header(open(path, "rb").read(), 4)
        assert hdr["crc"] is None
        # absent crc -> reader skips verification and still reads
        assert read_row_group_native(path, 0).equals(t)


def test_pyarrow_page_index_parses_with_engine_reader(tmp_path):
    """Golden interop for the ColumnChunk page-index field ids (4/5 =
    offset index, 6/7 = column index — NOT 16-19): parse a PYARROW-
    written page index with the engine's thrift reader. This is the
    cross-vendor direction our own writer→reader round-trip can't
    check (a consistent wrong id passes it silently)."""
    from parquet_go_ray.sources.parquet_pages import (
        read_page_header,
        read_page_index,
    )

    t = sample_table(4000, seed=31)
    path = str(tmp_path / "pa_pi.parquet")
    pq.write_table(t, path, write_page_index=True, data_page_size=4096,
                   compression="zstd")
    buf = open(path, "rb").read()
    idx = read_page_index(path, 0, 1)  # i64 column
    assert idx and "offset_index" in idx and "column_index" in idx
    locs = idx["offset_index"]
    assert len(locs) >= 2  # small pages -> several entries
    rows = [p["first_row_index"] for p in locs]
    assert rows == sorted(rows) and rows[0] == 0
    for p in locs:  # offsets land on real page headers
        hdr, _ = read_page_header(buf, p["offset"])
        assert hdr["type"] in (0, 3)
    ci = idx["column_index"]
    assert len(ci["min_values"]) == len(locs)
    lo = min(v for v in t.column("i64").to_pylist() if v is not None)
    assert int.from_bytes(ci["min_values"][0][:8], "little", signed=True) >= lo


class TestOffsetIndexWindowedRead:
    """Row-range reads fetch only the overlapping pages' byte ranges
    (plus the dictionary prefix) when an OffsetIndex exists — the
    100-TB point of the page index: a 2k-row window out of a 50k-row
    chunk must not pull the whole chunk from storage."""

    def _spy_reads(self, path, fn):
        import builtins

        counts = []
        real_open = builtins.open
        def spy(*a, **k):
            f = real_open(*a, **k)
            if a and isinstance(a[0], str) and a[0] == path:
                orig = f.read
                def rd(n=-1):
                    b = orig(n)
                    counts.append(len(b))
                    return b
                f.read = rd
            return f
        builtins.open = spy
        try:
            out = fn()
        finally:
            builtins.open = real_open
        return out, sum(counts)

    @pytest.mark.parametrize("writer", ["native", "pyarrow"])
    def test_window_reads_fewer_bytes(self, tmp_path, writer):
        from parquet_go_ray.sources.parquet_pages import (
            read_row_group_native,
        )

        rng = np.random.default_rng(3)
        t = pa.table({
            "a": pa.array(rng.integers(0, 10**6, 40_000)),
            "s": pa.array([f"v{i % 997}" for i in range(40_000)]),
        })
        path = str(tmp_path / "w.parquet")
        if writer == "native":
            write_parquet_native(t, path, data_page_rows=2000)
        else:
            pq.write_table(t, path, write_page_index=True,
                           data_page_size=8_000, compression="zstd",
                           use_dictionary=False)
        full, full_bytes = self._spy_reads(
            path, lambda: read_row_group_native(path, 0)
        )
        assert full.equals(t)
        win, win_bytes = self._spy_reads(
            path, lambda: read_row_group_native(path, 0,
                                                row_range=(5_000, 7_000))
        )
        assert win.equals(t.slice(5_000, 2_000))
        assert win_bytes < full_bytes / 3

    def test_windows_cover_edges(self, tmp_path):
        from parquet_go_ray.sources.parquet_pages import (
            read_row_group_native,
        )

        t = pa.table({"x": pa.array(range(10_000))})
        path = str(tmp_path / "e.parquet")
        write_parquet_native(t, path, data_page_rows=777)
        for rr in [(0, 1), (0, 777), (776, 778), (9_999, 10_000),
                   (0, 10_000), (5_000, 5_000)]:
            got = read_row_group_native(path, 0, row_range=rr)
            assert got.equals(t.slice(rr[0], rr[1] - rr[0])), rr


def test_column_index_truncated_long_strings(tmp_path):
    """>64 B strings used to drop the whole ColumnIndex; the index now
    carries truncated pruning bounds (prefix min, incremented-prefix
    max) while chunk Statistics stay omitted-not-truncated."""
    from parquet_go_ray.sources.parquet_pages import read_page_index

    vals = [f"{'x' * 100}{i:04d}" for i in range(500)] + ["zz" * 60]
    t = pa.table({"s": pa.array(vals)})
    path = str(tmp_path / "long.parquet")
    write_parquet_native(t, path, data_page_rows=200)
    assert pq.read_table(path).equals(t)
    idx = read_page_index(path, 0, 0)
    ci = idx["column_index"]
    assert len(ci["min_values"]) >= 3
    for mn, mx in zip(ci["min_values"], ci["max_values"]):
        assert len(mn) <= 64 and len(mx) <= 64
    # bounds really bound: every value within [page_min, page_max]
    locs = idx["offset_index"]
    for k, (mn, mx) in enumerate(zip(ci["min_values"], ci["max_values"])):
        r0 = locs[k]["first_row_index"]
        r1 = (locs[k + 1]["first_row_index"]
              if k + 1 < len(locs) else t.num_rows)
        for v in vals[r0:r1]:
            assert mn <= v.encode() <= mx
    # chunk Statistics remain omitted for long strings
    st = pq.ParquetFile(path).metadata.row_group(0).column(0).statistics
    assert st is None or not st.has_min_max


def test_encoding_stats_emitted(tmp_path):
    """ColumnMetaData.encoding_stats (field 13): per-(page_type,
    encoding) page counts, parsed back via the engine's footer walk."""
    from parquet_go_ray.sources.parquet_pages import _footer_struct

    t = pa.table({
        "d": pa.array([f"k{i % 9}" for i in range(2000)]),  # dict-friendly
        "x": pa.array(np.random.default_rng(0).integers(0, 9, 2000)),
    })
    path = str(tmp_path / "es.parquet")
    write_parquet_native(t, path, data_page_rows=400,
                         encodings={"d": "dict", "x": "plain"})
    assert pq.read_table(path).equals(t)
    md = _footer_struct(path)
    d_stats = {(e[1], e[2]): e[3] for e in md[4][0][1][0][3][13]}
    assert d_stats[(2, 0)] == 1  # one PLAIN dictionary page
    assert d_stats[(0, 8)] == 5  # five RLE_DICTIONARY data pages
    x_stats = {(e[1], e[2]): e[3] for e in md[4][0][1][1][3][13]}
    assert x_stats == {(0, 0): 5}  # five PLAIN data pages


class TestLz4Raw:
    """LZ4_RAW (wire enum 7) both directions; the deprecated
    Hadoop-framed LZ4 (enum 5) read-side via the dual-try fallback —
    the same strategy Arrow C++ uses (pyarrow's metadata prints "LZ4"
    for both)."""

    def test_both_directions(self, tmp_path):
        import duckdb

        from parquet_go_ray.sources.parquet_pages import (
            _footer_struct,
            read_row_group_native,
        )

        t = sample_table(3000, seed=41)
        pa_path = str(tmp_path / "pa.parquet")
        pq.write_table(t, pa_path, compression="lz4")
        assert read_row_group_native(pa_path, 0).equals(t)
        nat = str(tmp_path / "nat.parquet")
        write_parquet_native(t, nat, codec="lz4_raw")
        assert pq.read_table(nat).equals(t)
        assert _footer_struct(nat)[4][0][1][0][3][4] == 7  # LZ4_RAW enum
        n = duckdb.sql(
            f"SELECT count(*) FROM read_parquet('{nat}')"
        ).fetchone()[0]
        assert n == 3000
        assert read_row_group_native(nat, 0).equals(t)

    def test_hadoop_frame_fallback(self):
        import pyarrow as pa_

        from parquet_go_ray.sources.parquet_pages import (
            _lz4_hadoop_decompress,
        )

        codec = pa_.Codec("lz4_raw")
        blocks = [b"hello world " * 20, b"second block" * 10]
        framed = b""
        for b in blocks:
            c = codec.compress(b, asbytes=True)
            framed += len(b).to_bytes(4, "big") + len(c).to_bytes(4, "big") + c
        total = b"".join(blocks)
        assert _lz4_hadoop_decompress(framed, len(total)) == total
        with pytest.raises((ValueError, OSError)):
            _lz4_hadoop_decompress(framed[:-3], len(total) + 5)


def test_boundary_order_and_in_filter(tmp_path, ray_session):
    """BoundaryOrder reflects the real page-min/max monotonicity, and
    the reader's `in` filter prunes via zone maps + blooms and
    re-applies exactly per batch."""
    from parquet_go_ray.sources.parquet_pages import (
        read_page_index,
        read_parquet_native,
    )

    # sorted column -> ASCENDING; shuffled column -> UNORDERED
    srt = pa.table({"a": pa.array(np.arange(5000))})
    p1 = str(tmp_path / "s.parquet")
    write_parquet_native(srt, p1, data_page_rows=500)
    assert read_page_index(p1, 0, 0)["column_index"]["boundary_order"] == 1
    rng = np.random.default_rng(5)
    shuf = pa.table({"a": pa.array(rng.permutation(5000))})
    p2 = str(tmp_path / "u.parquet")
    write_parquet_native(shuf, p2, data_page_rows=500,
                         bloom_filter_columns=["a"])
    assert read_page_index(p2, 0, 0)["column_index"]["boundary_order"] == 0
    desc = pa.table({"a": pa.array(np.arange(5000)[::-1].copy())})
    p3 = str(tmp_path / "d.parquet")
    write_parquet_native(desc, p3, data_page_rows=500)
    assert read_page_index(p3, 0, 0)["column_index"]["boundary_order"] == 2
    # `in` filter end to end over the bloom-filtered file
    want = [3, 1234, 4999]
    got = read_parquet_native(
        p2, filters=[("a", "in", want)], max_rows_per_task=1000
    ).to_pandas()
    assert sorted(got["a"]) == want


class TestPageHeaderStatistics:
    """Per-page Statistics embedded in the data-page headers themselves
    (VERDICT r4 item 8; reference thrift DataPageHeader.statistics /
    DataPageHeaderV2.statistics) — null_count always, exact min/max
    when available — parsed back with the engine's own thrift reader
    and cross-checked against the actual page value slices; files stay
    readable by pyarrow and DuckDB."""

    @pytest.mark.parametrize("page_version", [1, 2])
    def test_header_stats_match_page_values(self, tmp_path, page_version):
        import struct as pystruct

        import pyarrow.compute as pc

        from parquet_go_ray.sources.parquet_pages import read_page_header

        n = 550
        t = pa.table({
            "x": pa.array(
                [None if i % 7 == 0 else (i * 3) % 1000 for i in range(n)],
                pa.int64(),
            ),
            "s": pa.array([f"k{(i * 13) % 97:03d}" for i in range(n)]),
        })
        path = str(tmp_path / f"ps{page_version}.parquet")
        write_parquet_native(t, path, codec="zstd",
                             page_version=page_version,
                             data_page_rows=100)
        assert pq.read_table(path).equals(t)
        import duckdb

        assert duckdb.sql(
            f"SELECT count(*) FROM read_parquet('{path}')"
        ).fetchone()[0] == n

        pf = pq.ParquetFile(path)
        for ci, name in enumerate(t.column_names):
            md = pf.metadata.row_group(0).column(ci)
            with open(path, "rb") as f:
                f.seek(md.data_page_offset)
                buf = f.read(md.total_compressed_size)
            pos, row = 0, 0
            pages = 0
            while row < n:
                hdr, pos = read_page_header(buf, pos)
                take = hdr["num_values"]
                sl = t.column(name).slice(row, take)
                st = hdr["page_statistics"]
                assert st["null_count"] == sl.null_count
                dense = sl.drop_null()
                if name == "x":
                    lo = pystruct.unpack("<q", st["min"])[0]
                    hi = pystruct.unpack("<q", st["max"])[0]
                    assert lo == pc.min(dense).as_py()
                    assert hi == pc.max(dense).as_py()
                else:
                    assert st["min"].decode() == pc.min(dense).as_py()
                    assert st["max"].decode() == pc.max(dense).as_py()
                row += take
                pos += hdr["compressed_size"]
                pages += 1
            assert pages == 6  # ceil(550 / 100)

    def test_all_null_page_has_null_count_only(self, tmp_path):
        from parquet_go_ray.sources.parquet_pages import read_page_header

        t = pa.table({
            "x": pa.array([None] * 100 + list(range(100)), pa.int64()),
        })
        path = str(tmp_path / "nullpage.parquet")
        write_parquet_native(t, path, data_page_rows=100)
        assert pq.read_table(path).equals(t)
        pf = pq.ParquetFile(path)
        md = pf.metadata.row_group(0).column(0)
        with open(path, "rb") as f:
            f.seek(md.data_page_offset)
            buf = f.read(md.total_compressed_size)
        hdr, _ = read_page_header(buf, 0)
        st = hdr["page_statistics"]
        assert st == {"null_count": 100, "min": None, "max": None}
