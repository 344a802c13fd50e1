"""General Dremel shredding / assembly (sources/dremel.py): the
arbitrary-depth struct/list machinery behind the native Parquet file
path. Self-consistency (assemble∘shred == id), a seeded random shape
fuzz, and wire-level assembly of pyarrow-written streams."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from parquet_go_ray.sources.dremel import (
    assemble_column,
    column_depth,
    shred_column,
)

S2 = pa.struct([pa.field("x", pa.int64()), pa.field("y", pa.string())])

SHAPES = [
    ("list_struct", pa.list_(S2),
     [[{"x": 1, "y": "a"}, {"x": None, "y": "b"}], None, [],
      [{"x": 3, "y": None}]]),
    ("list_list", pa.list_(pa.list_(pa.int64())),
     [[[1, 2], [], None], [], None, [[3]]]),
    ("struct_list_struct",
     pa.struct([pa.field("inner", pa.struct([
         pa.field("l", pa.list_(pa.float64())),
         pa.field("z", pa.int32())])),
         pa.field("w", pa.string())]),
     [{"inner": {"l": [1.0, None], "z": 5}, "w": "q"}, None,
      {"inner": None, "w": "r"},
      {"inner": {"l": None, "z": None}, "w": None},
      {"inner": {"l": [], "z": 1}, "w": "s"}]),
    ("list_list_struct", pa.list_(pa.list_(S2)),
     [[[{"x": 1, "y": "a"}], []], None, [], [None],
      [[None, {"x": 2, "y": None}]]]),
    ("depth4",
     pa.list_(pa.struct([pa.field("m", pa.list_(
         pa.struct([pa.field("q", pa.int64())])))])),
     [[{"m": [{"q": 1}, {"q": None}]}, {"m": None}], None, [{"m": []}]]),
]


@pytest.mark.parametrize("name,typ,data", SHAPES, ids=[s[0] for s in SHAPES])
def test_shred_assemble_identity(name, typ, data):
    f = pa.field("c", typ)
    arr = pa.array(data, typ)
    leaves = shred_column(f, arr)
    got = assemble_column(f, [(l.rep, l.de, l.dense) for l in leaves])
    assert got.equals(arr), got.to_pylist()
    assert column_depth(typ) >= 2


PRIMS = [pa.int64(), pa.int32(), pa.float64(), pa.string(), pa.bool_()]


def _rand_type(rng, depth):
    if depth == 0 or rng.random() < 0.3:
        return PRIMS[rng.integers(len(PRIMS))]
    if rng.random() < 0.5:
        return pa.list_(pa.field("element", _rand_type(rng, depth - 1),
                                 nullable=bool(rng.random() < 0.8)))
    nf = int(rng.integers(1, 4))
    return pa.struct([pa.field(f"f{i}", _rand_type(rng, depth - 1),
                               nullable=bool(rng.random() < 0.8))
                      for i in range(nf)])


def _rand_val(rng, t, nullable):
    if nullable and rng.random() < 0.25:
        return None
    if pa.types.is_list(t):
        return [_rand_val(rng, t.value_type, t.value_field.nullable)
                for _ in range(int(rng.integers(0, 4)))]
    if pa.types.is_struct(t):
        return {t.field(i).name: _rand_val(rng, t.field(i).type,
                                           t.field(i).nullable)
                for i in range(t.num_fields)}
    if pa.types.is_integer(t):
        return int(rng.integers(-1000, 1000))
    if pa.types.is_floating(t):
        return float(rng.normal())
    if pa.types.is_boolean(t):
        return bool(rng.random() < 0.5)
    return f"s{int(rng.integers(0, 50))}"


def test_fuzz_shred_assemble():
    for seed in range(80):
        rng = np.random.default_rng(seed)
        t = _rand_type(rng, 4)
        nullable = bool(rng.random() < 0.8)
        f = pa.field("c", t, nullable)
        data = [_rand_val(rng, t, nullable)
                for _ in range(int(rng.integers(0, 50)))]
        arr = pa.array(data, t)
        leaves = shred_column(f, arr)
        got = assemble_column(f, [(l.rep, l.de, l.dense) for l in leaves])
        assert got.equals(arr), (seed, t)


@pytest.mark.parametrize("version,use_dict", [("1.0", True), ("2.6", False)])
def test_assemble_pyarrow_wire_streams(tmp_path, version, use_dict):
    """Raw (rep, def, values) streams decoded from a pyarrow-written
    file assemble back to pq.read_table's answer — assembly against a
    foreign writer's levels, not just our own shredder's."""
    from parquet_go_ray.sources.parquet_pages import _read_chunk

    t = pa.table({
        "a": pa.array(SHAPES[0][2], SHAPES[0][1]),
        "b": pa.array(SHAPES[1][2], SHAPES[1][1]),
        "c": pa.array([1, 2, 3, 4], pa.int64()),
    })
    path = str(tmp_path / "w.parquet")
    pq.write_table(t, path, version=version, use_dictionary=use_dict,
                   compression="snappy", data_page_size=64)
    pf = pq.ParquetFile(path)
    md = pf.metadata.row_group(0)
    tops = [md.column(i).path_in_schema.split(".")[0]
            for i in range(md.num_columns)]
    expect = pq.read_table(path)
    for f in expect.schema:
        streams = []
        for i in [i for i, tn in enumerate(tops) if tn == f.name]:
            v, r, d = _read_chunk(pf, path, 0, i, raw=True)
            streams.append((r, d, v))
        got = assemble_column(f, streams)
        assert got.equals(expect.column(f.name).combine_chunks()), f.name
