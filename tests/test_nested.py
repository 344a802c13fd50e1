"""Nested-column (Dremel struct/list/map recursion) round-trip tests —
the round-1 gap vs the reference's group assembly
(/root/reference/schema/column.go:332-379, LIST/MAP shapes
schema.json:66-100)."""

import numpy as np
import pyarrow as pa
import pytest

from parquet_go_ray.state.blob import decode_table, encode_table


def _roundtrip_equal(t: pa.Table):
    blob, meta = encode_table(t)
    out = decode_table(blob)
    for name in t.column_names:
        a = t.column(name).combine_chunks()
        b = out.column(name).combine_chunks()
        assert a.equals(b), f"column {name}: {a.to_pylist()[:4]} != {b.to_pylist()[:4]}"
    return meta


def test_struct_roundtrip_with_nulls():
    t = pa.table(
        {
            "s": pa.array(
                [{"a": 1, "b": "x"}, {"a": None, "b": "y"}, None, {"a": 4, "b": None}],
                pa.struct([("a", pa.int64()), ("b", pa.string())]),
            )
        }
    )
    meta = _roundtrip_equal(t)
    assert meta["columns"]["s"]["codec"] == "struct"


def test_list_of_struct_and_struct_of_list():
    t = pa.table(
        {
            "ls": pa.array(
                [[{"k": 1.5}], [], None, [{"k": None}, {"k": 2.5}]],
                pa.list_(pa.struct([("k", pa.float64())])),
            ),
            "sl": pa.array(
                [{"v": [1, 2]}, {"v": []}, {"v": None}, None],
                pa.struct([("v", pa.list_(pa.int32()))]),
            ),
        }
    )
    _roundtrip_equal(t)


def test_list_of_list_and_map():
    t = pa.table(
        {
            "ll": pa.array(
                [[[1], [2, 3]], [], [[None, 4]], None],
                pa.list_(pa.list_(pa.int64())),
            ),
            "m": pa.array(
                [[("a", 1)], [], None, [("b", 2), ("c", None)]],
                pa.map_(pa.string(), pa.int64()),
            ),
        }
    )
    meta = _roundtrip_equal(t)
    assert meta["columns"]["m"]["codec"] == "map"


def test_three_level_nesting():
    typ = pa.struct(
        [("x", pa.struct([("y", pa.list_(pa.struct([("z", pa.int64())])))]))]
    )
    t = pa.table(
        {
            "deep": pa.array(
                [
                    {"x": {"y": [{"z": 1}]}},
                    None,
                    {"x": None},
                    {"x": {"y": None}},
                    {"x": {"y": []}},
                    {"x": {"y": [{"z": None}, {"z": 3}]}},
                ],
                typ,
            )
        }
    )
    _roundtrip_equal(t)


def test_nested_random_fuzz_roundtrip():
    """Seeded randomized nested tables: many null patterns and shapes."""
    rng = np.random.default_rng(17)
    for trial in range(5):
        n = int(rng.integers(1, 200))

        def maybe(v, p=0.2):
            return None if rng.random() < p else v

        s = pa.array(
            [
                maybe(
                    {
                        "a": maybe(int(rng.integers(-(2**40), 2**40))),
                        "b": maybe("w" * int(rng.integers(0, 20))),
                    }
                )
                for _ in range(n)
            ],
            pa.struct([("a", pa.int64()), ("b", pa.string())]),
        )
        ls = pa.array(
            [
                maybe(
                    [
                        {"q": maybe(float(rng.normal()))}
                        for _ in range(int(rng.integers(0, 5)))
                    ]
                )
                for _ in range(n)
            ],
            pa.list_(pa.struct([("q", pa.float64())])),
        )
        _roundtrip_equal(pa.table({"s": s, "ls": ls}))


def test_nested_projection_and_sliced_batches():
    """Nested columns through the blob with projection and through
    chunked/sliced input (offset handling in struct/list children)."""
    t = pa.table(
        {
            "id": pa.array(range(100), pa.int64()),
            "s": pa.array(
                [{"a": i, "b": f"v{i%5}"} if i % 7 else None for i in range(100)],
                pa.struct([("a", pa.int64()), ("b", pa.string())]),
            ),
        }
    )
    blob, _ = encode_table(t)
    out = decode_table(blob, columns=["s"])
    assert out.column_names == ["s"]
    assert out.column("s").combine_chunks().equals(t.column("s").combine_chunks())
    # Sliced input: encode a slice whose child buffers carry an offset.
    sl = t.slice(13, 41)
    blob2, _ = encode_table(sl)
    out2 = decode_table(blob2)
    assert out2.column("s").combine_chunks().equals(
        sl.column("s").combine_chunks()
    )


def test_struct_unsupported_shapes_raise():
    with pytest.raises((TypeError, pa.ArrowInvalid)):
        encode_table(pa.table({"e": pa.array([{}, {}], pa.struct([]))}))
