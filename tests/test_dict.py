"""Dictionary codec tests (ref types/dict.go, datastore/dict.go)."""

import numpy as np
import pyarrow as pa
import pytest

from parquet_go_ray.functions.dictionary import dict_decode, dict_encode


@pytest.mark.parametrize(
    "values",
    [
        ["user", "assistant", "user", "tool", "assistant"] * 20,
        ["solo"],
        [""] * 5,
        list("abcdefgh") * 3,
        [f"tool_{i}" for i in range(300)],  # wide dictionary -> 9-bit indices
    ],
)
def test_string_roundtrip(values):
    arr = pa.array(values)
    payload, meta = dict_encode(arr)
    out, pos = dict_decode(payload, len(arr))
    assert pos == len(payload)
    assert out.to_pylist() == values
    assert meta["dict_count"] == len(set(values))


def test_numeric_roundtrip():
    arr = pa.array(np.array([5, 7, 5, 5, 9, 7], dtype=np.int64))
    payload, meta = dict_encode(arr)
    out, _ = dict_decode(payload, len(arr))
    assert out.to_pylist() == [5, 7, 5, 5, 9, 7]


def test_first_occurrence_order_is_stable():
    # Same first-occurrence semantics as the reference's DictStore
    # (datastore/dict.go:55-83) -> deterministic payload bytes.
    a = pa.array(["b", "a", "b", "c"])
    p1, m1 = dict_encode(a)
    p2, m2 = dict_encode(pa.array(["b", "a", "b", "c"]))
    assert p1 == p2 and m1["symtab_hash"] == m2["symtab_hash"]


def test_symtab_hash_distinguishes_tables():
    _, m1 = dict_encode(pa.array(["a", "b"]))
    _, m2 = dict_encode(pa.array(["a", "c"]))
    assert m1["symtab_hash"] != m2["symtab_hash"]


def test_index_out_of_range_rejected():
    # Mirror of ref types/dict.go:98-103 bounds check.
    payload, _ = dict_encode(pa.array(["a", "b", "a"]))
    with pytest.raises(ValueError):
        dict_decode(payload, 100)  # more values than stream -> zeros beyond
