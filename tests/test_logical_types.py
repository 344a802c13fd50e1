"""Extended logical-type coverage: decimal128, fixed-size binary,
unsigned ints, date32/64, time types — the SURVEY §1.3 annotations —
plus the embedding-cosine near-dup op."""

import decimal

import numpy as np
import pyarrow as pa
import pytest

from parquet_go_ray.state.blob import decode_table, encode_table


def tbl_roundtrip(t: pa.Table):
    blob, meta = encode_table(t)
    out = decode_table(blob)
    a, b = t.combine_chunks(), out.combine_chunks()
    assert a.schema.equals(b.schema)
    for c in a.column_names:
        assert a.column(c).equals(b.column(c)), c
    return meta


def test_decimal128():
    vals = [decimal.Decimal("12.34"), None, decimal.Decimal("-99999999.99"),
            decimal.Decimal("0.01")]
    t = pa.table({"d": pa.array(vals, pa.decimal128(18, 2))})
    meta = tbl_roundtrip(t)
    assert meta["columns"]["d"]["codec"] == "plain"


def test_fixed_size_binary_uuid_like(rng):
    payloads = [rng.integers(0, 256, 16).astype(np.uint8).tobytes() for _ in range(50)]
    t = pa.table({"u": pa.array(payloads + [None], pa.binary(16))})
    tbl_roundtrip(t)


def test_unsigned_ints():
    t = pa.table(
        {
            "u8": pa.array([0, 255, None], pa.uint8()),
            "u16": pa.array([0, 65535, 7], pa.uint16()),
            "u32": pa.array([0, 2**32 - 1, 5], pa.uint32()),
            "u64": pa.array([0, 2**64 - 1, 2**63 + 5], pa.uint64()),
        }
    )
    tbl_roundtrip(t)


def test_date_and_time_types():
    t = pa.table(
        {
            "d32": pa.array([0, 19000, None], pa.date32()),
            "t32": pa.array([0, 86_399_999, 5], pa.time32("ms")),
            "t64": pa.array([0, 86_399_999_999, 7], pa.time64("us")),
            "ts_tz": pa.array(
                [1_700_000_000_000_000, None, 0], pa.timestamp("us", tz="UTC")
            ),
        }
    )
    tbl_roundtrip(t)


def test_list_columns_roundtrip():
    """Repetition-level case (SURVEY §1.4): list offsets + recursive
    child encode, incl. outer nulls, empty lists, and element nulls."""
    t = pa.table(
        {
            "emb": pa.array(
                [[1.5, 2.5], [0.0], None, []], pa.list_(pa.float32())
            ),
            "tags": pa.array(
                [["a", "bb"], None, ["c", None, "dd"], []], pa.list_(pa.string())
            ),
            "fixed": pa.array(
                [[1, 2, 3], [4, 5, 6], None, [7, 8, 9]],
                pa.list_(pa.int64(), 3),
            ),
        }
    )
    meta = tbl_roundtrip(t)
    assert meta["columns"]["emb"]["codec"] == "list"


def test_unsupported_type_raises():
    # Structs are supported since round 2 (Dremel recursion); sparse
    # unions remain genuinely unsupported and must fail loudly.
    arr = pa.UnionArray.from_sparse(
        pa.array([0, 1], pa.int8()),
        [pa.array([1, 2], pa.int32()), pa.array(["a", "b"])],
    )
    t = pa.table({"u": arr})
    with pytest.raises((TypeError, pa.ArrowInvalid, pa.ArrowNotImplementedError)):
        encode_table(t)


def test_dedup_embedding(ray_session, rng):
    import ray

    from parquet_go_ray.ops.dedup import dedup_embedding

    base = rng.normal(size=(30, 16))
    # vec 1 = vec 0 + tiny noise (near-dup); vec 2.. independent.
    base[1] = base[0] + rng.normal(scale=1e-3, size=16)
    t = pa.table(
        {
            "vec_id": pa.array(range(30), pa.int64()),
            "embedding": pa.array(list(base.astype(np.float32)), pa.list_(pa.float32())),
        }
    )
    ids = sorted(
        r["vec_id"]
        for r in dedup_embedding(
            ray.data.from_arrow(t), threshold=0.999, n_planes=8, n_tables=8
        ).iter_rows()
    )
    assert 0 in ids and 1 not in ids
    assert len(ids) == 29


def test_uuid_fixed_binary_roundtrip():
    """UUID logical type (ref schema.json:169-236): 16-byte
    FIXED_LEN_BYTE_ARRAY values round-trip bit-exact."""
    import uuid

    vals = [uuid.uuid5(uuid.NAMESPACE_DNS, f"k{i}").bytes for i in range(200)]
    vals[7] = None
    t = pa.table({"u": pa.array(vals, pa.binary(16))})
    meta = tbl_roundtrip(t)
    assert meta["columns"]["u"]["null_count"] == 1


def test_interval_month_day_nano_roundtrip():
    """INTERVAL logical type: month_day_nano 16-byte raw values."""
    MDN = pa.MonthDayNano
    vals = [MDN([i % 12, i % 28, i * 1_000_000]) for i in range(100)]
    vals[3] = None
    t = pa.table({"iv": pa.array(vals, pa.month_day_nano_interval())})
    meta = tbl_roundtrip(t)
    assert meta["columns"]["iv"]["codec"] == "plain"


def test_duration_roundtrip():
    t = pa.table(
        {
            "d_us": pa.array([1_000_000 * i for i in range(500)], pa.duration("us")),
            "d_s": pa.array([None if i % 9 == 0 else i for i in range(500)], pa.duration("s")),
        }
    )
    tbl_roundtrip(t)


def test_time_types_roundtrip():
    t = pa.table(
        {
            "t32": pa.array([i * 1000 for i in range(300)], pa.time32("ms")),
            "t64": pa.array([i * 1_000_000 for i in range(300)], pa.time64("us")),
        }
    )
    tbl_roundtrip(t)
