"""JSON schema-definition dialect tests (the reference's schema.json
dialect, whose textual parser the reference leaves unimplemented —
schema/schema-definition.go:8-18). A declared schema must be usable
end-to-end: build a table against it, encode, decode bit-exact."""

import numpy as np
import pyarrow as pa
import pytest

from parquet_go_ray.state.schema_def import (
    field_from_definition,
    schema_from_definition,
    schemas_from_json,
)

DOC = {
    "transcripts": {
        "convId": {"type": "STRING"},
        "turnIdx": {"type": "INT32"},
        "role": {"type": "ENUM", "repetition": "optional"},
        "text": {"type": {"type": "BYTE_ARRAY", "encoding": "DELTA_LENGTH_BYTE_ARRAY"}},
        "ts": {"type": {"type": "TIMESTAMP", "precision": "MICROS"}},
        "score": {"type": "DOUBLE", "repetition": "optional"},
        "tags": {"type": "list", "data": {"type": "STRING"}, "repetition": "optional"},
        "attrs": {
            "type": "map",
            "key": {"type": "STRING"},
            "value": {"type": "INT64", "repetition": "optional"},
        },
        "uid": {"type": "UUID"},
        "amount": {"type": {"type": "DECIMAL", "precision": 10, "scale": 2}},
        "small": {"type": {"type": "INTEGER", "bit-width": 16, "signed": False}},
        "t": {"type": {"type": "TIME", "precision": "MILLIS"}},
        "local_ts": {
            "type": {
                "type": "TIMESTAMP",
                "precision": "NANOS",
                "adjusted-to-utc": False,
            }
        },
        "frames": {"type": "INT64", "repetition": "repeated"},
        "fixed": {"type": {"type": "FIXED_LEN_BYTE_ARRAY", "length": 10}},
    }
}


def test_types_and_repetition():
    schemas = schemas_from_json(DOC)
    s = schemas["transcripts"]
    assert s.field("convId").type == pa.string()
    assert not s.field("convId").nullable  # required by default
    assert s.field("turnIdx").type == pa.int32()
    assert s.field("role").nullable
    assert s.field("text").type == pa.binary()
    assert s.field("ts").type == pa.timestamp("us", "UTC")
    assert s.field("tags").type == pa.list_(pa.field("item", pa.string(), nullable=False))
    assert pa.types.is_map(s.field("attrs").type)
    assert s.field("attrs").type.key_type == pa.string()
    assert s.field("attrs").type.item_field.nullable  # declared optional
    # A 'required' map value keeps its repetition in the Arrow type.
    req_map = field_from_definition(
        "m", {"type": "map", "key": {"type": "STRING"}, "value": {"type": "INT64"}}
    )
    assert not req_map.type.item_field.nullable
    assert s.field("uid").type == pa.binary(16)
    assert s.field("amount").type == pa.decimal128(10, 2)
    assert s.field("small").type == pa.uint16()
    assert s.field("t").type == pa.time32("ms")
    assert s.field("local_ts").type == pa.timestamp("ns")  # not adjusted: no tz
    assert s.field("frames").type == pa.list_(pa.int64())  # repeated ≡ list
    assert s.field("fixed").type == pa.binary(10)


def test_declared_schema_encodes_end_to_end():
    """A schema declared in the dialect drives a real engine round-trip."""
    from parquet_go_ray.state.blob import decode_table, encode_table

    schema = schema_from_definition(
        {
            "id": {"type": "INT64"},
            "name": {"type": "STRING", "repetition": "optional"},
            "vals": {"type": "list", "data": {"type": "DOUBLE"}},
            "props": {
                "type": "map",
                "key": {"type": "STRING"},
                "value": {"type": "INT32", "repetition": "optional"},
            },
        }
    )
    rng = np.random.default_rng(3)
    n = 200
    t = pa.table(
        {
            "id": pa.array(range(n), pa.int64()),
            "name": pa.array(
                [None if i % 7 == 0 else f"n{i}" for i in range(n)], pa.string()
            ),
            "vals": pa.array(
                [[float(x) for x in rng.normal(size=i % 4)] for i in range(n)],
                schema.field("vals").type,
            ),
            "props": pa.array(
                [[(f"k{i%3}", i if i % 5 else None)] for i in range(n)],
                schema.field("props").type,
            ),
        },
        schema=pa.schema(
            [schema.field(i) for i in range(len(schema.names))]
        ),
    )
    blob, _ = encode_table(t)
    out = decode_table(blob)
    for c in t.column_names:
        assert out.column(c).combine_chunks().equals(t.column(c).combine_chunks())


def test_errors():
    with pytest.raises(ValueError):
        field_from_definition("x", {"type": "NOPE"})
    with pytest.raises(ValueError):
        field_from_definition("x", {"type": {"type": "INTEGER", "bit-width": 12, "signed": True}})
    with pytest.raises(ValueError):
        schemas_from_json("[1, 2]")
    with pytest.raises((ValueError, KeyError)):
        field_from_definition("x", {"type": "list"})  # missing data
