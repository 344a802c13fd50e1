"""JSON schema-definition dialect → Arrow schemas.

The reference declares write schemas in a JSON dialect
(/root/reference/schema.json; example at
/root/reference/examples/schemas/schema1.json) whose textual parser is
left unimplemented in the snapshot
(/root/reference/schema/schema-definition.go:8-18). This module supplies
the working reader for that dialect against the engine's Arrow-native
schema system: a document maps message names to column collections, each
column being a simple field (primitive or logical type + repetition), a
LIST group, or a MAP group (the LIST/MAP shapes of schema.json:66-100).

Type mapping follows SURVEY.md §1.2/§1.3:

    BOOLEAN→bool  INT32→int32  INT64→int64  INT96→timestamp[ns] (decode
    compat)  FLOAT→float32  DOUBLE→float64  BYTE_ARRAY→binary
    FIXED_LEN_BYTE_ARRAY(n)→binary(n)
    STRING/ENUM/JSON→string  BSON→binary  UUID→binary(16)  DATE→date32
    INTERVAL→month_day_nano  INTEGER(w,signed)→(u)int{w}
    DECIMAL(p,s)→decimal128(p,s)  TIME(p)→time32/64  TIMESTAMP(p)→
    timestamp(unit, tz=UTC when adjusted-to-utc)

``repetition: optional`` → nullable field, ``required`` → non-nullable,
``repeated`` → list<type> (the unwrapped repeated-field shape).
"""

from __future__ import annotations

import json

import pyarrow as pa

__all__ = ["schema_from_definition", "schemas_from_json", "field_from_definition"]

_PRIMITIVES = {
    "BOOLEAN": pa.bool_(),
    "INT32": pa.int32(),
    "INT64": pa.int64(),
    "INT96": pa.timestamp("ns"),  # legacy timestamps; decode-only compat
    "FLOAT": pa.float32(),
    "DOUBLE": pa.float64(),
    "BYTE_ARRAY": pa.binary(),
}

_LOGICAL_SIMPLE = {
    "STRING": pa.string(),
    "ENUM": pa.string(),
    "JSON": pa.string(),
    "BSON": pa.binary(),
    "UUID": pa.binary(16),
    "DATE": pa.date32(),
    "INTERVAL": pa.month_day_nano_interval(),
}

_TIME_UNITS = {"MILLIS": "ms", "MICROS": "us", "NANOS": "ns"}


def _type_from_def(t) -> pa.DataType:
    if isinstance(t, str):
        if t in _PRIMITIVES:
            return _PRIMITIVES[t]
        if t in _LOGICAL_SIMPLE:
            return _LOGICAL_SIMPLE[t]
        raise ValueError(f"unknown type name {t!r}")
    if not isinstance(t, dict) or "type" not in t:
        raise ValueError(f"malformed type definition: {t!r}")
    name = t["type"]
    if name == "FIXED_LEN_BYTE_ARRAY":
        return pa.binary(int(t["length"]))
    if name in _PRIMITIVES:
        return _PRIMITIVES[name]  # encoding hints don't change the type
    if name in _LOGICAL_SIMPLE:
        return _LOGICAL_SIMPLE[name]
    if name == "INTEGER":
        width = int(t["bit-width"])
        signed = bool(t["signed"])
        table = {
            (8, True): pa.int8(),
            (16, True): pa.int16(),
            (32, True): pa.int32(),
            (64, True): pa.int64(),
            (8, False): pa.uint8(),
            (16, False): pa.uint16(),
            (32, False): pa.uint32(),
            (64, False): pa.uint64(),
        }
        try:
            return table[(width, signed)]
        except KeyError:
            raise ValueError(f"bad INTEGER width {width}") from None
    if name == "DECIMAL":
        return pa.decimal128(int(t["precision"]), int(t["scale"]))
    if name == "TIME":
        unit = _TIME_UNITS[t["precision"]]
        return pa.time32(unit) if unit == "ms" else pa.time64(unit)
    if name == "TIMESTAMP":
        unit = _TIME_UNITS[t["precision"]]
        tz = "UTC" if t.get("adjusted-to-utc", True) else None
        return pa.timestamp(unit, tz)
    raise ValueError(f"unknown logical type {name!r}")


def field_from_definition(name: str, spec: dict) -> pa.Field:
    """One column definition → pa.Field."""
    if not isinstance(spec, dict):
        raise ValueError(f"column {name!r}: definition must be an object")
    rep = spec.get("repetition", "required")
    kind = spec.get("type")
    if kind == "list":
        inner = field_from_definition("item", spec["data"])
        typ = pa.list_(inner)
    elif kind == "map":
        key = field_from_definition("key", spec["key"])
        if key.nullable and spec["key"].get("repetition") == "optional":
            raise ValueError(f"map column {name!r}: keys cannot be optional")
        value = field_from_definition(
            "value", spec.get("value", {"type": "BYTE_ARRAY"})
        )
        # Pass the full value FIELD so its repetition survives — a
        # 'required' map value stays non-nullable in the Arrow type
        # (pa.map_(key.type, value.type) would silently make it nullable).
        typ = pa.map_(key.type, value)
    else:
        typ = _type_from_def(kind)
    if rep == "repeated":
        typ = pa.list_(typ)
        return pa.field(name, typ, nullable=False)
    return pa.field(name, typ, nullable=(rep == "optional"))


def schema_from_definition(message: dict) -> pa.Schema:
    """One message (column-name → field definition) → pa.Schema."""
    return pa.schema(
        [field_from_definition(n, spec) for n, spec in message.items()]
    )


def schemas_from_json(text: str | bytes | dict) -> dict[str, pa.Schema]:
    """Full document (message-name → message) → {name: pa.Schema}."""
    doc = text if isinstance(text, dict) else json.loads(text)
    if not isinstance(doc, dict):
        raise ValueError("schema definition document must be a JSON object")
    return {name: schema_from_definition(msg) for name, msg in doc.items()}
