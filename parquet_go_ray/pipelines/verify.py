"""Distributed round-trip verification.

The north-rule invariant: decoded text (and every column) bit-identical
per (conv_id, turn_idx) under stable turn ordering. The comparison is
per-key, i.e. order-independent — so instead of a join/shuffle we compare
order-independent multiset hashes: sum over rows of a deterministic
per-row SipHash, reduced with ``Dataset.sum`` — no driver-side
materialization, no all-to-all (SURVEY.md §4.3).
"""

from __future__ import annotations

import pyarrow as pa

import ray

from ..stages.encoder import multiset_hash


def dataset_content_hash(ds: ray.data.Dataset, columns: list[str]) -> int:
    """Order-independent content hash of selected columns, distributed."""

    def batch_hash(batch: pa.Table) -> pa.Table:
        return pa.table({"h": pa.array([multiset_hash(batch, columns)], pa.uint64())})

    hashed = ds.map_batches(batch_hash, batch_format="pyarrow")
    total = 0
    for row in hashed.iter_rows():
        total = (total + row["h"]) & 0xFFFFFFFFFFFFFFFF
    return total


def verify_roundtrip(
    input_ds: ray.data.Dataset,
    decoded_ds: ray.data.Dataset,
    columns: list[str] | None = None,
) -> dict:
    """Compare input vs decoded datasets per-key without a shuffle."""
    if columns is None:
        columns = sorted(input_ds.schema().names)
    in_count = input_ds.count()
    out_count = decoded_ds.count()
    in_hash = dataset_content_hash(input_ds, columns)
    out_hash = dataset_content_hash(decoded_ds, columns)
    return {
        "rows_in": in_count,
        "rows_out": out_count,
        "hash_in": in_hash,
        "hash_out": out_hash,
        "match": in_count == out_count and in_hash == out_hash,
    }
