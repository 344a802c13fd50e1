"""Stateful encoder / decoder actors for ``map_batches`` / ``map_groups``.

EncoderActor is the engine's ColumnStore-write analogue
(/root/reference/datastore/column.go:42-101) re-expressed as a Ray Data
actor-pool stage: constructed once per actor (codec registry, checkpoint
paths, completed-partition set), invoked once per shuffle group. Symbol
tables and codec choices are built *per partition* and never shared
across partitions, so task retries reproduce byte-identical blobs
(SURVEY.md §3.4).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..state import manifest as mf
from ..state.blob import decode_table, encode_table
from .salt import BUCKET_COL

SUMMARY_SCHEMA = pa.schema(
    [
        pa.field("partition_id", pa.string()),
        pa.field("rows", pa.int64()),
        pa.field("raw_bytes", pa.int64()),
        pa.field("blob_bytes", pa.int64()),
        pa.field("skipped", pa.bool_()),
    ]
)


class EncoderActor:
    """map_groups callable: one shuffle group (= one partition) per call."""

    def __init__(
        self,
        checkpoint_dir: str,
        sort_keys: tuple[str, ...] = ("conv_id", "turn_idx"),
        choices: dict | None = None,
        input_files: list[str] | None = None,
    ):
        self.checkpoint_dir = checkpoint_dir
        self.sort_keys = [k for k in sort_keys]
        self.choices = choices
        self.input_files = input_files or []
        # Loaded once per actor; partitions completed by *previous runs*.
        self.completed = mf.completed_partitions(checkpoint_dir)

    def __call__(self, group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return SUMMARY_SCHEMA.empty_table()
        bucket = group.column(BUCKET_COL)[0].as_py()
        pid = f"{bucket:06d}"
        if pid in self.completed:
            entry = mf.read_entry(self.checkpoint_dir, pid)
            return self._summary(pid, entry["rows"], entry.get("raw_bytes") or 0,
                                 entry["blob_bytes"], skipped=True)
        group = group.drop_columns([BUCKET_COL])
        # Lineage: which input fragments fed this partition.
        fragments = [f"bucket={bucket}"]
        from .salt import SRC_COL

        if SRC_COL in group.column_names:
            src = pc.unique(group.column(SRC_COL)).to_pylist()
            fragments += [
                self.input_files[i] if 0 <= i < len(self.input_files) else f"src={i}"
                for i in sorted(src)
            ]
            group = group.drop_columns([SRC_COL])
        # Sort-within-partition: stable turn ordering (north rule).
        keys = [k for k in self.sort_keys if k in group.column_names]
        if keys:
            idx = pc.sort_indices(
                group, sort_keys=[(k, "ascending") for k in keys]
            )
            group = group.take(idx)
        raw_bytes = group.nbytes
        blob, meta = encode_table(group, choices=self.choices)
        mf.write_partition(
            self.checkpoint_dir,
            pid,
            blob,
            meta,
            input_fragments=fragments,
            raw_bytes=raw_bytes,
        )
        return self._summary(pid, group.num_rows, raw_bytes, len(blob), False)

    @staticmethod
    def _summary(pid, rows, raw_bytes, blob_bytes, skipped):
        return pa.Table.from_pydict(
            {
                "partition_id": [pid],
                "rows": [rows],
                "raw_bytes": [raw_bytes],
                "blob_bytes": [blob_bytes],
                "skipped": [skipped],
            },
            schema=SUMMARY_SCHEMA,
        )


class DecoderActor:
    """map_batches callable over read_binary_files rows (one blob each)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        tables = []
        for blob in batch.column("bytes"):
            tables.append(decode_table(blob.as_py()))
        if not tables:
            return pa.table({})
        return pa.concat_tables(tables)


def multiset_hash(batch: pa.Table, columns: list[str] | None = None) -> int:
    """Order-independent content hash of a batch: the sum (mod 2^64) of
    per-row SipHashes. Equal multisets of rows ⇔ equal hashes (whp), so a
    distributed sum over batches verifies round-trip equality without any
    shuffle or driver-side materialization."""
    import pandas as pd

    cols = columns or sorted(batch.column_names)
    df = batch.select(cols).to_pandas()
    h = pd.util.hash_pandas_object(df, index=False).to_numpy(dtype=np.uint64)
    return int(h.sum(dtype=np.uint64))
