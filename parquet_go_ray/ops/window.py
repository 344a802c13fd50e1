"""Rolling (sliding-row-frame) window aggregates per key.

SQL's ``MAX(val) OVER (PARTITION BY key ORDER BY ... ROWS BETWEEN k-1
PRECEDING AND CURRENT ROW)`` — the per-row streaming-window shape (a
sensor's k-reading peak, a user's recent-activity high-water mark).
MIN/MAX frames are float-exact (no re-association), so the DuckDB
window oracle hash-matches; rolling SUM/AVG would re-associate float
addition and is deliberately not offered on floats.

Plan (the repo's standard grouped shape): project (key, order, value),
co-locate each key's rows on a coarse ``pk = hash(key) % B`` bucket,
and resolve ALL of a bucket's keys in one vectorized pass — one
lexsort, then ``k-1`` shifted segment-masked ``np.maximum`` passes
(window sizes are small constants; no per-row Python, no per-key
tasks). The ordering must be total per key (pass a tiebreak column) —
otherwise frame contents are implementation-defined, same as SQL.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray


def _bucket_hash(col: pa.Array, num_buckets: int) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_string(col.type) or pa.types.is_large_string(col.type) \
            or pa.types.is_binary(col.type) \
            or pa.types.is_large_binary(col.type):
        from ..functions.bloom import xxh64_bytes
        from ..functions.bytearray import arrow_strings_to_parts

        lens, data = arrow_strings_to_parts(col)
        h = xxh64_bytes(lens, np.frombuffer(data, np.uint8))
    else:
        from ..functions.bloom import xxh64_fixed

        h = xxh64_fixed(col.to_numpy(zero_copy_only=False))
    return (h % np.uint64(num_buckets)).astype(np.int32)


def _sortable(col) -> np.ndarray:
    arr = col.to_numpy(zero_copy_only=False)
    return arr.view("i8") if arr.dtype.kind in "Mm" else arr


def rolling_max(
    ds: ray.data.Dataset,
    by: str,
    order_cols: list[str],
    val_col: str,
    window: int,
    out_col: str = "rolling_max",
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Per-``by`` rolling max of ``val_col`` over the current row and
    the ``window - 1`` preceding rows in ``order_cols`` order. Returns
    the projected columns plus ``out_col``; null values propagate like
    SQL MAX (ignored within the frame unless the whole frame is null).
    """
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    if num_buckets is None:
        from .bucketing import derive_num_buckets

        num_buckets = derive_num_buckets(ds)

    def project(batch: pa.Table) -> pa.Table:
        keys = batch.column(by)
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        if keys.null_count:
            raise ValueError(f"rolling_max: null partition keys in {by!r}")
        cols = {by: keys}
        for c in order_cols:
            cols[c] = batch.column(c)
        cols[val_col] = batch.column(val_col)
        cols["__pk"] = pa.array(_bucket_hash(keys, num_buckets))
        return pa.table(cols)

    def per_bucket(group: pa.Table) -> pa.Table:
        n = group.num_rows
        out_schema = [by] + order_cols + [val_col]
        if n == 0:
            t = {c: group.column(c).slice(0, 0) for c in out_schema}
            t[out_col] = pa.array([], pa.float64())
            return pa.table(t)
        keys = group.column(by).to_numpy(zero_copy_only=False)
        _, codes = np.unique(keys, return_inverse=True)
        sort_cols = [_sortable(group.column(c))
                     for c in reversed(order_cols)]
        order = np.lexsort(sort_cols + [codes])
        seg = codes[order]
        vals = group.column(val_col).to_numpy(
            zero_copy_only=False
        ).astype(np.float64, copy=False)[order]
        # NaN marks SQL NULL here; np.fmax ignores NaN unless both are
        rmax = vals.copy()
        for s in range(1, window):
            same = seg[s:] == seg[:-s]
            shifted = vals[:-s]
            tgt = rmax[s:]
            upd = np.where(same, np.fmax(tgt, shifted), tgt)
            rmax[s:] = upd
        inv = np.empty(n, dtype=np.int64)
        inv[order] = np.arange(n)
        t = {c: group.column(c) for c in out_schema}
        t[out_col] = pa.array(rmax[inv])
        tbl = pa.table(t)
        if group.column(val_col).null_count:
            # restore nulls where the whole frame was null (NaN rmax)
            mask = np.isnan(rmax[inv])
            if mask.any():
                tbl = tbl.set_column(
                    tbl.schema.get_field_index(out_col), out_col,
                    pa.array(rmax[inv], mask=mask),
                )
        return tbl

    return (
        ds.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__pk")
        .map_groups(per_bucket, batch_format="pyarrow")
    )
