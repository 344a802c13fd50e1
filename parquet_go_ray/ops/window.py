"""Rolling (sliding-row-frame) window aggregates per key.

SQL's ``agg(val) OVER (PARTITION BY key ORDER BY ... ROWS BETWEEN k-1
PRECEDING AND CURRENT ROW)`` — the per-row streaming-window shape (a
sensor's k-reading peak, a user's recent-activity high-water mark).
MIN/MAX frames are float-exact (no re-association), so the DuckDB
window oracle hash-matches; SUM/MEAN/COUNT run on exact int64
prefix-sum differences and are offered for integer value columns only
— rolling SUM over floats would re-associate float addition and is
deliberately refused.

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


_ROLLING_AGGS = ("max", "min", "sum", "mean", "count")


def rolling_max(
    ds: ray.data.Dataset,
    by: str,
    order_cols: list[str],
    val_col: str,
    window: int,
    out_col: str = "rolling_max",
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Per-``by`` rolling max — see :func:`rolling_agg`."""
    return rolling_agg(
        ds, by, order_cols, val_col, window, agg="max", out_col=out_col,
        num_buckets=num_buckets,
    )


def rolling_agg(
    ds: ray.data.Dataset,
    by: str,
    order_cols: list[str],
    val_col: str,
    window: int | None,
    agg: str = "max",
    out_col: str | None = None,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Per-``by`` rolling aggregate of ``val_col`` over the current row
    and the ``window - 1`` preceding rows in ``order_cols`` order —
    SQL's ``agg(val) OVER (PARTITION BY by ORDER BY ... ROWS BETWEEN
    window-1 PRECEDING AND CURRENT ROW)``. ``window=None`` is the
    EXPANDING frame (``ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT
    ROW`` — running totals per key), supported for the prefix-sum
    aggregates (sum/mean/count; max/min would need an O(frame) pass
    per row and are refused). Returns the projected columns plus
    ``out_col``; nulls behave like SQL (ignored within the frame; an
    all-null frame yields NULL, except COUNT → 0).

    ``max``/``min`` run on floats exactly (no re-association: shifted
    fmax/fmin passes). ``sum``/``mean`` are offered for INTEGER value
    columns only — an exact int64 prefix-sum difference per frame;
    float SUM would re-associate and lose the hash-oracle guarantee
    (cast explicitly if approximate is acceptable). ``count`` counts
    non-null frame values for any type."""
    if window is None:
        if agg in ("max", "min"):
            raise ValueError(
                f"expanding {agg} needs an O(frame) pass per row; "
                "give an explicit window"
            )
    elif window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    if agg not in _ROLLING_AGGS:
        raise ValueError(f"agg must be one of {_ROLLING_AGGS}, got {agg!r}")
    if out_col is None:
        out_col = f"rolling_{agg}"
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

    out_type = {
        "max": pa.float64(), "min": pa.float64(), "mean": pa.float64(),
        "sum": pa.int64(), "count": pa.int64(),
    }[agg]

    def per_bucket(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = group.num_rows
        out_schema = [by] + order_cols + [val_col]
        if n == 0:
            t = {c: group.column(c).slice(0, 0) for c in out_schema}
            t[out_col] = pa.array([], out_type)
            return pa.table(t)
        keys = group.column(by).to_numpy(zero_copy_only=False)
        _, codes = np.unique(keys, return_inverse=True)
        sort_cols = [_sortable(group.column(c))
                     for c in reversed(order_cols)]
        order = np.lexsort(sort_cols + [codes])
        seg = codes[order]
        inv = np.empty(n, dtype=np.int64)
        inv[order] = np.arange(n)
        vcol = group.column(val_col)
        if isinstance(vcol, pa.ChunkedArray):
            vcol = vcol.combine_chunks()

        if agg in ("max", "min"):
            vals = vcol.to_numpy(zero_copy_only=False).astype(
                np.float64, copy=False
            )[order]
            # NaN marks SQL NULL; fmax/fmin ignore NaN unless both are
            acc = vals.copy()
            op = np.fmax if agg == "max" else np.fmin
            for s in range(1, window):
                same = seg[s:] == seg[:-s]
                acc[s:] = np.where(
                    same, op(acc[s:], vals[:-s]), acc[s:]
                )
            res = acc[inv]
            mask = np.isnan(res) if vcol.null_count else None
        else:
            if agg in ("sum", "mean") and not pa.types.is_integer(
                vcol.type
            ):
                raise ValueError(
                    f"rolling {agg} is exact-int only (float frames "
                    "re-associate); cast explicitly if approximate is "
                    "acceptable"
                )
            notnull = (
                ~np.asarray(pc.is_null(vcol))
                if vcol.null_count
                else np.ones(n, dtype=bool)
            )[order]
            idx = np.arange(n, dtype=np.int64)
            new_seg = np.empty(n, dtype=bool)
            new_seg[0] = True
            new_seg[1:] = seg[1:] != seg[:-1]
            first = np.maximum.accumulate(np.where(new_seg, idx, 0))
            start = (first if window is None
                     else np.maximum(first, idx - window + 1))
            C = np.concatenate(
                ([0], np.cumsum(notnull.astype(np.int64)))
            )
            fcnt = C[idx + 1] - C[start]
            if agg == "count":
                res = fcnt[inv]
                mask = None
            else:
                vi = pc.fill_null(vcol, 0).to_numpy(
                    zero_copy_only=False
                ).astype(np.int64, copy=False)[order]
                S = np.concatenate(([0], np.cumsum(vi)))
                fsum = S[idx + 1] - S[start]
                empty = fcnt == 0
                if agg == "sum":
                    res = fsum[inv]
                else:
                    res = (
                        fsum / np.maximum(fcnt, 1).astype(np.float64)
                    )[inv]
                mask = empty[inv] if empty.any() else None

        t = {c: group.column(c) for c in out_schema}
        t[out_col] = pa.array(res, out_type, mask=mask)
        return pa.table(t)

    return (
        ds.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__pk")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def shift_by_key(
    ds: ray.data.Dataset,
    by: str,
    order_cols: list[str],
    val_col: str,
    periods: int = 1,
    out_col: str | None = None,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """SQL LAG (``periods`` > 0) / LEAD (``periods`` < 0) of
    ``val_col`` within each ``by`` partition in ``order_cols`` order;
    out-of-partition frames yield NULL. Type-preserving (the shifted
    column keeps ``val_col``'s Arrow type — values move by ``take``,
    never through numpy casts). Same coarse-bucket plan as
    :func:`rolling_agg`."""
    if periods == 0:
        raise ValueError("periods must be nonzero (0 is the identity)")
    if out_col is None:
        out_col = (f"lag{periods}_{val_col}" if periods > 0
                   else f"lead{-periods}_{val_col}")
    if num_buckets is None:
        from .bucketing import derive_num_buckets

        num_buckets = derive_num_buckets(ds)

    def project(batch: pa.Table) -> pa.Table:
        keys = batch.column(by)
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        if keys.null_count:
            raise ValueError(f"shift_by_key: null partition keys in {by!r}")
        cols = {by: keys}
        for c in order_cols:
            cols[c] = batch.column(c)
        cols[val_col] = batch.column(val_col)
        cols["__pk"] = pa.array(_bucket_hash(keys, num_buckets))
        return pa.table(cols)

    def per_bucket(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = group.num_rows
        out_schema = [by] + order_cols + [val_col]
        vcol = group.column(val_col)
        if isinstance(vcol, pa.ChunkedArray):
            vcol = vcol.combine_chunks()
        if n == 0:
            t = {c: group.column(c).slice(0, 0) for c in out_schema}
            t[out_col] = pa.array([], vcol.type)
            return pa.table(t)
        keys = group.column(by).to_numpy(zero_copy_only=False)
        _, codes = np.unique(keys, return_inverse=True)
        sort_cols = [_sortable(group.column(c))
                     for c in reversed(order_cols)]
        order = np.lexsort(sort_cols + [codes])
        seg = codes[order]
        idx = np.arange(n, dtype=np.int64)
        src = idx - periods
        ok = (src >= 0) & (src < n)
        src_clamped = np.clip(src, 0, n - 1)
        ok &= seg[src_clamped] == seg
        # null indices -> null outputs through take
        take_idx = pa.array(order[src_clamped], mask=~ok)
        shifted_sorted = pc.take(vcol, take_idx)
        inv = np.empty(n, dtype=np.int64)
        inv[order] = idx
        t = {c: group.column(c) for c in out_schema}
        t[out_col] = pc.take(shifted_sorted, pa.array(inv))
        return pa.table(t)

    return (
        ds.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__pk")
        .map_groups(per_bucket, batch_format="pyarrow")
    )
