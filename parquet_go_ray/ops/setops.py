"""SQL set operations over whole rows: INTERSECT / EXCEPT (DISTINCT
and ALL) and UNION [DISTINCT] between two Datasets with identical
schemas.

Scale shape — the repo's standard combiner + one-exchange design:
each side pre-DEDUPS its own batches with Arrow's hash group-by,
shipping one (row, per-side partial multiplicity) cell per distinct
row per batch instead of raw rows (the all-to-all is bounded by
distinct rows, never input size — on the dominant set-op use, a
low-multiplicity EXCEPT against a small exclusion list, the shuffle
volume collapses to near the distinct count). Rows co-locate on a
null-safe whole-row coarse bucket (``ops.bucketing.multi_bucket_hash``)
and ONE ``groupby(__pk)`` resolves every row vectorized: a final
group-by summing the two side counts, then a ``np.repeat`` over the
multiplicity rule of the requested op. NULLs compare equal, exactly
like SQL set operations (Arrow's group-by groups them; the row hash
stamps them consistently).

The reference engine exposes row-set semantics only through its
dictionary/dedup machinery (SURVEY §2.6 distinct); INTERSECT/EXCEPT
are the engine-beyond-reference completion of that family, sharing
``dedup_exact``'s hash-route + group-resolve design (ops/dedup.py:69).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from .bucketing import derive_num_buckets, multi_bucket_hash

_OPS = ("intersect", "except", "union")


def set_op(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    op: str,
    *,
    all: bool = False,
    cols: list[str] | None = None,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """``left INTERSECT [ALL] right`` / ``left EXCEPT [ALL] right`` /
    ``left UNION right`` with SQL bag/set semantics:

    - ``intersect`` (distinct): rows present on BOTH sides, once each.
    - ``intersect all``: each row ``min(n_left, n_right)`` times.
    - ``except`` (distinct): rows on the left and NOT on the right.
    - ``except all``: each row ``max(n_left - n_right, 0)`` times.
    - ``union`` (distinct): every row from either side, once each.
      (``UNION ALL`` is just ``left.union(right)`` — no operator
      needed, and asking for it here raises.)

    ``cols`` defaults to the left schema's columns; both sides must
    agree on names AND types (mixed-width keys belong upstream in a
    cast, same rule as ``shuffle_join``). Nested (list/struct) columns
    are rejected — project them away or fingerprint them first.
    """
    if op not in _OPS:
        raise ValueError(f"op must be one of {_OPS}, got {op!r}")
    if op == "union" and all:
        raise ValueError("UNION ALL is left.union(right); set_op only "
                         "implements the deduplicating forms")
    if cols is None:
        cols = list(left.schema().names)
    if not cols:
        raise ValueError("cols must be non-empty")
    # the row hash is width-sensitive (an int32 3 and an int64 3 hash
    # differently), so a silent type mismatch would mis-route equal
    # rows into different buckets — make it a loud error instead
    lsch, rsch = left.schema(), right.schema()
    for c in cols:
        if c not in lsch.names or c not in rsch.names:
            side = "left" if c not in lsch.names else "right"
            raise ValueError(f"set_op: column {c!r} missing on {side}")
        lt = lsch.types[lsch.names.index(c)]
        rt = rsch.types[rsch.names.index(c)]
        if lt != rt:
            raise TypeError(
                f"set_op: column {c!r} types differ (left {lt}, right "
                f"{rt}); cast both sides to one type upstream"
            )
    if num_buckets is None:
        num_buckets = max(derive_num_buckets(left),
                          derive_num_buckets(right))

    def tag(side: int):
        def f(batch: pa.Table) -> pa.Table:
            t = batch.select(cols)
            for c in cols:
                if pa.types.is_nested(t.column(c).type):
                    raise TypeError(
                        f"set_op: nested column {c!r} is not comparable; "
                        "project it away or fingerprint it first"
                    )
            part = t.group_by(cols).aggregate([([], "count_all")])
            n = part.column("count_all").cast(pa.int64())
            z = pa.array(np.zeros(part.num_rows, np.int64))
            out = {c: part.column(c) for c in cols}
            out["__n1"] = n if side == 1 else z
            out["__n2"] = z if side == 1 else n
            out["__pk"] = pa.array(
                multi_bucket_hash(part, cols, num_buckets)
            )
            return pa.table(out)

        return f

    tagged = left.map_batches(
        tag(1), batch_format="pyarrow", zero_copy_batch=True
    ).union(right.map_batches(
        tag(2), batch_format="pyarrow", zero_copy_batch=True
    ))

    def per_bucket(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return group.select(cols)
        tot = group.group_by(cols).aggregate(
            [("__n1", "sum"), ("__n2", "sum")]
        )
        n1 = tot.column("__n1_sum").to_numpy(zero_copy_only=False)
        n2 = tot.column("__n2_sum").to_numpy(zero_copy_only=False)
        if op == "intersect":
            reps = (np.minimum(n1, n2) if all
                    else ((n1 > 0) & (n2 > 0)).astype(np.int64))
        elif op == "except":
            reps = (np.maximum(n1 - n2, 0) if all
                    else ((n1 > 0) & (n2 == 0)).astype(np.int64))
        else:  # union distinct: every surviving distinct row, once
            reps = np.ones(len(n1), dtype=np.int64)
        idx = np.repeat(np.arange(len(reps), dtype=np.int64), reps)
        return tot.select(cols).take(pa.array(idx, pa.int64()))

    return tagged.groupby("__pk").map_groups(
        per_bucket, batch_format="pyarrow"
    )
