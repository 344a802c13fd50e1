"""Top-k without a global sort.

A global ``Dataset.sort(...).limit(k)`` is an all-to-all shuffle of every
row to answer a k-row question. Instead: each batch reduces itself to its
local top-k (``np.argpartition`` — O(n) selection, no full sort), the
k-row partials stream to the driver (bounded: k × num_batches rows), and
one tiny final sort picks the global winners. Same pattern as the ANN
candidate merge (ops/ann.py).

Multi-key orderings use ``np.lexsort`` on the (tiny) partial only; the
per-batch selection keys on the primary column, widened to k+ties so a
secondary tie-break key can never change the global answer: any row tied
with the local k-th primary value is kept.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray


def _sort_key(arr: np.ndarray, descending: bool) -> np.ndarray:
    """An array whose ASCENDING order equals the requested order of arr.
    Overflow-safe: ints/datetimes invert via bitwise-not, floats negate,
    object/string keys invert via dense rank codes."""
    if arr.dtype.kind in "Mm":
        arr = arr.view("i8")
    if not descending:
        return arr
    if arr.dtype.kind in "iu":
        return ~arr
    if arr.dtype.kind == "f":
        return -arr
    _, inv = np.unique(arr, return_inverse=True)
    return -inv


def _local_topk(batch: pa.Table, keys, descending, k: int) -> pa.Table:
    n = batch.num_rows
    if n <= k or n == 0:
        return batch
    primary = batch.column(keys[0]).to_numpy(zero_copy_only=False)
    order_key = _sort_key(primary, descending[0])
    part = np.argpartition(order_key, k - 1)
    kth = order_key[part[k - 1]]
    keep = order_key <= kth  # keep ties with the k-th value
    return batch.filter(pa.array(keep))


def topk(
    ds: ray.data.Dataset,
    keys: list[str],
    k: int,
    descending: list[bool] | bool = False,
) -> pa.Table:
    """Global top-k rows ordered by ``keys`` — no ``Dataset.sort`` stage.

    Returns a k-row pyarrow Table (driver-side: the result is tiny by
    definition). Ordering is lexicographic over ``keys`` with per-key
    ``descending`` flags.
    """
    if isinstance(descending, bool):
        descending = [descending] * len(keys)
    partials = ds.map_batches(
        _local_topk,
        fn_kwargs={"keys": keys, "descending": descending, "k": k},
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    tables = ray.get(partials.to_arrow_refs())
    if not tables:
        return pa.table({})
    merged = pa.concat_tables(tables, promote_options="default").combine_chunks()
    if merged.num_rows == 0:
        return merged
    # Final ordering on the small merged table: lexsort wants the least-
    # significant key first.
    cols = [
        _sort_key(
            merged.column(name).to_numpy(zero_copy_only=False), desc
        )
        for name, desc in zip(reversed(keys), reversed(descending))
    ]
    order = np.lexsort(cols)[:k]
    return merged.take(pa.array(order, pa.int64()))
