"""Broadcast (map-side) hash join: the no-shuffle join for small sides.

The small table is materialized once, ``ray.put`` into the object store,
and each actor builds its lookup index ONCE in the constructor — the
canonical broadcast pattern (task brief: "broadcast small sides with
ray.put + lookup inside map_batches instead of a shuffle join"). The big
side streams through map_batches untouched; join cost is one vectorized
take per batch. At 100 TB this is the right plan whenever the small side
fits a worker heap (dimension tables, vocabularies, codebooks).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray


class _BroadcastJoiner:
    def __init__(self, small_ref, on: str, small_on: str, select: list[str] | None):
        small: pa.Table = ray.get(small_ref) if not isinstance(
            small_ref, pa.Table
        ) else small_ref
        self.small = small.combine_chunks()
        keys = self.small.column(small_on).to_numpy(zero_copy_only=False)
        order = np.argsort(keys, kind="stable")
        sorted_keys = keys[order]
        # searchsorted emits at most one small-side row per probe key, so a
        # duplicated key would silently drop matches instead of multiplying
        # rows like SQL LEFT JOIN. Fail fast at index-build time.
        if len(sorted_keys) > 1 and (sorted_keys[1:] == sorted_keys[:-1]).any():
            raise ValueError(
                f"broadcast_join small side has duplicate keys in {small_on!r};"
                " a 1:N broadcast join is not supported (use a shuffle join)"
            )
        self.sorted_keys = sorted_keys
        self.order = order
        self.on = on
        self.small_on = small_on
        self.select = select

    def __call__(self, batch: pa.Table) -> pa.Table:
        probe = batch.column(self.on).to_numpy(zero_copy_only=False)
        if len(self.sorted_keys) == 0:  # empty small side -> all-null join
            out = batch
            cols = self.select or [
                c for c in self.small.column_names if c != self.small_on
            ]
            for c in cols:
                out = out.append_column(
                    c, pa.nulls(batch.num_rows, self.small.schema.field(c).type)
                )
            return out
        idx = np.searchsorted(self.sorted_keys, probe)
        idx_c = np.minimum(idx, len(self.sorted_keys) - 1)
        hit = self.sorted_keys[idx_c] == probe
        take = self.order[idx_c]
        out = batch
        cols = self.select or [
            c for c in self.small.column_names if c != self.small_on
        ]
        indices = pa.array(
            np.where(hit, take, -1), mask=~hit
        )  # null index -> null value (left join)
        for c in cols:
            out = out.append_column(c, self.small.column(c).take(indices))
        return out


def asof_join_broadcast(
    big: ray.data.Dataset,
    small: pa.Table,
    on: str,
    small_on: str | None = None,
    select: list[str] | None = None,
) -> ray.data.Dataset:
    """As-of join (nearest earlier ``small_on`` ≤ ``on``): the custom
    operator the brief names, expressed as a broadcast + per-batch
    ``np.searchsorted`` — no shuffle, no sort of the big side. The
    small side must fit a worker heap and is shipped once via
    ``fn_kwargs`` (an object-store ref under the hood); rows earlier
    than every small-side timestamp get nulls, exactly like SQL
    ``ASOF JOIN``. Partitioning assumption (documented per the brief):
    the small side is global — with a per-key ``by`` dimension at
    100 TB, hash-partition both sides by key first and apply this
    inside each partition."""
    small_on = small_on or on
    small = small.combine_chunks().sort_by(small_on)
    skeys = small.column(small_on).to_numpy(zero_copy_only=False)
    cols = select or [c for c in small.column_names if c != small_on]
    payload = {c: small.column(c) for c in cols}

    def probe(batch: pa.Table) -> pa.Table:
        keys = batch.column(on).to_numpy(zero_copy_only=False)
        pos = np.searchsorted(skeys, keys, side="right") - 1
        valid = pos >= 0
        pos = np.where(valid, pos, 0)
        out = batch
        vmask = pa.array(valid)
        idx = pa.array(pos, pa.int64())
        for c in cols:
            taken = payload[c].take(idx)
            import pyarrow.compute as pc

            col = pc.if_else(vmask, taken, pa.nulls(len(keys), taken.type))
            out = out.append_column(c, col)
        return out

    return big.map_batches(
        probe, batch_format="pyarrow", zero_copy_batch=True,
    )


def broadcast_join(
    big: ray.data.Dataset,
    small: pa.Table,
    on: str,
    small_on: str | None = None,
    select: list[str] | None = None,
    concurrency=(1, 8),
) -> ray.data.Dataset:
    """Left join ``big ⟕ small`` on an equality key, no shuffle."""
    small_on = small_on or on
    small_ref = ray.put(small)  # shipped once per node, not per batch
    return big.map_batches(
        _BroadcastJoiner,
        fn_constructor_kwargs={
            "small_ref": small_ref,
            "on": on,
            "small_on": small_on,
            "select": select,
        },
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
        num_cpus=1,
    )
