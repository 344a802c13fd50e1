"""Sessionization: the engine's windowed-aggregate composition.

A session = a run of events per user with gaps ≤ ``gap``. One shuffle on
a COARSE partition key pk = hash(user) % K (which still co-locates every
user's rows), then each pk partition handles ALL of its users in one
vectorized pass: lexsort by (user, ts), segment boundaries, session
starts via a single gap/user-change mask, per-user counts via prefix-sum
differences. Round 1 ran ``groupby(user).map_groups`` — one Python call
per user, 10^8 interpreter calls at 10^8 users; this shape makes the
group count a constant independent of user cardinality.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

DEFAULT_GAP_US = 30 * 60 * 1_000_000  # 30 minutes
_N_PARTS = 64
_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def sessionize(
    ds: ray.data.Dataset,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_us: int = DEFAULT_GAP_US,
) -> ray.data.Dataset:
    """Per user: event count and session count at the given gap."""

    def add_pk(batch: pa.Table) -> pa.Table:
        users = batch.column(user_col).to_numpy(zero_copy_only=False)
        pk = (
            (users.astype(np.uint64) * _GOLDEN) % np.uint64(_N_PARTS)
        ).astype(np.int32)
        ts = batch.column(ts_col)
        if pa.types.is_timestamp(ts.type):
            ts = ts.cast(pa.int64())
        return pa.table({"pk": pk, user_col: batch.column(user_col), ts_col: ts})

    def per_part(group: pa.Table) -> pa.Table:
        n = group.num_rows
        if n == 0:
            return pa.table(
                {
                    user_col: pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                    "n_sessions": pa.array([], pa.int64()),
                }
            )
        users = group.column(user_col).to_numpy(zero_copy_only=False)
        ts = group.column(ts_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((ts, users))
        u, t = users[order], ts[order]
        new_user = np.empty(n, dtype=bool)
        new_user[0] = True
        new_user[1:] = u[1:] != u[:-1]
        starts = np.flatnonzero(new_user)
        ends = np.append(starts[1:], n)
        sess_start = np.empty(n, dtype=bool)
        sess_start[0] = True
        sess_start[1:] = new_user[1:] | ((t[1:] - t[:-1]) > gap_us)
        csum = np.concatenate(([0], np.cumsum(sess_start, dtype=np.int64)))
        return pa.table(
            {
                user_col: u[starts].astype(np.int64),
                "n_events": (ends - starts).astype(np.int64),
                "n_sessions": csum[ends] - csum[starts],
            }
        )

    return (
        ds.map_batches(add_pk, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("pk")
        .map_groups(per_part, batch_format="pyarrow")
    )
