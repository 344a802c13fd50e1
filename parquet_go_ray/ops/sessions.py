"""Sessionization: the engine's windowed-aggregate composition.

A session = a run of events per user with gaps ≤ ``gap``. Expressed as
``groupby(user).map_groups`` (sort-within-group + vectorized gap diff) —
the (b)-pattern for operators Ray Data lacks natively (SURVEY.md §2.6):
one shuffle on the user key, O(group) memory, no driver loops.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

DEFAULT_GAP_US = 30 * 60 * 1_000_000  # 30 minutes


def sessionize(
    ds: ray.data.Dataset,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_us: int = DEFAULT_GAP_US,
) -> ray.data.Dataset:
    """Per user: event count and session count at the given gap."""

    def per_user(group: pa.Table) -> pa.Table:
        ts = group.column(ts_col)
        if pa.types.is_timestamp(ts.type):
            ts = ts.cast(pa.int64())
        t = np.sort(ts.to_numpy(zero_copy_only=False))
        n = len(t)
        sessions = 1 + int((np.diff(t) > gap_us).sum()) if n else 0
        return pa.table(
            {
                user_col: pa.array([group.column(user_col)[0].as_py()], pa.int64()),
                "n_events": pa.array([n], pa.int64()),
                "n_sessions": pa.array([sessions], pa.int64()),
            }
        )

    return ds.groupby(user_col).map_groups(per_user, batch_format="pyarrow")
