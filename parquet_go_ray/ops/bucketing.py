"""Input-size-derived coarse-bucket counts (VERDICT r4 item 5).

The repo-wide high-cardinality groupby pattern — ``pk = hash(key) %
num_buckets`` then one ``map_groups`` task resolving ALL of a bucket's
groups vectorized — needs a bucket count that scales with the input: a
fixed 64 means a 1/64 slice of a 100-TB table (~1.6 TB) must fit one
worker. ``derive_num_buckets`` sizes the count from the dataset's
metadata-estimated bytes so each bucket task sees roughly
``target_bucket_bytes`` of input.

The estimate is METADATA-ONLY on purpose: ``Dataset.size_bytes()``
executes any non-trivial plan, which would run the upstream transforms
twice. ``infer_metadata()`` is O(1); when the plan can't be sized
(in-memory or transformed inputs), the historical default of 64 buckets
is kept — small test inputs behave exactly as before.
"""

from __future__ import annotations

import ray

# ~1 GiB of (estimated in-memory) input per bucket task: comfortably
# inside a worker heap with room for the lexsort copies the bucket
# kernels make, while keeping task counts low on small inputs.
TARGET_BUCKET_BYTES = 1 << 30

DEFAULT_NUM_BUCKETS = 64


def estimated_size_bytes(ds: ray.data.Dataset) -> int | None:
    """Metadata-inferred dataset size; None when unknown. Never executes."""
    try:
        return ds._logical_plan.dag.infer_metadata().size_bytes
    except Exception:
        return None


def derive_num_buckets(
    ds: ray.data.Dataset,
    target_bucket_bytes: int = TARGET_BUCKET_BYTES,
    lo: int = DEFAULT_NUM_BUCKETS,
    hi: int = 1 << 16,
) -> int:
    """``max(lo, est_bytes // target_bucket_bytes)`` capped at ``hi``."""
    est = estimated_size_bytes(ds)
    if not est or est <= 0:
        return lo
    return int(min(hi, max(lo, -(-est // target_bucket_bytes))))
