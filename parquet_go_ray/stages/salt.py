"""Skew-aware bucket assignment (the engine's one shuffle key).

The north rule requires a groupby-on-conv_id repartition with *explicit
skew salting*: conversation sizes are heavy-tailed, so a plain
hash(conv_id) partitioning would send a hot conversation's millions of
turns to one partition. We salt *within* conversations by turn block:

    salt   = turn_idx // turns_per_salt
    bucket = (stable_hash(conv_id) ^ mix(salt)) % num_buckets

- same conversation, nearby turns → same bucket (turn ordering within a
  partition stays intact after the per-group sort);
- a conversation longer than ``turns_per_salt`` splits across buckets at
  deterministic turn boundaries (recorded in the manifest via per-blob
  (conv_id, turn range) stats), so no partition can exceed
  ``turns_per_salt`` rows *per conversation*;
- the hash is pandas' SipHash (stable across processes/machines), NOT
  Python's seeded ``hash`` — Ray task retries must land rows in the same
  bucket (SURVEY.md §4.2 determinism requirement).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

BUCKET_COL = "_bucket"
SRC_COL = "_src"  # compact input-fragment index carried through the shuffle
PATH_COL = "path"  # added by read_parquet(include_paths=True)
DEFAULT_TURNS_PER_SALT = 65536
_MIX = np.uint64(0x9E3779B97F4A7C15)


def stable_hash_strings(values) -> np.ndarray:
    """Deterministic uint64 hash of a string column (pandas SipHash)."""
    arr = np.asarray(values, dtype=object)
    return pd.util.hash_array(arr, categorize=True)


def assign_buckets(
    batch: pa.Table,
    num_buckets: int,
    key: str = "conv_id",
    turn_col: str = "turn_idx",
    turns_per_salt: int = DEFAULT_TURNS_PER_SALT,
    path_index: dict[str, int] | None = None,
) -> pa.Table:
    """map_batches stage: append the shuffle bucket column.

    When ``path_index`` is given (input file → index) and the batch has
    the read_parquet(include_paths=True) ``path`` column, the path is
    replaced by a compact int32 source index so per-partition lineage
    (which input fragments fed each blob) survives the shuffle at ~4
    bytes/row instead of a repeated path string.
    """
    conv = batch.column(key).to_numpy(zero_copy_only=False)
    h = stable_hash_strings(conv)
    if turn_col in batch.column_names and turns_per_salt > 0:
        turns = batch.column(turn_col).to_numpy(zero_copy_only=False).astype(np.int64)
        salt = (turns // turns_per_salt).astype(np.uint64)
        h = h ^ (salt * _MIX)
    bucket = (h % np.uint64(num_buckets)).astype(np.int64)
    if path_index is not None and PATH_COL in batch.column_names:
        paths = batch.column(PATH_COL).to_numpy(zero_copy_only=False)
        uniq, inverse = np.unique(paths, return_inverse=True)
        codes = np.array([path_index.get(p, -1) for p in uniq], dtype=np.int32)
        src = codes[inverse]
        batch = batch.drop_columns([PATH_COL]).append_column(
            SRC_COL, pa.array(src, pa.int32())
        )
    return batch.append_column(BUCKET_COL, pa.array(bucket))
