"""Deterministic stratified (per-group) sampling.

The balanced-corpus primitive of a 100-TB training-data pipeline: keep
group g at rate(g) — downsample the dominant web domains / languages,
keep the rare ones — with a pure per-row hash filter, so the sample is
REPRODUCIBLE on any cluster size, partitioning, or execution order
(same contract as the global sampler in ``functions/selector.py``).

Two hash modes:

- ``xxh64`` (default): the engine path — the vectorized XXH64 kernel
  from ``functions/bloom`` over the id column's bytes; zero per-row
  Python.
- ``md5``: SQL-parity mode, matching DuckDB
  ``CAST(('0x' || substring(md5(CAST(id AS VARCHAR)), 1, 8)) AS
  UBIGINT) % 100`` exactly so the driver's oracle gate can replay the
  predicate (md5 has no vectorized numpy form — this mode is
  oracle-forced per-row, same boundary as ``fingerprint_documents``;
  use xxh64 at scale).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray


def _rates_for(keys: pa.Array, rates: dict, default_rate: float) -> np.ndarray:
    """Per-row keep-rate in [0, 100): dictionary-encode the group key
    once per batch, map the (few) distinct codes through the dict.
    Null keys take the default rate (a null dictionary index is
    undefined memory if read raw — fill it first)."""
    enc = pc.dictionary_encode(keys)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    dic = enc.dictionary
    lut = np.array(
        [float(rates.get(v.as_py(), default_rate)) for v in dic],
        dtype=np.float64,
    )
    idx = enc.indices
    if idx.null_count:
        codes = np.asarray(idx.fill_null(-1))
        return np.where(codes < 0, float(default_rate), lut[codes])
    return lut[np.asarray(idx)]


def _hash_mod100(ids: pa.Array, hash_mode: str) -> np.ndarray:
    if hash_mode == "xxh64":
        from ..functions.bloom import xxh64_bytes, xxh64_fixed

        if pa.types.is_integer(ids.type) or pa.types.is_floating(ids.type):
            h = xxh64_fixed(ids.to_numpy(zero_copy_only=False))
        else:
            from ..functions.bytearray import arrow_strings_to_parts

            lens, data = arrow_strings_to_parts(ids)
            h = xxh64_bytes(lens, np.frombuffer(data, np.uint8))
        return (h % np.uint64(100)).astype(np.float64)
    if hash_mode == "md5":
        return np.array([
            int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16) % 100
            for v in ids.to_pylist()
        ], dtype=np.float64)
    raise ValueError(f"hash_mode must be 'xxh64' or 'md5', not {hash_mode!r}")


def stratified_sample(
    ds: ray.data.Dataset,
    key_col: str,
    id_col: str,
    rates: dict,
    default_rate: float = 100.0,
    hash_mode: str = "xxh64",
) -> ray.data.Dataset:
    """Keep each row iff ``hash(id) % 100 < rate(key)`` — rates in
    percent per distinct ``key_col`` value, ``default_rate`` for keys
    not in ``rates``. A pure filter: no shuffle, no state, identical
    output for any partitioning."""

    def keep(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        keys = batch.column(key_col)
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        ids = batch.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        r = _rates_for(keys, rates, default_rate)
        h = _hash_mod100(ids, hash_mode)
        return batch.filter(pa.array(h < r))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)
