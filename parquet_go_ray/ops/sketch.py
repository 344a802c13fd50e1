"""HyperLogLog: mergeable approximate-distinct sketch.

The cardinality question a 100-TB pipeline asks constantly (how many
distinct users / URLs / shingles?) where the exact answer needs a
full shuffle (``groupby`` over every key) but a 16 KiB sketch answers
within ~1%. Classic HLL (Flajolet et al. 2007, public): ``m = 2^p``
registers; each value's XXH64 routes to register ``h >> (64-p)`` and
contributes ``rank = clz(remaining bits) + 1``; registers keep the max.
Sketches merge by element-wise max — embarrassingly tree-reducible, so
the Ray plan is: one register array per BATCH (vectorized
``np.maximum.at``), stream the m-byte rows to the driver, one final
max-reduce. Nothing data-sized moves.

Estimator: alpha_m * m^2 / sum(2^-reg) with the standard small-range
linear-counting correction; 64-bit hashes need no large-range
correction. Expected relative error ~1.04/sqrt(m) (0.8% at p=14).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def _hash_column(col: pa.Array) -> np.ndarray:
    from ..functions.bloom import xxh64_bytes, xxh64_fixed

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count:
        col = col.drop_null()
    if pa.types.is_string(col.type) or pa.types.is_large_string(col.type) \
            or pa.types.is_binary(col.type) \
            or pa.types.is_large_binary(col.type):
        from ..functions.bytearray import arrow_strings_to_parts

        lens, data = arrow_strings_to_parts(col)
        return xxh64_bytes(lens, np.frombuffer(data, np.uint8))
    return xxh64_fixed(col.to_numpy(zero_copy_only=False))


def hll_registers(hashes: np.ndarray, p: int) -> np.ndarray:
    """Register array (uint8, len 2^p) for a batch of 64-bit hashes."""
    m = 1 << p
    reg = np.zeros(m, dtype=np.uint8)
    if len(hashes) == 0:
        return reg
    h = hashes.astype(np.uint64, copy=False)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)  # sentinel low bits
    # rank = clz64(rest) + 1 = 65 - bit_length(rest). bit_length comes
    # from the float64 exponent (exact integer log2 would overflow
    # float precision past 2^53, so correct the one case where the
    # conversion ROUNDS UP across a power of two).
    f = rest.astype(np.float64)
    bits = (((f.view(np.uint64) >> np.uint64(52)) & np.uint64(0x7FF))
            .astype(np.int64) - 1023)  # floor(log2) modulo rounding
    bits = np.minimum(bits, 63)
    bits -= ((np.uint64(1) << bits.astype(np.uint64)) > rest)
    rank = (64 - bits).astype(np.uint8)  # sentinel caps it at 64 - p + 1
    np.maximum.at(reg, idx, rank)
    return reg


def hll_estimate(reg: np.ndarray) -> float:
    m = len(reg)
    est = _alpha(m) * m * m / np.sum(np.ldexp(1.0, -reg.astype(np.int64)))
    zeros = int((reg == 0).sum())
    if est <= 2.5 * m and zeros:
        return m * float(np.log(m / zeros))  # linear counting
    return float(est)


def approx_distinct(
    ds: ray.data.Dataset, col: str, p: int = 14
) -> float:
    """Approximate ``count(DISTINCT col)`` via one streaming pass."""
    if not 4 <= p <= 18:
        raise ValueError(f"p must be in [4, 18], got {p}")

    def sketch(batch: pa.Table) -> pa.Table:
        reg = hll_registers(_hash_column(batch.column(col)), p)
        return pa.table({"reg": pa.array([reg.tobytes()], pa.binary())})

    rows = ds.map_batches(
        sketch, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    merged = np.zeros(1 << p, dtype=np.uint8)
    for raw in rows["reg"]:
        np.maximum(merged, np.frombuffer(raw, np.uint8), out=merged)
    return hll_estimate(merged)
