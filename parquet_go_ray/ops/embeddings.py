"""Embedding-column quantization: 4x smaller vectors, ANN-compatible.

The storage half of a 100-TB similarity pipeline: a `list<float>`
embedding column dominates table bytes (a 768-d float32 vector is
3 KB/row — usually larger than the text). Symmetric per-vector int8
quantization (`q = round(v / scale)`, `scale = max|v| / 127` — the
standard faiss/SQ8 scheme, public) cuts that 4x while keeping cosine
top-k recall ≈ 1 (the rounding error is ~0.4% of the max coordinate;
pinned in tests), and int8 + the native writer's byte-stream-split /
zstd path compresses far better than float32 noise. Per-batch pure
Arrow/numpy transforms — zero shuffle; compose with
``sources.parquet_write`` for storage and ``ops.ann`` for search
(dequantize is exact up to the documented rounding).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from .ann import _emb_matrix

__all__ = ["quantize_embeddings", "dequantize_embeddings"]


def quantize_embeddings(
    ds: ray.data.Dataset,
    emb_col: str = "embedding",
    out_col: str | None = None,
    scale_col: str | None = None,
) -> ray.data.Dataset:
    """Replace ``emb_col`` (list<float>) with int8 codes plus a
    per-vector float32 scale. ``v ≈ code * scale``; an all-zero
    vector stores scale 0. Output columns default to ``emb_col +
    '_q8'`` and ``emb_col + '_scale'``; the float column is dropped."""
    out_col = out_col or emb_col + "_q8"
    scale_col = scale_col or emb_col + "_scale"

    def q(batch: pa.Table) -> pa.Table:
        m = _emb_matrix(batch, emb_col)
        n, d = m.shape if m.ndim == 2 else (len(batch), 0)
        peak = np.abs(m).max(axis=1) if d else np.zeros(n)
        scale = peak / 127.0
        inv = np.divide(
            1.0, scale, out=np.zeros_like(scale), where=scale > 0
        )
        codes = np.clip(
            np.rint(m * inv[:, None]), -127, 127
        ).astype(np.int8)
        out = batch.drop_columns([emb_col])
        out = out.append_column(
            out_col,
            pa.FixedSizeListArray.from_arrays(
                pa.array(codes.reshape(-1), pa.int8()), d
            ) if d else pa.nulls(n, pa.list_(pa.int8())),
        )
        return out.append_column(
            scale_col, pa.array(scale.astype(np.float32), pa.float32())
        )

    return ds.map_batches(q, batch_format="pyarrow",
                          zero_copy_batch=True)


def dequantize_embeddings(
    ds: ray.data.Dataset,
    q_col: str = "embedding_q8",
    scale_col: str = "embedding_scale",
    out_col: str = "embedding",
    dtype=np.float32,
) -> ray.data.Dataset:
    """Inverse of :func:`quantize_embeddings` up to the int8 rounding
    (max error = scale/2 per coordinate)."""

    def dq(batch: pa.Table) -> pa.Table:
        col = batch.column(q_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        codes = _emb_matrix(batch, q_col)
        scale = (
            batch.column(scale_col)
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
        )
        m = (codes * scale[:, None]).astype(dtype)
        d = m.shape[1] if m.ndim == 2 else 0
        out = batch.drop_columns([q_col, scale_col])
        return out.append_column(
            out_col,
            pa.FixedSizeListArray.from_arrays(
                pa.array(m.reshape(-1)), d
            ) if d else pa.nulls(len(batch), pa.list_(pa.float32())),
        )

    return ds.map_batches(dq, batch_format="pyarrow",
                          zero_copy_batch=True)
