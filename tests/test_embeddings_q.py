"""Embedding int8 quantization (ops/embeddings.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _emb_table(n=200, d=32, seed=41):
    rng = np.random.default_rng(seed)
    m = rng.normal(size=(n, d)).astype(np.float32)
    m[0] = 0.0  # all-zero vector edge case
    return pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(m.reshape(-1)), d
        ),
    }), m


class TestQuantizeEmbeddings:
    def test_roundtrip_error_bound(self, ray_session):
        import ray

        from parquet_go_ray.ops.ann import _emb_matrix
        from parquet_go_ray.ops.embeddings import (
            dequantize_embeddings, quantize_embeddings)

        t, m = _emb_table()
        q = quantize_embeddings(
            ray.data.from_arrow(t).repartition(4), "embedding"
        )
        back = dequantize_embeddings(q).to_pandas().sort_values("doc_id")
        got = np.stack(back["embedding"].to_numpy())
        # per-coordinate error <= scale/2 = max|v| / 254
        bound = np.abs(m).max(axis=1, keepdims=True) / 254.0 + 1e-7
        assert np.abs(got - m).max(axis=1, keepdims=True).max() <= \
            (bound.max() + 1e-6)
        assert np.all(np.abs(got - m) <= bound)
        assert np.array_equal(got[0], np.zeros_like(got[0]))  # zeros exact

    def test_schema_and_size(self, ray_session):
        import ray

        from parquet_go_ray.ops.embeddings import quantize_embeddings

        t, _ = _emb_table()
        out = quantize_embeddings(ray.data.from_arrow(t)).take_batch(
            5, batch_format="pyarrow"
        )
        assert "embedding" not in out.column_names
        f = out.schema.field("embedding_q8").type
        assert pa.types.is_fixed_size_list(f) and f.value_type == pa.int8()
        assert out.schema.field("embedding_scale").type == pa.float32()

    def test_ann_recall_on_quantized(self, ray_session):
        import ray

        from parquet_go_ray.ops.ann import _emb_matrix
        from parquet_go_ray.ops.embeddings import (
            dequantize_embeddings, quantize_embeddings)

        t, m = _emb_table(n=500, d=48, seed=43)
        # exact cosine top-10 on floats vs on dequantized codes
        norm = m / np.linalg.norm(m, axis=1, keepdims=True).clip(1e-9)
        queries = norm[:5]
        exact = np.argsort(-(queries @ norm.T), axis=1)[:, :10]
        dq = (
            dequantize_embeddings(
                quantize_embeddings(ray.data.from_arrow(t))
            ).to_pandas().sort_values("doc_id")
        )
        g = np.stack(dq["embedding"].to_numpy())
        gn = g / np.linalg.norm(g, axis=1, keepdims=True).clip(1e-9)
        approx = np.argsort(-(queries @ gn.T), axis=1)[:, :10]
        recall = np.mean([
            len(set(exact[i]) & set(approx[i])) / 10 for i in range(5)
        ])
        assert recall >= 0.9, recall
