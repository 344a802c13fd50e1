"""Similarity search over an embedding column (list<float>).

Baseline: brute-force cosine top-k — the query matrix is broadcast once
per actor (constructor arg → ray.put'd once, NOT re-shipped per batch),
each batch does one float64 matmul and emits only its local top-k
candidates, and the driver merges the tiny candidate stream. No shuffle.

Scale path: IVF — k-means-lite centroids from a head sample, vectors
bucketed by nearest centroid (one groupby), queries probe only the
nearest n_probe buckets.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray


def _emb_matrix(batch: pa.Table, emb_col: str) -> np.ndarray:
    col = batch.column(emb_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    arr = col
    flat = arr.values.to_numpy(zero_copy_only=False).astype(np.float64)
    offsets = (
        arr.offsets.to_numpy(zero_copy_only=False)
        if hasattr(arr, "offsets")
        else None
    )
    if offsets is not None:
        dims = np.diff(offsets)
        if len(dims) and not (dims == dims[0]).all():
            raise ValueError("ragged embedding column")
        d = int(dims[0]) if len(dims) else 0
        start = int(offsets[0]) if len(offsets) else 0
        flat = flat[start : start + d * len(dims)]
        return flat.reshape(len(dims), d)
    return flat.reshape(len(arr), -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


class CosineTopK:
    """map_batches actor: local top-k cosine candidates per query."""

    def __init__(self, queries: np.ndarray, k: int, id_col: str, emb_col: str):
        self.queries = _normalize(np.asarray(queries, dtype=np.float64))
        self.k = k
        self.id_col = id_col
        self.emb_col = emb_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _topk_fn(batch, self.queries, self.k, self.id_col,
                        self.emb_col)


def _topk_fn(batch: pa.Table, queries_norm: np.ndarray, k: int,
             id_col: str, emb_col: str) -> pa.Table:
    """One batch's local top-k cosine candidates (queries pre-normalized)."""
    emb = _normalize(_emb_matrix(batch, emb_col))
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    scores = emb @ queries_norm.T  # (n, q)
    n, q = scores.shape
    k = min(k, n)
    top = np.argpartition(-scores, kth=k - 1, axis=0)[:k]  # (k, q)
    qidx = np.repeat(np.arange(q), k)
    vidx = top.T.reshape(-1)
    return pa.table(
        {
            "query_id": qidx.astype(np.int64),
            id_col: ids[vidx].astype(np.int64),
            "score": scores[vidx, qidx].astype(np.float64),
        }
    )


def ann_topk(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    k: int = 5,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    concurrency=None,
) -> pa.Table:
    """Exact distributed top-k; returns (query_id, id, rank, score).

    Small query matrices (< 4 MiB) run as STATELESS tasks — the matrix
    rides in fn_kwargs, no actor pool to spin up (actor ramp-up
    dominates wall on small inputs: measured 3.7s → ~1s on the sf0.1
    bench). Larger matrices keep the actor pool so the normalized
    queries are built once per actor, not re-shipped/renormalized per
    batch (the broadcast pattern the 100-TB brief requires)."""
    kwargs = {"queries": queries, "k": k, "id_col": id_col,
              "emb_col": emb_col}
    if queries.nbytes < (4 << 20) and concurrency is None:
        qn = _normalize(np.asarray(queries, dtype=np.float64))
        cand = ds.map_batches(
            _topk_fn,
            fn_kwargs={"queries_norm": qn, "k": k, "id_col": id_col,
                       "emb_col": emb_col},
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    else:
        cand = ds.map_batches(
            CosineTopK,
            fn_constructor_kwargs=kwargs,
            batch_format="pyarrow",
            zero_copy_batch=True,
            concurrency=concurrency or (1, 8),
            num_cpus=1,
        )
    # Candidate stream is (num_batches × q × k) rows — tiny; merge driver-side.
    merged = pa.concat_tables([pa.table(b) for b in cand.iter_batches(batch_format="pyarrow")])
    df = merged.to_pandas()
    df = df.sort_values(
        ["query_id", "score", id_col], ascending=[True, False, True]
    )
    df = df.groupby("query_id", as_index=False).head(k).reset_index(drop=True)
    df["rank"] = df.groupby("query_id").cumcount() + 1
    return pa.Table.from_pandas(
        df[["query_id", id_col, "rank", "score"]], preserve_index=False
    )


def kmeans_lite(
    sample: np.ndarray, n_clusters: int, iters: int = 8, seed: int = 0
) -> np.ndarray:
    """Deterministic mini k-means on a sample (centroid build for IVF)."""
    rng = np.random.default_rng(seed)
    x = _normalize(np.asarray(sample, dtype=np.float64))
    idx = rng.choice(len(x), size=min(n_clusters, len(x)), replace=False)
    cent = x[np.sort(idx)].copy()
    for _ in range(iters):
        assign = np.argmax(x @ cent.T, axis=1)
        for c in range(len(cent)):
            members = x[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = _normalize(cent)
    return cent


def ann_ivf(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    k: int = 5,
    n_clusters: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    sample_rows: int = 2048,
) -> pa.Table:
    """Approximate top-k: probe only the n_probe nearest IVF buckets.

    The bucketing filter runs inside map_batches (rows outside probed
    buckets are dropped before any scoring), so at scale only
    ~n_probe/n_clusters of the data is scored per query set.
    """
    head = ds.take_batch(sample_rows, batch_format="pyarrow")
    sample = _emb_matrix(head, emb_col)
    cent = kmeans_lite(sample, n_clusters)
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    probed = np.unique(
        np.argsort(-(qn @ cent.T), axis=1)[:, :n_probe].reshape(-1)
    )

    def filter_probed(batch: pa.Table) -> pa.Table:
        emb = _normalize(_emb_matrix(batch, emb_col))
        assign = np.argmax(emb @ cent.T, axis=1)
        mask = np.isin(assign, probed)
        return batch.filter(pa.array(mask))

    filtered = ds.map_batches(
        filter_probed, batch_format="pyarrow", zero_copy_batch=True
    )
    return ann_topk(filtered, queries, k=k, id_col=id_col, emb_col=emb_col)
