"""Distributed k-means over an embedding column (list<float>).

The 100-TB shape: centroids initialize from a uniform corpus-wide
sample (:func:`..ops.ann.ivf_sample` — streamed bottom-k by id-hash
priority, no head bias), then each Lloyd iteration is ONE streaming
``map_batches`` pass emitting k partial rows per batch (cluster id,
coordinate sums, count); the driver folds the tiny partial stream into
new centroids. Driver memory is O(k x d) per iteration — no shuffle,
no per-row driver traffic, and the corpus is never materialized.

This is also the refinement path for the IVF index
(:func:`..ops.ann.ivf_build` ``refine_iters``): kmeans-lite on the
sample gives the seed, the distributed iterations converge it against
the FULL corpus rather than the sample.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from .ann import _emb_matrix, _normalize


def _partials_fn(
    batch: pa.Table, cent: np.ndarray, emb_col: str
) -> pa.Table:
    """Per-batch Lloyd partials: for each cluster with members in this
    batch, one row (cluster, coordinate sums, member count)."""
    emb = _normalize(_emb_matrix(batch, emb_col))
    k, d = cent.shape
    assign = np.argmax(emb @ cent.T, axis=1)
    sums = np.zeros((k, d), dtype=np.float64)
    np.add.at(sums, assign, emb)
    counts = np.bincount(assign, minlength=k).astype(np.int64)
    live = np.flatnonzero(counts)
    return pa.table(
        {
            "cluster": pa.array(live.astype(np.int32)),
            "sums": pa.FixedSizeListArray.from_arrays(
                pa.array(sums[live].reshape(-1), pa.float64()), d
            ),
            "count": pa.array(counts[live]),
        }
    )


def kmeans_fit(
    ds: ray.data.Dataset,
    n_clusters: int,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    iters: int = 5,
    tol: float = 1e-4,
    sample_rows: int = 2048,
    seed: int = 0,
    init: np.ndarray | None = None,
) -> tuple[np.ndarray, dict]:
    """Fit spherical k-means (cosine geometry — rows and centroids unit
    norm, same metric as the ANN/IVF family). Returns
    ``(centroids, info)`` where ``info`` carries per-iteration centroid
    shift and the final member counts.

    Each iteration executes the dataset pipeline once; callers with a
    non-trivial upstream plan should ``ds.materialize()`` first so the
    iterations stream the same blocks instead of recomputing the plan
    (documented rather than forced: materializing is the caller's
    memory/spill tradeoff).
    """
    from .ann import ivf_sample, kmeans_lite

    if init is not None:
        cent = _normalize(np.asarray(init, dtype=np.float64))
    else:
        sample = ivf_sample(
            ds, emb_col=emb_col, id_col=id_col, sample_rows=sample_rows,
            seed=seed,
        )
        cent = kmeans_lite(sample, n_clusters, seed=seed)
    shifts: list[float] = []
    counts = np.zeros(len(cent), dtype=np.int64)
    for _ in range(iters):
        part = ds.map_batches(
            _partials_fn,
            fn_kwargs={"cent": cent, "emb_col": emb_col},
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        sums = np.zeros_like(cent)
        counts = np.zeros(len(cent), dtype=np.int64)
        for b in part.iter_batches(batch_format="pyarrow"):
            if b.num_rows == 0:
                continue
            cl = b.column("cluster").to_numpy(zero_copy_only=False)
            sm = _emb_matrix(b, "sums")
            ct = b.column("count").to_numpy(zero_copy_only=False)
            np.add.at(sums, cl, sm)
            np.add.at(counts, cl, ct)
        live = counts > 0
        new = cent.copy()
        new[live] = _normalize(sums[live] / counts[live, None])
        shift = float(np.abs(new - cent).max())
        shifts.append(shift)
        cent = new
        if shift < tol:
            break
    return cent, {"shifts": shifts, "counts": counts}


def kmeans_predict(
    ds: ray.data.Dataset,
    centroids: np.ndarray,
    emb_col: str = "embedding",
    out_col: str = "cluster",
) -> ray.data.Dataset:
    """Append the nearest-centroid id per row (one streaming pass; the
    centroid matrix rides in fn_kwargs — k x d, broadcast once)."""
    cent = _normalize(np.asarray(centroids, dtype=np.float64))

    def assign(batch: pa.Table) -> pa.Table:
        emb = _normalize(_emb_matrix(batch, emb_col))
        a = np.argmax(emb @ cent.T, axis=1).astype(np.int32)
        return batch.append_column(out_col, pa.array(a))

    return ds.map_batches(
        assign, batch_format="pyarrow", zero_copy_batch=True
    )
