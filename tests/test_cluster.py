"""Distributed k-means (ops/cluster.py): sample-seeded Lloyd
refinement where each iteration is one streaming partials pass and an
O(k x d) driver fold."""

import numpy as np
import pyarrow as pa
import pytest

import ray

from parquet_go_ray.ops.cluster import kmeans_fit, kmeans_predict


def _clustered(n_clusters=8, n_per=150, dim=12, seed=3, spread=0.05):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    emb = (
        np.repeat(centers, n_per, axis=0)
        + rng.normal(size=(n_clusters * n_per, dim)) * spread
    ).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(range(len(emb)), pa.int64()),
            "embedding": pa.array(list(emb), pa.list_(pa.float32())),
        }
    )
    return t, centers, emb


def test_recovers_planted_centers(ray_session):
    t, centers, emb = _clustered()
    ds = ray.data.from_arrow(t).repartition(6)
    cent, info = kmeans_fit(ds, 8, iters=6, sample_rows=400, seed=1)
    assert cent.shape == (8, 12)
    # every planted center has a fitted centroid within a tight cosine
    # distance (cluster separation >> spread)
    sims = centers @ cent.T
    assert (sims.max(axis=1) > 0.99).all(), sims.max(axis=1)
    # counts account for every row
    assert info["counts"].sum() == len(emb)
    # monotone-ish convergence: the last recorded shift is small
    assert info["shifts"][-1] < 0.05


def test_predict_assigns_to_nearest(ray_session):
    t, centers, emb = _clustered(n_clusters=4, n_per=50)
    ds = ray.data.from_arrow(t)
    out = kmeans_predict(ds, centers).take_all()
    got = np.array([r["cluster"] for r in out])
    # rows were generated in center order: n_per blocks per cluster
    expect = np.repeat(np.arange(4), 50)
    assert (got == expect).mean() > 0.99


def test_deterministic_and_driver_light(ray_session, monkeypatch):
    """Same seed → identical centroids; and the driver never ray.puts a
    corpus-sized array (partials stream through iter_batches)."""
    t, _, _ = _clustered(n_clusters=4, n_per=80)
    ds = ray.data.from_arrow(t).repartition(4)

    puts = []
    orig_put = ray.put

    def spy_put(x, **kw):
        if isinstance(x, np.ndarray) and x.size > 64 * 64:
            puts.append(x.shape)
        return orig_put(x, **kw)

    monkeypatch.setattr(ray, "put", spy_put)
    c1, _ = kmeans_fit(ds, 4, iters=3, sample_rows=200, seed=5)
    c2, _ = kmeans_fit(ds, 4, iters=3, sample_rows=200, seed=5)
    assert np.array_equal(c1, c2)
    assert puts == [], puts


def test_ivf_refine_iters_improves_or_holds_recall(ray_session, tmp_path):
    """ivf_build(refine_iters=2) stays a valid index (row accounting,
    pruned probes) and self-match survives."""
    from parquet_go_ray.ops.ann import ivf_build

    t, _, emb = _clustered(n_clusters=8, n_per=100)
    ds = ray.data.from_arrow(t).repartition(4)
    idx = ivf_build(
        ds, str(tmp_path / "ivf"), n_clusters=8, sample_rows=300,
        refine_iters=2,
    )
    assert idx.meta["rows_total"] == len(emb)
    out = idx.query(emb[:4].astype(np.float64), k=3, n_probe=2)
    df = out.to_pandas()
    assert df[df["rank"] == 1].sort_values("query_id")[
        "vec_id"
    ].tolist() == [0, 1, 2, 3]
    st = idx.last_probe_stats
    assert st["bytes_read"] < st["bytes_total"]
