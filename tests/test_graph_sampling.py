"""connected_components (ops/graph.py), weighted_sample and
split_dataset (ops/sampling.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _uf_components(edges, nodes):
    """Union-find reference: node -> component min."""
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in nodes}


class TestConnectedComponents:
    def _run(self, ray, edges):
        from parquet_go_ray.ops.graph import connected_components

        t = pa.table({
            "a": pa.array([e[0] for e in edges], pa.int64()),
            "b": pa.array([e[1] for e in edges], pa.int64()),
        })
        out = connected_components(
            ray.data.from_arrow(t).repartition(4)
        ).to_pandas()
        # EXACTLY one row per node (the sf0.01 drive caught duplicate
        # star edges across buckets inflating the row count)
        assert out["node"].is_unique
        return dict(zip(out["node"], out["component"]))

    def test_random_graph_matches_union_find(self, ray_session):
        import ray

        rng = np.random.default_rng(31)
        edges = [tuple(map(int, e))
                 for e in rng.integers(0, 400, (900, 2))]
        nodes = sorted({x for e in edges for x in e})
        got = self._run(ray, edges)
        exp = _uf_components(edges, nodes)
        assert got == exp
        # exactly one row per node (roots not duplicated)
        assert len(got) == len(nodes)

    def test_deep_chain_and_duplicates(self, ray_session):
        import ray

        # a 600-node chain exercises multiple label-propagation
        # rounds; duplicate + reversed + self-loop edges are noise
        edges = [(i, i + 1) for i in range(600)]
        edges += [(i + 1, i) for i in range(0, 600, 7)]
        edges += [(i, i) for i in range(0, 600, 11)]
        edges += edges[:50]
        got = self._run(ray, edges)
        assert set(got.values()) == {0}
        assert len(got) == 601

    def test_two_components(self, ray_session):
        import ray

        edges = [(1, 2), (2, 3), (10, 11)]
        got = self._run(ray, edges)
        assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


class TestWeightedSample:
    def test_determinism_and_partition_invariance(self, ray_session):
        import ray

        from parquet_go_ray.ops.sampling import weighted_sample

        rng = np.random.default_rng(37)
        t = pa.table({
            "doc_id": pa.array(range(5000), pa.int64()),
            "w": pa.array(rng.lognormal(size=5000)),
        })
        a = weighted_sample(
            ray.data.from_arrow(t).repartition(3),
            ["w"], "doc_id", "w", k=200,
        )
        b = weighted_sample(
            ray.data.from_arrow(t).repartition(11),
            ["w"], "doc_id", "w", k=200,
        )
        assert sorted(a.column("doc_id").to_pylist()) == \
            sorted(b.column("doc_id").to_pylist())
        assert a.num_rows == 200

    def test_weights_tilt_inclusion(self, ray_session):
        import ray

        from parquet_go_ray.ops.sampling import weighted_sample

        # 100 heavy (w=20) + 900 light (w=1); E[heavy in sample of
        # 100] ≈ 69 by sequential weighted draw; uniform would be 10.
        t = pa.table({
            "doc_id": pa.array(range(1000), pa.int64()),
            "w": pa.array([20.0] * 100 + [1.0] * 900),
        })
        ds = ray.data.from_arrow(t)
        heavy_counts = []
        for seed in range(5):
            s = weighted_sample(ds, [], "doc_id", "w", k=100, seed=seed)
            ids = np.array(s.column("doc_id").to_pylist())
            heavy_counts.append(int((ids < 100).sum()))
        mean_heavy = np.mean(heavy_counts)
        assert 45 < mean_heavy < 95, heavy_counts

    def test_nonpositive_weights_excluded(self, ray_session):
        import ray

        from parquet_go_ray.ops.sampling import weighted_sample

        t = pa.table({
            "doc_id": pa.array(range(10), pa.int64()),
            "w": pa.array([1.0, 0.0, -2.0, None, float("nan")] * 2),
        })
        s = weighted_sample(
            ray.data.from_arrow(t), [], "doc_id", "w", k=10,
        )
        assert sorted(s.column("doc_id").to_pylist()) == [0, 5]


class TestSplitDataset:
    def test_partition_of_unity_and_determinism(self, ray_session):
        import ray

        from parquet_go_ray.ops.sampling import split_dataset

        t = pa.table({
            "doc_id": pa.array(range(20_000), pa.int64()),
        })
        ds = ray.data.from_arrow(t).repartition(6)
        parts = split_dataset(
            ds, {"train": 0.8, "valid": 0.1, "test": 0.1}
        )
        got = {n: sorted(p.to_pandas()["doc_id"]) for n, p in
               parts.items()}
        # exactly-one-split partition
        allids = sorted(i for ids in got.values() for i in ids)
        assert allids == list(range(20_000))
        # fractions hit within hash tolerance
        assert abs(len(got["train"]) - 16_000) < 400
        assert abs(len(got["valid"]) - 2_000) < 200
        # rerun identical
        again = split_dataset(
            ds, {"train": 0.8, "valid": 0.1, "test": 0.1}
        )
        assert sorted(again["valid"].to_pandas()["doc_id"]) == \
            got["valid"]
        # different seed reshuffles
        other = split_dataset(
            ds, {"train": 0.8, "valid": 0.1, "test": 0.1}, seed=9
        )
        assert sorted(other["valid"].to_pandas()["doc_id"]) != \
            got["valid"]

    def test_group_coherent_split(self, ray_session):
        import ray

        from parquet_go_ray.ops.sampling import split_dataset

        t = pa.table({
            "conv_id": pa.array(
                [f"c{i // 10}" for i in range(2000)]
            ),
            "turn": pa.array(range(2000), pa.int64()),
        })
        parts = split_dataset(
            ray.data.from_arrow(t).repartition(5),
            {"train": 0.7, "test": 0.3}, by="conv_id",
        )
        tr = set(parts["train"].to_pandas()["conv_id"])
        te = set(parts["test"].to_pandas()["conv_id"])
        assert tr.isdisjoint(te)  # whole conversations stay together
        assert len(tr) + len(te) == 200

    def test_bad_fractions(self, ray_session):
        import ray

        from parquet_go_ray.ops.sampling import split_dataset

        ds = ray.data.from_arrow(
            pa.table({"doc_id": pa.array([1], pa.int64())})
        )
        with pytest.raises(ValueError, match="sum to 1"):
            split_dataset(ds, {"a": 0.5, "b": 0.4})
        with pytest.raises(ValueError, match="at least one"):
            split_dataset(ds, {})
