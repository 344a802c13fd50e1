"""KLL mergeable quantile sketch (ops/sketch.py KllSketch).

Local properties are deterministic (fixed fold order); the distributed
aggregate carries an error BAND like HLL (merge order varies with Ray
scheduling)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _rank_err(vals_sorted: np.ndarray, est: float, q: float) -> float:
    """|rank(est) - q·n| / n with rank = count of values <= est."""
    n = len(vals_sorted)
    r = np.searchsorted(vals_sorted, est, side="right")
    return abs(r - q * n) / n


class TestKllSketchLocal:
    def test_exact_when_under_capacity(self):
        from parquet_go_ray.ops.sketch import KllSketch

        rng = np.random.default_rng(1)
        v = rng.normal(size=400)
        sk = KllSketch(k=512).add_array(v)
        s = np.sort(v)
        for q in (0.0, 0.25, 0.5, 0.9, 1.0):
            assert sk.quantiles([q])[0] == s[int(np.floor(q * 399))]

    @pytest.mark.parametrize("dist", ["normal", "lognormal", "uniform"])
    def test_rank_error_band_large_input(self, dist):
        from parquet_go_ray.ops.sketch import KllSketch

        rng = np.random.default_rng(7)
        v = getattr(rng, dist)(size=200_000)
        sk = KllSketch(k=256)
        for chunk in np.array_split(v, 37):  # streaming fold
            sk.add_array(chunk)
        assert sk.count == len(v)
        s = np.sort(v)
        for q in (0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99):
            err = _rank_err(s, sk.quantiles([q])[0], q)
            assert err < 0.02, (dist, q, err)

    def test_merge_equals_combined_stream_error(self):
        from parquet_go_ray.ops.sketch import KllSketch

        rng = np.random.default_rng(11)
        a, b = rng.normal(size=50_000), rng.normal(2.0, size=50_000)
        sa = KllSketch(k=256).add_array(a)
        sb = KllSketch(k=256).add_array(b)
        sa.merge(sb)
        assert sa.count == 100_000
        s = np.sort(np.concatenate((a, b)))
        for q in (0.1, 0.5, 0.9):
            assert _rank_err(s, sa.quantiles([q])[0], q) < 0.02

    def test_merge_k_mismatch_rejected(self):
        from parquet_go_ray.ops.sketch import KllSketch

        with pytest.raises(ValueError, match="k mismatch"):
            KllSketch(k=64).merge(KllSketch(k=128))

    def test_wire_roundtrip(self):
        from parquet_go_ray.ops.sketch import KllSketch

        rng = np.random.default_rng(13)
        sk = KllSketch(k=64).add_array(rng.normal(size=10_000))
        back = KllSketch.from_bytes(sk.to_bytes())
        qs = [0.05, 0.5, 0.95]
        assert np.array_equal(back.quantiles(qs), sk.quantiles(qs))
        assert back.count == sk.count and back.k == sk.k

    def test_empty_and_nulls(self):
        from parquet_go_ray.ops.sketch import KllSketch

        sk = KllSketch()
        assert np.isnan(sk.quantiles([0.5])[0])
        t = pa.table({"x": pa.array([1.0, None, np.nan, 3.0])})
        sk.add_block(t, "x")
        assert sk.count == 2
        assert sk.quantiles([1.0])[0] == 3.0

    def test_memory_stays_bounded(self):
        from parquet_go_ray.ops.sketch import KllSketch

        rng = np.random.default_rng(17)
        sk = KllSketch(k=128)
        for _ in range(50):
            sk.add_array(rng.normal(size=20_000))
        retained = sum(len(v) for v in sk.levels)
        # O(k log(n/k)): 1e6 values at k=128 -> ~13 levels
        assert retained <= 128 * 20


class TestKllDistributed:
    def test_aggregate_matches_exact_within_band(self, ray_session):
        import ray

        from parquet_go_ray.ops.sketch import approx_quantiles_kll

        rng = np.random.default_rng(23)
        v = rng.lognormal(size=120_000)
        ds = ray.data.from_arrow(
            pa.table({"x": pa.array(v)})
        ).repartition(16)
        out = approx_quantiles_kll(
            ds, "x", qs=(0.1, 0.5, 0.9, 0.99), k=256
        )
        s = np.sort(v)
        for row in out.to_pylist():
            assert _rank_err(s, row["value"], row["q"]) < 0.02, row

    def test_int_column_and_empty_ds(self, ray_session):
        import ray

        from parquet_go_ray.ops.sketch import approx_quantiles_kll

        ds = ray.data.from_arrow(
            pa.table({"x": pa.array(np.arange(400), pa.int64())})
        )
        out = approx_quantiles_kll(ds, "x", qs=(0.5,), k=512)
        assert out.column("value")[0].as_py() == 199.0  # exact under k


class TestKllProperties:
    def test_merge_order_error_invariant(self):
        """Any merge tree over the same data keeps the rank-error
        band — the property the nondeterministic Ray merge order
        relies on."""
        from parquet_go_ray.ops.sketch import KllSketch

        rng = np.random.default_rng(29)
        chunks = [rng.normal(size=5000) for _ in range(8)]
        v = np.sort(np.concatenate(chunks))

        def build(order, pairing):
            sks = [KllSketch(k=256).add_array(chunks[i]) for i in order]
            while len(sks) > 1:
                if pairing == "linear":
                    sks = [sks[0].merge(sks[1])] + sks[2:]
                else:  # balanced tree
                    sks = [
                        sks[i].merge(sks[i + 1])
                        if i + 1 < len(sks) else sks[i]
                        for i in range(0, len(sks), 2)
                    ]
            return sks[0]

        for order, pairing in [
            (range(8), "linear"), (reversed(range(8)), "linear"),
            (range(8), "tree"), ([3, 1, 7, 0, 5, 2, 6, 4], "tree"),
        ]:
            sk = build(list(order), pairing)
            assert sk.count == 40_000
            for q in (0.05, 0.5, 0.95):
                assert _rank_err(v, sk.quantiles([q])[0], q) < 0.025
