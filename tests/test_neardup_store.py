"""Incremental MinHash-LSH near-dup store (ops/neardup_store.py).

The store's decision rule is purely deterministic given its meta
(num_perm/bands/k/seed), so every test differential-pins the
distributed path against a local numpy replay of the same kernels:
doc flagged iff >= min_band_hits of its folded band hashes appear in
the corpus's banded set.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _docs(ids, texts, id_type=pa.int64()):
    return pa.table({
        "doc_id": pa.array(ids, id_type),
        "text": pa.array(texts),
    })


def _mk_text(rng, n_words=40):
    return " ".join(
        f"w{int(x)}" for x in rng.integers(0, 5000, n_words)
    )


def _expected_new(corpus_texts, shard_texts, shard_ids,
                  num_perm=128, bands=16, k=5, seed=1, min_band_hits=1):
    """Local replay of the store's decision rule."""
    from parquet_go_ray.ops.neardup_store import _banded_hashes

    ch = np.unique(
        _banded_hashes(pa.array(corpus_texts), num_perm, bands, k, seed)
        .reshape(-1)
    )
    sh = _banded_hashes(pa.array(shard_texts), num_perm, bands, k, seed)
    hits = np.isin(sh, ch).sum(axis=1)
    return sorted(
        i for i, h in zip(shard_ids, hits) if h < min_band_hits
    )


class TestMinHashDedupStore:
    def test_near_dups_of_history_flagged(self, ray_session, tmp_path):
        import ray

        from parquet_go_ray.ops.neardup_store import MinHashDedupStore

        rng = np.random.default_rng(7)
        corpus_texts = [_mk_text(rng) for _ in range(60)]
        # shard: 10 exact copies, 10 near-copies (one word changed),
        # 20 fresh docs
        near = [t.replace("w", "x", 1) for t in corpus_texts[10:20]]
        fresh = [_mk_text(rng) for _ in range(20)]
        shard_texts = corpus_texts[:10] + near + fresh
        shard_ids = list(range(100, 140))

        p = str(tmp_path / "store")
        store = MinHashDedupStore.build(
            ray.data.from_arrow(_docs(range(60), corpus_texts))
            .repartition(4),
            p, num_parts=8,
        )
        got = sorted(
            store.filter_new(
                ray.data.from_arrow(_docs(shard_ids, shard_texts))
                .repartition(3)
            ).to_pandas()["doc_id"].tolist()
        )
        # differential: identical to the local replay
        assert got == _expected_new(corpus_texts, shard_texts, shard_ids)
        # semantic: all exact copies flagged, all near-copies flagged,
        # fresh docs overwhelmingly survive
        assert not any(i < 120 for i in got)
        assert len([i for i in got if i >= 120]) >= 18

    def test_append_then_seen(self, ray_session, tmp_path):
        import ray

        from parquet_go_ray.ops.neardup_store import MinHashDedupStore

        rng = np.random.default_rng(11)
        a, b, c = (_mk_text(rng) for _ in range(3))
        p = str(tmp_path / "store")
        store = MinHashDedupStore.build(
            ray.data.from_arrow(_docs([0], [a])), p, num_parts=4,
        )
        shard = _docs([10, 11], [b, c])
        first = store.filter_new(ray.data.from_arrow(shard)).to_pandas()
        assert sorted(first["doc_id"]) == [10, 11]
        res = store.append(ray.data.from_arrow(shard))
        assert res["added"] > 0
        again = store.filter_new(ray.data.from_arrow(shard)).to_pandas()
        assert len(again) == 0
        # reopened store serves the appended state and its meta params
        reopened = MinHashDedupStore(p)
        assert reopened.meta["num_perm"] == 128
        assert reopened.meta["bands"] == 16
        out = reopened.filter_new(
            ray.data.from_arrow(_docs([20], [b]))
        ).to_pandas()
        assert len(out) == 0

    def test_min_band_hits_raises_precision(self, ray_session, tmp_path):
        import ray

        from parquet_go_ray.ops.neardup_store import MinHashDedupStore

        rng = np.random.default_rng(13)
        corpus_texts = [_mk_text(rng) for _ in range(40)]
        shard_texts = [t.replace("w", "x", 1) for t in corpus_texts[:5]] + [
            _mk_text(rng) for _ in range(5)
        ]
        shard_ids = list(range(100, 110))
        p = str(tmp_path / "store")
        store = MinHashDedupStore.build(
            ray.data.from_arrow(_docs(range(40), corpus_texts)),
            p, num_parts=4,
        )
        for m in (1, 4):
            got = sorted(
                store.filter_new(
                    ray.data.from_arrow(_docs(shard_ids, shard_texts)),
                    min_band_hits=m,
                ).to_pandas()["doc_id"].tolist()
            )
            assert got == _expected_new(
                corpus_texts, shard_texts, shard_ids, min_band_hits=m
            )

    def test_string_ids(self, ray_session, tmp_path):
        import ray

        from parquet_go_ray.ops.neardup_store import MinHashDedupStore

        rng = np.random.default_rng(17)
        a, b = _mk_text(rng), _mk_text(rng)
        p = str(tmp_path / "store")
        store = MinHashDedupStore.build(
            ray.data.from_arrow(_docs([1], [a])), p, num_parts=4,
        )
        out = store.filter_new(
            ray.data.from_arrow(
                _docs(["dup", "new"], [a, b], id_type=pa.string())
            )
        ).to_pandas()
        assert sorted(out["doc_id"]) == ["new"]

    def test_rebuild_clears_stale_parts(self, ray_session, tmp_path):
        import ray

        from parquet_go_ray.ops.neardup_store import MinHashDedupStore

        rng = np.random.default_rng(19)
        texts = [_mk_text(rng) for _ in range(50)]
        only = _mk_text(rng)
        p = str(tmp_path / "store")
        MinHashDedupStore.build(
            ray.data.from_arrow(_docs(range(50), texts)), p, num_parts=4,
        )
        store = MinHashDedupStore.build(
            ray.data.from_arrow(_docs([0], [only])), p, num_parts=4,
        )
        out = store.filter_new(
            ray.data.from_arrow(_docs([5], [texts[5]]))
        ).to_pandas()
        assert out["doc_id"].tolist() == [5]  # gone with the rebuild

    def test_bad_band_split_rejected(self, ray_session, tmp_path):
        import ray

        from parquet_go_ray.ops.neardup_store import MinHashDedupStore

        with pytest.raises(ValueError, match="divisible"):
            MinHashDedupStore.build(
                ray.data.from_arrow(_docs([0], ["x"])),
                str(tmp_path / "s"), num_perm=100, bands=16,
            )
