"""One-pass corpus profiling (ops/profile.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


class TestProfileCorpus:
    def test_counts_langs_and_dup_rate(self, ray_session):
        import ray

        from parquet_go_ray.ops.profile import profile_corpus

        en = ["the cat and the dog are in the house again today"] * 40
        fr = ["le chat et le chien sont dans la maison avec les"] * 10
        dups = ["duplicated body text exactly"] * 50
        texts = en + fr + dups
        t = pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
        })
        p = profile_corpus(
            ray.data.from_arrow(t).repartition(5)
        )
        assert p["docs"] == 100
        assert p["tokens"] == sum(len(s.split(" ")) for s in texts)
        assert p["chars"] == sum(len(s) for s in texts)
        assert p["mean_tokens"] == p["tokens"] / 100
        # the two planted languages dominate the histogram
        assert p["langs"]["en"] >= 40
        assert p["langs"].get("fr", 0) >= 10
        # 3 distinct texts among 100 docs -> dup rate ~0.97
        assert p["approx_distinct_texts"] == 3
        assert 0.9 < p["approx_exact_dup_rate"] <= 1.0

    def test_empty_and_null(self, ray_session):
        import ray

        from parquet_go_ray.ops.profile import profile_corpus

        t = pa.table({
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array([None, ""]),
        })
        p = profile_corpus(ray.data.from_arrow(t))
        assert p["docs"] == 2 and p["chars"] == 0
        empty = profile_corpus(
            ray.data.from_arrow(t.slice(0, 0))
        )
        assert empty["docs"] == 0
