"""Cross-doc repeated-passage detection (ops/passages.py),
differential-pinned against a scalar reference."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _scalar_ref(texts, window, min_df, stride=1, lower=True):
    """Reference: distinct window-token-tuples per doc; df across
    docs; per-doc (n_windows, dup_windows)."""
    per_doc = []
    for t in texts:
        toks = (t.lower() if lower else t).split(" ")
        if len(toks) < window:
            per_doc.append(set())
            continue
        wins = [
            tuple(toks[i : i + window])
            for i in range(0, len(toks) - window + 1, stride)
        ]
        per_doc.append(set(wins))
    from collections import Counter

    df = Counter()
    for s in per_doc:
        df.update(s)
    out = []
    for s in per_doc:
        dup = sum(1 for w in s if df[w] >= min_df)
        out.append((len(s), dup))
    return out


def _table(texts):
    return pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
    })


class TestRepeatedPassages:
    def _run(self, ray, texts, **kw):
        from parquet_go_ray.ops.passages import repeated_passages

        return (
            repeated_passages(
                ray.data.from_arrow(_table(texts)).repartition(4), **kw
            )
            .to_pandas()
            .set_index("doc_id")
            .sort_index()
        )

    def test_matches_scalar_reference(self, ray_session):
        import ray

        rng = np.random.default_rng(3)
        # Shared boilerplate passage planted into some docs + unique
        # bodies; a few short (windowless) docs
        boiler = " ".join(f"b{i}" for i in range(12))
        texts = []
        for i in range(60):
            body = " ".join(
                f"w{int(x)}" for x in rng.integers(0, 9999, 30)
            )
            if i % 3 == 0:
                texts.append(boiler + " " + body)
            else:
                texts.append(body)
        texts += ["tiny doc", ""]  # < window tokens

        got = self._run(ray, texts, window=8, min_df=2, num_buckets=8)
        exp = _scalar_ref(texts, window=8, min_df=2)
        assert len(got) == len(texts)
        for i, (tot, dup) in enumerate(exp):
            row = got.loc[i]
            assert (row["n_windows"], row["dup_windows"]) == (tot, dup), i
            want = dup / tot if tot else 0.0
            assert row["dup_fraction"] == pytest.approx(want)
        # the planted boilerplate actually fires
        assert (got.loc[list(range(0, 60, 3)), "dup_windows"] > 0).all()
        assert got.loc[60, "n_windows"] == 0  # windowless doc present

    def test_min_df_3(self, ray_session):
        import ray

        shared = " ".join(f"s{i}" for i in range(6))
        texts = [shared + f" u{j} v{j} x{j}" for j in range(2)] + [
            " ".join(f"z{j}k{i}" for i in range(10)) for j in range(3)
        ]
        got = self._run(ray, texts, window=4, min_df=3, num_buckets=4)
        exp = _scalar_ref(texts, window=4, min_df=3)
        for i, (tot, dup) in enumerate(exp):
            assert (got.loc[i, "n_windows"],
                    got.loc[i, "dup_windows"]) == (tot, dup)
        # the 2-doc shared passage does NOT fire at min_df=3
        assert got["dup_windows"].sum() == 0

    def test_stride_sampling(self, ray_session):
        import ray

        rng = np.random.default_rng(5)
        texts = [
            " ".join(f"w{int(x)}" for x in rng.integers(0, 50, 40))
            for _ in range(20)
        ]
        texts.append(texts[0])  # exact duplicate doc
        got = self._run(ray, texts, window=5, min_df=2, stride=3,
                        num_buckets=4)
        exp = _scalar_ref(texts, window=5, min_df=2, stride=3)
        for i, (tot, dup) in enumerate(exp):
            assert (got.loc[i, "n_windows"],
                    got.loc[i, "dup_windows"]) == (tot, dup), i
        # the exact-dup pair is fully flagged even under stride
        assert got.loc[20, "dup_fraction"] == 1.0

    def test_bad_args(self, ray_session):
        import ray

        from parquet_go_ray.ops.passages import repeated_passages

        ds = ray.data.from_arrow(_table(["a b"]))
        with pytest.raises(ValueError, match="min_df"):
            repeated_passages(ds, min_df=1)
        with pytest.raises(ValueError, match="window"):
            repeated_passages(ds, window=0)
