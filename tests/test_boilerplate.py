"""Boilerplate line removal (ops/boilerplate.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


BOILER = "Accept cookies | Privacy | Terms"
FOOTER = "(c) 2026 Example Corp"


def _corpus(n=40, rng=None):
    rng = rng or np.random.default_rng(53)
    texts = []
    for i in range(n):
        body = [
            f"unique line {i} {int(x)}" for x in rng.integers(0, 9999, 4)
        ]
        lines = [BOILER] + body[:2] + ["", FOOTER] + body[2:]
        texts.append("\n".join(lines))
    return texts


class TestRemoveBoilerplate:
    def _run(self, ray, texts, **kw):
        from parquet_go_ray.ops.boilerplate import \
            remove_boilerplate_lines

        t = pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
        })
        return (
            remove_boilerplate_lines(
                ray.data.from_arrow(t).repartition(4), **kw
            ).to_pandas().sort_values("doc_id")
        )

    def test_repeated_lines_removed_unique_kept(self, ray_session):
        import ray

        texts = _corpus()
        out = self._run(ray, texts, min_docs=10)
        for i, (orig, new, dropped) in enumerate(
            zip(texts, out["text"], out["boilerplate_lines_removed"])
        ):
            olines = orig.split("\n")
            exp = [l for l in olines if l not in (BOILER, FOOTER)]
            assert new.split("\n") == exp, i
            assert dropped == 2
        # blank lines survived (keep_blank default)
        assert all("\n\n" in t or "" in t.split("\n")
                   for t in out["text"])

    def test_min_docs_threshold(self, ray_session):
        import ray

        # the boilerplate appears in only 5 docs -> below min_docs=10
        texts = _corpus(5)
        out = self._run(ray, texts, min_docs=10)
        assert (out["boilerplate_lines_removed"] == 0).all()
        assert out["text"].tolist() == texts

    def test_long_lines_protected(self, ray_session):
        import ray

        long_line = "x" * 600  # > max_line_chars default 500
        texts = [f"{long_line}\nunique {i}" for i in range(30)]
        out = self._run(ray, texts, min_docs=5)
        assert (out["boilerplate_lines_removed"] == 0).all()
        out2 = self._run(ray, texts, min_docs=5, max_line_chars=10_000)
        assert (out2["boilerplate_lines_removed"] == 1).all()

    def test_sketch_reuse_and_within_doc_repeat(self, ray_session):
        import ray

        from parquet_go_ray.ops.boilerplate import (
            line_df_sketch, remove_boilerplate_lines)

        # a line repeated 20x WITHIN one doc counts once (df = 1)
        texts = ["\n".join(["solo repeat"] * 20 + ["body"])] + [
            f"other {i}" for i in range(10)
        ]
        t = pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
        })
        ds = ray.data.from_arrow(t)
        cms = line_df_sketch(ds)
        out = remove_boilerplate_lines(
            ds, min_docs=2, cms=cms
        ).to_pandas().sort_values("doc_id")
        assert (out["boilerplate_lines_removed"] == 0).all()
        assert out["text"].iloc[0] == texts[0]

    def test_bad_min_docs(self, ray_session):
        import ray

        from parquet_go_ray.ops.boilerplate import \
            remove_boilerplate_lines

        ds = ray.data.from_arrow(
            pa.table({"doc_id": pa.array([1], pa.int64()),
                      "text": pa.array(["x"])})
        )
        with pytest.raises(ValueError, match="min_docs"):
            remove_boilerplate_lines(ds, min_docs=1)


class TestBroadcastDispatch:
    def test_task_and_actor_paths_identical(self, ray_session):
        """The auto (stateless-task) path and a forced actor pool
        produce identical output for every broadcast-probe op."""
        import ray

        from parquet_go_ray.ops.boilerplate import (
            line_df_sketch, remove_boilerplate_lines)
        from parquet_go_ray.ops.lm_score import (lm_perplexity,
                                                 train_ngram_lm)

        texts = _corpus(20)
        t = pa.table({
            "doc_id": pa.array(range(20), pa.int64()),
            "text": pa.array(texts),
        })
        ds = ray.data.from_arrow(t).repartition(3)
        cms = line_df_sketch(ds)
        auto = remove_boilerplate_lines(
            ds, cms=cms, min_docs=10
        ).to_pandas().sort_values("doc_id")
        forced = remove_boilerplate_lines(
            ds, cms=cms, min_docs=10, concurrency=(1, 2)
        ).to_pandas().sort_values("doc_id")
        assert auto["text"].tolist() == forced["text"].tolist()

        lm = train_ngram_lm(ds)
        a = lm_perplexity(ds, lm).to_pandas().sort_values("doc_id")
        b = lm_perplexity(
            ds, lm, concurrency=(1, 2)
        ).to_pandas().sort_values("doc_id")
        assert np.array_equal(
            a["lm_bits_per_token"].to_numpy(),
            b["lm_bits_per_token"].to_numpy(),
        )
