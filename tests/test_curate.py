"""End-to-end curation pipeline (pipelines/curate.py) — plumbing
test: stage order, column contracts, report arithmetic. The
operators themselves are oracled in their own test files."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


BOILER = "Cookie banner | Accept | Decline"


def _corpus(rng):
    """60 docs: 15 boilerplate-carrying, 10 exact dups, 6 near-dups,
    5 benchmark-contaminated, the rest clean."""
    mk = lambda n=30: " ".join(
        f"w{int(x)}" for x in rng.integers(0, 5000, n)
    )
    base = [mk() for _ in range(40)]
    texts = list(base)
    texts += [base[i] for i in range(10)]            # exact dups
    texts += [base[i].replace("w", "v", 1) for i in range(10, 16)]
    bench_passage = " ".join(f"b{i}" for i in range(15))
    texts += [bench_passage + " " + mk(10) for _ in range(4)]
    texts = [
        (BOILER + "\n" + t) if i % 4 == 0 else t
        for i, t in enumerate(texts)
    ]
    return texts, bench_passage


class TestCuratePipeline:
    def test_full_stack(self, ray_session):
        import ray

        from parquet_go_ray.pipelines.curate import curate_corpus

        rng = np.random.default_rng(71)
        texts, bench_passage = _corpus(rng)
        docs = ray.data.from_arrow(pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
        })).repartition(4)
        bench = ray.data.from_arrow(pa.table({
            "text": pa.array([bench_passage]),
        }))
        ref = ray.data.from_arrow(pa.table({
            "text": pa.array(texts[:20]),
        }))

        out = curate_corpus(
            docs,
            benchmark=bench,
            reference=ref,
            boilerplate_min_docs=10,
            near_dup_threshold=0.7,
            max_bits_per_token=50.0,  # permissive: plumbing test
            decontam_n=8,
            pack_tokens=128,
        )
        res = out["dataset"].to_pandas()
        rep = out["report"]

        # exact dups collapsed (min id kept), near-dups collapsed,
        # contaminated docs dropped
        assert rep["before"]["docs"] == len(texts)
        assert rep["after"]["docs"] == len(res)
        assert rep["docs_removed"] >= 10 + 6 + 4
        # no boilerplate line survives anywhere
        assert not res["text"].str.contains(BOILER, regex=False).any()
        # no benchmark n-gram survives
        assert not res["text"].str.contains("b0 b1 b2", regex=False).any()
        # survivors carry the LM score column and respect the cap
        assert (res["lm_bits_per_token"] <= 50.0).all()
        # the clean docs survived (ids 16..39 minus contaminated none)
        surv = set(res["doc_id"])
        assert set(range(16, 40)) <= surv
        # packing consumed the curated stream: every surviving doc
        # placed exactly once
        packed = out["packed"].to_pandas()
        placed = sorted(i for ids in packed["doc_ids"] for i in ids)
        assert placed == sorted(surv)
        assert (packed["n_tokens"] <= 128).all() or \
            packed["oversize"].any()

    def test_minimal_stages(self, ray_session):
        import ray

        from parquet_go_ray.pipelines.curate import curate_corpus

        docs = ray.data.from_arrow(pa.table({
            "doc_id": pa.array(range(12), pa.int64()),
            "text": pa.array(
                [f"unique text number {i} alpha beta" for i in range(6)]
                * 2
            ),
        }))
        out = curate_corpus(docs, profile=False)
        res = out["dataset"].to_pandas()
        assert sorted(res["doc_id"]) == list(range(6))  # dups gone
        assert out["report"] == {}
        assert "packed" not in out
