"""N-gram LM quality scoring (ops/lm_score.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _ref_texts(rng, n=200):
    """Reference corpus with strong bigram structure: sentences
    sampled from a tiny grammar."""
    subs = ["the cat", "a dog", "the bird", "my fish"]
    verbs = ["eats", "sees", "likes", "chases"]
    objs = ["food", "the ball", "water", "a toy"]
    return [
        " ".join([
            subs[rng.integers(4)], verbs[rng.integers(4)],
            objs[rng.integers(4)],
        ] * int(rng.integers(3, 8)))
        for _ in range(n)
    ]


class TestLmScore:
    def test_in_domain_scores_below_garbage(self, ray_session):
        import ray

        from parquet_go_ray.ops.lm_score import (lm_perplexity,
                                                 train_ngram_lm)

        rng = np.random.default_rng(61)
        ref = ray.data.from_arrow(pa.table({
            "text": pa.array(_ref_texts(rng)),
        })).repartition(4)
        lm = train_ngram_lm(ref)
        assert lm.total > 0

        in_domain = _ref_texts(rng, 20)
        garbage = [
            " ".join(f"zq{int(x)}" for x in rng.integers(0, 10**6, 30))
            for _ in range(20)
        ]
        # shuffled in-domain tokens: same unigrams, broken bigrams
        shuffled = []
        for t in in_domain:
            toks = t.split(" ")
            rng.shuffle(toks)
            shuffled.append(" ".join(toks))
        corpus = pa.table({
            "doc_id": pa.array(range(60), pa.int64()),
            "text": pa.array(in_domain + shuffled + garbage),
        })
        out = (
            lm_perplexity(
                ray.data.from_arrow(corpus).repartition(3), lm
            ).to_pandas().sort_values("doc_id")
        )
        bits = out["lm_bits_per_token"].to_numpy()
        mean_in, mean_sh, mean_gb = (
            bits[:20].mean(), bits[20:40].mean(), bits[40:].mean()
        )
        # reference-like < shuffled-tokens < out-of-vocab garbage
        assert mean_in < mean_sh < mean_gb, (mean_in, mean_sh, mean_gb)
        # CLEAN separation, not just means: every in-domain doc beats
        # every garbage doc
        assert bits[:20].max() < bits[40:].min()

    def test_edge_docs_and_determinism(self, ray_session):
        import ray

        from parquet_go_ray.ops.lm_score import (lm_perplexity,
                                                 train_ngram_lm)

        rng = np.random.default_rng(67)
        ref = ray.data.from_arrow(pa.table({
            "text": pa.array(_ref_texts(rng, 50)),
        }))
        lm = train_ngram_lm(ref)
        corpus = pa.table({
            "doc_id": pa.array(range(4), pa.int64()),
            "text": pa.array(["", "eats", None, "the cat eats food"]),
        })
        a = lm_perplexity(
            ray.data.from_arrow(corpus), lm
        ).to_pandas().sort_values("doc_id")
        b = lm_perplexity(
            ray.data.from_arrow(corpus).repartition(3), lm
        ).to_pandas().sort_values("doc_id")
        assert np.allclose(
            a["lm_bits_per_token"], b["lm_bits_per_token"]
        )
        assert np.isfinite(a["lm_bits_per_token"]).all()
        # the real sentence scores lower than the single word
        assert a["lm_bits_per_token"].iloc[3] < \
            a["lm_bits_per_token"].iloc[1]

    def test_save_load_roundtrip(self, ray_session, tmp_path):
        import ray

        from parquet_go_ray.ops.lm_score import (NgramLM, lm_perplexity,
                                                 train_ngram_lm)

        rng = np.random.default_rng(71)
        ref = ray.data.from_arrow(pa.table({
            "text": pa.array(_ref_texts(rng, 30)),
        }))
        lm = train_ngram_lm(ref)
        p = str(tmp_path / "lm.npz")
        lm.save(p)
        back = NgramLM.load(p)
        corpus = ray.data.from_arrow(pa.table({
            "doc_id": pa.array([0], pa.int64()),
            "text": pa.array(["the cat eats food"]),
        }))
        a = lm_perplexity(corpus, lm).to_pandas()["lm_bits_per_token"]
        b = lm_perplexity(corpus, back).to_pandas()["lm_bits_per_token"]
        assert np.array_equal(a.to_numpy(), b.to_numpy())
        assert back.total == lm.total and back.lam == lm.lam
