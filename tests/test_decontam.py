"""Benchmark decontamination (ops/decontam): vectorized n-gram
overlap, differential-pinned against a scalar Python reference."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import ray
from parquet_go_ray.ops.decontam import (
    build_ngram_set,
    decontaminate,
    ngram_hashes,
)


def _ref_grams(text: str | None, n: int, lower: bool) -> list[tuple]:
    toks = ("" if text is None else text).split()
    if lower:
        toks = [t.lower() for t in toks]
    return [tuple(toks[i : i + n]) for i in range(len(toks) - n + 1)]


def _ref_hits(text, bench_texts, n, lower) -> int:
    s = set()
    for b in bench_texts:
        s.update(_ref_grams(b, n, lower))
    return sum(1 for g in _ref_grams(text, n, lower) if g in s)


CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "pack my box with five dozen liquor jugs",
    "THE QUICK BROWN fox sat still",
    "",
    None,
    "one two",
    "the quick brown fox jumps over the lazy dog again and again",
    "completely novel text with no overlap at all",
    "five dozen liquor jugs were packed yesterday",
    "tabs\tand\nnewlines  split   like str split",
]
BENCH = [
    "a quick brown fox story: the quick brown fox jumps high",
    "five dozen liquor jugs",
    "tabs and newlines split",
]


class TestNgramHashes:
    @pytest.mark.parametrize("n", [1, 2, 3, 5])
    @pytest.mark.parametrize("lower", [True, False])
    def test_counts_and_cross_doc_equality(self, n, lower):
        col = pa.array(CORPUS, pa.string())
        g, m = ngram_hashes(col, n, lower)
        want = [len(_ref_grams(t, n, lower)) for t in CORPUS]
        assert m.tolist() == want
        assert len(g) == sum(want)
        # identical gram text => identical hash across docs; distinct
        # gram text => distinct hash (no collisions in this corpus)
        seg = np.concatenate(([0], np.cumsum(m)))
        by_text: dict[tuple, set] = {}
        for i, t in enumerate(CORPUS):
            for j, gram in enumerate(_ref_grams(t, n, lower)):
                by_text.setdefault(gram, set()).add(int(g[seg[i] + j]))
        assert all(len(v) == 1 for v in by_text.values())
        hashes = [next(iter(v)) for v in by_text.values()]
        assert len(set(hashes)) == len(hashes)

    def test_short_docs_make_no_grams(self):
        g, m = ngram_hashes(pa.array(["one two", "", None]), 3, True)
        assert m.tolist() == [0, 0, 0] and len(g) == 0

    def test_large_string_and_chunked(self):
        base = pa.array(CORPUS, pa.string())
        g0, m0 = ngram_hashes(base, 2, True)
        g1, m1 = ngram_hashes(base.cast(pa.large_string()), 2, True)
        chunked = pa.chunked_array([base[:4], base[4:]])
        g2, m2 = ngram_hashes(chunked, 2, True)
        assert np.array_equal(g0, g1) and np.array_equal(g0, g2)
        assert m0.tolist() == m1.tolist() == m2.tolist()

    def test_n_zero_raises(self):
        with pytest.raises(ValueError):
            ngram_hashes(pa.array(["x"]), 0)


@pytest.mark.usefixtures("ray_session")
class TestDecontaminate:
    @pytest.mark.parametrize("n,lower", [(2, True), (3, True), (2, False)])
    def test_flag_matches_scalar_reference(self, n, lower):
        corpus = ray.data.from_arrow(
            pa.table({"id": list(range(len(CORPUS))),
                      "text": pa.array(CORPUS, pa.string())}))
        bench = ray.data.from_arrow(
            pa.table({"text": pa.array(BENCH, pa.string())}))
        out = decontaminate(corpus, bench, n=n, lower=lower).sort("id")
        got = out.to_pandas()
        want = [_ref_hits(t, BENCH, n, lower) for t in CORPUS]
        assert got["contaminated_ngrams"].tolist() == want
        assert got["is_contaminated"].tolist() == [w >= 1 for w in want]

    def test_drop_mode_and_min_hits(self):
        corpus = ray.data.from_arrow(
            pa.table({"id": list(range(len(CORPUS))),
                      "text": pa.array(CORPUS, pa.string())}))
        bench = ray.data.from_arrow(
            pa.table({"text": pa.array(BENCH, pa.string())}))
        hits = [_ref_hits(t, BENCH, 2, True) for t in CORPUS]
        kept = decontaminate(
            corpus, bench, n=2, mode="drop").to_pandas()["id"].tolist()
        assert sorted(kept) == [i for i, h in enumerate(hits) if h < 1]
        kept3 = decontaminate(
            corpus, bench, n=2, mode="drop",
            min_hits=3).to_pandas()["id"].tolist()
        assert sorted(kept3) == [i for i, h in enumerate(hits) if h < 3]

    def test_gram_set_reuse_and_empty_benchmark(self):
        bench = ray.data.from_arrow(
            pa.table({"text": pa.array(BENCH, pa.string())}))
        s = build_ngram_set(bench, n=2)
        assert np.array_equal(s, np.sort(np.unique(s)))  # sorted unique
        corpus = ray.data.from_arrow(
            pa.table({"id": [0, 1], "text": [BENCH[1], "nothing shared"]}))
        got = decontaminate(
            corpus, gram_set=s, n=2).sort("id").to_pandas()
        assert got["is_contaminated"].tolist() == [True, False]
        empty = ray.data.from_arrow(pa.table({"text": pa.array([], pa.string())}))
        s0 = build_ngram_set(empty, n=2)
        assert len(s0) == 0
        got0 = decontaminate(corpus, gram_set=s0, n=2).to_pandas()
        assert got0["is_contaminated"].tolist() == [False, False]

    def test_mode_validation(self):
        corpus = ray.data.from_arrow(pa.table({"text": ["x"]}))
        with pytest.raises(ValueError):
            decontaminate(corpus, gram_set=np.zeros(0, np.uint64),
                          mode="purge")
        with pytest.raises(ValueError):
            decontaminate(corpus)  # no benchmark, no gram_set

    def test_planted_contamination_larger_corpus(self, rng):
        """Plant benchmark passages inside 1/8 of a synthetic corpus;
        decontaminate must flag exactly the planted docs."""
        vocab = np.array([f"w{i}" for i in range(500)])
        bench_texts = [
            " ".join(rng.choice(vocab, 30).tolist()) for _ in range(20)
        ]
        docs, planted = [], []
        for i in range(400):
            words = rng.choice(vocab, 60).tolist()
            if i % 8 == 0:
                b = bench_texts[int(rng.integers(len(bench_texts)))]
                frag = b.split()[5:25]  # a 20-token benchmark passage
                pos = int(rng.integers(0, 40))
                words = words[:pos] + frag + words[pos:]
                planted.append(i)
            docs.append(" ".join(words))
        corpus = ray.data.from_arrow(
            pa.table({"id": list(range(400)), "text": docs}))
        bench = ray.data.from_arrow(pa.table({"text": bench_texts}))
        got = decontaminate(corpus, bench, n=13).sort("id").to_pandas()
        flagged = got.loc[got["is_contaminated"], "id"].tolist()
        want = [i for i in range(400)
                if _ref_hits(docs[i], bench_texts, 13, True) >= 1]
        assert flagged == want
        assert set(planted) <= set(flagged)  # every plant found


class TestEmbeddingDecontam:
    def _tables(self):
        rng = np.random.default_rng(47)
        bench = rng.normal(size=(20, 16))
        # corpus: 10 exact benchmark vectors, 10 slightly-perturbed
        # (cos > 0.99), 30 random (cos ~ 0)
        near = bench[:10] + rng.normal(scale=0.01, size=(10, 16))
        rest = rng.normal(size=(30, 16))
        corpus = np.concatenate((bench[:10], near, rest))
        def tbl(m, ids):
            return pa.table({
                "doc_id": pa.array(ids, pa.int64()),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(m.reshape(-1).astype(np.float32)), 16
                ),
            })
        return tbl(corpus, range(50)), tbl(bench, range(1000, 1020)), \
            corpus, bench

    def test_flag_matches_numpy(self, ray_session):
        import ray

        from parquet_go_ray.ops.decontam import decontaminate_embeddings

        corpus_t, bench_t, corpus, bench = self._tables()
        out = (
            decontaminate_embeddings(
                ray.data.from_arrow(corpus_t).repartition(4),
                ray.data.from_arrow(bench_t).repartition(2),
                threshold=0.95,
            ).to_pandas().sort_values("doc_id")
        )
        cn = corpus / np.linalg.norm(corpus, axis=1, keepdims=True)
        bn = bench / np.linalg.norm(bench, axis=1, keepdims=True)
        sim = (cn @ bn.T).max(axis=1)
        assert np.allclose(out["benchmark_similarity"], sim, atol=1e-6)
        assert (out["is_contaminated"].to_numpy() == (sim >= 0.95)).all()
        # the planted structure fires as designed
        assert out["is_contaminated"][:20].all()
        assert not out["is_contaminated"][20:].any()

    def test_drop_and_reuse_matrix(self, ray_session):
        import ray

        from parquet_go_ray.ops.decontam import (
            collect_benchmark_embeddings, decontaminate_embeddings)

        corpus_t, bench_t, *_ = self._tables()
        mat = collect_benchmark_embeddings(
            ray.data.from_arrow(bench_t)
        )
        assert mat.shape == (20, 16)
        kept = decontaminate_embeddings(
            ray.data.from_arrow(corpus_t),
            bench_matrix=mat, threshold=0.95, mode="drop",
        ).to_pandas()
        assert sorted(kept["doc_id"]) == list(range(20, 50))

    def test_empty_benchmark(self, ray_session):
        import ray

        from parquet_go_ray.ops.decontam import decontaminate_embeddings

        corpus_t, _, *_ = self._tables()
        out = decontaminate_embeddings(
            ray.data.from_arrow(corpus_t),
            bench_matrix=np.zeros((0, 0)),
        ).to_pandas()
        assert not out["is_contaminated"].any()
