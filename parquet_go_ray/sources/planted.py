"""Deterministic planted-duplicate fixtures.

Each fixture has a closed-form group structure so the expected survivor
set of a dedup run is provable, and — for the clone corpora — byte-
identical to what a DuckDB oracle can construct from ``range()`` +
string formulas. That turns the near-dup pipelines (MinHash, SimHash,
embedding LSH), which have no general SQL equivalent, into hash-oracled
queries on a corpus with known ground truth: survivors = min(id) per
planted group.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

N_DOCS = 500
N_GROUPS = 50
N_VECS = 500
EMB_DIM = 32


def planted_clone_documents(n: int = N_DOCS, groups: int = N_GROUPS) -> pa.Table:
    """``n`` docs in ``groups`` exact-clone groups (g = i % groups).

    Mirrors the oracle SQL formula exactly:
        'doc ' || g || ' payload ' || repeat('t' || g || 'q ', 25)
    """
    texts = [
        f"doc {i % groups} payload " + (f"t{i % groups}q " * 25) for i in range(n)
    ]
    return pa.table(
        {"doc_id": pa.array(range(n), pa.int64()), "text": pa.array(texts)}
    )


def planted_clone_documents_sql(n: int = N_DOCS, groups: int = N_GROUPS) -> str:
    """The DuckDB CTE constructing the identical corpus."""
    return (
        f"SELECT i AS doc_id, 'doc ' || (i % {groups}) || ' payload ' ||"
        f" repeat('t' || (i % {groups}) || 'q ', 25) AS text"
        f" FROM range({n}) t(i)"
    )


def planted_mutated_documents(
    groups: int = 20, clones_per_group: int = 5, n_tokens: int = 40, seed: int = 3
) -> tuple[pa.Table, list[int]]:
    """Near-duplicate corpus: per group, a base doc plus clones each with
    ONE token mutated (Jaccard ≈ 0.9 ≫ 0.7). Returns (table, expected
    survivor ids = first doc of each group)."""
    rng = np.random.default_rng(seed)
    texts, expected = [], []
    doc_id = 0
    for g in range(groups):
        base = [f"g{g}w{j}x{rng.integers(0, 1000)}" for j in range(n_tokens)]
        expected.append(doc_id)
        for c in range(clones_per_group):
            toks = list(base)
            if c > 0:
                toks[int(rng.integers(0, n_tokens))] = f"mut{g}c{c}"
            texts.append(" ".join(toks))
            doc_id += 1
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
        }
    )
    return t, expected


def planted_embeddings(
    n: int = N_VECS, dim: int = EMB_DIM, seed: int = 9
) -> pa.Table:
    """``n`` unit vectors in clone groups g = floor(sqrt(i)) (uneven group
    sizes 1,3,5,…). Vectors within a group are identical; group
    directions are independent random unit vectors (pairwise cosine
    ~N(0, 1/dim), far below any dedup threshold)."""
    g = np.floor(np.sqrt(np.arange(n))).astype(np.int64)
    n_groups = int(g.max()) + 1
    rng = np.random.default_rng(seed)
    dirs = rng.normal(size=(n_groups, dim))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    emb = dirs[g]
    return pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(emb.reshape(-1), pa.float64()), dim
            ).cast(pa.list_(pa.float64())),
        }
    )


def planted_embeddings_survivors_sql(n: int = N_VECS) -> str:
    """Expected survivors: min(vec_id) per g = floor(sqrt(i)) — i.e. the
    perfect squares below n."""
    return (
        f"SELECT min(i) AS vec_id FROM (SELECT i,"
        f" CAST(floor(sqrt(i)) AS BIGINT) AS g FROM range({n}) t(i))"
        f" GROUP BY g"
    )
