"""Hypothesis property tests for pack_sequences / chunk_documents —
full differential against scalar replays of the documented contracts
(bucket routing included), on top of the example-based tests in
test_mixing.py."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

MAX = 15


def _bucket_of(ids, num_buckets):
    from parquet_go_ray.ops.bucketing import col_hash64

    return (
        col_hash64(pa.array(ids, pa.int64()))
        % np.uint64(num_buckets)
    ).astype(np.int64)


def _scalar_pack(ids, ntoks, max_tokens, num_buckets):
    """Greedy-sequential per hash bucket, id order — the contract."""
    rk = _bucket_of(ids, num_buckets)
    packs = []
    for b in sorted(set(rk)):
        rows = sorted(
            (i for i, r in zip(ids, rk) if r == b)
        )
        toks = {i: ntoks[ids.index(i)] for i in rows}
        cur, tot = [], 0
        for i in rows:
            if cur and tot + toks[i] > max_tokens:
                packs.append((tuple(cur), tot))
                cur, tot = [], 0
            cur.append(i)
            tot += toks[i]
            if tot > max_tokens:  # oversize singleton closes at once
                packs.append((tuple(cur), tot))
                cur, tot = [], 0
        if cur:
            packs.append((tuple(cur), tot))
    return sorted(packs)


@settings(max_examples=MAX, deadline=None)
@given(
    st.lists(st.integers(1, 60), min_size=1, max_size=60),
    st.integers(4, 80),
)
def test_pack_matches_scalar_greedy(ray_session, ntoks, max_tokens):
    import ray

    from parquet_go_ray.ops.mixing import pack_sequences

    ids = list(range(len(ntoks)))
    t = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array([" ".join(["w"] * k) for k in ntoks]),
    })
    out = pack_sequences(
        ray.data.from_arrow(t).repartition(2), max_tokens=max_tokens,
        num_buckets=4,
    ).to_pandas()
    got = sorted(
        (tuple(i), int(tok))
        for i, tok in zip(out["doc_ids"], out["n_tokens"])
    )
    assert got == _scalar_pack(ids, ntoks, max_tokens, 4)
    over = out["n_tokens"] > max_tokens
    assert (out["oversize"] == over).all()
    assert (out.loc[over, "n_docs"] == 1).all()


@settings(max_examples=MAX, deadline=None)
@given(
    st.lists(
        st.lists(
            st.sampled_from(["a", "bb", "ccc", ""]),
            min_size=0, max_size=50,
        ),
        min_size=1, max_size=20,
    ),
    st.integers(2, 12),
    st.integers(0, 6),
)
def test_chunk_matches_scalar(ray_session, docs, max_tokens, overlap):
    import ray

    from parquet_go_ray.ops.mixing import chunk_documents

    if overlap >= max_tokens:
        overlap = max_tokens - 1
    texts = [" ".join(d) for d in docs]
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
    })
    out = chunk_documents(
        ray.data.from_arrow(t).repartition(2),
        max_tokens=max_tokens, overlap=overlap,
    ).to_pandas()
    step = max_tokens - overlap
    for i, text in enumerate(texts):
        toks = text.split(" ")
        exp, j = [], 0
        while True:
            exp.append(" ".join(toks[j : j + max_tokens]))
            if j + max_tokens >= len(toks):
                break
            j += step
        g = out[out.doc_id == i].sort_values("chunk_idx")
        assert g["text"].tolist() == exp, (i, text)
