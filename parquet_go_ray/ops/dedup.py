"""Deduplication over ray.data Datasets.

Three scale-out strategies, all expressed as map_batches partials feeding
ONE groupby shuffle each (never a driver-side row loop):

- exact: 128-bit content hash (2×64-bit SipHash, independent keys),
  batch-local pre-aggregation, then ``groupby(hash).min(id)`` — the
  hash-partition + per-group-first pattern. The dictionary-as-dedup idea
  of the reference's DictStore (/root/reference/datastore/dict.go:55-83)
  applied table-wide.
- MinHash + LSH: char-shingle → vectorized minhash signatures
  (``np.minimum.reduceat`` over permuted shingle hashes) → banded bucket
  groupby → in-bucket signature-agreement verification.
- SimHash: token-hash bit-vote fingerprints, 4×16-bit band buckets,
  in-bucket Hamming verification.

Candidate pairs are clustered with a driver-side union-find — pairs are
rare relative to rows. At 10^12-doc scale the same pair stream feeds an
iterative star-contraction connected-components job instead; the bucket
and verify stages are unchanged.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

_KEY2 = b"fedcba9876543210"
_MERSENNE = np.uint64((1 << 61) - 1)


def _hash128(texts: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    h1 = pd.util.hash_array(texts, categorize=False)
    h2 = pd.util.hash_array(texts, hash_key=_KEY2.decode(), categorize=False)
    return h1, h2


def dedup_exact(
    ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Keep the minimum ``id_col`` per distinct ``text_col`` value.

    Batch-local combine first (cheap dedup before the shuffle), then one
    groupby over the 128-bit hash.
    """

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_numpy(zero_copy_only=False)
        h1, h2 = _hash128(texts)
        df = pd.DataFrame(
            {
                "h1": h1,
                "h2": h2,
                id_col: batch.column(id_col).to_numpy(zero_copy_only=False),
            }
        )
        local = df.groupby(["h1", "h2"], as_index=False)[id_col].min()
        return pa.Table.from_pandas(local, preserve_index=False)

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["h1", "h2"])
        .min(id_col)
    )

    def project(batch: pa.Table) -> pa.Table:
        col = batch.column(f"min({id_col})")
        return pa.table({id_col: col})

    return agg.map_batches(project, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# MinHash + LSH


def _char_shingle_hashes(texts: list[bytes], k: int) -> tuple[np.ndarray, np.ndarray]:
    """All k-byte shingle hashes per doc (k ≤ 8 → one uint64 window pass).
    Returns (flat_hashes, doc_offsets)."""
    lens = np.array([len(t) for t in texts], dtype=np.int64)
    data = (
        np.frombuffer(b"".join(texts), dtype=np.uint8)
        if texts
        else np.empty(0, dtype=np.uint8)
    )
    n = len(data)
    padded = np.concatenate([data, np.zeros(8, dtype=np.uint8)])
    win = np.lib.stride_tricks.sliding_window_view(padded, 8)[:n]
    w8 = win.view(">u8").ravel().astype(np.uint64) >> np.uint64(8 * (8 - k))
    # positions whose shingle stays inside its doc
    starts = np.concatenate(([0], np.cumsum(lens)))
    n_sh = np.maximum(lens - k + 1, 1)  # short docs contribute 1 (padded) shingle
    doc_offsets = np.concatenate(([0], np.cumsum(n_sh)))
    idx = np.arange(int(n_sh.sum()), dtype=np.int64) - np.repeat(
        doc_offsets[:-1], n_sh
    )
    pos = np.repeat(starts[:-1], n_sh) + idx
    flat = w8[np.minimum(pos, max(0, n - 1))] if n else np.zeros(len(pos), np.uint64)
    # Mix so short/truncated shingles don't collide with real ones.
    flat = flat * np.uint64(0x9E3779B97F4A7C15) + np.uint64(k)
    return flat, doc_offsets


def minhash_signatures(
    texts: list[bytes], num_perm: int = 64, k: int = 5, seed: int = 1
) -> np.ndarray:
    """(n_docs, num_perm) uint64 minhash signature matrix, vectorized."""
    flat, doc_offsets = _char_shingle_hashes(texts, k)
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 1 << 61, num_perm, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, 1 << 61, num_perm, dtype=np.uint64)
    n_docs = len(doc_offsets) - 1
    sig = np.empty((n_docs, num_perm), dtype=np.uint64)
    starts = doc_offsets[:-1]
    for p in range(num_perm):
        perm = (flat * a[p] + b[p]) & _MERSENNE
        sig[:, p] = np.minimum.reduceat(perm, starts) if len(perm) else 0
    return sig


def dedup_minhash(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    k: int = 5,
    threshold: float = 0.7,
) -> ray.data.Dataset:
    """Near-duplicate removal: keep one representative (min id) per
    near-dup cluster at estimated Jaccard ≥ threshold."""
    rows_per_band = num_perm // bands

    def band_rows(batch: pa.Table) -> pa.Table:
        texts = [
            t.encode() if isinstance(t, str) else t
            for t in batch.column(text_col).to_pylist()
        ]
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        sig = minhash_signatures(texts, num_perm=num_perm, k=k)
        nd = len(ids)
        band_hash = np.empty((nd, bands), dtype=np.uint64)
        for bidx in range(bands):
            chunk = sig[:, bidx * rows_per_band : (bidx + 1) * rows_per_band]
            h = np.zeros(nd, dtype=np.uint64)
            for c in range(rows_per_band):
                h = h * np.uint64(1099511628211) + chunk[:, c]
            band_hash[:, bidx] = h
        out = {
            "band": np.repeat(np.arange(bands, dtype=np.int32), nd),
            "bh": band_hash.T.reshape(-1),
            id_col: np.tile(ids, bands),
            "sig": pa.FixedSizeListArray.from_arrays(
                pa.array(np.tile(sig, (bands, 1)).reshape(-1), pa.uint64()), num_perm
            ),
        }
        return pa.table(out)

    def bucket_pairs(group: pa.Table) -> pa.Table:
        nd = group.num_rows
        if nd < 2:
            return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        sig = np.stack(group.column("sig").to_numpy(zero_copy_only=False))
        anchor = int(np.argmin(ids))
        est = (sig == sig[anchor]).mean(axis=1)
        keep = (est >= threshold) & (np.arange(nd) != anchor)
        return pa.table(
            {
                "a": np.full(int(keep.sum()), ids[anchor], dtype=np.int64),
                "b": ids[keep].astype(np.int64),
            }
        )

    pairs = (
        ds.map_batches(band_rows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["band", "bh"])
        .map_groups(bucket_pairs, batch_format="pyarrow")
    )
    return _survivors_from_pairs(ds, pairs, id_col)


# ---------------------------------------------------------------------------
# SimHash


def simhash64(texts: list[str]) -> np.ndarray:
    """64-bit SimHash over whitespace tokens, vectorized bit-voting."""
    token_lists = [t.split() for t in texts]
    counts = np.array([max(1, len(t)) for t in token_lists], dtype=np.int64)
    flat = np.array(
        [tok for toks in token_lists for tok in (toks or [""])], dtype=object
    )
    h = pd.util.hash_array(flat, categorize=False)
    starts = np.concatenate(([0], np.cumsum(counts)))[:-1]
    n_docs = len(texts)
    out = np.zeros(n_docs, dtype=np.uint64)
    for bit in range(64):
        votes = (((h >> np.uint64(bit)) & np.uint64(1)).astype(np.int64) * 2) - 1
        tally = np.add.reduceat(votes, starts) if len(votes) else np.zeros(n_docs)
        out |= (tally > 0).astype(np.uint64) << np.uint64(bit)
    return out


def dedup_simhash(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> ray.data.Dataset:
    """Near-dup removal at Hamming distance ≤ max_hamming over SimHash64.

    Band on 4×16-bit chunks: any pair within distance 3 shares at least
    one exact chunk (pigeonhole), so bucket-groupby finds all candidates.
    """

    def band_rows(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        sh = simhash64(texts)
        nd = len(ids)
        out_band = np.repeat(np.arange(4, dtype=np.int32), nd)
        chunks = np.concatenate(
            [(sh >> np.uint64(16 * c)) & np.uint64(0xFFFF) for c in range(4)]
        )
        return pa.table(
            {
                "band": out_band,
                "bh": chunks,
                id_col: np.tile(ids, 4),
                "sh": np.tile(sh, 4),
            }
        )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        nd = group.num_rows
        if nd < 2:
            return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        sh = group.column("sh").to_numpy(zero_copy_only=False).astype(np.uint64)
        anchor = int(np.argmin(ids))
        x = sh ^ sh[anchor]
        dist = np.zeros(nd, dtype=np.int64)
        for _ in range(64):
            dist += (x & np.uint64(1)).astype(np.int64)
            x >>= np.uint64(1)
        keep = (dist <= max_hamming) & (np.arange(nd) != anchor)
        return pa.table(
            {
                "a": np.full(int(keep.sum()), ids[anchor], dtype=np.int64),
                "b": ids[keep].astype(np.int64),
            }
        )

    pairs = (
        ds.map_batches(band_rows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["band", "bh"])
        .map_groups(bucket_pairs, batch_format="pyarrow")
    )
    return _survivors_from_pairs(ds, pairs, id_col)


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup (random-hyperplane LSH + exact verify)


def dedup_embedding(
    ds: ray.data.Dataset,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 16,
    n_tables: int = 4,
    seed: int = 0,
) -> ray.data.Dataset:
    """Near-duplicate removal over an embedding column.

    Random-hyperplane LSH: sign pattern of ``n_planes`` projections is
    the bucket key; ``n_tables`` independent tables keep recall high.
    Candidates sharing a bucket are cosine-verified exactly against the
    bucket's min-id anchor; clusters collapse to the min id. Same
    band→bucket→verify shape as MinHash, one groupby shuffle.
    """
    from .ann import _emb_matrix, _normalize

    def band_rows(batch: pa.Table) -> pa.Table:
        emb = _normalize(_emb_matrix(batch, emb_col))
        n, d = emb.shape
        rng = np.random.default_rng(seed)  # same planes in every batch
        planes = rng.normal(size=(n_tables, d, n_planes))
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        out_band, out_bh, out_id, out_emb = [], [], [], []
        for t in range(n_tables):
            signs = (emb @ planes[t]) > 0  # (n, planes)
            bh = np.zeros(n, dtype=np.uint64)
            for j in range(n_planes):
                bh |= signs[:, j].astype(np.uint64) << np.uint64(j)
            out_band.append(np.full(n, t, dtype=np.int32))
            out_bh.append(bh)
            out_id.append(ids)
            out_emb.append(emb)
        return pa.table(
            {
                "band": np.concatenate(out_band),
                "bh": np.concatenate(out_bh),
                id_col: np.concatenate(out_id),
                "emb": pa.FixedSizeListArray.from_arrays(
                    pa.array(np.concatenate(out_emb).reshape(-1), pa.float64()),
                    emb.shape[1],
                ),
            }
        )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        nd = group.num_rows
        empty = pa.table(
            {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
        )
        if nd < 2:
            return empty
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        emb = np.stack(group.column("emb").to_numpy(zero_copy_only=False))
        anchor = int(np.argmin(ids))
        cos = emb @ emb[anchor]
        keep = (cos >= threshold) & (np.arange(nd) != anchor)
        return pa.table(
            {
                "a": np.full(int(keep.sum()), ids[anchor], dtype=np.int64),
                "b": ids[keep].astype(np.int64),
            }
        )

    pairs = (
        ds.map_batches(band_rows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["band", "bh"])
        .map_groups(bucket_pairs, batch_format="pyarrow")
    )
    return _survivors_from_pairs(ds, pairs, id_col)


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard (the verification kernel for near-dup candidates)


def ngram_jaccard(a: str | bytes, b: str | bytes, k: int = 5) -> float:
    """Exact Jaccard similarity of k-byte shingle sets."""
    if isinstance(a, str):
        a = a.encode()
    if isinstance(b, str):
        b = b.encode()
    sa = {a[i : i + k] for i in range(max(1, len(a) - k + 1))}
    sb = {b[i : i + k] for i in range(max(1, len(b) - k + 1))}
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


# ---------------------------------------------------------------------------


def _survivors_from_pairs(
    ds: ray.data.Dataset, pairs: ray.data.Dataset, id_col: str
) -> ray.data.Dataset:
    """Union-find over the (small) candidate-pair stream; survivors =
    every id that is not absorbed into a lower-id cluster root."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for row in pairs.iter_rows():
        ra, rb = find(int(row["a"])), find(int(row["b"]))
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo

    absorbed = {x for x in parent if find(x) != x}

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        mask = ~np.isin(ids, list(absorbed)) if absorbed else np.ones(len(ids), bool)
        return pa.table({id_col: ids[mask].astype(np.int64)})

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)
