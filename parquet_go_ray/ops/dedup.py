"""Deduplication over ray.data Datasets.

All strategies are expressed as map_batches partials feeding ONE
light-weight groupby shuffle each (never a driver-side row loop):

- exact: 128-bit content hash (2×64-bit independent keys), batch-local
  pre-aggregation, then ``groupby(hash).min(id)`` — the hash-partition +
  per-group-first pattern. The dictionary-as-dedup idea of the
  reference's DictStore (/root/reference/datastore/dict.go:55-83)
  applied table-wide.
- MinHash + LSH: char-shingle → vectorized minhash signatures
  (``np.minimum.reduceat`` over permuted shingle hashes) → banded bucket
  groupby over (band, band_hash, id) ONLY — signatures are NOT shipped
  through the shuffle (≈16 bytes/row/band instead of ~0.5 KB) — then an
  exact second-pass verification that recomputes signatures for just the
  candidate rows.
- SimHash: token-hash bit-vote fingerprints, 4×16-bit band buckets; the
  8-byte fingerprint rides along and all in-bucket pairs are verified by
  a vectorized Hamming matrix.
- Embedding cosine: random-hyperplane LSH buckets over (table, bh, id);
  candidate embeddings are re-read from the source in a projected second
  pass and cosine-verified exactly.

Candidate pairs are rare relative to rows (bounded by bucket
collisions); they are clustered with a fully vectorized hash-to-min
connected-components kernel (numpy, O(log n) rounds — no Python loop
over edges), and the absorbed-id set is broadcast ONCE via ``ray.put``
of a sorted array probed with ``searchsorted`` inside the filter stage.
At 10^12-doc scale the same pair stream feeds the identical kernel per
shard; nothing here re-ships per batch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

_KEY2 = b"fedcba9876543210"
_MERSENNE = np.uint64((1 << 61) - 1)
_GOLDEN = np.uint64(0x9E3779B97F4A7C15)

# Buckets larger than this emit a star (everything → min id) instead of
# all pairs. Small buckets get complete pair coverage (ADVICE r1: the
# anchor-only scheme missed non-anchor near-dup pairs); a large bucket at
# 4 rows/band is either a clone cluster — where the star already connects
# the component and every star edge verifies — or a template collision,
# where downstream exact verification rejects the edges and all-pairs
# would only add O(m²) candidate volume for marginal recall. Documented
# approximation: non-anchor pairs inside LARGE collision buckets that
# share no other (smaller) bucket are not emitted.
_MAX_ALLPAIRS_BUCKET = 32


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
    Returns (flat_hashes, doc_offsets).

    Docs shorter than k contribute exactly one shingle derived from their
    OWN bytes only (effective shingle length = doc length); zero-length
    docs get a fixed sentinel — never bytes read from a neighboring doc.
    """
    lens = np.array([len(t) for t in texts], dtype=np.int64)
    data = (
        np.frombuffer(b"".join(texts), dtype=np.uint8)
        if texts
        else np.empty(0, dtype=np.uint8)
    )
    n = len(data)
    padded = np.concatenate([data, np.zeros(8, dtype=np.uint8)])
    win = np.lib.stride_tricks.sliding_window_view(padded, 8)[: max(n, 1)]
    w8 = win.view(">u8").ravel().astype(np.uint64)
    # positions whose shingle stays inside its doc
    starts = np.concatenate(([0], np.cumsum(lens)))
    n_sh = np.maximum(lens - k + 1, 1)  # short docs contribute 1 shingle
    doc_offsets = np.concatenate(([0], np.cumsum(n_sh)))
    idx = np.arange(int(n_sh.sum()), dtype=np.int64) - np.repeat(
        doc_offsets[:-1], n_sh
    )
    pos = np.repeat(starts[:-1], n_sh) + idx
    # Effective shingle length: k normally, the doc's own length for
    # docs shorter than k (their single shingle must not read past the
    # doc end into a neighbor).
    k_eff = np.minimum(np.repeat(lens, n_sh), k).astype(np.uint64)
    raw = (
        w8[np.minimum(pos, max(0, n - 1))]
        if n
        else np.zeros(len(pos), np.uint64)
    )
    shift = np.minimum(np.uint64(8) * (np.uint64(8) - k_eff), np.uint64(63))
    vals = np.where(k_eff > 0, raw >> shift, np.uint64(0))
    # Mix so short/truncated shingles don't collide with real ones.
    flat = vals * _GOLDEN + k_eff
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


def _band_hashes(sig: np.ndarray, bands: int) -> np.ndarray:
    """(n, bands) uint64 FNV fold of each band's signature slice."""
    nd, num_perm = sig.shape
    rows_per_band = num_perm // bands
    band_hash = np.empty((nd, bands), dtype=np.uint64)
    for bidx in range(bands):
        chunk = sig[:, bidx * rows_per_band : (bidx + 1) * rows_per_band]
        h = np.zeros(nd, dtype=np.uint64)
        for c in range(rows_per_band):
            h = h * np.uint64(1099511628211) + chunk[:, c]
        band_hash[:, bidx] = h
    return band_hash


# The bucket groupby runs over a COARSE partition key pk = hash(band, bh)
# % _N_BUCKET_PARTS rather than (band, bh) itself: same co-location
# guarantee (every row of a bucket shares its pk), but the shuffle
# produces a few dozen groups processed vectorized instead of one Python
# map_groups call per bucket (~rows×bands tiny groups — the per-group
# interpreter overhead dominated round 1's dedup wall time).
_N_BUCKET_PARTS = 64


def _with_pk(band: np.ndarray, bh: np.ndarray) -> np.ndarray:
    return (
        (bh ^ (band.astype(np.uint64) * _GOLDEN)) % np.uint64(_N_BUCKET_PARTS)
    ).astype(np.int32)


def _segment_bounds(band: np.ndarray, bh: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Start/end offsets of each (band, bh) bucket in lexsorted order."""
    new = np.empty(len(band), dtype=bool)
    new[0] = True
    new[1:] = (band[1:] != band[:-1]) | (bh[1:] != bh[:-1])
    starts = np.flatnonzero(new)
    ends = np.append(starts[1:], len(band))
    return starts, ends


def _bucket_pairs_ids(group: pa.Table, id_col: str) -> pa.Table:
    """Candidate pairs from ALL buckets in one pk partition: all pairs
    for small buckets (ADVICE r1: anchor-only verification missed
    non-anchor pairs), a star to the min id for giant buckets. The
    Python loop touches only multi-member buckets — singletons (the vast
    majority) are skipped in bulk."""
    empty = pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
    if group.num_rows < 2:
        return empty
    band = group.column("band").to_numpy(zero_copy_only=False)
    bh = group.column("bh").to_numpy(zero_copy_only=False)
    ids = group.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((ids, bh, band))
    band, bh, ids = band[order], bh[order], ids[order]
    starts, ends = _segment_bounds(band, bh)
    multi = np.flatnonzero(ends - starts >= 2)
    out_a: list[np.ndarray] = []
    out_b: list[np.ndarray] = []
    for si in multi:
        seg = np.unique(ids[starts[si] : ends[si]])
        m = len(seg)
        if m < 2:
            continue
        if m > _MAX_ALLPAIRS_BUCKET:
            out_a.append(np.full(m - 1, seg[0]))
            out_b.append(seg[1:])
        else:
            iu = np.triu_indices(m, k=1)
            out_a.append(seg[iu[0]])
            out_b.append(seg[iu[1]])
    if not out_a:
        return empty
    return pa.table({"a": np.concatenate(out_a), "b": np.concatenate(out_b)})


def _collect_pairs(pairs: ray.data.Dataset) -> tuple[np.ndarray, np.ndarray]:
    """Candidate-pair stream → deduplicated (a, b) numpy arrays.
    Pairs are rare by construction (bucket collisions only)."""
    tabs = ray.get(pairs.to_arrow_refs())
    tabs = [t for t in tabs if t.num_rows]
    if not tabs:
        z = np.empty(0, dtype=np.int64)
        return z, z
    merged = pa.concat_tables(tabs).combine_chunks()
    a = merged.column("a").to_numpy(zero_copy_only=False).astype(np.int64)
    b = merged.column("b").to_numpy(zero_copy_only=False).astype(np.int64)
    ab = np.stack([a, b], axis=1)
    ab = np.unique(ab, axis=0)  # same pair from multiple bands
    return ab[:, 0], ab[:, 1]


def _fetch_candidate_rows(
    ds: ray.data.Dataset,
    cand_ids: np.ndarray,
    id_col: str,
    columns: list[str],
    transform=None,
) -> pa.Table:
    """Project + filter the source down to candidate rows only, applying
    ``transform`` (e.g. distributed signature recompute) to each filtered
    batch before collecting. The sorted id array is ray.put ONCE and
    probed via searchsorted in every batch (never re-shipped per task)."""
    ref = ray.put(np.sort(cand_ids))

    def keep(batch: pa.Table) -> pa.Table:
        arr = ray.get(ref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        if len(arr) == 0:
            out = batch.slice(0, 0).select(columns)
        else:
            pos = np.minimum(np.searchsorted(arr, ids), len(arr) - 1)
            mask = arr[pos] == ids
            out = batch.filter(pa.array(mask)).select(columns)
        return transform(out) if transform is not None else out

    out = ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)
    tabs = [t for t in ray.get(out.to_arrow_refs()) if t.num_rows]
    if not tabs:
        empty = pa.table({c: [] for c in columns})
        return transform(empty) if transform is not None else empty
    return pa.concat_tables(tabs).combine_chunks()


def connected_components_absorbed(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Ids absorbed into a lower-id cluster root, from an edge list.

    Vectorized hash-to-min label propagation with pointer jumping —
    O(E) work per round, O(log n) rounds, no Python loop over edges
    (the round-1 driver union-find iterated pairs row by row). The same
    kernel runs per shard on huge pair streams; only the edge arrays
    need to fit in memory, never the corpus.
    """
    if len(a) == 0:
        return np.empty(0, dtype=np.int64)
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    ea, eb = inv[: len(a)], inv[len(a) :]
    label = np.arange(len(nodes), dtype=np.int64)
    while True:
        edge_min = np.minimum(label[ea], label[eb])
        new = label.copy()
        np.minimum.at(new, ea, edge_min)
        np.minimum.at(new, eb, edge_min)
        new = new[new]  # pointer jumping halves tree depth
        new = new[new]
        if np.array_equal(new, label):
            break
        label = new
    roots = nodes[label]
    return nodes[roots != nodes].astype(np.int64)


def _filter_absorbed(
    ds: ray.data.Dataset, absorbed: np.ndarray, id_col: str
) -> ray.data.Dataset:
    """Survivors = rows whose id is not absorbed. The sorted absorbed
    array lives in the object store once (ray.put) and every batch
    probes it with searchsorted — O(log n) per row, no per-task
    re-serialization of a Python set (round-1 closure anti-pattern)."""
    ref = ray.put(np.sort(absorbed.astype(np.int64)))

    def keep(batch: pa.Table) -> pa.Table:
        arr = ray.get(ref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        if len(arr) == 0:
            return pa.table({id_col: ids})
        pos = np.minimum(np.searchsorted(arr, ids), len(arr) - 1)
        mask = arr[pos] != ids
        return pa.table({id_col: ids[mask]})

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def dedup_minhash(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    k: int = 5,
    threshold: float = 0.7,
    verify: str = "sig",
) -> ray.data.Dataset:
    """Near-duplicate removal: keep one representative (min id) per
    near-dup cluster at (estimated or exact) Jaccard ≥ threshold.

    Shuffle ships (band, bh, id) only — 20 bytes/row/band. Candidates
    are verified in a second projected pass over just the candidate
    rows: ``verify="sig"`` recomputes minhash signatures in-cluster and
    thresholds their agreement (the estimate); ``verify="jaccard"``
    compares EXACT k-shingle Jaccard on the candidate texts — the
    n-gram-Jaccard dedup flavor, with LSH as the candidate generator.
    """
    if verify not in ("sig", "jaccard"):
        raise ValueError(f"unknown verify mode {verify!r}")

    def sig_rows(batch: pa.Table) -> pa.Table:
        texts = [
            t.encode() if isinstance(t, str) else (t or b"")
            for t in batch.column(text_col).to_pylist()
        ]
        sig = minhash_signatures(texts, num_perm=num_perm, k=k)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "sig": pa.FixedSizeListArray.from_arrays(
                    pa.array(sig.reshape(-1), pa.uint64()), num_perm
                ),
            }
        )

    def _sig_matrix(tab: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        ids = tab.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        sig = (
            tab.column("sig")
            .combine_chunks()
            .flatten()
            .to_numpy(zero_copy_only=False)
            .reshape(len(ids), num_perm)
        )
        return ids, sig

    # Signatures are computed ONCE and materialized as a compact
    # (id, 512B sig) dataset — ~1/3 the size of typical document text.
    # Banding, candidate verification and the survivor filter all derive
    # from it, so the source corpus is scanned exactly once and no
    # signature is ever recomputed. (The object store spills the sig
    # dataset at scale; it never rides a shuffle.)
    sig_ds = ds.map_batches(
        sig_rows, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    def band_rows(batch: pa.Table) -> pa.Table:
        ids, sig = _sig_matrix(batch)
        bh = _band_hashes(sig, bands)
        band = np.repeat(np.arange(bands, dtype=np.int32), len(ids))
        bh_flat = bh.T.reshape(-1)
        return pa.table(
            {
                "pk": _with_pk(band, bh_flat),
                "band": band,
                "bh": bh_flat,
                id_col: np.tile(ids, bands),
            }
        )

    pairs = (
        sig_ds.map_batches(band_rows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("pk")
        .map_groups(_bucket_pairs_ids, fn_kwargs={"id_col": id_col}, batch_format="pyarrow")
    )
    a, b = _collect_pairs(pairs)
    if len(a) and verify == "jaccard":
        cand_ids = np.unique(np.concatenate([a, b]))
        cand = _fetch_candidate_rows(ds, cand_ids, id_col, [id_col, text_col])
        ids = cand.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        texts = [
            t.encode() if isinstance(t, str) else (t or b"")
            for t in cand.column(text_col).to_pylist()
        ]
        order = np.argsort(ids)
        ids_sorted = ids[order]
        texts_sorted = [texts[i] for i in order]
        ia = np.searchsorted(ids_sorted, a)
        ib = np.searchsorted(ids_sorted, b)
        # Exact verification only runs on the (rare) candidate pairs.
        ok = np.fromiter(
            (
                ngram_jaccard(texts_sorted[i], texts_sorted[j], k) >= threshold
                for i, j in zip(ia, ib)
            ),
            dtype=bool,
            count=len(ia),
        )
        a, b = a[ok], b[ok]
    elif len(a):
        cand_ids = np.unique(np.concatenate([a, b]))
        cand = _fetch_candidate_rows(sig_ds, cand_ids, id_col, [id_col, "sig"])
        ids, sig = _sig_matrix(cand)
        order = np.argsort(ids)
        ids_sorted, sig_sorted = ids[order], sig[order]
        ia = np.searchsorted(ids_sorted, a)
        ib = np.searchsorted(ids_sorted, b)
        est = (sig_sorted[ia] == sig_sorted[ib]).mean(axis=1)
        ok = est >= threshold
        a, b = a[ok], b[ok]
    absorbed = connected_components_absorbed(a, b)
    return _filter_absorbed(sig_ds, absorbed, id_col)


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


def _hamming_matrix(sh: np.ndarray) -> np.ndarray:
    """(m, m) pairwise Hamming distances over uint64 fingerprints."""
    x = sh[:, None] ^ sh[None, :]
    dist = np.zeros(x.shape, dtype=np.int64)
    for _ in range(64):
        dist += (x & np.uint64(1)).astype(np.int64)
        x >>= np.uint64(1)
    return dist


def dedup_simhash(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> ray.data.Dataset:
    """Near-dup removal at Hamming distance ≤ max_hamming over SimHash64.

    Band on 4×16-bit chunks: any pair within distance 3 shares at least
    one exact chunk (pigeonhole), so bucket-groupby finds all candidates.
    The 8-byte fingerprint rides through the shuffle and ALL in-bucket
    pairs are verified with a vectorized Hamming matrix (buckets are
    small; giant buckets fall back to a star around the min id, whose
    members are near-identical by construction).
    """

    def band_rows(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        sh = simhash64(texts)
        band = np.repeat(np.arange(4, dtype=np.int32), len(ids))
        chunks = np.concatenate(
            [(sh >> np.uint64(16 * c)) & np.uint64(0xFFFF) for c in range(4)]
        )
        return pa.table(
            {
                "pk": _with_pk(band, chunks),
                "band": band,
                "bh": chunks,
                id_col: np.tile(ids, 4),
                "sh": np.tile(sh, 4),
            }
        )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        """Pairs from every bucket in one pk partition, Hamming-verified
        in place (simhash has no second verification pass)."""
        empty = pa.table(
            {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
        )
        if group.num_rows < 2:
            return empty
        band = group.column("band").to_numpy(zero_copy_only=False)
        bh = group.column("bh").to_numpy(zero_copy_only=False)
        ids = group.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        sh = group.column("sh").to_numpy(zero_copy_only=False).astype(np.uint64)
        order = np.lexsort((ids, bh, band))
        band, bh, ids, sh = band[order], bh[order], ids[order], sh[order]
        starts, ends = _segment_bounds(band, bh)
        multi = np.flatnonzero(ends - starts >= 2)
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        for si in multi:
            s, e = starts[si], ends[si]
            seg_ids, first = np.unique(ids[s:e], return_index=True)
            seg_sh = sh[s:e][first]
            m = len(seg_ids)
            if m < 2:
                continue
            if m > _MAX_ALLPAIRS_BUCKET:
                # Star fallback still Hamming-checks vs the anchor.
                x = seg_sh ^ seg_sh[0]
                dist = np.zeros(m, dtype=np.int64)
                for _ in range(64):
                    dist += (x & np.uint64(1)).astype(np.int64)
                    x >>= np.uint64(1)
                keep = (dist <= max_hamming) & (np.arange(m) != 0)
                out_a.append(np.full(int(keep.sum()), seg_ids[0]))
                out_b.append(seg_ids[keep])
            else:
                dist = _hamming_matrix(seg_sh)
                iu = np.triu_indices(m, k=1)
                ok = dist[iu] <= max_hamming
                out_a.append(seg_ids[iu[0]][ok])
                out_b.append(seg_ids[iu[1]][ok])
        if not out_a:
            return empty
        return pa.table({"a": np.concatenate(out_a), "b": np.concatenate(out_b)})

    pairs = (
        ds.map_batches(band_rows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("pk")
        .map_groups(bucket_pairs, batch_format="pyarrow")
    )
    a, b = _collect_pairs(pairs)
    absorbed = connected_components_absorbed(a, b)
    return _filter_absorbed(ds, absorbed, id_col)


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
    The shuffle ships (table, bh, id) only — candidate embeddings are
    re-read from the source in a projected second pass and all candidate
    pairs are cosine-verified exactly; clusters collapse to the min id.
    """
    from .ann import _emb_matrix, _normalize

    def band_rows(batch: pa.Table) -> pa.Table:
        emb = _normalize(_emb_matrix(batch, emb_col))
        n, d = emb.shape
        rng = np.random.default_rng(seed)  # same planes in every batch
        planes = rng.normal(size=(n_tables, d, n_planes))
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        out_band, out_bh, out_id = [], [], []
        for t in range(n_tables):
            signs = (emb @ planes[t]) > 0  # (n, planes)
            bh = np.zeros(n, dtype=np.uint64)
            for j in range(n_planes):
                bh |= signs[:, j].astype(np.uint64) << np.uint64(j)
            out_band.append(np.full(n, t, dtype=np.int32))
            out_bh.append(bh)
            out_id.append(ids)
        band = np.concatenate(out_band)
        bh = np.concatenate(out_bh)
        return pa.table(
            {
                "pk": _with_pk(band, bh),
                "band": band,
                "bh": bh,
                id_col: np.concatenate(out_id),
            }
        )

    pairs = (
        ds.map_batches(band_rows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("pk")
        .map_groups(_bucket_pairs_ids, fn_kwargs={"id_col": id_col}, batch_format="pyarrow")
    )
    a, b = _collect_pairs(pairs)
    if len(a):
        cand_ids = np.unique(np.concatenate([a, b]))
        cand = _fetch_candidate_rows(ds, cand_ids, id_col, [id_col, emb_col])
        emb = _normalize(_emb_matrix(cand, emb_col))
        ids = cand.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ids)
        ids_sorted, emb_sorted = ids[order], emb[order]
        ia = np.searchsorted(ids_sorted, a)
        ib = np.searchsorted(ids_sorted, b)
        cos = np.einsum("ij,ij->i", emb_sorted[ia], emb_sorted[ib])
        ok = cos >= threshold
        a, b = a[ok], b[ok]
    absorbed = connected_components_absorbed(a, b)
    return _filter_absorbed(ds, absorbed, id_col)


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
