"""Planted-duplicate dedup tests: provable ground truth for the near-dup
pipelines (VERDICT r1 item 4), scale-path regressions (large absorbed
sets, bucket all-pairs), and the empty/short-doc shingle fix."""

import numpy as np
import pyarrow as pa
import pytest

from parquet_go_ray.ops.dedup import (
    _bucket_pairs_ids,
    connected_components_absorbed,
    minhash_signatures,
)
from parquet_go_ray.sources.planted import (
    planted_clone_documents,
    planted_embeddings,
    planted_mutated_documents,
)


def _ids(ds):
    col = "doc_id" if "doc_id" in ds.schema().names else "vec_id"
    return sorted(r[col] for r in ds.iter_rows())


def test_connected_components_absorbed():
    a = np.array([2, 1, 10, 5], dtype=np.int64)
    b = np.array([3, 2, 11, 5], dtype=np.int64)
    assert sorted(connected_components_absorbed(a, b)) == [2, 3, 11]
    assert len(connected_components_absorbed(np.empty(0, np.int64), np.empty(0, np.int64))) == 0


def test_connected_components_matches_union_find():
    rng = np.random.default_rng(7)
    n, e = 300, 600
    ea = rng.integers(0, n, e).astype(np.int64)
    eb = rng.integers(0, n, e).astype(np.int64)
    got = set(connected_components_absorbed(ea, eb))
    parent: dict[int, int] = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for x, y in zip(ea, eb):
        rx, ry = find(int(x)), find(int(y))
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)
    exp = {x for x in set(ea.tolist()) | set(eb.tolist()) if find(int(x)) != int(x)}
    assert got == exp


def test_bucket_emits_all_pairs_not_just_anchor():
    """ADVICE r1: a bucket {unrelated low id, dup A, dup B} must emit the
    (A, B) pair, not only anchor pairs."""
    group = pa.table(
        {"band": [0, 0, 0], "bh": [7, 7, 7], "doc_id": pa.array([0, 5, 6], pa.int64())}
    )
    pairs = _bucket_pairs_ids(group, "doc_id")
    got = set(zip(pairs.column("a").to_pylist(), pairs.column("b").to_pylist()))
    assert got == {(0, 5), (0, 6), (5, 6)}


def test_bucket_giant_falls_back_to_star():
    ids = pa.array(range(1000), pa.int64())
    group = pa.table({"band": [0] * 1000, "bh": [1] * 1000, "doc_id": ids})
    pairs = _bucket_pairs_ids(group, "doc_id")
    assert pairs.num_rows == 999
    assert set(pairs.column("a").to_pylist()) == {0}


def test_short_doc_shingles_neighbor_independent():
    """Zero/short docs must not read bytes from the adjacent doc
    (ADVICE r1): signature depends only on own content."""
    s1 = minhash_signatures([b"", b"hello world document text"])
    s2 = minhash_signatures([b"", b"completely different stuff"])
    assert (s1[0] == s2[0]).all()
    s3 = minhash_signatures([b"ab", b"xxxxxxxxxxxx"])
    s4 = minhash_signatures([b"ab", b"yyyyyyyyyyyy"])
    assert (s3[0] == s4[0]).all()
    assert not (s3[0] == s1[0]).all()  # 'ab' differs from empty


class TestPlanted:
    def test_minhash_exact_clones(self, ray_session):
        import ray

        from parquet_go_ray.ops.dedup import dedup_minhash

        ds = ray.data.from_arrow(planted_clone_documents(300, 30))
        assert _ids(dedup_minhash(ds, threshold=0.7)) == list(range(30))

    def test_minhash_mutated_near_dups(self, ray_session):
        """Near-dups at Jaccard ≈ 0.9 collapse to the group's first doc;
        recall and precision both exact on the planted structure."""
        import ray

        from parquet_go_ray.ops.dedup import dedup_minhash

        t, expected = planted_mutated_documents(groups=20, clones_per_group=5)
        ds = ray.data.from_arrow(t)
        assert _ids(dedup_minhash(ds, threshold=0.6)) == expected

    def test_simhash_exact_clones(self, ray_session):
        import ray

        from parquet_go_ray.ops.dedup import dedup_simhash

        ds = ray.data.from_arrow(planted_clone_documents(300, 30))
        assert _ids(dedup_simhash(ds, max_hamming=3)) == list(range(30))

    def test_embedding_clone_groups(self, ray_session):
        import ray

        from parquet_go_ray.ops.dedup import dedup_embedding

        ds = ray.data.from_arrow(planted_embeddings(400))
        expected = [g * g for g in range(20)]  # min id per sqrt group
        assert _ids(dedup_embedding(ds, threshold=0.95)) == expected

    def test_high_duplication_corpus(self, ray_session):
        """90%-duplicate corpus (VERDICT r1 item 3): the absorbed set is
        O(rows) and must flow through the ray.put + searchsorted filter,
        not a per-task closure."""
        import ray

        from parquet_go_ray.ops.dedup import dedup_minhash

        # 1000 docs in 10 clone groups of 100 → 990 absorbed.
        ds = ray.data.from_arrow(planted_clone_documents(1000, 10)).repartition(8)
        ids = _ids(dedup_minhash(ds, threshold=0.7))
        assert ids == list(range(10))


def test_minhash_jaccard_exact_verify(ray_session):
    """verify='jaccard': exact shingle-set verification accepts clones
    and rejects sub-threshold bucket collisions."""
    import ray

    from parquet_go_ray.ops.dedup import dedup_minhash

    ds = ray.data.from_arrow(planted_clone_documents(200, 20))
    assert _ids(dedup_minhash(ds, threshold=0.7, verify="jaccard")) == list(range(20))
    t, expected = planted_mutated_documents(groups=10, clones_per_group=4)
    ds2 = ray.data.from_arrow(t)
    assert _ids(dedup_minhash(ds2, threshold=0.6, verify="jaccard")) == expected


def test_band_rows_ship_no_signatures(ray_session):
    """VERDICT r1 item 2 done-criterion: the minhash shuffle carries
    (pk, band, bh, id) only — ~28 bytes/band-row — never the 512-byte
    signature (r1 shipped ~532 B/band-row)."""
    import ray

    from parquet_go_ray.ops import dedup as dd

    t = planted_clone_documents(200, 20)
    texts = [x.encode() for x in t.column("text").to_pylist()]
    sig = dd.minhash_signatures(texts, num_perm=64, k=5)
    bh = dd._band_hashes(sig, 16)
    band = np.repeat(np.arange(16, dtype=np.int32), len(texts))
    bh_flat = bh.T.reshape(-1)
    shuffled = pa.table(
        {
            "pk": dd._with_pk(band, bh_flat),
            "band": band,
            "bh": bh_flat,
            "doc_id": np.tile(np.arange(len(texts)), 16),
        }
    )
    per_band_row = shuffled.nbytes / shuffled.num_rows
    assert per_band_row <= 32, per_band_row  # 4+4+8+8 payload + padding


class TestDistributed:
    """The sharded verify/CC path (VERDICT r2 #2): identical results to
    the driver path, with NO driver-side pair/text collection."""

    def _no_driver_collect(self, monkeypatch):
        import parquet_go_ray.ops.dedup as dd

        def boom(*a, **k):
            raise AssertionError(
                "driver-side candidate collection used on the distributed path"
            )

        monkeypatch.setattr(dd, "_collect_pairs", boom)
        monkeypatch.setattr(dd, "_fetch_candidate_rows", boom)

    def test_minhash_distributed_matches(self, ray_session, monkeypatch):
        import ray

        from parquet_go_ray.ops.dedup import dedup_minhash

        t, expected = planted_mutated_documents(groups=20, clones_per_group=5)
        ds = ray.data.from_arrow(t)
        self._no_driver_collect(monkeypatch)
        assert _ids(dedup_minhash(ds, threshold=0.6, distributed=True)) == expected

    def test_jaccard_distributed_matches(self, ray_session, monkeypatch):
        import ray

        from parquet_go_ray.ops.dedup import dedup_minhash

        ds = ray.data.from_arrow(planted_clone_documents(300, 30))
        self._no_driver_collect(monkeypatch)
        got = _ids(
            dedup_minhash(ds, threshold=0.7, verify="jaccard", distributed=True)
        )
        assert got == list(range(30))

    def test_embedding_distributed_matches(self, ray_session, monkeypatch):
        import ray

        from parquet_go_ray.ops.dedup import dedup_embedding

        ds = ray.data.from_arrow(planted_embeddings(400))
        self._no_driver_collect(monkeypatch)
        got = _ids(dedup_embedding(ds, threshold=0.95, distributed=True))
        assert got == [g * g for g in range(20)]

    def test_high_duplication_no_driver_texts(self, ray_session, monkeypatch):
        """50%-duplicate 100k-doc corpus (VERDICT r2 #2 done-criterion):
        candidates are O(dup rows); the distributed path must verify and
        cluster them without _collect_pairs/_fetch_candidate_rows, and
        the survivor set must still be exact.

        Group tokens are hash-derived (not decimal group numbers):
        ``planted_clone_documents`` texts for adjacent group numbers share
        digit-prefix shingles, and at 50k groups some cross-group pairs are
        GENUINE near-dups (exact 5-gram Jaccard('...t999q...', '...t9999q...')
        = 0.76 ≥ 0.7), which breaks the closed-form ground truth."""
        import hashlib

        import ray

        from parquet_go_ray.ops.dedup import dedup_minhash

        n, groups = 100_000, 50_000  # every group has exactly 2 clones
        toks = [
            hashlib.md5(str(g).encode()).hexdigest()[:12] for g in range(groups)
        ]
        texts = [f"doc {toks[i % groups]} " + (f"w{toks[i % groups]} " * 8) for i in range(n)]
        t = pa.table(
            {"doc_id": pa.array(range(n), pa.int64()), "text": pa.array(texts)}
        )
        ds = ray.data.from_arrow(t).repartition(16)
        self._no_driver_collect(monkeypatch)
        ids = _ids(dedup_minhash(ds, threshold=0.7, distributed=True))
        assert ids == list(range(groups))


def test_distributed_cc_no_driver_resident_arrays(ray_session, monkeypatch):
    """VERDICT r3 item 3 / r4 item 4 structural pin: the distributed
    path must hold NOTHING candidate-sized on the driver — no
    candidate-id broadcast (r3), no star-edge pull and no absorbed-array
    ray.put (r4: _collect_pairs / connected_components_absorbed /
    _filter_absorbed are all off-limits in distributed mode; the
    cross-shard CC merge and the survivor anti-join are Dataset
    shuffles). The spy covers the WHOLE dedup call including lazy
    execution at consumption time."""
    import ray

    import parquet_go_ray.ops.dedup as dd

    assert not hasattr(dd, "_candidate_ids")  # the r3 artifact is gone

    puts = []
    orig_put = ray.put

    def spy_put(x, **kw):
        if isinstance(x, np.ndarray):
            puts.append(len(x))
        return orig_put(x, **kw)

    def boom(*a, **k):
        raise AssertionError("driver-side edge/CC helper on distributed path")

    monkeypatch.setattr(dd.ray, "put", spy_put)
    monkeypatch.setattr(dd, "_collect_pairs", boom)
    monkeypatch.setattr(dd, "_fetch_candidate_rows", boom)
    monkeypatch.setattr(dd, "connected_components_absorbed", boom)
    monkeypatch.setattr(dd, "_filter_absorbed", boom)

    t, expected = planted_mutated_documents(groups=20, clones_per_group=5)
    ds = ray.data.from_arrow(t)
    got = _ids(dd.dedup_minhash(ds, threshold=0.6, distributed=True))
    assert got == expected  # correctness unchanged by the co-partition
    assert puts == [], puts  # zero driver-resident numpy arrays


class TestSimhashDistributed:
    def test_matches_driver_path(self, ray_session, monkeypatch):
        """r5 (VERDICT r4 item 4): simhash's cross-shard merge goes
        through _distributed_cc_stars — same survivors as the driver
        path, with the driver-side helpers banned and zero numpy
        ray.puts."""
        import ray

        import parquet_go_ray.ops.dedup as dd

        ds_t = planted_clone_documents(400, 40)
        expected = _ids(
            dd.dedup_simhash(ray.data.from_arrow(ds_t), max_hamming=3,
                             distributed=False)
        )

        puts = []
        orig_put = ray.put

        def spy_put(x, **kw):
            if isinstance(x, np.ndarray):
                puts.append(len(x))
            return orig_put(x, **kw)

        def boom(*a, **k):
            raise AssertionError("driver-side helper on distributed path")

        monkeypatch.setattr(dd.ray, "put", spy_put)
        monkeypatch.setattr(dd, "_collect_pairs", boom)
        monkeypatch.setattr(dd, "connected_components_absorbed", boom)
        monkeypatch.setattr(dd, "_filter_absorbed", boom)
        got = _ids(
            dd.dedup_simhash(ray.data.from_arrow(ds_t), max_hamming=3,
                             distributed=True)
        )
        assert got == expected == list(range(40))
        assert puts == [], puts

    def test_cc_stars_merges_cross_shard_chains(self, ray_session):
        """The hash-to-min rounds must merge components whose per-shard
        stars chain through different roots: feed star fragments of one
        big component split across artificial shards plus singletons."""
        import ray

        from parquet_go_ray.ops.dedup import _distributed_cc_stars

        # component {0..9} as two shard-local stars rooted at 0 and 5,
        # chained by (0,5) appearing nowhere — link via shared member 7;
        # component {100,101}; singleton edges absent for 200.
        a = np.array([0, 0, 0, 5, 5, 5, 100], dtype=np.int64)
        b = np.array([1, 2, 7, 6, 7, 9, 101], dtype=np.int64)
        stars = ray.data.from_arrow(pa.table({"a": a, "b": b}))
        # zero-row blocks keep no schema through map_batches (Ray skips
        # the UDF on them) — filter before concat, as _collect_pairs does
        out = pa.concat_tables(
            t
            for t in ray.get(_distributed_cc_stars(stars).to_arrow_refs())
            if t.num_rows
        )
        roots = dict(zip(
            out.column("b").to_pylist(), out.column("a").to_pylist()
        ))
        assert roots == {1: 0, 2: 0, 5: 0, 6: 0, 7: 0, 9: 0, 101: 100}


def test_distributed_paths_with_zero_duplicates(ray_session):
    """Empty candidate/star streams must flow through the distributed
    CC merge and the co-partitioned anti-join without touching the
    empty-barrier-block schema gotcha (empty groupby/map_groups blocks
    can carry the UPSTREAM schema): every input row survives."""
    import ray

    from parquet_go_ray.ops.dedup import dedup_minhash, dedup_simhash

    texts = [
        " ".join(f"tok{i}w{j}x{(i * 31 + j * 7) % 1000}" for j in range(30))
        for i in range(60)
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(60), pa.int64()),
            "text": pa.array(texts),
        }
    )
    for op, kw in (
        (dedup_minhash, {"threshold": 0.8}),
        (dedup_simhash, {"max_hamming": 1}),
    ):
        got = sorted(
            r["doc_id"]
            for r in op(
                ray.data.from_arrow(t), distributed=True, **kw
            ).iter_rows()
        )
        assert got == list(range(60)), (op.__name__, len(got))


def test_cc_stars_random_graphs_match_reference(ray_session):
    """Property check: on random star-fragment inputs (components
    split across artificial shards every way the LSH paths can emit
    them), the distributed hash-to-min merge resolves exactly the same
    absorbed set as the driver-side union-find reference."""
    import ray

    from parquet_go_ray.ops.dedup import (
        _distributed_cc_stars,
        connected_components_absorbed,
    )

    rng = np.random.default_rng(17)
    for trial in range(4):
        n_nodes = int(rng.integers(20, 120))
        n_edges = int(rng.integers(10, 200))
        a = rng.integers(0, n_nodes, n_edges).astype(np.int64)
        b = rng.integers(0, n_nodes, n_edges).astype(np.int64)
        keep = a != b
        a, b = a[keep], b[keep]
        if not len(a):
            continue
        expected = set(
            connected_components_absorbed(a.copy(), b.copy()).tolist()
        )
        stars = ray.data.from_arrow(
            pa.table({"a": a, "b": b})
        ).repartition(int(rng.integers(1, 6)))
        out = pa.concat_tables(
            t
            for t in ray.get(_distributed_cc_stars(stars).to_arrow_refs())
            if t.num_rows
        )
        got_roots = dict(
            zip(out.column("b").to_pylist(), out.column("a").to_pylist())
        )
        # absorbed set identical; every absorbed node's label is its
        # component minimum
        assert set(got_roots) == expected, trial
        for member, root in got_roots.items():
            assert root < member
            assert root not in expected  # roots are survivors


class TestExactDedupStore:
    """Incremental exact dedup against a persisted corpus store."""

    def _docs(self, ids, texts):
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts),
        })

    def test_filter_new_matches_not_in_sql(self, ray_session, tmp_path):
        import duckdb
        import ray

        from parquet_go_ray.ops.dedup import ExactDedupStore

        rng = np.random.default_rng(101)
        corpus_texts = [f"doc body {int(x)}" for x in
                        rng.integers(0, 300, 800)]
        corpus = self._docs(range(800), corpus_texts)
        shard_texts = [f"doc body {int(x)}" for x in
                       rng.integers(200, 500, 400)]
        shard = self._docs(range(10_000, 10_400), shard_texts)

        p = str(tmp_path / "store")
        store = ExactDedupStore.build(
            ray.data.from_arrow(corpus).repartition(4), p, num_parts=8,
        )
        got = sorted(
            store.filter_new(ray.data.from_arrow(shard).repartition(3))
            .to_pandas()["doc_id"].tolist()
        )
        con = duckdb.connect()
        con.register("corpus", corpus)
        con.register("shard", shard)
        exp = sorted(
            con.sql("SELECT doc_id FROM shard WHERE text NOT IN"
                    " (SELECT text FROM corpus)").df()["doc_id"]
        )
        assert got == exp
        assert 0 < len(got) < 400  # both outcomes exercised

    def test_append_makes_seen_texts_old(self, ray_session, tmp_path):
        import ray

        from parquet_go_ray.ops.dedup import ExactDedupStore

        p = str(tmp_path / "store")
        store = ExactDedupStore.build(
            ray.data.from_arrow(self._docs([0, 1], ["a", "b"])), p,
            num_parts=4,
        )
        shard = self._docs([10, 11, 12], ["b", "c", "d"])
        first = store.filter_new(ray.data.from_arrow(shard)).to_pandas()
        assert sorted(first["doc_id"]) == [11, 12]
        res = store.append(ray.data.from_arrow(shard))
        assert res["added"] == 2  # c, d new; b already present
        again = store.filter_new(ray.data.from_arrow(shard)).to_pandas()
        assert len(again) == 0
        # store survives a fresh open
        reopened = ExactDedupStore(p)
        assert reopened.meta["rows"] == 4
        third = reopened.filter_new(
            ray.data.from_arrow(self._docs([20], ["e"]))
        ).to_pandas()
        assert third["doc_id"].tolist() == [20]

    def test_rebuild_clears_stale_parts(self, ray_session, tmp_path):
        import ray

        from parquet_go_ray.ops.dedup import ExactDedupStore

        p = str(tmp_path / "store")
        ExactDedupStore.build(
            ray.data.from_arrow(self._docs(range(100),
                                           [f"t{i}" for i in range(100)])),
            p, num_parts=4,
        )
        store = ExactDedupStore.build(
            ray.data.from_arrow(self._docs([0], ["only"])), p,
            num_parts=4,
        )
        out = store.filter_new(
            ray.data.from_arrow(self._docs([5], ["t5"]))
        ).to_pandas()
        assert out["doc_id"].tolist() == [5]  # t5 gone with the rebuild
