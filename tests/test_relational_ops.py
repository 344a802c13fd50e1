"""DuckDB differentials for the relational completion ops: explode
(UNNEST), set_op (INTERSECT/EXCEPT/UNION), rollup/cube grouping sets."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray

from parquet_go_ray.ops.agg import explode, rollup
from parquet_go_ray.ops.setops import set_op

SF = "/root/testdata/sf0.001"


def _df(result) -> pd.DataFrame:
    if isinstance(result, ray.data.Dataset):
        result = result.to_pandas()
    elif isinstance(result, pa.Table):
        result = result.to_pandas()
    return result


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _assert_same(mine: pd.DataFrame, ref: pd.DataFrame):
    mine, ref = _canon(mine), _canon(ref)
    assert list(mine.columns) == list(ref.columns)
    assert len(mine) == len(ref)
    for c in mine.columns:
        a, b = mine[c], ref[c]
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            a = pd.to_numeric(a, errors="coerce")
            b = pd.to_numeric(b, errors="coerce")
            assert np.allclose(a.fillna(-1e308), b.fillna(-1e308),
                               rtol=1e-12, atol=1e-12), c
        else:
            pd.testing.assert_series_equal(
                a, b, check_dtype=False, check_names=False
            )


def _random_lists_table(rng, n=400):
    """id + list<int64> with nulls, empties, and null elements."""
    ids = np.arange(n, dtype=np.int64)
    lists = []
    for i in range(n):
        r = rng.integers(0, 10)
        if r == 0:
            lists.append(None)
        elif r == 1:
            lists.append([])
        else:
            vals = rng.integers(-5, 100, size=int(r)).tolist()
            if r > 4:
                vals[rng.integers(0, len(vals))] = None
            lists.append(vals)
    tag = rng.integers(0, 3, size=n)
    return pa.table({
        "id": pa.array(ids),
        "tag": pa.array([f"t{int(x)}" for x in tag]),
        "vals": pa.array(lists, pa.list_(pa.int64())),
    })


class TestExplode:
    def test_unnest_vs_duckdb_embeddings(self, ray_session):
        ds = ray.data.read_parquet(f"{SF}/embeddings.parquet")
        out = _df(explode(ds, "embedding", out_col="emb"))
        con = duckdb.connect()
        ref = con.sql(
            f"SELECT vec_id, label, UNNEST(embedding) AS emb"
            f" FROM '{SF}/embeddings.parquet'"
        ).df()
        # float32 exact: UNNEST copies values bit-for-bit
        _assert_same(out, ref)

    def test_unnest_vs_duckdb_random(self, ray_session, rng):
        t = _random_lists_table(rng)
        out = _df(explode(ray.data.from_arrow(t), "vals", out_col="v"))
        con = duckdb.connect()
        con.register("t", t)
        ref = con.sql("SELECT id, tag, UNNEST(vals) AS v FROM t").df()
        _assert_same(out, ref)

    def test_keep_empty_matches_pandas_explode(self, ray_session, rng):
        t = _random_lists_table(rng)
        out = _canon(_df(explode(
            ray.data.from_arrow(t), "vals", out_col="v", keep_empty=True
        )))
        pdf = t.to_pandas()
        ref = pdf.explode("vals").rename(columns={"vals": "v"})
        # pandas explode leaves [] / None rows with NaN, same contract
        ref["v"] = ref["v"].astype("float64")
        ref = _canon(ref)
        assert len(out) == len(ref)
        assert np.allclose(
            out["v"].astype("float64").fillna(-1.0),
            ref["v"].fillna(-1.0),
        )

    def test_positions(self, ray_session):
        t = pa.table({
            "id": pa.array([1, 2, 3], pa.int64()),
            "vals": pa.array([[10, 11, 12], None, [20]],
                             pa.list_(pa.int64())),
        })
        out = _df(explode(ray.data.from_arrow(t), "vals",
                          out_col="v", pos_col="pos"))
        out = out.sort_values(["id", "pos"]).reset_index(drop=True)
        assert out["id"].tolist() == [1, 1, 1, 3]
        assert out["pos"].tolist() == [0, 1, 2, 0]
        assert out["v"].tolist() == [10, 11, 12, 20]

    def test_non_list_raises(self, ray_session):
        t = pa.table({"x": pa.array([1, 2])})
        with pytest.raises(Exception, match="not a list"):
            _df(explode(ray.data.from_arrow(t), "x"))


def _two_random_tables(rng, n1=300, n2=260):
    """Two same-schema tables with overlapping rows, duplicates, and
    nulls in both key spaces (SQL set ops treat NULLs as equal)."""
    def mk(n, seed_shift):
        a = rng.integers(0, 12, size=n).astype("float64")
        a[rng.random(n) < 0.15] = np.nan  # → null via pandas
        b = rng.integers(0, 6, size=n)
        s = np.array([f"s{int(x)}" for x in rng.integers(0, 5, size=n)],
                     dtype=object)
        s[rng.random(n) < 0.1] = None
        df = pd.DataFrame({
            "a": pd.array([None if np.isnan(x) else int(x) for x in a],
                          dtype="Int64"),
            "b": b + seed_shift,
            "s": s,
        })
        return pa.Table.from_pandas(df, preserve_index=False)
    return mk(n1, 0), mk(n2, 0)


SETOP_SQL = {
    ("intersect", False): "SELECT * FROM t1 INTERSECT SELECT * FROM t2",
    ("intersect", True):
        "SELECT * FROM t1 INTERSECT ALL SELECT * FROM t2",
    ("except", False): "SELECT * FROM t1 EXCEPT SELECT * FROM t2",
    ("except", True): "SELECT * FROM t1 EXCEPT ALL SELECT * FROM t2",
    ("union", False): "SELECT * FROM t1 UNION SELECT * FROM t2",
}


class TestSetOps:
    @pytest.mark.parametrize("op,use_all", list(SETOP_SQL))
    def test_vs_duckdb(self, ray_session, rng, op, use_all):
        t1, t2 = _two_random_tables(rng)
        out = _df(set_op(
            ray.data.from_arrow(t1), ray.data.from_arrow(t2),
            op, all=use_all,
        ))
        con = duckdb.connect()
        con.register("t1", t1)
        con.register("t2", t2)
        ref = con.sql(SETOP_SQL[(op, use_all)]).df()
        _assert_same(out, ref)

    def test_empty_side(self, ray_session, rng):
        t1, _ = _two_random_tables(rng)
        empty = t1.slice(0, 0)
        out = _df(set_op(ray.data.from_arrow(t1),
                         ray.data.from_arrow(empty), "except"))
        # except nothing = distinct of t1
        con = duckdb.connect()
        con.register("t1", t1)
        ref = con.sql("SELECT DISTINCT * FROM t1").df()
        _assert_same(out, ref)

    def test_union_all_raises(self, ray_session, rng):
        t1, t2 = _two_random_tables(rng)
        with pytest.raises(ValueError, match="UNION ALL"):
            set_op(ray.data.from_arrow(t1), ray.data.from_arrow(t2),
                   "union", all=True)

    def test_nested_column_rejected(self, ray_session):
        t = pa.table({"x": pa.array([[1], [2]], pa.list_(pa.int64()))})
        with pytest.raises(Exception, match="nested"):
            _df(set_op(ray.data.from_arrow(t),
                       ray.data.from_arrow(t), "intersect"))


def _rollup_input(rng, n=2000):
    df = pd.DataFrame({
        "k1": [f"g{int(x)}" for x in rng.integers(0, 4, size=n)],
        "k2": rng.integers(0, 3, size=n),
        "v": rng.normal(10.0, 3.0, size=n).round(3),
        "w": rng.integers(0, 100, size=n),
    })
    # null keys and null values must follow SQL GROUP BY / aggregate rules
    df.loc[rng.random(n) < 0.05, "k1"] = None
    df.loc[rng.random(n) < 0.1, "v"] = None
    return pa.Table.from_pandas(df, preserve_index=False)


ROLLUP_SQL = (
    "SELECT k1, k2,"
    " GROUPING(k1) * 2 + GROUPING(k2) AS grouping_id,"
    " CAST(COUNT(*) AS BIGINT) AS n,"
    " SUM(v) AS sum_v,"
    " CAST(COUNT(v) AS BIGINT) AS count_v,"
    " MIN(w) AS min_w, MAX(w) AS max_w, AVG(v) AS mean_v"
    " FROM t GROUP BY {sets} (k1, k2)"
)

ROLLUP_AGGS = [
    (None, "count"), ("v", "sum"), ("v", "count"),
    ("w", "min"), ("w", "max"), ("v", "mean"),
]


class TestRollup:
    @pytest.mark.parametrize("cube", [False, True])
    def test_vs_duckdb(self, ray_session, rng, cube):
        t = _rollup_input(rng)
        out = _df(rollup(ray.data.from_arrow(t), ["k1", "k2"],
                         ROLLUP_AGGS, cube=cube))
        con = duckdb.connect()
        con.register("t", t)
        ref = con.sql(
            ROLLUP_SQL.format(sets="CUBE" if cube else "ROLLUP")
        ).df()
        _assert_same(out, ref)

    def test_single_key(self, ray_session, rng):
        t = _rollup_input(rng)
        out = _df(rollup(ray.data.from_arrow(t), ["k2"],
                         [("w", "sum"), (None, "count")]))
        con = duckdb.connect()
        con.register("t", t)
        ref = con.sql(
            "SELECT k2, GROUPING(k2) AS grouping_id,"
            " CAST(SUM(w) AS BIGINT) AS sum_w,"
            " CAST(COUNT(*) AS BIGINT) AS n"
            " FROM t GROUP BY ROLLUP (k2)"
        ).df()
        _assert_same(out, ref)

    def test_all_null_value_group_mean(self, ray_session):
        t = pa.table({
            "k": pa.array(["a", "a", "b"]),
            "v": pa.array([None, None, 5.0], pa.float64()),
        })
        out = _canon(_df(rollup(ray.data.from_arrow(t), ["k"],
                                [("v", "mean"), ("v", "sum")])))
        # group 'a': all-null v → mean/sum NULL (SQL), count path 0
        row_a = out[out["k"] == "a"].iloc[0]
        assert pd.isna(row_a["mean_v"]) and pd.isna(row_a["sum_v"])

    def test_bad_args(self, ray_session, rng):
        t = _rollup_input(rng)
        ds = ray.data.from_arrow(t)
        with pytest.raises(ValueError, match="agg must be"):
            rollup(ds, ["k1"], [("v", "median")])
        with pytest.raises(ValueError, match="col=None"):
            rollup(ds, ["k1"], [(None, "sum")])
        with pytest.raises(ValueError, match="duplicate"):
            rollup(ds, ["k1"], [("v", "sum"), ("v", "sum")])


def _json_table():
    rows = [
        '{"k": 42, "s": "plain", "f": 1.5, "b": true}',
        '{"k": -7, "s": "quo\\"te", "f": -2e3, "b": false}',
        '{"s": "sl\\/ash\\nnl", "f": 0.25}',          # k missing
        '{"k": null, "s": null, "b": null}',           # JSON nulls
        '{"k": 3.5, "s": 7, "b": "true"}',             # type mismatches
        None,                                           # null row
        '{"k": 1000000007, "s": "", "f": 12, "b": true}',
        '{"s": "uni\\u00e9code"}',                     # \u → null (boundary)
    ]
    return pa.table({"id": pa.array(range(len(rows)), pa.int64()),
                     "props": pa.array(rows, pa.string())})


class TestJsonField:
    def _extract(self, ray_session, key, out_type):
        from parquet_go_ray.ops.jsonops import json_field

        ds = ray.data.from_arrow(_json_table())
        out = _df(json_field(ds, "props", key, out_col="v",
                             out_type=out_type))
        return [None if pd.isna(x) else x
                for x in out.sort_values("id")["v"].tolist()]

    def test_int64_vs_duckdb(self, ray_session):
        got = self._extract(ray_session, "k", "int64")
        con = duckdb.connect()
        con.register("t", _json_table())
        ref = con.sql(
            "SELECT id, CASE WHEN props->>'k' ~ '^-?\\d+$'"
            " THEN CAST(props->>'k' AS BIGINT) END AS v"
            " FROM t ORDER BY id"
        ).df()["v"].tolist()
        assert [(x if not pd.isna(x) else None) for x in ref] == got

    def test_double_vs_duckdb(self, ray_session):
        got = self._extract(ray_session, "f", "double")
        con = duckdb.connect()
        con.register("t", _json_table())
        ref = con.sql(
            "SELECT id, CAST(props->>'f' AS DOUBLE) AS v FROM t ORDER BY id"
        ).df()["v"].tolist()
        for g, r in zip(got, ref):
            if pd.isna(r):
                assert g is None
            else:
                assert abs(g - r) < 1e-12

    def test_string_vs_duckdb(self, ray_session):
        got = self._extract(ray_session, "s", "string")
        con = duckdb.connect()
        con.register("t", _json_table())
        ref = con.sql(
            "SELECT id, json_extract_string(props, 's') AS v"
            " FROM t ORDER BY id"
        ).df()["v"].tolist()
        for i, (g, r) in enumerate(zip(got, ref)):
            if i == 4:   # "s": 7 — number, not a string: we null, duckdb stringifies
                assert g is None
                continue
            if i == 7:   # \u escape: documented null boundary
                assert g is None
                continue
            assert g == (None if pd.isna(r) else r), i

    def test_bool(self, ray_session):
        got = self._extract(ray_session, "b", "bool")
        assert got == [True, False, None, None, None, None, True, None]

    def test_raw_and_replace_existing(self, ray_session):
        from parquet_go_ray.ops.jsonops import json_field

        ds = ray.data.from_arrow(_json_table())
        out = _df(json_field(ds, "props", "k", out_col="props",
                             out_type="raw"))
        assert list(out.columns) == ["id", "props"]
        assert out.sort_values("id")["props"].tolist()[0] == "42"

    def test_bad_type(self, ray_session):
        from parquet_go_ray.ops.jsonops import json_field

        with pytest.raises(ValueError, match="out_type"):
            json_field(ray.data.from_arrow(_json_table()),
                       "props", "k", out_type="decimal")


class TestSetOpProperty:
    """Hypothesis: random same-schema tables (dup rows, nulls, empty
    sides, disjoint and identical inputs) through every set-op mode
    == DuckDB."""

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=12, deadline=None)
    @given(
        st.lists(st.tuples(st.one_of(st.none(), st.integers(0, 5)),
                           st.sampled_from(["x", "y", "z"])),
                 max_size=50),
        st.lists(st.tuples(st.one_of(st.none(), st.integers(3, 8)),
                           st.sampled_from(["x", "y", "w"])),
                 max_size=40),
        st.sampled_from([("intersect", False), ("intersect", True),
                         ("except", False), ("except", True),
                         ("union", False)]),
    )
    def test_random_tables_match_duckdb(self, ray_session, l, r, mode):
        op, use_all = mode
        lt = pa.table({
            "a": pa.array([x for x, _ in l], pa.int64()),
            "s": pa.array([s for _, s in l], pa.string()),
        })
        rt = pa.table({
            "a": pa.array([x for x, _ in r], pa.int64()),
            "s": pa.array([s for _, s in r], pa.string()),
        })
        out = _df(set_op(ray.data.from_arrow(lt),
                         ray.data.from_arrow(rt),
                         op, all=use_all, num_buckets=3))
        con = duckdb.connect()
        con.register("t1", lt)
        con.register("t2", rt)
        ref = con.sql(SETOP_SQL[(op, use_all)]).df()
        if len(ref) == 0:
            assert len(out) == 0
            return
        _assert_same(out, ref)
