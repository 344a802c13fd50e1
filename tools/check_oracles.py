"""Local stand-in for the driver's correctness gate: run every queries()
entry at sf0.01 and compare against oracle_sql() via DuckDB
(row count + schema-insensitive sorted-column value hash)."""

from __future__ import annotations

import hashlib
import sys

import duckdb
import pandas as pd
import pyarrow as pa

import ray

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def to_pandas(result) -> pd.DataFrame:
    if isinstance(result, ray.data.Dataset):
        result = result.to_pandas()
    elif isinstance(result, pa.Table):
        result = result.to_pandas()
    return result


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    # Canonicalize: sort rows by all columns for order-insensitivity.
    try:
        df = df.sort_values(list(df.columns)).reset_index(drop=True)
    except Exception:
        pass
    h = hashlib.sha1()
    for col in df.columns:
        vals = df[col]
        h.update(col.encode())
        try:
            h.update(pd.util.hash_pandas_object(vals, index=False).values.tobytes())
        except TypeError:  # unhashable cells (lists/arrays) -> stringify
            h.update(
                pd.util.hash_pandas_object(
                    vals.map(str), index=False
                ).values.tobytes()
            )
    return h.hexdigest()


def main(sf_dir: str = "/root/testdata/sf0.01"):
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        try:
            mine = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(mine)} rows)")
            continue
        try:
            ref = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle raised {e}")
            failures.append(name)
            continue
        ok_rows = len(mine) == len(ref)
        ok_cols = sorted(mine.columns) == sorted(ref.columns)
        ok_hash = False
        if ok_rows and ok_cols:
            ok_hash = value_hash(mine) == value_hash(ref)
        status = "ok  " if (ok_rows and ok_cols and ok_hash) else "FAIL"
        print(
            f"{status} {name}: rows {len(mine)}/{len(ref)} cols_match={ok_cols} hash_match={ok_hash}"
        )
        if status == "FAIL":
            failures.append(name)
            if ok_cols and ok_rows:
                m = mine[sorted(mine.columns)].sort_values(sorted(mine.columns)).reset_index(drop=True)
                r = ref[sorted(ref.columns)].sort_values(sorted(ref.columns)).reset_index(drop=True)
                for c in m.columns:
                    if not m[c].equals(r[c]):
                        neq = (m[c] != r[c])
                        print(f"    col {c}: {int(neq.sum())} diffs; e.g. mine={m[c][neq].head(3).tolist()} ref={r[c][neq].head(3).tolist()}")
            else:
                print(f"    mine cols: {sorted(mine.columns)}")
                print(f"    ref  cols: {sorted(ref.columns)}")
    print(f"\n{len(qs) - len(failures)}/{len(qs)} queries pass")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(*(sys.argv[1:] or [])))
