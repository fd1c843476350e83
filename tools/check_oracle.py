"""Local emulation of the driver's correctness gate: run every queries()
entry and its oracle_sql() on the same sf dir, compare row count, schema
(column names) and order-insensitive values."""

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = sys.argv[2:] or None

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(obj):
    import pyarrow as pa

    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    if hasattr(obj, "to_pandas"):
        return obj.to_pandas()
    return pd.DataFrame(obj)


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    if len(df):
        df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main():
    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="error")
    import importlib

    entry = importlib.import_module("plakar_ray.entry")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    n_ok = n_bad = n_rows_only = 0
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        try:
            res = to_pandas(fn(SF_DIR))
        except Exception as e:
            print(f"FAIL {name}: query raised {e!r}")
            n_bad += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"rows-only {name}: {len(res)} rows {dt:.1f}s")
            n_rows_only += 1
            continue
        try:
            want = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL raised {e!r}")
            n_bad += 1
            continue
        a, b = canon(res), canon(want)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}")
            n_bad += 1
            continue
        if len(a) != len(b):
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}")
            n_bad += 1
            continue
        mismatch = None
        for c in a.columns:
            av, bv = a[c].to_numpy(), b[c].to_numpy()
            if av.dtype.kind == "f" or bv.dtype.kind == "f":
                eq = np.array_equal(av.astype(np.float64), bv.astype(np.float64))
            else:
                eq = (av == bv).all()
            if not eq:
                bad = np.nonzero(~(av == bv))[0][:3] if av.shape == bv.shape else []
                mismatch = (c, [(av[i], bv[i]) for i in bad])
                break
        if mismatch:
            print(f"FAIL {name}: col {mismatch[0]} differs, e.g. {mismatch[1]}")
            n_bad += 1
        else:
            print(f"OK   {name}: {len(a)} rows {dt:.1f}s")
            n_ok += 1
    print(f"\nsummary: {n_ok} ok, {n_rows_only} rows-only, {n_bad} FAIL")
    ray.shutdown()
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
