#!/usr/bin/env python3
"""Replay the driver's correctness gate locally.

Usage: python3 tools/compare_oracle.py <sfDir> <verifyOutDir>

Runs each oracle_sql.json query in DuckDB against the sf tables and
compares with the Spark-dumped parquet, after the driver's
normalization: sort columns by name, sort rows by all columns.
"""
import sys, glob, json
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df):
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df.reset_index(drop=True)

def main(sf, out):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracles = json.load(open(f"{out}/oracle_sql.json"))
    # every dumped query dir
    import os
    dumped = sorted(d for d in os.listdir(out) if os.path.isdir(f"{out}/{d}"))
    n_ok = n_fail = 0
    for name in dumped:
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no parquet dumped"); n_fail += 1; continue
        spark = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        if name not in oracles:
            print(f"ok?  {name}: rows={len(spark)} (no oracle, rows-only)")
            n_ok += 1
            continue
        try:
            oracle = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_fail += 1; continue
        o, s = norm(oracle), norm(spark)
        if list(o.columns) != list(s.columns):
            print(f"FAIL {name}: cols oracle={list(o.columns)} spark={list(s.columns)}")
            n_fail += 1; continue
        if o.shape != s.shape:
            print(f"FAIL {name}: shape oracle={o.shape} spark={s.shape}")
            n_fail += 1; continue
        # dtype-tolerant compare (int64 vs int32 etc.)
        try:
            eq = True
            for c in o.columns:
                oc, sc = o[c], s[c]
                if oc.dtype.kind in "iuf" and sc.dtype.kind in "iuf":
                    import numpy as np
                    if not np.allclose(oc.astype(float), sc.astype(float),
                                       rtol=0, atol=0, equal_nan=True):
                        eq = False; break
                else:
                    if not oc.astype(str).equals(sc.astype(str)):
                        eq = False; break
        except Exception as e:
            print(f"FAIL {name}: compare error {e}"); n_fail += 1; continue
        if eq:
            print(f"OK   {name} rows={len(s)}"); n_ok += 1
        else:
            print(f"FAIL {name}: value mismatch in col '{c}'")
            merged = o[[c]].compare(s[[c]]) if hasattr(o[[c]], "compare") else None
            if merged is not None and len(merged):
                print(merged.head(5))
            n_fail += 1
    print(f"\n{n_ok} ok, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
