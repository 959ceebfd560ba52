#!/usr/bin/env python3
"""Replay the driver's correctness gate locally — STRICT mode.

Usage: python3 tools/compare_oracle.py <sfDir> <verifyOutDir>

Runs each oracle_sql.json query in DuckDB against the sf tables and
compares with the Spark-dumped parquet after the driver's
normalization: sort columns by name, sort rows by all columns, then
compare stringified values EXACTLY.

Round-1 lesson: the driver hashes stringified values, so numeric
equality is NOT enough —
  * int64 `1` vs float64 `1.0` (DuckDB HUGEINT sums land as float64
    in pandas) fails the driver hash while np.allclose passes;
  * IEEE -0.0 vs +0.0 (DuckDB round keeps the sign bit, Spark's
    BigDecimal round drops it) fails the hash while allclose passes.
This tool therefore requires dtype-KIND parity (int vs float is a
fail) and exact per-value string equality, including the zero sign.
"""
import sys, glob, json, os
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df):
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df.reset_index(drop=True)


def kind(dt):
    k = dt.kind
    return "i" if k == "u" else k


def col_strings(s):
    """Stringify a column the way a value hash would see it."""
    if s.dtype.kind == "f":
        # repr keeps the -0.0 sign and full precision
        return s.map(lambda v: "nan" if pd.isna(v) else repr(float(v)))
    return s.astype(str)


def main(sf, out):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracles = json.load(open(f"{out}/oracle_sql.json"))
    dumped = sorted(d for d in os.listdir(out) if os.path.isdir(f"{out}/{d}"))
    n_ok = n_fail = 0
    for name in dumped:
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no parquet dumped"); n_fail += 1; continue
        spark = pd.concat([pd.read_parquet(f) for f in files],
                          ignore_index=True)
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
            print(f"FAIL {name}: cols oracle={list(o.columns)} "
                  f"spark={list(s.columns)}")
            n_fail += 1; continue
        if o.shape != s.shape:
            print(f"FAIL {name}: shape oracle={o.shape} spark={s.shape}")
            n_fail += 1; continue
        bad = None
        for c in o.columns:
            if kind(o[c].dtype) != kind(s[c].dtype):
                bad = (c, f"dtype kind oracle={o[c].dtype} spark={s[c].dtype} "
                          f"(driver hash WILL differ: '1' vs '1.0')")
                break
            os_, ss_ = col_strings(o[c]), col_strings(s[c])
            if not os_.equals(ss_):
                diff = os_ != ss_
                i = int(np.argmax(diff.values))
                bad = (c, f"value mismatch at sorted row {i}: "
                          f"oracle={os_.iloc[i]!r} spark={ss_.iloc[i]!r} "
                          f"({int(diff.sum())} rows differ)")
                break
        if bad is None:
            print(f"OK   {name} rows={len(s)}"); n_ok += 1
        else:
            print(f"FAIL {name}: col '{bad[0]}': {bad[1]}")
            n_fail += 1
    # A query that THREW during Verify never creates its dump dir and
    # would otherwise vanish from this report entirely (found the hard
    # way: a failing new query "passed" as 156/156). On a full run,
    # flag every oracle with no dump as FAIL; when most dirs are absent
    # this was a `Verify <sf> <out> <subset>` run — note, don't fail.
    missing = sorted(set(oracles) - set(dumped))
    if not dumped:
        # zero dumps is never a legitimate subset run — it means Verify
        # itself failed wholesale (bad sf dir, crash before any write)
        print("FAIL: no query dumps at all — Verify produced nothing")
        n_fail += max(1, len(missing))
    elif missing and len(dumped) >= len(oracles) // 2:
        for name in missing:
            print(f"FAIL {name}: no dump directory (query threw in Verify?)")
        n_fail += len(missing)
    elif missing:
        print(f"(subset run: {len(missing)} oracle queries not dumped)")
    print(f"\n{n_ok} ok, {n_fail} fail (strict driver-hash mode)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
