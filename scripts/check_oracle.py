#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet result, runs the matching oracle SQL
from oracle_sql.json in DuckDB over the sfDir parquet tables, sorts columns by
name, sorts rows, and compares values. Exit nonzero on any mismatch.
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify for a stable, type-insensitive compare (mirrors hashing rows)
    df = df.astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = n_noracle = 0
    for d in sorted(glob.glob(os.path.join(out_dir, "*"))):
        if not os.path.isdir(d):
            continue
        name = os.path.basename(d)
        files = glob.glob(os.path.join(d, "*.parquet"))
        got = pd.concat([pd.read_parquet(f) for f in files]) if files else pd.DataFrame()
        if name not in oracles:
            print(f"  [rows-only] {name}: {len(got)} rows")
            n_noracle += 1
            continue
        try:
            want = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"  [FAIL-oracle-sql] {name}: {e}")
            n_fail += 1
            continue
        g, w = norm(got), norm(want)
        if list(g.columns) != list(w.columns):
            print(f"  [FAIL-schema] {name}: spark={list(g.columns)} duckdb={list(w.columns)}")
            n_fail += 1
        elif len(g) != len(w):
            print(f"  [FAIL-rows] {name}: spark={len(g)} duckdb={len(w)}")
            n_fail += 1
        elif not g.equals(w):
            diff = (g != w).any(axis=1)
            idx = diff[diff].index[:3]
            print(f"  [FAIL-values] {name}: {int(diff.sum())}/{len(g)} rows differ")
            for i in idx:
                print(f"    spark : {g.loc[i].to_dict()}")
                print(f"    duckdb: {w.loc[i].to_dict()}")
            n_fail += 1
        else:
            print(f"  [ok] {name}: {len(g)} rows")
            n_pass += 1
    print(f"PASS={n_pass} FAIL={n_fail} ROWS_ONLY={n_noracle}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
