#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Loads each <verifyOutDir>/<name> parquet result (written by graft.Verify),
runs the matching oracle SQL from oracle_sql.json in DuckDB over the raw
testdata parquet tables, canonicalizes both sides (columns sorted by name,
rows sorted), and reports exact / near / mismatch per query.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # naive timestamps vs tz-aware: strip tz for comparison
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            try:
                df[c] = df[c].dt.tz_localize(None)
            except TypeError:
                pass
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = canon(pd.read_parquet(f"{out_dir}/{name}"))
        except Exception as e:
            print(f"FAIL  {name}: spark result missing ({e})")
            n_bad += 1
            continue
        try:
            want = canon(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL  {name}: oracle sql error: {e}")
            n_bad += 1
            continue
        if got.shape[0] == 0:
            print(f"WARN  {name}: zero rows")
        if list(got.columns) != list(want.columns):
            print(f"FAIL  {name}: columns {list(got.columns)} vs "
                  f"{list(want.columns)}")
            n_bad += 1
            continue
        if got.shape != want.shape:
            print(f"FAIL  {name}: shape {got.shape} vs {want.shape}")
            n_bad += 1
            continue
        # the driver hashes raw values, so an int64 Spark column vs a
        # float64 oracle column (e.g. DuckDB HUGEINT sums) FAILS even when
        # values are numerically equal — treat kind mismatches as failures
        kind_bad = [c for c in got.columns
                    if got[c].dtype.kind != want[c].dtype.kind
                    and {got[c].dtype.kind, want[c].dtype.kind} <= {"i", "u",
                                                                    "f"}]
        if kind_bad:
            print(f"FAIL  {name}: dtype kind mismatch (driver hash would "
                  f"differ): "
                  + ", ".join(f"{c}: {got[c].dtype}!={want[c].dtype}"
                              for c in kind_bad))
            n_bad += 1
            continue
        try:
            pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                          check_exact=True)
            print(f"OK    {name}  ({got.shape[0]} rows)")
            n_ok += 1
        except AssertionError:
            try:
                pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                              rtol=1e-9)
                print(f"NEAR  {name}: values differ within 1e-9 "
                      f"(hash compare would FAIL)")
            except AssertionError as e2:
                print(f"FAIL  {name}: {str(e2).splitlines()[-1]}")
            n_bad += 1
    print(f"\n{n_ok} exact, {n_bad} failing")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
