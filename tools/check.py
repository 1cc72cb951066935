#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name> parquet (Spark result), runs the oracle SQL
from <verifyOutDir>/oracle_sql.json in DuckDB with views over <sfDir>'s
parquet tables, then compares: row count, column names, sorted values
(exact for non-floats, tiny-tolerance report for floats).
"""
import json
import math
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def compare(name, spark_df, oracle_df):
    problems = []
    if list(spark_df.columns) != list(oracle_df.columns):
        return [f"columns differ: spark={list(spark_df.columns)} oracle={list(oracle_df.columns)}"]
    if len(spark_df) != len(oracle_df):
        return [f"row count: spark={len(spark_df)} oracle={len(oracle_df)}"]
    for c in spark_df.columns:
        a, b = spark_df[c], oracle_df[c]
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            # The driver hashes exact values, so int64 `5` vs float64 `5.0`
            # is a HARD failure there — mirror that here instead of letting
            # the tolerance compare mask a wrong-typed oracle (round-3 q55/q57).
            if a.dtype.kind != b.dtype.kind:
                problems.append(
                    f"col {c}: dtype kind mismatch spark={a.dtype} oracle={b.dtype}"
                    " (driver hashes exact values; int-vs-float WILL fail the gate)")
            aa = a.astype(float).to_numpy()
            bb = b.astype(float).to_numpy()
            bad = 0
            worst = 0.0
            for x, y in zip(aa, bb):
                if math.isnan(x) and math.isnan(y):
                    continue
                d = abs(x - y)
                if not (d <= 1e-9 * max(1.0, abs(x), abs(y))):
                    bad += 1
                    worst = max(worst, d)
            if bad:
                problems.append(f"col {c}: {bad} float mismatches (worst abs diff {worst})")
            exact = (pd.Series(aa).fillna(-1) != pd.Series(bb).fillna(-1)).sum()
            if exact and not bad:
                problems.append(f"col {c}: {exact} non-bitexact floats (within tolerance) ⚠")
        else:
            if a.dtype != b.dtype:
                problems.append(f"col {c}: dtype spark={a.dtype} oracle={b.dtype} ⚠types")
            neq = (a.astype(str) != b.astype(str)).sum()
            if neq:
                idx = (a.astype(str) != b.astype(str)).idxmax()
                problems.append(f"col {c}: {neq} mismatches, e.g. spark={a[idx]!r} oracle={b[idx]!r}")
    return problems


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        # driver testdata is one file per table; GenData scale fixtures are
        # Spark-written DIRECTORIES of part files — glob those for DuckDB
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    raw = json.load(open(f"{out_dir}/oracle_sql.json"))
    # Verify emits each oracle under BOTH "name" and "name.parquet" keys
    # (the driver looks up by output filename); collapse to bare names.
    oracle_sql = {k.removesuffix(".parquet"): v for k, v in raw.items()}
    n_pass = n_fail = 0
    for name, sql in sorted(oracle_sql.items()):
        if only and name not in only:
            continue
        try:
            spark_df = normalize(pd.read_parquet(f"{out_dir}/{name}.parquet"))
        except Exception as e:
            print(f"✗ {name}: no spark output ({e})")
            n_fail += 1
            continue
        try:
            oracle_df = normalize(con.execute(sql).df())
        except Exception as e:
            print(f"✗ {name}: oracle SQL failed: {e}")
            n_fail += 1
            continue
        problems = compare(name, spark_df, oracle_df)
        hard = [p for p in problems if "⚠" not in p]
        if hard:
            print(f"✗ {name} ({len(spark_df)} rows):")
            for p in problems:
                print(f"    {p}")
            n_fail += 1
        else:
            note = "; ".join(p for p in problems if "⚠" in p)
            print(f"✓ {name} ({len(spark_df)} rows)" + (f"  [{note}]" if note else ""))
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
