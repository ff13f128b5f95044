#!/usr/bin/env python3
"""Local driver-style correctness checker (dev harness only; the real driver
runs its own copy). Usage:
    python3 scripts/check_oracle.py <sfDir> <verifyOutDir>
Reads <verifyOutDir>/<name>/ parquet dumped by graft.Verify plus
<verifyOutDir>/oracle_sql.json, registers every <sfDir>/*.parquet as a DuckDB
view, runs each oracle, and compares row counts, schemas (column names), and
order-insensitive value hashes.
"""
import json
import sys
import glob
import os

import duckdb
import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.splitext(os.path.basename(p))[0]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    n_fail = 0
    for name, sql in sorted(oracles.items()):
        spark_path = os.path.join(out_dir, name)
        if not os.path.isdir(spark_path):
            print(f"FAIL {name}: no spark output at {spark_path}")
            n_fail += 1
            continue
        try:
            got = canon(
                con.execute(
                    f"SELECT * FROM ({sql}) q"
                ).fetchdf()
            )
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle error {e}")
            n_fail += 1
            continue
        exp = canon(
            con.execute(
                f"SELECT * FROM '{spark_path}/*.parquet'"
            ).fetchdf()
        )
        ok_rows = len(got) == len(exp)
        ok_cols = list(got.columns) == list(exp.columns)
        ok_vals = ok_rows and ok_cols and got.equals(exp)
        if ok_vals:
            print(f"PASS {name}: rows={len(exp)}")
        else:
            n_fail += 1
            print(f"FAIL {name}: rows spark={len(exp)} duck={len(got)} "
                  f"cols spark={list(exp.columns)} duck={list(got.columns)}")
            if ok_rows and ok_cols:
                neq = (got != exp) & ~(got.isna() & exp.isna())
                bad = neq.any(axis=1)
                print("first diffs (duck vs spark):")
                print(got[bad].head(3))
                print(exp[bad].head(3))
    print(f"{'ALL PASS' if n_fail == 0 else f'{n_fail} FAILURES'} "
          f"({len(oracles)} oracles)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
