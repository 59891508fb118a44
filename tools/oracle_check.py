#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Runs each oracle SQL from <outDir>/oracle_sql.json in DuckDB over the
sf parquet tables, loads the Spark-written parquet from <outDir>/<name>/,
sorts columns by name + rows by all columns, and compares values exactly.

Usage: python3 tools/oracle_check.py <sfDir> <outDir>
(Dev-only tool: uses the driver-side python stack; not part of the
shipped Scala library.)
"""
import json
import math
import sys

import duckdb
import pandas as pd
import pyarrow.parquet as pq
import glob
import os

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True,
                        key=lambda s: s.astype(str))
    return df


def cells_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
        if pd.isna(a) != pd.isna(b):
            return False
    except (TypeError, ValueError):
        pass
    if hasattr(a, "__len__") and not isinstance(a, str):
        if len(a) != len(b):
            return False
        return all(cells_equal(x, y) for x, y in zip(a, b))
    if str(a) == str(b):
        return True
    # timestamp precision normalization (spark µs vs duckdb ns)
    try:
        return pd.Timestamp(a) == pd.Timestamp(b)
    except (TypeError, ValueError):
        return False


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    n_ok = n_fail = 0
    produced = {os.path.basename(d) for d in glob.glob(f"{out_dir}/*")
                if os.path.isdir(d)}
    for name in sorted(produced):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output parquet")
            n_fail += 1
            continue
        spark_df = pq.read_table(files).to_pandas()
        if name not in oracles:
            print(f"ROWS {name}: rows={len(spark_df)} (no oracle declared)")
            continue
        try:
            duck_df = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        s, d = norm(spark_df), norm(duck_df)
        if list(s.columns) != list(d.columns):
            print(f"FAIL {name}: columns spark={list(s.columns)} duck={list(d.columns)}")
            n_fail += 1
            continue
        if len(s) != len(d):
            print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}")
            n_fail += 1
            continue
        bad = None
        for col in s.columns:
            for i, (x, y) in enumerate(zip(s[col], d[col])):
                if not cells_equal(x, y):
                    bad = (col, i, x, y)
                    break
            if bad:
                break
        if bad:
            col, i, x, y = bad
            print(f"FAIL {name}: first diff col={col} row={i} "
                  f"spark={x!r} duck={y!r}")
            n_fail += 1
        else:
            print(f"OK   {name}: rows={len(s)} cols={len(s.columns)}")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_fail} fail, "
          f"{len(produced) - n_ok - n_fail} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
