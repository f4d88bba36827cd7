#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify's
output against DuckDB executing SparkEntry.oracleSql on the same parquet
tables, compare values column-name-sorted / row-sorted.

Usage: python3 tools/compare_oracle.py <sfDir> <verifyOutDir>
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

sf_dir, out_dir = sys.argv[1], sys.argv[2]

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize timestamps to ns
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[ns]")
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v)
    return df.sort_values(by=list(df.columns), ignore_index=True)

fails = 0
for name in sorted(oracle):
    spark_path = f"{out_dir}/{name}"
    if not os.path.isdir(spark_path):
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    try:
        got = canon(con.execute(
            f"SELECT * FROM read_parquet('{spark_path}/*.parquet')").df())
        want = canon(con.execute(oracle[name]).df())
    except Exception as e:
        print(f"FAIL {name}: {e}"); fails += 1; continue
    if list(got.columns) != list(want.columns):
        print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
        fails += 1; continue
    if len(got) != len(want):
        print(f"FAIL {name}: rows {len(got)} != {len(want)}"); fails += 1; continue
    dt = [(c, got[c].dtype, want[c].dtype) for c in got.columns
          if got[c].dtype != want[c].dtype]
    if dt:
        print(f"FAIL {name}: dtype mismatch {dt}"); fails += 1; continue
    eq = got.equals(want)
    if not eq:
        # locate first mismatch
        diff_cols = [c for c in got.columns if not got[c].equals(want[c])]
        print(f"FAIL {name}: value mismatch in {diff_cols}")
        for c in diff_cols[:3]:
            neq = got[c] != want[c]
            if str(got[c].dtype).startswith("float"):
                both_nan = got[c].isna() & want[c].isna()
                neq = neq & ~both_nan
            i = neq.idxmax()
            print(f"  {c}[{i}]: spark={got[c][i]!r} duck={want[c][i]!r}")
        fails += 1
    else:
        print(f"PASS {name} ({len(got)} rows)")
print(f"\n{len(oracle)-fails}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
