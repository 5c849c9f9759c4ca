#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
reads each <outDir>/<name> parquet (Spark result), runs the matching oracle
SQL from <outDir>/oracle_sql.json in DuckDB over the raw testdata parquet,
and compares schema + values (column-name-sorted, row-sorted, exact).
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3].split(',')) if len(sys.argv) > 3 else None

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fail = 0
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); fail += 1; continue
    spark_df = pq.read_table(files).to_pandas()
    try:
        duck_df = con.execute(sql).df()
    except Exception as ex:
        print(f"FAIL {name}: oracle error {ex}"); fail += 1; continue
    s = spark_df[sorted(spark_df.columns)]
    d = duck_df[sorted(duck_df.columns)]
    if list(s.columns) != list(d.columns):
        print(f"FAIL {name}: columns spark={list(s.columns)} duck={list(d.columns)}")
        fail += 1; continue
    if len(s) != len(d):
        print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}"); fail += 1; continue
    # row-order-insensitive: sort both by all columns; numeric columns are
    # compared exactly as float64 (both sides emit doubles by contract)
    def norm(df):
        out = df.copy()
        for c in out.columns:
            try:
                out[c] = out[c].astype('float64')
                continue
            except (ValueError, TypeError):
                pass
            try:
                # dates/timestamps: canonical datetime64 (nulls become 'NaT'
                # on both sides)
                out[c] = pd.to_datetime(out[c], errors='raise').astype(str)
            except (ValueError, TypeError):
                col = out[c].astype(object)
                out[c] = col.where(pd.notna(col), '<NULL>').astype(str)
        return out
    s, d = norm(s), norm(d)
    key = list(s.columns)
    s2 = s.sort_values(key, ignore_index=True).astype(str)
    d2 = d.sort_values(key, ignore_index=True).astype(str)
    neq = (s2 != d2)
    if neq.any().any():
        bad_cols = [c for c in s2.columns if neq[c].any()]
        i = neq.any(axis=1).idxmax()
        print(f"FAIL {name}: {int(neq.any(axis=1).sum())}/{len(s2)} rows differ; cols={bad_cols}")
        for c in bad_cols[:4]:
            j = neq[c].idxmax()
            print(f"   [{c}] row {j}: spark={s2[c][j]!r} duck={d2[c][j]!r}")
        fail += 1; continue
    print(f"ok   {name} ({len(s)} rows, {len(s.columns)} cols)")
print("RESULT:", "FAIL" if fail else "PASS", f"({len(oracle) if not only else len(only)} queries, {fail} failed)")
sys.exit(1 if fail else 0)
