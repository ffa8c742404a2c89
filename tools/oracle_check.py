#!/usr/bin/env python3
"""Local pre-check mimicking the driver's DuckDB oracle compare.

Usage: python3 tools/oracle_check.py <sf_dir> <verify_out_dir>

For each query dir in <verify_out_dir>: load the Spark parquet result and
run the matching SQL from oracle_sql.json in DuckDB over the sf_dir tables;
compare row count, column names, and a hash of the value matrix after
sorting columns by name and rows by all columns.
"""
import json, sys, hashlib
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    h = hashlib.sha256()
    for col in df.columns:
        for v in df[col]:
            if isinstance(v, float):
                h.update(repr(round(v, 9)).encode())
            else:
                h.update(repr(v).encode())
            h.update(b"\x00")  # value delimiter: '1','23' must not hash like '12','3'
    return h.hexdigest()

fails = 0
for name, sql in sorted(oracle.items()):
    try:
        spark_df = pd.read_parquet(f"{out_dir}/{name}")
        duck_df = con.execute(sql).df()
        ok_rows = len(spark_df) == len(duck_df)
        ok_cols = sorted(spark_df.columns) == sorted(duck_df.columns)
        ok_hash = ok_rows and ok_cols and canon(spark_df) == canon(duck_df)
        status = "OK" if (ok_rows and ok_cols and ok_hash) else "FAIL"
        if status == "FAIL":
            fails += 1
        print(f"{status} {name}: rows {len(spark_df)}/{len(duck_df)} cols_match={ok_cols} hash_match={ok_hash}")
        if not ok_hash and ok_rows and ok_cols:
            s = spark_df.reindex(sorted(spark_df.columns), axis=1).sort_values(
                by=sorted(spark_df.columns)).reset_index(drop=True)
            d = duck_df.reindex(sorted(duck_df.columns), axis=1).sort_values(
                by=sorted(duck_df.columns)).reset_index(drop=True)
            for c in s.columns:
                if s[c].dtype != object and d[c].dtype != object:
                    diff = (pd.to_numeric(s[c]) - pd.to_numeric(d[c])).abs().max()
                    if diff and diff > 0:
                        print(f"    col {c}: max abs diff {diff}")
                else:
                    neq = (s[c].astype(str) != d[c].astype(str)).sum()
                    if neq:
                        print(f"    col {c}: {neq} unequal values")
    except Exception as e:
        fails += 1
        print(f"ERROR {name}: {e}")

print(f"\n{'ALL OK' if fails == 0 else f'{fails} FAILURES'}")
sys.exit(1 if fails else 0)
