#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [query ...]

Reads <verifyOutDir>/oracle_sql.json, registers every fixture parquet in
<sfDir> as a DuckDB view, runs each oracle SQL, and compares against the
Spark result parquet at <verifyOutDir>/<name>/. Columns are sorted by name
before compare (like the driver); reports both row-order-sensitive and
-insensitive equality so ordering bugs are visible either way.
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df):
    df = df[sorted(df.columns)]
    return df.reset_index(drop=True)

def norm_cell(v):
    if isinstance(v, float):
        return round(v, 6)
    return v

def frame_sig(df, sort_rows):
    df = canon(df)
    rows = [tuple(norm_cell(v) for v in row) for row in df.itertuples(index=False)]
    if sort_rows:
        rows = sorted(rows, key=repr)
    return rows

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            print(f"[MISS] {name}: no spark parquet output")
            n_fail += 1
            continue
        try:
            duck = con.execute(sql).df()
        except Exception as e:
            print(f"[ORACLE-ERR] {name}: {e}")
            n_fail += 1
            continue
        spark = pd.concat([pd.read_parquet(f) for f in sorted(spark_files)])
        if sorted(duck.columns) != sorted(spark.columns):
            print(f"[SCHEMA] {name}: duck={sorted(duck.columns)} spark={sorted(spark.columns)}")
            n_fail += 1
            continue
        if len(duck) != len(spark):
            print(f"[ROWS] {name}: duck={len(duck)} spark={len(spark)}")
            n_fail += 1
            continue
        ordered = frame_sig(duck, False) == frame_sig(spark, False)
        unordered = ordered or (frame_sig(duck, True) == frame_sig(spark, True))
        if ordered:
            print(f"[OK]   {name}: {len(duck)} rows (order-exact)")
            n_pass += 1
        elif unordered:
            print(f"[WARN] {name}: values match but ROW ORDER differs")
            n_fail += 1
        else:
            d, s = frame_sig(duck, True), frame_sig(spark, True)
            diff = [(a, b) for a, b in zip(d, s) if a != b][:3]
            print(f"[VALS] {name}: value mismatch, e.g. {diff}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
