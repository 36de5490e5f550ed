#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, runs each SQL in DuckDB with the
sf parquet tables registered as views, and compares against the Spark
parquet dump in <verifyOutDir>/<name>/ — columns sorted by name, rows
sorted, values stringified. Prints a per-query verdict.

Dev tool only (duckdb/pyarrow are driver-side deps, not library deps).
"""
import json, sys, os, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df):
    import pandas as pd
    import decimal
    df = df.reindex(sorted(df.columns), axis=1)
    def cell(v):
        if v is None or v != v:
            return "NULL"
        # Match the driver's canonicalizer: DECIMAL is coerced to float64
        # before stringification (observed in CORRECTNESS_r02 — Spark
        # Decimal('253994.00') vs DuckDB 253994.0 broke the hash), and
        # floats hash at full repr precision, not rounded.
        if isinstance(v, decimal.Decimal):
            v = float(v)
        if isinstance(v, float):
            return repr(v)
        if isinstance(v, (list, tuple)) or type(v).__name__ == 'ndarray':
            return "[" + ",".join(cell(x) for x in v) + "]"
        return str(v)
    rows = ["\x1f".join(cell(v) for v in row) for row in df.itertuples(index=False, name=None)]
    rows.sort()
    return rows

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    n_ok = n_bad = n_skip = 0
    names = sorted(set(oracle) | {os.path.basename(d) for d in glob.glob(out_dir + "/*") if os.path.isdir(d)})
    for name in names:
        spark_path = os.path.join(out_dir, name)
        if not os.path.isdir(spark_path):
            print(f"  {name}: NO SPARK OUTPUT"); n_bad += 1; continue
        got = con.sql(f"SELECT * FROM '{spark_path}/*.parquet'").df()
        if name not in oracle:
            print(f"  {name}: rows-only ({len(got)} rows)"); n_skip += 1; continue
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"  {name}: ORACLE SQL ERROR: {e}"); n_bad += 1; continue
        g, e = canon(got), canon(exp)
        cols_g, cols_e = sorted(got.columns), sorted(exp.columns)
        if cols_g != cols_e:
            print(f"  {name}: SCHEMA MISMATCH spark={cols_g} duckdb={cols_e}"); n_bad += 1
        elif g != e:
            print(f"  {name}: VALUE MISMATCH ({len(g)} vs {len(e)} rows)")
            for i, (a, b) in enumerate(zip(g, e)):
                if a != b:
                    print(f"    first diff row {i}:\n      spark : {a[:300]}\n      duckdb: {b[:300]}")
                    break
            else:
                print(f"    row-count diff only; spark head: {g[:1]} duckdb head: {e[:1]}")
            n_bad += 1
        else:
            print(f"  {name}: OK ({len(g)} rows)"); n_ok += 1
    print(f"== {n_ok} ok, {n_bad} bad, {n_skip} rows-only")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
