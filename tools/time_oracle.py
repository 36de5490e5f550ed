#!/usr/bin/env python3
"""Time the DuckDB side of selected oracle queries — the baseline the
2x-of-single-node gate is audited against (PLANS.md "Measured vs
single-node DuckDB").

Usage: python3 tools/time_oracle.py <sfDir> <verifyOutDir> <q1,q2,...>

Runs each oracle SQL from <verifyOutDir>/oracle_sql.json twice against
the sf parquet views and prints min-of-2 wall seconds per query —
the same min-of-N convention graft.Bench uses.

Dev tool only (duckdb is a driver-side dep, not a library dep).
"""
import json, os, sys, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main():
    sf_dir, out_dir, names = sys.argv[1], sys.argv[2], sys.argv[3].split(",")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    for name in names:
        if name not in oracle:
            print(f"{name}: no oracle sql")
            continue
        times = []
        for _ in range(2):
            t0 = time.time()
            con.sql(oracle[name]).fetchall()
            times.append(time.time() - t0)
        print(f"{name}: {min(times):.3f} s  (passes: {['%.3f' % t for t in times]})")

if __name__ == "__main__":
    main()
