#!/usr/bin/env python3
"""Compare two Verify output dirs value-for-value (e.g. runs at
different SPARK_GRAFT_CPUS) — catches partition-count-dependent
nondeterminism before the driver does.
Usage: python3 tools/crosscheck.py /tmp/verify_a /tmp/verify_b
"""
import sys, os
import duckdb

def main(a, b):
    con = duckdb.connect()
    names = sorted(d for d in os.listdir(a) if os.path.isdir(os.path.join(a, d)))
    bad = 0
    for n in names:
        try:
            da = con.execute(f"SELECT * FROM '{a}/{n}/*.parquet'").fetchdf()
            db = con.execute(f"SELECT * FROM '{b}/{n}/*.parquet'").fetchdf()
        except Exception as e:
            print(f"DIFF {n}: read error {e}")
            bad += 1
            continue
        if list(da.columns) != list(db.columns) or len(da) != len(db):
            print(f"DIFF {n}: shape {da.shape} vs {db.shape}")
            bad += 1
            continue
        if not da.equals(db):
            print(f"DIFF {n}: values differ")
            bad += 1
        else:
            print(f"SAME {n} ({len(da)} rows)")
    print(f"\n{len(names) - bad} identical / {bad} differ")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
