#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify output
against the DuckDB oracles and diff. Usage:
  python3 tools/selfcheck.py /root/testdata/sf0.01 /tmp/verify_out
"""
import sys, json, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(v)
    return v

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}")
            n_fail += 1
            continue
        try:
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        gcols, ecols = sorted(got.columns), sorted(exp.columns)
        if gcols != ecols:
            print(f"FAIL {name}: columns {gcols} vs {ecols}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}")
            n_fail += 1
            continue
        got, exp = got[gcols], exp[ecols]
        bad = 0
        for c in gcols:
            gv = [norm(x) for x in got[c].tolist()]
            ev = [norm(x) for x in exp[c].tolist()]
            if gv != ev:
                for i, (a, b) in enumerate(zip(gv, ev)):
                    eq = a == b or (a is None and b is None)
                    try:
                        import pandas as pd
                        eq = eq or (pd.isna(a) and pd.isna(b))
                    except Exception:
                        pass
                    if not eq:
                        print(f"FAIL {name}: col {c} row {i}: {a!r} vs {b!r}")
                        bad += 1
                        break
        if bad:
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail "
          f"(+{len(json.load(open(f'{out_dir}/oracle_sql.json')))} oracled)")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
