#!/usr/bin/env python3
"""Local dev mimic of the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

For each <name>.parquet dir under verifyOutDir, runs the matching SQL from
oracle_sql.json in DuckDB (tables registered from sfDir parquet), then
compares row count, column names, and the multiset of rows (columns sorted
by name; values normalized: floats rounded to 6 decimals).
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    import glob
    import os
    names = sorted(os.path.basename(p) for p in glob.glob(f"{out_dir}/*")
                   if os.path.isdir(p))
    for name in names:
        got = con.execute(
            f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchall()
        got_cols = [d[0] for d in con.description]
        if name not in oracle:
            print(f"  {name}: NO-ORACLE rows={len(got)}")
            continue
        try:
            exp = con.execute(oracle[name]).fetchall()
            exp_cols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        gi = sorted(range(len(got_cols)), key=lambda i: got_cols[i])
        ei = sorted(range(len(exp_cols)), key=lambda i: exp_cols[i])
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: cols {sorted(got_cols)} != {sorted(exp_cols)}")
            n_fail += 1
            continue
        g = sorted(tuple(str(norm(r[i])) for i in gi) for r in got)
        e = sorted(tuple(str(norm(r[i])) for i in ei) for r in exp)
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} != {len(e)}")
            n_fail += 1
        elif g != e:
            bad = next(i for i in range(len(g)) if g[i] != e[i])
            print(f"FAIL {name}: values differ, first at sorted idx {bad}:")
            print(f"   got {g[bad]}")
            print(f"   exp {e[bad]}")
            n_fail += 1
        else:
            print(f"  ok {name} ({len(g)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
