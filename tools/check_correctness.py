#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage:  python3 tools/check_correctness.py SF_DIR VERIFY_OUT_DIR

Reads VERIFY_OUT_DIR/oracle_sql.json (written by `graft.Verify`), runs
each oracle query in DuckDB against the parquet tables in SF_DIR, reads
the Spark result parquet from VERIFY_OUT_DIR/<name>/, sorts columns by
name (mirroring the driver) and rows by all columns, and compares
values exactly. Reports per-query PASS/FAIL plus rows-only queries
(no oracle entry).
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        # exact compare — the driver hashes values, so any FP divergence
        # must surface here, not be rounded away
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

    import os
    produced = sorted(d for d in os.listdir(out_dir)
                      if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = 0
    for name in produced:
        spark_glob = f"{out_dir}/{name}/*.parquet"
        try:
            sdf = con.sql(f"SELECT * FROM '{spark_glob}'").df()
        except Exception as e:
            print(f"FAIL  {name}: cannot read spark output: {e}")
            n_fail += 1
            continue
        if name not in oracle:
            print(f"ROWS  {name}: rows={len(sdf)} (no oracle; rows-only check)")
            continue
        try:
            odf = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}")
            n_fail += 1
            continue
        scols, ocols = sorted(sdf.columns), sorted(odf.columns)
        if scols != ocols:
            print(f"FAIL  {name}: columns {scols} != {ocols}")
            n_fail += 1
            continue
        srows = [tuple(norm(v) for v in r) for r in
                 sdf[scols].itertuples(index=False, name=None)]
        orows = [tuple(norm(v) for v in r) for r in
                 odf[ocols].itertuples(index=False, name=None)]
        if sorted(srows, key=repr) == sorted(orows, key=repr):
            if srows == orows:
                print(f"PASS  {name}: {len(srows)} rows (ordered)")
            else:
                print(f"PASS* {name}: {len(srows)} rows (set-equal, ORDER differs!)")
            n_pass += 1
        else:
            n_fail += 1
            sset = {r: srows.count(r) for r in srows[:0]}  # placeholder
            only_s = [r for r in srows if r not in orows][:3]
            only_o = [r for r in orows if r not in srows][:3]
            print(f"FAIL  {name}: spark={len(srows)} oracle={len(orows)} rows")
            for r in only_s:
                print(f"      spark-only: {r}")
            for r in only_o:
                print(f"      oracle-only: {r}")
    missing = sorted(set(oracle) - set(produced))
    for name in missing:
        print(f"FAIL  {name}: oracle declared but no spark output")
        n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, "
          f"{len([n for n in produced if n not in oracle])} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
