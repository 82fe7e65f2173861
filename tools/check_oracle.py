#!/usr/bin/env python3
"""Local pre-flight for the driver's correctness gate.

Reads <outDir>/oracle_sql.json + each <outDir>/<name>/ parquet result
(written by graft.Verify), runs the oracle SQL in DuckDB over the same
sf directory, and compares: row count, column names (sorted), and the
full sorted value matrix. Not my library code — dev tooling only.

Usage: python3 tools/check_oracle.py <sfDir> <outDir> [name ...]
"""
import sys, json, glob, math, decimal

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

# Strictly harsher than the driver (round-1 lesson: f"{v:.6g}" masked the
# DECIMAL trailing-zero class — local 60/60 coexisted with driver 45/62):
#   * floats compare by exact repr (full precision, bit-for-bit);
#   * decimals are normalized ASYMMETRICALLY — oracle side coerced to float
#     (repr), parquet side kept as fixed-scale str — simulating the driver's
#     one-sided float coercion, so any DECIMAL output with a trailing zero
#     fails locally exactly as it fails on the driver.


def norm_float(v):
    if math.isnan(v):
        return "NaN"
    return repr(v)


def norm_exp(v):  # oracle (DuckDB) side
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return norm_float(v)
    if isinstance(v, decimal.Decimal):
        return norm_float(float(v))
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def norm_got(v):  # Spark parquet result side
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return norm_float(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)  # Decimal stays fixed-scale ('0.5000') → mismatch by design


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"MISSING result: {name}")
            n_fail += 1
            continue
        try:
            exp = con.execute(oracle[name]).fetchall()
            exp_cols = [d[0] for d in con.description]
        except Exception as e:
            print(f"ORACLE-ERR {name}: {e}")
            n_fail += 1
            continue
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchall()
        got_cols = [d[0] for d in con.description]
        if sorted(exp_cols) != sorted(got_cols):
            print(f"FAIL {name}: cols exp={sorted(exp_cols)} got={sorted(got_cols)}")
            n_fail += 1
            continue
        # reorder got columns to expected order
        idx = [got_cols.index(c) for c in exp_cols]
        got = [tuple(r[i] for i in idx) for r in got]
        e_n = sorted(tuple(norm_exp(v) for v in r) for r in exp)
        g_n = sorted(tuple(norm_got(v) for v in r) for r in got)
        if len(e_n) != len(g_n):
            print(f"FAIL {name}: rows exp={len(e_n)} got={len(g_n)}")
            n_fail += 1
            continue
        if e_n != g_n:
            diffs = [(a, b) for a, b in zip(e_n, g_n) if a != b][:3]
            print(f"FAIL {name}: values differ, first diffs (exp,got): {diffs}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(g_n)} rows)")
        n_pass += 1
    # queries without oracle → rows-only
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
