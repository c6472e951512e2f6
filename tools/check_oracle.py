#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <sf_dir> <verify_out_dir>

For each query result under <verify_out_dir>/<name>/ (Spark parquet):
run oracle_sql.json[<name>] in DuckDB over views of <sf_dir>/*.parquet,
sort columns by name, compare row count, column names/types, and values.
"""
import sys, os, json, glob
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    names = sorted(d for d in os.listdir(out_dir) if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = n_skip = 0
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"{name}: NO RESULT FILES"); n_fail += 1; continue
        res = con.sql(f"SELECT * FROM read_parquet({files!r})").df()
        if name not in oracle:
            print(f"{name}: rows={len(res)} (no oracle — rows-only)"); n_skip += 1; continue
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"{name}: ORACLE SQL ERROR: {e}"); n_fail += 1; continue
        res = res[sorted(res.columns)]
        exp = exp[sorted(exp.columns)]
        ok = True
        if list(res.columns) != list(exp.columns):
            print(f"{name}: COLUMN MISMATCH spark={list(res.columns)} oracle={list(exp.columns)}"); ok = False
        elif len(res) != len(exp):
            print(f"{name}: ROWCOUNT MISMATCH spark={len(res)} oracle={len(exp)}"); ok = False
        else:
            import pandas as pd
            for c in res.columns:
                a, b = res[c], exp[c]
                if str(a.dtype) != str(b.dtype):
                    print(f"{name}: dtype mismatch col={c} spark={a.dtype} oracle={b.dtype}"); ok = False
                na, nb = a.isna(), b.isna()
                if not na.equals(nb):
                    print(f"{name}: null-pattern mismatch col={c}"); ok = False; continue
                neq = ~((a == b) | (na & nb))
                if neq.any():
                    i = neq.idxmax()
                    print(f"{name}: VALUE MISMATCH col={c} at row {i}: spark={a[i]!r} oracle={b[i]!r} ({int(neq.sum())} diffs)")
                    ok = False
        if ok:
            print(f"{name}: OK rows={len(res)}"); n_pass += 1
        else:
            n_fail += 1
    print(f"\nPASS={n_pass} FAIL={n_fail} ROWS_ONLY={n_skip}")
    return n_fail

if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)
