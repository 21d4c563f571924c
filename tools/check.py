#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB oracle gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Runs each SQL in <verifyOutDir>/oracle_sql.json against DuckDB views of
the sfDir parquet tables, loads the matching Spark result parquet, sorts
columns by name and rows by all columns, and diffs cell-by-cell.
"""
import sys, os, json, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    failed = set()
    for name in sorted(oracle):
        sql = oracle[name]
        res_glob = glob.glob(f"{outdir}/{name}/*.parquet")
        if not res_glob:
            print(f"FAIL {name}: no spark result parquet")
            n_fail += 1
            failed.add(name)
            continue
        try:
            exp = canon(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            failed.add(name)
            continue
        got = canon(con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'").df())
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: columns exp={list(exp.columns)} got={list(got.columns)}")
            n_fail += 1
            failed.add(name)
            continue
        if len(exp) != len(got):
            print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
            n_fail += 1
            failed.add(name)
            continue
        es = exp.astype(str).values
        gs = got.astype(str).values
        bad = (es != gs)
        if bad.any():
            idx = list(zip(*bad.nonzero()))[:5]
            print(f"FAIL {name}: {bad.sum()} mismatched cells, e.g.:")
            for r, c in idx:
                print(f"  row {r} col {exp.columns[c]}: exp={es[r][c]} got={gs[r][c]}")
            n_fail += 1
            failed.add(name)
        else:
            print(f"PASS {name} ({len(exp)} rows)")
            n_pass += 1
    # Verify's fail-loud artifact: queries that crashed never produced
    # a result dir, so without this they'd vanish from the report
    # (the r9 masking failure mode). Count each as a FAIL.
    errs_path = f"{outdir}/errors.json"
    if os.path.exists(errs_path):
        for name, err in sorted(json.load(open(errs_path)).items()):
            # a crashed declared query already FAILed above ("no spark
            # result parquet"); don't double-count it (ADVICE r10)
            if name in failed:
                print(f"  (crash detail for {name}: {err})")
                continue
            print(f"FAIL {name}: query crashed: {err}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
