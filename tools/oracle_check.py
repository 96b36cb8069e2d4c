#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Loads <verifyOutDir>/oracle_sql.json, registers every parquet table in
<sfDir> as a DuckDB view, runs each oracle SQL, and compares against the
engine result dumped at <verifyOutDir>/<name>/ (parquet). Columns are
sorted by name before comparison (driver convention); floats are compared
via repr round-trip.
"""
import json, sys, glob, os
import duckdb

def canon(df):
    # pandas DataFrame -> list of tuples, columns sorted by name
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False):
        out.append(tuple(repr(v) for v in row))
    return cols, out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        got_files = glob.glob(f"{d}/*.parquet")
        if not got_files:
            print(f"{name}: FAIL (no engine output)")
            n_fail += 1
            continue
        got = con.sql(f"SELECT * FROM '{d}/*.parquet'").df()
        if name not in oracle:
            print(f"{name}: rows-only check — {len(got)} rows "
                  f"{'OK' if len(got) > 0 else 'FAIL(empty)'}")
            continue
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"{name}: FAIL (oracle SQL error: {e})")
            n_fail += 1
            continue
        gc, gv = canon(got)
        ec, ev = canon(exp)
        if gc != ec:
            print(f"{name}: FAIL schema {gc} vs {ec}")
            n_fail += 1
        elif gv != ev:
            n_fail += 1
            diff = [(i, a, b) for i, (a, b) in enumerate(zip(gv, ev)) if a != b]
            print(f"{name}: FAIL values rows={len(gv)}/{len(ev)} "
                  f"first_diffs={diff[:3]}"
                  + (f" len_mismatch" if len(gv) != len(ev) else ""))
        else:
            n_pass += 1
            print(f"{name}: PASS ({len(gv)} rows)")
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
