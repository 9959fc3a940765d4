#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query output in
<outDir>, run its DuckDB oracle over the raw testdata tables and compare
(rows, schema-ish, values). Usage: local_check.py <sfDir> <outDir>.

Driver-side tooling only (duckdb/pandas are not dependencies of the Scala
library)."""
import json, sys, glob, os
import duckdb

def canon(df):
    # sort columns by name, then rows by all values (None-safe), like the driver
    cols = sorted(df.columns)
    df = df[cols]
    rows = [tuple(xs) for xs in df.itertuples(index=False, name=None)]
    rows.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return cols, rows

def norm(v):
    import datetime, math
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision
    return str(v)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders","lineitem",
              "events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        qdir = f"{out_dir}/{name}"
        if not os.path.isdir(qdir):
            continue
        try:
            mine = con.sql(f"SELECT * FROM '{qdir}/*.parquet'").df()
        except Exception as e:
            print(f"{name:22s} NO OUTPUT: {e}")
            n_fail += 1
            continue
        if name not in oracle:
            print(f"{name:22s} rows-only: {len(mine)} rows")
            continue
        try:
            ref = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"{name:22s} ORACLE ERROR: {e}")
            n_fail += 1
            continue
        mc, mr = canon(mine)
        rc, rr = canon(ref)
        if mc != rc:
            print(f"{name:22s} COLS MISMATCH mine={mc} ref={rc}")
            n_fail += 1
            continue
        if len(mr) != len(rr):
            print(f"{name:22s} ROWS MISMATCH mine={len(mr)} ref={len(rr)}")
            n_fail += 1
            continue
        bad = 0
        for a, b in zip(mr, rr):
            if tuple(map(norm, a)) != tuple(map(norm, b)):
                if bad < 3:
                    print(f"  {name} diff: mine={a} ref={b}")
                bad += 1
        if bad:
            print(f"{name:22s} VALUE MISMATCH ({bad}/{len(mr)} rows)")
            n_fail += 1
        else:
            print(f"{name:22s} OK ({len(mr)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
