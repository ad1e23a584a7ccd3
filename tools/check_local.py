#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: read Verify's parquet
dumps + oracle_sql.json, run each oracle in DuckDB over the same sf
tables, and compare rows/schema/values (columns sorted by name, rows
sorted by all columns — the driver's convention).

Usage: check_local.py <sfDir> <verifyOutDir> [query ...]
"""
import json, sys, glob, os
import duckdb

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(t)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{t}')")
    failures = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        pq = os.path.join(out_dir, name)
        if not os.path.isdir(pq):
            print(f"[{name}] MISSING spark dump"); failures += 1; continue
        spark_df = con.execute(
            f"SELECT * FROM read_parquet('{pq}/*.parquet')").fetchdf()
        try:
            duck_df = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"[{name}] ORACLE ERROR: {e}"); failures += 1; continue
        s = spark_df.reindex(sorted(spark_df.columns), axis=1)
        d = duck_df.reindex(sorted(duck_df.columns), axis=1)
        if list(s.columns) != list(d.columns):
            print(f"[{name}] SCHEMA mismatch: {list(s.columns)} vs {list(d.columns)}")
            failures += 1; continue
        if len(s) != len(d):
            print(f"[{name}] ROWS mismatch: {len(s)} vs {len(d)}")
            failures += 1; continue
        s = s.sort_values(by=list(s.columns)).reset_index(drop=True)
        d = d.sort_values(by=list(d.columns)).reset_index(drop=True)
        bad = None
        for c in s.columns:
            sc, dc = s[c], d[c]
            try:
                import pandas as pd
                if sc.dtype.kind == 'f' or dc.dtype.kind == 'f':
                    import numpy as np
                    if not np.allclose(sc.astype(float), dc.astype(float),
                                       rtol=1e-9, atol=1e-12, equal_nan=True):
                        bad = c; break
                else:
                    if not sc.astype(str).equals(dc.astype(str)):
                        bad = c; break
            except Exception as e:
                bad = f"{c} ({e})"; break
        if bad:
            print(f"[{name}] VALUE mismatch in column {bad}")
            m = (s.astype(str) != d.astype(str)).any(axis=1)
            print("  spark:", s[m].head(3).to_dict("records"))
            print("  duck :", d[m].head(3).to_dict("records"))
            failures += 1
        else:
            print(f"[{name}] OK ({len(s)} rows)")
    sys.exit(1 if failures else 0)

if __name__ == "__main__":
    main()
