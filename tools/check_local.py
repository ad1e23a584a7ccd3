#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: read Verify's parquet
dumps + oracle_sql.json, run each oracle in DuckDB over the same sf
tables, and compare rows/schema/values (columns sorted by name, rows
sorted by all columns — the driver's convention).

Usage: check_local.py [--fresh] <sfDir> <verifyOutDir> [query ...]

--fresh (round 20, the r19 verdict's #5): run EVERY query in its own
subprocess. The single-process sweep accumulates DuckDB/pyarrow
allocator state across ~180 oracles and eventually dies with spurious
"Failed to allocate block" errors on a host with >100 GiB free — the
round-19 driver artifact lost 132 rows to exactly this. A fresh process
per query is immune; use it for full-registry sweeps and to adjudicate
any single-process OOM.
"""
import json, subprocess, sys, glob, os


def check_one(con, sf_dir, out_dir, name, sql):
    """Compare one query's parquet dump against its oracle; returns True
    on match (prints the driver-style verdict line)."""
    pq = os.path.join(out_dir, name)
    if not os.path.isdir(pq):
        print(f"[{name}] MISSING spark dump"); return False
    spark_df = con.execute(
        f"SELECT * FROM read_parquet('{pq}/*.parquet')").fetchdf()
    try:
        duck_df = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"[{name}] ORACLE ERROR: {e}"); return False
    s = spark_df.reindex(sorted(spark_df.columns), axis=1)
    d = duck_df.reindex(sorted(duck_df.columns), axis=1)
    if list(s.columns) != list(d.columns):
        print(f"[{name}] SCHEMA mismatch: {list(s.columns)} vs {list(d.columns)}")
        return False
    if len(s) != len(d):
        print(f"[{name}] ROWS mismatch: {len(s)} vs {len(d)}")
        return False
    s = s.sort_values(by=list(s.columns)).reset_index(drop=True)
    d = d.sort_values(by=list(d.columns)).reset_index(drop=True)
    bad = None
    for c in s.columns:
        sc, dc = s[c], d[c]
        try:
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
        return False
    print(f"[{name}] OK ({len(s)} rows)")
    return True


def connect(sf_dir):
    import duckdb
    con = duckdb.connect()
    for t in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(t)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{t}')")
    return con


def main():
    args = sys.argv[1:]
    fresh = "--fresh" in args
    if fresh:
        args = [a for a in args if a != "--fresh"]
    sf_dir, out_dir = args[0], args[1]
    only = set(args[2:])
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    names = [n for n in sorted(oracle) if not only or n in only]
    if fresh:
        failures = 0
        for name in names:
            # one subprocess per query: allocator state cannot accumulate
            r = subprocess.run([sys.executable, os.path.abspath(__file__),
                                sf_dir, out_dir, name])
            failures += 1 if r.returncode else 0
        print(f"[fresh sweep] {len(names) - failures}/{len(names)} OK")
        sys.exit(1 if failures else 0)
    con = connect(sf_dir)
    failures = 0
    for name in names:
        if not check_one(con, sf_dir, out_dir, name, oracle[name]):
            failures += 1
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
