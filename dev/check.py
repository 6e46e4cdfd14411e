#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run Verify output vs DuckDB."""
import duckdb, json, os, sys, glob
import pandas as pd
import numpy as np

sfdir, outdir = sys.argv[1], sys.argv[2]
only = sys.argv[3].split(',') if len(sys.argv) > 3 else None
con = duckdb.connect()
for p in glob.glob(os.path.join(sfdir, '*.parquet')):
    # ScaleData writes multi-file tables as DIRECTORIES named <t>.parquet
    src = f'{p}/*.parquet' if os.path.isdir(p) else p
    con.sql(f"CREATE VIEW {os.path.basename(p)[:-8]} AS SELECT * FROM '{src}'")
oracle = json.load(open(os.path.join(outdir, 'oracle_sql.json')))
fails = []
for name in sorted(oracle):
    if only and name not in only: continue
    try:
        spark = pd.read_parquet(os.path.join(outdir, name))
    except Exception as e:
        print(f"{name}: NO SPARK OUTPUT ({e})"); fails.append(name); continue
    try:
        duck = con.sql(oracle[name]).df()
    except Exception as e:
        print(f"{name}: ORACLE SQL FAILED: {e}"); fails.append(name); continue
    sc, dc = sorted(spark.columns), sorted(duck.columns)
    if sc != dc:
        print(f"{name}: SCHEMA MISMATCH spark={sc} duck={dc}"); fails.append(name); continue
    s = spark[sc].sort_values(sc, kind='mergesort').reset_index(drop=True)
    d = duck[sc].sort_values(sc, kind='mergesort').reset_index(drop=True)
    if len(s) != len(d):
        print(f"{name}: ROWCOUNT spark={len(s)} duck={len(d)}"); fails.append(name); continue
    bad = None
    for c in sc:
        a, b = s[c], d[c]
        if str(a.dtype) != str(b.dtype):
            print(f"{name}: dtype note {c}: spark={a.dtype} duck={b.dtype}")
        try:
            eq = (a.isna() & b.isna()) | (a == b)
        except Exception:
            eq = a.astype(str) == b.astype(str)
        if not eq.fillna(False).all():
            i = int((~eq.fillna(False)).idxmax())
            bad = (c, i, a.iloc[i], b.iloc[i]); break
    if bad:
        c, i, av, bv = bad
        print(f"{name}: VALUE MISMATCH col={c} row={i} spark={av!r} duck={bv!r} ({len(s)} rows)")
        fails.append(name)
    else:
        print(f"{name}: OK ({len(s)} rows)")
print(f"\n{len(oracle) - len(fails)}/{len(oracle)} passed" + (f"; FAILED: {fails}" if fails else ""))
sys.exit(1 if fails else 0)
