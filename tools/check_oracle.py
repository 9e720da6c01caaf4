#!/usr/bin/env python3
"""Local pre-validation of SparkEntry.oracleSql against DuckDB — mimics the
driver's compare: run each oracle SQL on the same parquet tables, sort columns
by name, sort rows, compare values cell-by-cell (exact for ints/strings/dates,
tight tolerance report for floats to surface any nondeterminism early).
Usage: check_oracle.py <sfdir> <verify_outdir>
"""
import json, sys, glob, os
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = []
for name, sql in sorted(oracle.items()):
    spark_df = pd.concat([pd.read_parquet(f) for f in glob.glob(f"{outdir}/{name}/*.parquet")],
                         ignore_index=True)
    try:
        duck_df = con.execute(sql).fetchdf()
    except Exception as e:
        fails.append(name); print(f"FAIL {name}: duckdb error {e}"); continue
    sc, dc = sorted(spark_df.columns), sorted(duck_df.columns)
    if sc != dc:
        fails.append(name); print(f"FAIL {name}: cols spark={sc} duck={dc}"); continue
    s = spark_df[sc].sort_values(sc, kind="mergesort").reset_index(drop=True)
    d = duck_df[dc].sort_values(dc, kind="mergesort").reset_index(drop=True)
    if len(s) != len(d):
        fails.append(name); print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}"); continue
    ok = True
    for c in sc:
        sv, dv = s[c], d[c]
        if str(sv.dtype) != str(dv.dtype):
            print(f"  note {name}.{c}: dtype spark={sv.dtype} duck={dv.dtype}")
        try:
            if sv.dtype.kind == 'f' or dv.dtype.kind == 'f':
                import numpy as np
                a, b = sv.astype(float).values, dv.astype(float).values
                nan_ok = (pd.isna(a) == pd.isna(b)).all()
                diff = abs(pd.Series(a).fillna(0) - pd.Series(b).fillna(0)).max()
                if not nan_ok or diff != 0.0:
                    ok = False
                    print(f"FAIL {name}.{c}: max |diff| = {diff}, bitexact=False")
            else:
                if not sv.astype(str).equals(dv.astype(str)):
                    ok = False
                    mism = (sv.astype(str) != dv.astype(str))
                    i = mism.idxmax()
                    print(f"FAIL {name}.{c}: first mismatch row {i}: spark={sv[i]!r} duck={dv[i]!r}")
        except Exception as e:
            ok = False; print(f"FAIL {name}.{c}: compare error {e}")
    if ok:
        print(f"OK   {name} ({len(s)} rows)")
    else:
        fails.append(name)

no_oracle = [d for d in os.listdir(outdir)
             if os.path.isdir(f"{outdir}/{d}") and d not in oracle]
print(f"\nno-oracle (rows-only): {sorted(no_oracle)}")
print(f"\n{len(oracle)-len(fails)}/{len(oracle)} oracle queries match")
sys.exit(1 if fails else 0)
