#!/usr/bin/env python3
"""Pre-flight mimic of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/compare_oracle.py <sfdir> <verify_outdir>

For each query dir under <verify_outdir>: read the Spark parquet result,
run the corresponding oracle SQL (oracle_sql.json) in DuckDB with the
sf tables registered as views, sort columns by name, sort rows, and
compare values exactly (small float tolerance reported separately).
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

ok, bad = [], []
for qdir in sorted(glob.glob(f"{outdir}/*/")):
    name = os.path.basename(qdir.rstrip("/"))
    spark_df = pd.read_parquet(qdir)
    if name not in oracle:
        ok.append((name, f"rows-only ({len(spark_df)} rows)"))
        continue
    try:
        duck_df = con.execute(oracle[name]).df()
    except Exception as e:
        bad.append((name, f"ORACLE SQL ERROR: {e}"))
        continue
    s, d = canon(spark_df), canon(duck_df)
    if list(s.columns) != list(d.columns):
        bad.append((name, f"SCHEMA: spark={list(s.columns)} duck={list(d.columns)}"))
        continue
    if len(s) != len(d):
        bad.append((name, f"ROWS: spark={len(s)} duck={len(d)}"))
        continue
    diffs = []
    for c in s.columns:
        a, b = s[c].values, d[c].values
        if a.dtype.kind == 'f' or b.dtype.kind == 'f':
            af = a.astype(float); bf = b.astype(float)
            exact = np.array_equal(af, bf, equal_nan=True)
            close = np.allclose(af, bf, rtol=1e-9, atol=1e-12, equal_nan=True)
            if not exact:
                mx = np.nanmax(np.abs(af - bf)) if len(af) else 0
                diffs.append(f"{c}: exact=False close={close} maxdiff={mx:.3e}")
        else:
            sa = pd.Series(a).astype(str); sb = pd.Series(b).astype(str)
            if not (sa == sb).all():
                i = int((sa != sb).idxmax())
                diffs.append(f"{c}: MISMATCH row {i}: {sa[i]!r} vs {sb[i]!r}")
    if diffs:
        bad.append((name, "; ".join(diffs)))
    else:
        ok.append((name, f"EXACT ({len(s)} rows)"))

for n, m in ok: print(f"PASS {n}: {m}")
for n, m in bad: print(f"FAIL {n}: {m}")
print(f"\n{len(ok)} pass, {len(bad)} fail")
