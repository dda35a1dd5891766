#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate: run each oracle SQL
from <outDir>/oracle_sql.json in DuckDB over the sf tables, compare against
the Spark parquet dump in <outDir>/<name>/ (columns sorted by name, rows
sorted, exact values). Dev tool only — not part of the shipped library.

Usage: python3 tools/compare.py <sfDir> <outDir>
"""
import sys, json, glob, math
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
declared = set(oracle)

import numpy as np

def norm(v):
    # Type-strict: int64 5 vs float64 5.0 must FAIL (the driver hashes string
    # forms, so DuckDB HUGEINT->float64 conversions break parity even when
    # Python == would accept them).
    if isinstance(v, (bool, np.bool_)): return ("b", bool(v))
    if isinstance(v, (int, np.integer)): return ("i", int(v))
    if isinstance(v, (float, np.floating)):
        if math.isnan(v): return ("f", "NaN")
        return ("f", float(v))
    return ("o", str(v))

fails, passes = [], []
for name in sorted(oracle):
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        fails.append((name, "NO SPARK OUTPUT")); continue
    try:
        got = con.sql(f"SELECT * FROM '{files[0]}'").df()
        exp = con.sql(oracle[name]).df()
    except Exception as e:
        fails.append((name, f"oracle error: {e}")); continue
    gc, ec = sorted(got.columns), sorted(exp.columns)
    if gc != ec:
        fails.append((name, f"schema: spark={gc} oracle={ec}")); continue
    g = [tuple(norm(v) for v in r) for r in got[gc].itertuples(index=False)]
    e = [tuple(norm(v) for v in r) for r in exp[ec].itertuples(index=False)]
    g.sort(key=repr); e.sort(key=repr)
    if len(g) != len(e):
        fails.append((name, f"rows: spark={len(g)} oracle={len(e)}")); continue
    bad = [(a, b) for a, b in zip(g, e) if a != b]
    if bad:
        fails.append((name, f"values differ ({len(bad)}/{len(g)} rows), first: spark={bad[0][0]} oracle={bad[0][1]}"))
    else:
        passes.append((name, len(g)))

for n, c in passes: print(f"PASS {n} ({c} rows)")
for n, m in fails: print(f"FAIL {n}: {m}")
nodecl = [d.split('/')[-1] for d in glob.glob(f"{outdir}/*")
          if '.' not in d.split('/')[-1] and d.split('/')[-1] not in declared]
if nodecl: print("rows-only (no oracle):", nodecl)
print(f"\n{len(passes)} pass / {len(fails)} fail")
sys.exit(1 if fails else 0)
