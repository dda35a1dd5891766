#!/usr/bin/env python3
"""Signed-zero oracle audit: the driver's t2 gate hashes STRING forms of
values, so a DuckDB oracle emitting -0.0 where Spark (whose dump boundary is
normalized wholesale by graft.functions.NumOps) emits +0.0 hash-mismatches
even though the values are IEEE-equal. This tool runs every oracle SQL from
<outDir>/oracle_sql.json in DuckDB against one or more sf dirs and reports
every float/double output cell whose bit pattern is a NEGATIVE zero — each
hit is an oracle that needs the `+ 0.0` normalization (the spearmanSql /
dsirSelectSql idiom). Dev tool only — not part of the shipped library.

Usage: python3 tools/negzero_audit.py <outDir> <sfDir> [<sfDir> ...]
Exit code 1 when any negative zero is found.
"""
import sys, json, math, struct
import duckdb
import numpy as np

outdir, sfdirs = sys.argv[1], sys.argv[2:]
oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def is_negzero(v):
    return isinstance(v, (float, np.floating)) and v == 0.0 \
        and math.copysign(1.0, v) < 0

bad = 0
for sfdir in sfdirs:
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    for name in sorted(oracle):
        try:
            df = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"ERR  {name} @ {sfdir}: {e}")
            bad += 1
            continue
        for c in df.columns:
            if df[c].dtype.kind != "f":
                continue
            hits = [v for v in df[c] if is_negzero(v)]
            if hits:
                print(f"NEGZERO {name} @ {sfdir}: column '{c}' has "
                      f"{len(hits)} negative-zero value(s)")
                bad += 1
print(f"{'FAIL' if bad else 'OK'}: {bad} negative-zero/err findings "
      f"across {len(oracle)} oracles x {len(sfdirs)} SFs")
sys.exit(1 if bad else 0)
