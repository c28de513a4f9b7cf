#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Runs each oracle_sql.json query in DuckDB against the same sf dir, loads the
Spark result parquet, sorts columns by name and rows by all columns, and
compares cell-by-cell (exact; floats reported with ulp context on mismatch).

Usage: python3 scripts/check.py <sfDir> <outDir>
"""
import json, math, sys

import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
failed = []
for name, sql in sorted(oracle.items()):
    try:
        exp = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}")
        failed.append(name)
        continue
    try:
        got = con.sql(
            f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").df()
    except Exception as e:
        print(f"FAIL {name}: spark result missing: {e}")
        failed.append(name)
        continue
    exp = exp.reindex(sorted(exp.columns), axis=1)
    got = got.reindex(sorted(got.columns), axis=1)
    if list(exp.columns) != list(got.columns):
        print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
        failed.append(name)
        continue
    if len(exp) != len(got):
        print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
        failed.append(name)
        continue
    exp = exp.sort_values(list(exp.columns), na_position="first").reset_index(drop=True)
    got = got.sort_values(list(got.columns), na_position="first").reset_index(drop=True)
    import pandas as pd
    import numpy as np

    def _cmp_safe(s):
        # LIST columns arrive as ndarray cells; == on those raises
        if s.dtype == object:
            return s.map(lambda x: tuple(x) if isinstance(x, (np.ndarray, list)) else x)
        return s

    bad = 0
    for c in exp.columns:
        ev, gv = _cmp_safe(exp[c]), _cmp_safe(got[c])
        ok = (ev.isna() & gv.isna()) | (ev == gv)
        nbad = int((~ok).sum())
        if nbad:
            for i in list(ok[~ok].index[:3]):
                print(f"  {name}.{c}[{i}]: spark={gv.iloc[i]!r} oracle={ev.iloc[i]!r}")
            bad += nbad
    if bad:
        print(f"FAIL {name}: {bad} cell mismatches")
        failed.append(name)
    else:
        print(f"PASS {name} ({len(exp)} rows)")
print()
print(f"{len(oracle) - len(failed)}/{len(oracle)} passed")
sys.exit(1 if failed else 0)
