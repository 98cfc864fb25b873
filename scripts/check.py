#!/usr/bin/env python3
"""Dev-only local mirror of the driver's DuckDB-oracle compare.
Usage: check.py <sfDir> <verifyOutDir>"""
import sys, json, glob, os
import duckdb, pandas as pd
import pyarrow.parquet as pq

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    pdir = f"{out}/{name}"
    files = glob.glob(f"{pdir}/*.parquet")
    if not files:
        print(f"{name}: MISSING spark output"); fails += 1; continue
    sdf = pq.read_table(files[0]).to_pandas()
    try:
        ddf = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"{name}: ORACLE SQL ERROR: {e}"); fails += 1; continue
    sdf = sdf[sorted(sdf.columns)]; ddf = ddf[sorted(ddf.columns)]
    if list(sdf.columns) != list(ddf.columns):
        print(f"{name}: COLUMN MISMATCH spark={list(sdf.columns)} duck={list(ddf.columns)}"); fails += 1; continue
    if len(sdf) != len(ddf):
        print(f"{name}: ROWCOUNT MISMATCH spark={len(sdf)} duck={len(ddf)}"); fails += 1; continue
    # normalize row order then compare values
    sdf = sdf.sort_values(list(sdf.columns)).reset_index(drop=True)
    ddf = ddf.sort_values(list(ddf.columns)).reset_index(drop=True)
    ok = True
    for c in sdf.columns:
        a, b = sdf[c], ddf[c]
        try:
            if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                import numpy as np
                if not np.array_equal(a.to_numpy(), b.to_numpy(), equal_nan=True):
                    ok = False
            else:
                if not (a.astype(str) == b.astype(str)).all():
                    ok = False
        except Exception as e:
            ok = False
        if not ok:
            import numpy as np
            try:
                neq = np.where(a.to_numpy() != b.to_numpy())[0][:3].tolist()
            except Exception:
                neq = (a.astype(str) != b.astype(str))
                neq = neq[neq].index[:3].tolist()
            print(f"{name}: VALUE MISMATCH col={c} rows={neq} spark={a.iloc[neq].tolist() if neq else '?'} duck={b.iloc[neq].tolist() if neq else '?'}")
            break
    if ok: print(f"{name}: OK ({len(sdf)} rows)")
    else: fails += 1
print(f"\n{'FAIL' if fails else 'PASS'}: {len(oracle)-fails}/{len(oracle)} matched")
sys.exit(1 if fails else 0)
