#!/usr/bin/env python3
# Dev-only validation harness mirroring the driver correctness gate:
# runs each oracle_sql.json query in DuckDB and value-compares against the
# Spark parquet outputs from `graft.Verify` (sorted columns+rows).
# Usage: python3 scripts/oracle_mimic.py [sfDir] [verifyOutDir]
# NOT part of the shipped library (duckdb/pandas are driver-side tools).
import duckdb, json, glob, sys
sf = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
out = sys.argv[2] if len(sys.argv) > 2 else '/tmp/verify_out'
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
oracle = json.load(open(f'{out}/oracle_sql.json'))
for name in sorted(oracle):
    try:
        o = con.sql(oracle[name]).df()
        files = glob.glob(f'{out}/{name}/*.parquet')
        s = con.sql(f"SELECT * FROM read_parquet({files})").df()
        ocols, scols = sorted(o.columns), sorted(s.columns)
        if ocols != scols:
            print(f'{name}: SCHEMA MISMATCH oracle={ocols} spark={scols}'); continue
        o2 = o[ocols].sort_values(ocols, na_position='first').reset_index(drop=True)
        s2 = s[scols].sort_values(scols, na_position='first').reset_index(drop=True)
        if len(o2) != len(s2):
            print(f'{name}: ROWCOUNT oracle={len(o2)} spark={len(s2)}'); continue
        # dtype align
        eq = True
        for c in ocols:
            oc, sc = o2[c], s2[c]
            try:
                import pandas as pd
                if oc.dtype != sc.dtype:
                    oc = oc.astype(str); sc = sc.astype(str)
                neq = (oc != sc) & ~(oc.isna() & sc.isna())
                if neq.any():
                    eq = False
                    i = neq.idxmax()
                    print(f'{name}: VALUE MISMATCH col={c} row={i} oracle={o2[c][i]!r} spark={s2[c][i]!r}')
                    break
            except Exception as e:
                eq = False; print(f'{name}: compare error col={c}: {e}'); break
        if eq:
            print(f'{name}: OK rows={len(o2)}')
    except Exception as e:
        print(f'{name}: ORACLE FAIL {str(e)[:200]}')
