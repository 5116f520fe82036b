#!/usr/bin/env python3
"""Dev-only harness (mimics the driver's correctness gate): compare
graft.Verify parquet dumps against the DuckDB oracle SQL.
Usage: python3 tools/check_oracle.py <sfdir> <verify_outdir>
"""
import duckdb, json, sys, os
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem',
          'events','documents','embeddings']:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f'{outdir}/oracle_sql.json'))
fail = 0

def norm(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind='mergesort').reset_index(drop=True)
    return df

names = sorted(d for d in os.listdir(outdir) if os.path.isdir(os.path.join(outdir, d)))
for name in names:
    try:
        spark_df = pd.read_parquet(f'{outdir}/{name}')
    except Exception as e:
        print(f'{name:28s} SPARK READ ERROR: {e}'); fail += 1; continue
    if name not in oracle:
        status = 'rows-only' if len(spark_df) > 0 else 'rows-only EMPTY(!)'
        print(f'{name:28s} {status:18s} rows={len(spark_df)}')
        if len(spark_df) == 0: fail += 1
        continue
    try:
        duck_df = con.sql(oracle[name]).df()
    except Exception as e:
        print(f'{name:28s} ORACLE SQL ERROR: {e}'); fail += 1; continue
    a, b = norm(spark_df), norm(duck_df)
    if list(a.columns) != list(b.columns):
        print(f'{name:28s} SCHEMA MISMATCH spark={list(a.columns)} duck={list(b.columns)}')
        fail += 1; continue
    if len(a) != len(b):
        print(f'{name:28s} ROWCOUNT {len(a)} vs {len(b)}'); fail += 1; continue
    astr, bstr = a.astype(str), b.astype(str)
    if astr.equals(bstr):
        print(f'{name:28s} OK rows={len(a)}')
    else:
        diff = (astr != bstr).any(axis=1)
        n = int(diff.sum())
        print(f'{name:28s} VALUE MISMATCH rows={len(a)} differing={n}')
        idx = diff[diff].index[:3]
        for i in idx:
            print(f'   spark: {a.loc[i].to_dict()}')
            print(f'   duck : {b.loc[i].to_dict()}')
        fail += 1

missing = sorted(set(oracle) - set(names))
if missing:
    print('oracles with no result dir:', missing); fail += 1
print(f'\n{"PASS" if fail == 0 else f"FAIL ({fail})"}')
sys.exit(1 if fail else 0)
