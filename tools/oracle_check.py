import duckdb, json, sys, glob, os
import pandas as pd
import numpy as np

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
oracle = json.load(open(f'{outdir}/oracle_sql.json'))
fails = []
for name, sql in sorted(oracle.items()):
    try:
        exp = con.sql(sql).df()
    except Exception as e:
        fails.append((name, f'duckdb error: {e}')); continue
    try:
        got = pd.read_parquet(glob.glob(f'{outdir}/{name}/*.parquet')[0] if not os.path.isfile(f'{outdir}/{name}') else f'{outdir}/{name}')
    except Exception as e:
        fails.append((name, f'read error: {e}')); continue
    # driver-style: sort columns by name
    ec, gc = sorted(exp.columns), sorted(got.columns)
    if ec != gc:
        fails.append((name, f'schema cols: oracle={ec} spark={gc}')); continue
    exp, got = exp[ec], got[ec]
    if len(exp) != len(got):
        fails.append((name, f'rowcount: oracle={len(exp)} spark={len(got)}')); continue
    # normalize timestamps to ns naive
    def norm(df):
        df = df.copy()
        for c in df.columns:
            if str(df[c].dtype).startswith('datetime64'):
                df[c] = pd.to_datetime(df[c]).dt.tz_localize(None) if getattr(df[c].dt, 'tz', None) is not None else df[c]
        return df.sort_values(by=list(df.columns), ignore_index=True)
    try:
        e2, g2 = norm(exp), norm(got)
    except Exception as ex:
        fails.append((name, f'norm error: {ex}')); continue
    diffs = []
    for c in ec:
        ev, gv = e2[c].values, g2[c].values
        if ev.dtype.kind == 'f' or gv.dtype.kind == 'f':
            neq = ~((pd.isna(ev) & pd.isna(gv)) | (ev == gv))
        else:
            neq = ~(pd.Series(ev).fillna('\0') == pd.Series(gv).fillna('\0')).values if ev.dtype.kind == 'O' else (ev != gv)
        n = int(np.sum(neq))
        if n: diffs.append((c, n, list(zip(np.asarray(ev)[neq][:3], np.asarray(gv)[neq][:3]))))
    if diffs: fails.append((name, f'value diffs: {diffs}'))
    else: print(f'OK    {name} rows={len(exp)}')
print()
for n, m in fails: print(f'FAIL  {n}: {m[:600]}')
print(f'\n{len(oracle)-len(fails)}/{len(oracle)} match')
