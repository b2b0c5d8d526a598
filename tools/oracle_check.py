#!/usr/bin/env python3
"""Local approximation of the driver's t2 correctness gate:
run each oracle SQL in DuckDB over the sf parquet tables, canonicalize
both sides (columns sorted by name, rows sorted, doubles rounded), and
compare. Usage: oracle_check.py <sfDir> <verifyOutDir> [jsonOut]
(jsonOut: also write a per-query {"status", "rows"} JSON artifact —
the committed-correctness format, e.g. CORRECTNESS_SF01_r12.json.)
"""
import sys, json, glob, os
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
json_out = sys.argv[3] if len(sys.argv) > 3 else None
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif "datetime" in str(df[c].dtype):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None).astype("datetime64[us]").astype(str)
        elif df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
        elif df[c].dtype.kind in "iu":
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

fails, passes, rows_only = [], [], []
for name in sorted(os.listdir(outdir)):
    d = os.path.join(outdir, name)
    if not os.path.isdir(d):
        continue
    spark_df = pd.concat([pd.read_parquet(f) for f in glob.glob(f"{d}/*.parquet")],
                         ignore_index=True) if glob.glob(f"{d}/*.parquet") else pd.DataFrame()
    if name not in oracle:
        rows_only.append((name, len(spark_df)))
        continue
    try:
        duck_df = con.sql(oracle[name]).df()
        a, b = canon(spark_df), canon(duck_df)
        if list(a.columns) != list(b.columns):
            fails.append((name, f"columns differ: spark={list(a.columns)} duck={list(b.columns)}"))
        elif len(a) != len(b):
            fails.append((name, f"rowcount differ: spark={len(a)} duck={len(b)}"))
        elif not a.equals(b):
            diff = (a != b) & ~(a.isna() & b.isna())
            bad = diff.any(axis=1)
            fails.append((name, f"values differ in {int(bad.sum())}/{len(a)} rows; first:\n"
                          f"spark:\n{a[bad].head(3)}\nduck:\n{b[bad].head(3)}"))
        else:
            passes.append(name)
    except Exception as e:
        fails.append((name, f"oracle error: {e}"))

print(f"PASS {len(passes)}: {' '.join(passes)}")
print(f"ROWS-ONLY {len(rows_only)}: {' '.join(f'{n}({r})' for n, r in rows_only)}")
print(f"FAIL {len(fails)}:")
for n, msg in fails:
    print(f"--- {n}: {msg}")
if json_out:
    art = {}
    for n in passes:
        art[n] = {"status": "PASS"}
    for n, r in rows_only:
        art[n] = {"status": "ROWS_ONLY", "rows": int(r)}
    for n, msg in fails:
        art[n] = {"status": "FAIL", "detail": msg.splitlines()[0][:300]}
    with open(json_out, "w") as f:
        json.dump({"sf": sfdir, "n_pass": len(passes),
                   "n_rows_only": len(rows_only), "n_fail": len(fails),
                   "queries": art}, f, indent=0, sort_keys=True)
sys.exit(1 if fails else 0)
