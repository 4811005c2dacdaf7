#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: runs DuckDB oracle SQL
against the testdata parquet and compares with graft.Verify's parquet output
(sorted columns by name, sorted rows, values normalized). Dev tool only."""
import json, sys, glob, math
import duckdb
import pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(9)
        elif "int" in str(df[c].dtype).lower():
            df[c] = df[c].astype("float64")  # unify int32/int64
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)

fails, passes = [], 0
for name, sql in sorted(oracle.items()):
    spark_files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not spark_files:
        fails.append((name, "NO SPARK OUTPUT")); continue
    try:
        dd = con.execute(sql).fetchdf()
    except Exception as e:
        fails.append((name, f"DUCKDB ERROR: {e}")); continue
    sp = pd.concat([pd.read_parquet(f) for f in spark_files], ignore_index=True)
    if sorted(dd.columns) != sorted(sp.columns):
        fails.append((name, f"SCHEMA: duck={sorted(dd.columns)} spark={sorted(sp.columns)}")); continue
    a, b = norm(dd), norm(sp)
    if len(a) != len(b):
        fails.append((name, f"ROWS: duck={len(a)} spark={len(b)}")); continue
    if not a.equals(b):
        diff_mask = ~(a.eq(b) | (a.isna() & b.isna()))
        ndiff = diff_mask.any(axis=1).sum()
        idx = diff_mask.any(axis=1).idxmax()
        fails.append((name, f"VALUES: {ndiff}/{len(a)} rows differ; first at {idx}:\n  duck : {a.iloc[idx].to_dict()}\n  spark: {b.iloc[idx].to_dict()}"))
        continue
    passes += 1

print(f"PASS {passes}/{len(oracle)}")
for n, msg in fails:
    print(f"FAIL {n}: {msg}")
sys.exit(1 if fails else 0)
