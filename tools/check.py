#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify output
against DuckDB oracles on the same parquet tables. Usage:
  python3 tools/check.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb, pandas as pd

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    p = f"{sf}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracles = json.load(open(f"{out}/oracle_sql.json"))
fails = json.load(open(f"{out}/_failures.json")) if os.path.exists(f"{out}/_failures.json") else {}
bad = 0
for name in sorted(os.listdir(out)):
    d = os.path.join(out, name)
    if not os.path.isdir(d):
        continue
    spark_df = pd.concat([pd.read_parquet(f) for f in sorted(glob.glob(f"{d}/*.parquet"))])
    if name not in oracles:
        print(f"{name:20s} rows={len(spark_df)} (no oracle)")
        continue
    try:
        odf = con.sql(oracles[name]).df()
    except Exception as e:
        print(f"{name:20s} ORACLE SQL ERROR: {e}")
        bad += 1
        continue
    sd = spark_df[sorted(spark_df.columns)].reset_index(drop=True)
    od = odf[sorted(odf.columns)].reset_index(drop=True)
    rows = len(sd) == len(od)
    schema = list(sd.columns) == list(od.columns)
    # value compare: stringify and sort rows (driver hashes sorted values)
    def canon(df):
        if len(df) == 0:
            return []
        return sorted(df.astype(str).apply("|".join, axis=1).tolist())
    hashm = rows and schema and canon(sd) == canon(od)
    status = "OK " if (rows and schema and hashm) else "FAIL"
    if status == "FAIL":
        bad += 1
        print(f"{name:20s} {status} rows={len(sd)}/{len(od)} schema={schema} cols spark={list(sd.columns)} oracle={list(od.columns)}")
        if rows and schema:
            a, b = canon(sd), canon(od)
            diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
            for x, y in diff:
                print(f"    spark:  {x}\n    oracle: {y}")
    else:
        print(f"{name:20s} {status} rows={len(sd)}")
for k, v in fails.items():
    print(f"{k:20s} RUNTIME FAIL: {v[:200]}")
    bad += 1
sys.exit(1 if bad else 0)
