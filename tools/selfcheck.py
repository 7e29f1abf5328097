#!/usr/bin/env python3
"""Self-check: replicate the driver's DuckDB-oracle compare locally.

Usage: python3 tools/selfcheck.py <sfdir> <verify_out_dir>
Reads each <out>/<name> parquet (Spark result) and runs the matching
oracle from <out>/oracle_sql.json in DuckDB over the raw tables.
Compares schema (sorted column names) and values (rows sorted, columns
sorted by name, exact equality; floats compared exactly after both
sides' ROUND(4)).
"""
import sys, json, glob, math
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracles = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(df):
    df = df[sorted(df.columns)]
    def norm(v):
        if v is None or (isinstance(v, float) and math.isnan(v)): return None
        if hasattr(v, "date") and not isinstance(v, str):  # Timestamp
            return str(pd.Timestamp(v))
        if isinstance(v, float): return repr(v)
        return str(v)
    rows = [tuple(norm(v) for v in r) for r in df.itertuples(index=False, name=None)]
    return sorted(rows)

fails = 0
for name, sql in sorted(oracles.items()):
    try:
        spark_files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not spark_files:
            print(f"FAIL {name}: no spark output"); fails += 1; continue
        sdf = pd.concat([pd.read_parquet(f) for f in sorted(spark_files)])
        odf = con.execute(sql).fetchdf()
        a, b = canon(sdf), canon(odf)
        if sorted(sdf.columns) != sorted(odf.columns):
            print(f"FAIL {name}: cols spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"); fails += 1
        elif len(a) != len(b):
            print(f"FAIL {name}: rows spark={len(a)} oracle={len(b)}"); fails += 1
        elif a != b:
            diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
            print(f"FAIL {name}: values differ, first diffs: {diff}"); fails += 1
        else:
            print(f"OK   {name} ({len(a)} rows)")
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__}: {e}"); fails += 1

# queries with no oracle: rows-only
import os
declared = set(os.listdir(outdir)) - {"oracle_sql.json"}
for name in sorted(declared - set(oracles)):
    n = len(glob.glob(f"{outdir}/{name}/*.parquet"))
    print(f"ROWS {name}: output present ({n} files)")
sys.exit(1 if fails else 0)
