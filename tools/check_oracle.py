#!/usr/bin/env python3
"""Replicates the driver's DuckDB oracle compare: load each query's parquet
output + run its oracle SQL in DuckDB over the same sf dir, hash-compare."""
import json, duckdb, glob, hashlib, sys
import pandas as pd

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
oracles = json.load(open(f"{out}/oracle_sql.json"))

def canon(df):
    df = df[sorted(df.columns)]
    rows = sorted(tuple(str(v) for v in r)
                  for r in df.itertuples(index=False, name=None))
    return hashlib.md5(str(rows).encode()).hexdigest(), len(rows)

fails = 0
for name, sql in sorted(oracles.items()):
    try:
        spark_df = pd.concat([pd.read_parquet(p)
                              for p in glob.glob(f"{out}/{name}/*.parquet")])
        ora_df = con.execute(sql).fetchdf()
        h1, n1 = canon(spark_df); h2, n2 = canon(ora_df)
        ok = h1 == h2
        fails += 0 if ok else 1
        print(f"{name}: {'MATCH' if ok else 'MISMATCH'} rows={n1}/{n2}")
        if not ok and n1 == n2:
            s = sorted(tuple(str(v) for v in r) for r in
                       spark_df[sorted(spark_df.columns)].itertuples(index=False, name=None))
            o = sorted(tuple(str(v) for v in r) for r in
                       ora_df[sorted(ora_df.columns)].itertuples(index=False, name=None))
            for a, b in zip(s, o):
                if a != b:
                    print("  spark :", a); print("  oracle:", b); break
    except Exception as e:
        fails += 1
        print(f"{name}: ERROR {e}")
sys.exit(1 if fails else 0)
