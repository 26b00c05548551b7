#!/usr/bin/env python3
"""Simulate the driver's DuckDB-oracle compare locally.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name> parquet (Spark result), runs the matching oracle
SQL from <outDir>/oracle_sql.json in DuckDB over the sfDir parquet tables,
and compares as sorted multisets of rows with columns sorted by name.
"""
import sys, json, glob, os
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracles = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(df):
    df = df[sorted(df.columns)]
    vals = []
    for row in df.itertuples(index=False):
        vals.append(tuple(norm(v) for v in row))
    return sorted(vals, key=lambda r: tuple(str(x) for x in r))

def norm(v):
    import decimal, datetime, math
    if isinstance(v, float):
        return round(v, 9)
    if isinstance(v, decimal.Decimal):
        return str(v.normalize())
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    return v

fails = 0
names = sorted(d for d in os.listdir(out_dir)
               if os.path.isdir(os.path.join(out_dir, d)))
for name in names:
    spark_df = con.execute(
        f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
    if name not in oracles:
        print(f"[rows-only] {name}: {len(spark_df)} rows")
        continue
    duck_df = con.execute(oracles[name]).fetchdf()
    a, b = canon(spark_df), canon(duck_df)
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        print(f"[FAIL-cols] {name}: spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}")
        fails += 1
    elif a == b:
        print(f"[OK] {name}: {len(a)} rows")
    else:
        print(f"[FAIL] {name}: spark {len(a)} rows vs duck {len(b)} rows")
        for i, (x, y) in enumerate(zip(a, b)):
            if x != y:
                print(f"   first diff at {i}:\n   spark={x}\n   duck ={y}")
                break
        fails += 1
print("FAILS:", fails)
sys.exit(1 if fails else 0)
