#!/usr/bin/env python3
"""Simulate the driver's DuckDB-oracle compare locally.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>

Mirrors the driver's type paths exactly (round-1 lesson: reading both sides
through DuckDB canonicalizes decimals and hides driver-side mismatches):
  - Spark result parquet is read via pyarrow/pandas (DECIMAL -> decimal.Decimal
    objects), NOT through DuckDB.
  - Oracle SQL runs in DuckDB and comes back via .fetchdf() (DECIMAL -> float64).
  - Rows are sorted with pandas sort_values over all columns -- array-typed
    cells crash here, exactly as they crash the driver.
  - Cells compare by exact value hash (repr), no decimal normalization: a
    Decimal('6.0000') on the Spark side vs 6.0 from DuckDB is a FAIL.
"""
import sys, json, os
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.isdir(p):  # multi-file table (ScaleUp output) -> glob parts
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
    elif os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracles = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns))  # crashes on array cells, like the driver
    vals = []
    for row in df.itertuples(index=False):
        vals.append(tuple(norm(v) for v in row))
    return vals

def norm(v):
    import datetime
    if isinstance(v, pd.Timestamp) or isinstance(v, datetime.datetime):
        return v.isoformat()
    # DATE columns: pyarrow yields datetime.date, DuckDB fetchdf yields a
    # midnight Timestamp; the driver treats these as equal (r01 evidence:
    # t_date_format hash-matched), so canonicalize date -> midnight ISO.
    if isinstance(v, datetime.date):
        return datetime.datetime(v.year, v.month, v.day).isoformat()
    if v is None or (isinstance(v, float) and v != v):  # NaN/None unify
        return None
    try:
        import numpy as np
        if isinstance(v, np.generic):
            v = v.item()
    except ImportError:
        pass
    return repr(v)

fails = 0
# optional 3rd arg: comma-separated queries whose ORACLE replay is skipped
# (recorded rows-only) — for scale sweeps where an all-pairs DuckDB oracle
# is O(n^2) by construction and exceeds practical runtime; the engine side
# still runs and must be sortable. Cross-engine equality for such queries
# stands at the scales where the oracle is tractable.
skip_oracle = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else set()
names = sorted(d for d in os.listdir(out_dir)
               if os.path.isdir(os.path.join(out_dir, d)))
for name in names:
    try:
        spark_df = pd.read_parquet(f"{out_dir}/{name}")  # pyarrow path, like the driver
        if name in skip_oracle:
            canon(spark_df)
            print(f"[rows-only/oracle-skipped] {name}: {len(spark_df)} rows")
            continue
        if name not in oracles:
            canon(spark_df)  # still must be sortable for the driver's rows-only check
            print(f"[rows-only] {name}: {len(spark_df)} rows")
            continue
        duck_df = con.execute(oracles[name]).fetchdf()
        a, b = canon(spark_df), canon(duck_df)
    except Exception as e:
        print(f"[ERR] {name}: {type(e).__name__}: {e}")
        fails += 1
        continue
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
