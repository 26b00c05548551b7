#!/usr/bin/env python3
"""Scale-sweep oracle compare for HUGE results (sf10): both sides read
through DuckDB and compared as MULTISETS in SQL (EXCEPT ALL both ways),
so a 15M-row result compares in seconds instead of hours of per-cell
Python canonicalization (tools/selfcheck.py's repr path — the driver's
exact gate — is O(rows x cols) in Python and is the right tool at
sf0.01/sf1 where it also catches type-rendering divergence; that
type-fidelity leg is already green there every round).

Reading BOTH sides through DuckDB canonicalizes decimal rendering — the
documented caveat of this path — so this checker proves VALUE equality
at scale, not rendering fidelity. Column names still compare exactly.

Usage: python3 tools/sf10check.py <sfDir> <verifyOutDir> [skip1,skip2]
"""
import sys, json, os, time
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
skip = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else set()
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.isdir(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
    elif os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
names = sorted(d for d in os.listdir(out_dir)
               if os.path.isdir(os.path.join(out_dir, d)))
fails = 0
for name in names:
    t0 = time.time()
    try:
        spark_glob = f"{out_dir}/{name}/*.parquet"
        scols = [r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{spark_glob}')").fetchall()]
        n_spark = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{spark_glob}')").fetchone()[0]
        if name in skip or name not in oracles:
            tag = "oracle-skipped" if name in skip else "rows-only"
            print(f"[{tag}] {name}: {n_spark} rows ({time.time()-t0:.1f}s)",
                  flush=True)
            continue
        con.execute(f"CREATE OR REPLACE TEMP VIEW __oracle AS {oracles[name]}")
        ocols = [r[0] for r in con.execute(
            "DESCRIBE SELECT * FROM __oracle").fetchall()]
        if sorted(scols) != sorted(ocols):
            print(f"[FAIL] {name}: schema {sorted(scols)} vs {sorted(ocols)}",
                  flush=True)
            fails += 1
            continue
        cols = ", ".join(f'"{c}"' for c in sorted(scols))
        # multiset equality: every row with its multiplicity must match
        diff = con.execute(f"""
            SELECT COUNT(*) FROM (
              (SELECT {cols} FROM read_parquet('{spark_glob}')
               EXCEPT ALL SELECT {cols} FROM __oracle)
              UNION ALL
              (SELECT {cols} FROM __oracle
               EXCEPT ALL SELECT {cols} FROM read_parquet('{spark_glob}'))
            )""").fetchone()[0]
        n_oracle = con.execute("SELECT COUNT(*) FROM __oracle").fetchone()[0]
        if n_spark != n_oracle or diff != 0:
            print(f"[FAIL] {name}: spark={n_spark} oracle={n_oracle} "
                  f"multiset-diff={diff}", flush=True)
            fails += 1
        else:
            print(f"[OK] {name}: {n_spark} rows ({time.time()-t0:.1f}s)",
                  flush=True)
    except Exception as e:
        print(f"[FAIL] {name}: {type(e).__name__}: {str(e)[:300]}", flush=True)
        fails += 1
print(f"FAILS: {fails}", flush=True)
