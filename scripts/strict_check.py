#!/usr/bin/env python3
"""Stricter driver-mimic oracle compare: pandas astype(str) hash on
column-name-sorted, row-sorted frames (catches decimal/HUGEINT/list-cell
rendering drift that value-level compares miss)."""
import sys, json, glob, hashlib
import duckdb, pandas as pd
import pyarrow.parquet as pq

sf, outdir = sys.argv[1], sys.argv[2]
oracle = json.load(open(f"{outdir}/oracle_sql.json"))
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings","partsupp"]:
    try:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    except Exception:
        pass

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    s = df.astype(str)
    s = s.sort_values(by=list(s.columns)).reset_index(drop=True)
    return hashlib.sha256(s.to_csv(index=False).encode()).hexdigest(), len(df)

fails = ok = 0
for name, sql in sorted(oracle.items()):
    try:
        spark_df = pq.read_table(f"{outdir}/{name}").to_pandas()
        ora_df = con.execute(sql).df()
        h1, n1 = canon(spark_df)
        h2, n2 = canon(ora_df)
        if h1 == h2 and n1 == n2:
            ok += 1
        else:
            fails += 1
            print(f"[FAIL] {name}: spark {n1} rows vs oracle {n2} rows, hash {'match' if h1==h2 else 'MISMATCH'}")
    except Exception as e:
        fails += 1
        print(f"[ERR ] {name}: {e}")
print(f"{ok}/{ok+fails} strict matches")
sys.exit(1 if fails else 0)
