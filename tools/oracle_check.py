#!/usr/bin/env python3
"""Local pre-flight of the driver's DuckDB oracle gate.

Usage: python3 tools/oracle_check.py <verify_out_dir> <sf_dir>
Loads each <name>/ parquet result, runs oracle_sql.json[name] in DuckDB over
the sf parquet tables, sorts columns by name + rows, and hash-compares.
"""
import sys, json, glob, os, hashlib
import duckdb
import pandas as pd

out_dir, sf_dir = sys.argv[1], sys.argv[2]
oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = os.path.join(sf_dir, f"{t}.parquet")
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize float rounding like a hash gate would: round to 6 dp
    for c in df.columns:
        if df[c].dtype == "float64" or df[c].dtype == "float32":
            df[c] = df[c].round(6)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def h(df):
    return hashlib.md5(df.to_csv(index=False).encode()).hexdigest()

fails, passes, skips = [], [], []
for name in sorted(os.listdir(out_dir)):
    d = os.path.join(out_dir, name)
    if not os.path.isdir(d):
        continue
    files = glob.glob(os.path.join(d, "*.parquet"))
    if not files:
        fails.append((name, "no spark output"))
        continue
    spark_df = pd.concat([pd.read_parquet(f) for f in files])
    if name not in oracle:
        skips.append((name, f"rows-only: {len(spark_df)}"))
        continue
    try:
        odf = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        fails.append((name, f"oracle sql error: {e}"))
        continue
    s, o = canon(spark_df), canon(odf)
    if len(s) != len(o):
        fails.append((name, f"rows {len(s)} vs {len(o)}"))
    elif list(s.columns) != list(o.columns):
        fails.append((name, f"cols {list(s.columns)} vs {list(o.columns)}"))
    elif h(s) != h(o):
        # find first differing cell for debugging
        diff = None
        for c in s.columns:
            if not s[c].astype(str).equals(o[c].astype(str)):
                bad = (s[c].astype(str) != o[c].astype(str))
                i = bad.idxmax()
                diff = f"col {c} row {i}: spark={s[c][i]!r} oracle={o[c][i]!r}"
                break
        fails.append((name, f"hash mismatch ({diff})"))
    else:
        passes.append(name)

print(f"PASS {len(passes)}  FAIL {len(fails)}  ROWS-ONLY {len(skips)}")
for n, r in fails:
    print(f"  FAIL {n}: {r}")
for n, r in skips:
    print(f"  SKIP {n}: {r}")
