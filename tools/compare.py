#!/usr/bin/env python3
"""Local pre-validation of SparkEntry queries vs the DuckDB oracle.

Mimics the driver's correctness gate strictly: for each query, read the
Verify-written parquet and the DuckDB result of oracle_sql.json, sort
columns by name, sort rows, and require exact (bit-level for floats)
value equality. Usage: python3 tools/compare.py <verify_out_dir> <sf_dir>
"""
import json, sys, math
import duckdb
import pandas as pd

out_dir, sf_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails, passes = [], []
for name, sql in sorted(oracle.items()):
    try:
        spark_df = pd.read_parquet(f"{out_dir}/{name}")
        duck_df = con.sql(sql).df()
    except Exception as e:
        fails.append((name, f"load/exec error: {str(e)[:300]}"))
        continue
    sc, dc = sorted(spark_df.columns), sorted(duck_df.columns)
    if sc != dc:
        fails.append((name, f"columns differ: spark={sc} duck={dc}"))
        continue
    s = spark_df[sc]; d = duck_df[sc]
    if len(s) != len(d):
        fails.append((name, f"row count: spark={len(s)} duck={len(d)}"))
        continue
    # normalize cells to comparable canonical form
    def canon(df):
        out = df.copy()
        for c in out.columns:
            out[c] = out[c].map(cell)
        return out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)
    def cell(v):
        if v is None: return "<null>"
        if isinstance(v, float):
            if math.isnan(v): return "<null>"
            return repr(v)  # exact double repr
        if isinstance(v, (list, tuple)) or str(type(v)).endswith("ndarray'>"):
            return "[" + ",".join(map(cell, list(v))) + "]"
        if isinstance(v, bytes): return v.hex()
        if hasattr(v, "isoformat"): return v.isoformat()
        if pd.isna(v): return "<null>"
        return str(v)
    cs, cd = canon(s), canon(d)
    neq = (cs != cd)
    if neq.any().any():
        bad_cols = [c for c in cs.columns if neq[c].any()]
        idx = neq.any(axis=1).idxmax()
        fails.append((name, f"value mismatch in {bad_cols}; first bad row {idx}: "
                      f"spark={cs.loc[idx, bad_cols].to_dict()} duck={cd.loc[idx, bad_cols].to_dict()}"))
    else:
        passes.append(name)

for n in passes: print(f"PASS {n}")
for n, why in fails: print(f"FAIL {n}: {why}")
print(f"\n{len(passes)}/{len(oracle)} pass")
sys.exit(1 if fails else 0)
