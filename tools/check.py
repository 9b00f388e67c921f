#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: tools/check.py <verify_out_dir> <sf_dir>

Assumes `graft.Verify` already wrote <out>/<query>/ parquet dirs and
<out>/oracle_sql.json. Runs each oracle SQL in DuckDB against the sf
parquet tables, then compares against the Spark result: columns sorted by
name, rows sorted by all columns, values compared exactly (with a float
near-miss report so rounding hazards are visible before the real driver
runs).
"""
import sys, os, json, glob, math
import duckdb
import pandas as pd
import numpy as np

out_dir, sf_dir = sys.argv[1], sys.argv[2]

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

with open(f"{out_dir}/oracle_sql.json") as f:
    oracles = json.load(f)

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes: timestamps -> iso string (to second unit issues),
    # dates -> iso, floats stay float64
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].apply(
                lambda v: v.isoformat() if hasattr(v, "isoformat") else v)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)

def cmp(name, spark_df, duck_df):
    a, b = canon(spark_df), canon(duck_df)
    if list(a.columns) != list(b.columns):
        return f"SCHEMA MISMATCH spark={list(a.columns)} duck={list(b.columns)}"
    if len(a) != len(b):
        return f"ROWCOUNT MISMATCH spark={len(a)} duck={len(b)}"
    problems = []
    def kind(s):
        if pd.api.types.is_float_dtype(s): return "float"
        if pd.api.types.is_integer_dtype(s): return "int"
        if pd.api.types.is_datetime64_any_dtype(s): return "ts"
        if s.dtype == object and any(type(v).__name__ == "Decimal"
                                     for v in s.head(20)): return "decimal"
        return "other"
    for c in a.columns:
        av, bv = a[c], b[c]
        # the real driver hashes values exactly, so int64 3385 vs float64
        # 3385.0 vs Decimal('3385.000000') all mismatch even when
        # numerically equal (DuckDB sum(BIGINT) is HUGEINT -> float64 in
        # pandas; Spark parquet DECIMAL -> Python Decimal objects)
        ka, kb = kind(av), kind(bv)
        if ka != kb:
            problems.append(f"col {c}: DTYPE-CLASS spark={ka}({av.dtype}) "
                            f"duck={kb}({bv.dtype}) — driver hash will differ")
            continue
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            avf = av.astype(float); bvf = bv.astype(float)
            exact = ((avf == bvf) | (avf.isna() & bvf.isna())).all()
            if not exact:
                diff = (avf - bvf).abs().max()
                problems.append(f"col {c}: float diff max={diff!r}")
        else:
            eq = (av.astype(str).fillna("<NA>") == bv.astype(str).fillna("<NA>")).all()
            if not eq:
                i = (av.astype(str) != bv.astype(str)).idxmax()
                problems.append(f"col {c}: first diff row {i}: spark={av[i]!r} duck={bv[i]!r}")
    return "; ".join(problems) if problems else None

n_ok = n_bad = n_err = 0
results = sorted(glob.glob(f"{out_dir}/*/"))
names = [os.path.basename(p.rstrip("/")) for p in results]
for name in names:
    try:
        spark_df = pd.read_parquet(f"{out_dir}/{name}")
    except Exception as e:
        print(f"[READ-FAIL] {name}: {e}"); n_err += 1; continue
    if name not in oracles:
        print(f"[ROWS-ONLY] {name}: rows={len(spark_df)}")
        continue
    try:
        duck_df = con.execute(oracles[name]).fetchdf()
    except Exception as e:
        print(f"[ORACLE-FAIL] {name}: {e}"); n_err += 1; continue
    problem = cmp(name, spark_df, duck_df)
    if problem:
        print(f"[MISMATCH] {name}: {problem}"); n_bad += 1
    else:
        print(f"[OK] {name} rows={len(spark_df)}"); n_ok += 1

missing = set(oracles) - set(names)
for m in sorted(missing):
    print(f"[NO-RESULT] {m}"); n_err += 1
print(f"\n{n_ok} ok, {n_bad} mismatch, {n_err} error, "
      f"{len(set(names) - set(oracles))} rows-only")
sys.exit(1 if (n_bad or n_err) else 0)
