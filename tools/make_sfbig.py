#!/usr/bin/env python3
"""Regenerate the 10x scale-measurement dataset at /tmp/graft-sfbig.

Replication scheme (inferred from and matching the r12-built directory,
so BASELINE.md's scale-curve numbers stay comparable):
  - fact/corpus tables (lineitem, documents, embeddings, events) are
    REP verbatim replicas of sf0.1 with the primary key shifted by
    i * 10_000_000 per replica (lineitem: i * 100_000_000); all other
    columns unchanged -- NOTE this makes every document text appear
    REP times, so pair-output queries' true answers grow ~REP^2 (see
    BASELINE.md "answer-bound" discussion before reading runtimes).
  - events additionally shifts user_id by i * 1_000_000 so sessions /
    user keys scale with the data (added r13; the r12 build had left
    events at sf0.1 size).
  - dimension tables (region, nation, customer, supplier, part,
    orders) are copied unreplicated -- they are the broadcast sides.

Usage: python3 tools/make_sfbig.py [sf_dir] [out_dir]
"""
import sys, os
import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft-sfbig"
REP = 10
os.makedirs(out, exist_ok=True)
con = duckdb.connect()
rep = f"(SELECT unnest(generate_series(0, {REP - 1})) AS i) r"

def copy(table, sql):
    con.execute(f"COPY ({sql}) TO '{out}/{table}.parquet' (FORMAT PARQUET)")
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{out}/{table}.parquet')"
    ).fetchone()[0]
    print(f"{table}: {n} rows")

for t in ["region", "nation", "customer", "supplier", "part", "orders"]:
    copy(t, f"SELECT * FROM read_parquet('{sf}/{t}.parquet')")

copy("lineitem", f"""
  SELECT l_orderkey + r.i * 100000000 AS l_orderkey, l_partkey, l_suppkey,
         l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
         l_returnflag, l_linestatus, l_shipdate
  FROM read_parquet('{sf}/lineitem.parquet'), {rep}""")

# NOTE: qualify the base relation's star — a bare `*` over the joined
# (base, replica-counter) pair would leak the counter column `i` into
# the output schema
copy("documents", f"""
  SELECT d.doc_id + r.i * 10000000 AS doc_id, d.* EXCLUDE (doc_id)
  FROM read_parquet('{sf}/documents.parquet') d, {rep}""")

copy("embeddings", f"""
  SELECT e.vec_id + r.i * 10000000 AS vec_id, e.* EXCLUDE (vec_id)
  FROM read_parquet('{sf}/embeddings.parquet') e, {rep}""")

copy("events", f"""
  SELECT event_id + r.i * 10000000 AS event_id, ts,
         user_id + r.i * 1000000 AS user_id, event_type, value, props
  FROM read_parquet('{sf}/events.parquet'), {rep}""")
