#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs graft.Verify at a given SF dir, then replays each oracle_sql.json
query in DuckDB against the same parquet tables and compares results
(sorted columns by name, sorted rows, floats rounded to 9 significant
digits) — approximating the driver's canonicalize+hash compare.

Usage: python3 scripts/check_oracle.py [sfdir] [outdir]
(Verify must have been run already to populate outdir.)
"""
import sys, os, json, math
import duckdb
import pyarrow.parquet as pq

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0:
            return "0"
        return f"{v:.9g}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)

def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(norm(r[i]) for i in order) for r in rows)
    return [cols[i] for i in order], out

sql = json.load(open(f"{outdir}/oracle_sql.json"))
n_ok = n_bad = 0
for name, q in sorted(sql.items()):
    pdir = f"{outdir}/{name}"
    if not os.path.isdir(pdir):
        print(f"FAIL {name}: no spark output")
        n_bad += 1
        continue
    files = [f for f in os.listdir(pdir) if f.endswith(".parquet")]
    tbl = pq.read_table([os.path.join(pdir, f) for f in files])
    s_cols = tbl.column_names
    s_rows = [tuple(r.values()) for r in tbl.to_pylist()]
    try:
        rel = con.sql(q)
        d_cols = rel.columns
        d_rows = rel.fetchall()
    except Exception as e:
        print(f"FAIL {name}: duckdb error: {e}")
        n_bad += 1
        continue
    sc, sr = canon(s_cols, s_rows)
    dc, dr = canon(d_cols, d_rows)
    if sc != dc:
        print(f"FAIL {name}: schema {sc} vs {dc}")
        n_bad += 1
    elif sr != dr:
        n_bad += 1
        diff_a = [r for r in sr if r not in set(map(tuple, dr))][:3]
        diff_b = [r for r in dr if r not in set(map(tuple, sr))][:3]
        print(f"FAIL {name}: rows spark={len(sr)} duckdb={len(dr)}")
        print(f"  spark-only: {diff_a}")
        print(f"  duckdb-only: {diff_b}")
    else:
        n_ok += 1
        print(f"ok   {name} ({len(sr)} rows)")
print(f"== {n_ok} ok, {n_bad} fail ==")
sys.exit(1 if n_bad else 0)
