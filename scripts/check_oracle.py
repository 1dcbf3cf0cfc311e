#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs graft.Verify at a given SF dir, then replays each oracle_sql.json
query in DuckDB against the same parquet tables and compares results
(sorted columns by name, sorted rows, floats rounded to 9 significant
digits) — approximating the driver's canonicalize+hash compare.

Usage: python3 scripts/check_oracle.py [sfdir] [outdir] [--strict-types]
(Verify must have been run already to populate outdir.)

--strict-types additionally enforces the BASELINE.md round-10
hash-robustness rules, which the value compare alone cannot see (the
driver's canonicalizer may pandas-convert the DuckDB result, widening
nullable/HUGEINT numeric columns to float64/NaN — the eval_prf_nb
post-mortem):
  - no NULL anywhere in a numeric output column, on either engine,
    UNLESS the query is in NULL_SEMANTICS_OK — the packs whose pinned
    contract IS the NULL behavior (ANSI try_* semantics, lead/lag
    frame boundaries, SCD2 open intervals, rollup/grouping-set
    super-aggregate rows, F7/F8 absent-measurement columns). Those
    were hash-green at the driver in CORRECTNESS_r09, so NULL-int
    columns are empirically canonicalizer-safe; the rule exists to
    stop NEW ratio-style queries from leaning on NULL guards.
  - no DuckDB result column typed HUGEINT (or DECIMAL(38,0)) where
    the Spark parquet column is an integer type (unconditional).
"""
import sys, os, json, math
import duckdb
import pyarrow.parquet as pq
import pyarrow as pa

KNOWN_FLAGS = {"--strict-types"}
flags = [a for a in sys.argv[1:] if a.startswith("--")]
unknown = [f for f in flags if f not in KNOWN_FLAGS]
if unknown:
    # a typo'd flag must not silently degrade the gate to non-strict
    sys.exit(f"unknown flag(s): {', '.join(unknown)} (known: {', '.join(sorted(KNOWN_FLAGS))})")
args = [a for a in sys.argv[1:] if not a.startswith("--")]
strict = "--strict-types" in sys.argv
sfdir = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
outdir = args[1] if len(args) > 1 else "/tmp/graft_verify"

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

NULL_SEMANTICS_OK = {
    "ansi_try_battery", "cube_segment_year", "f7_dynamic_value",
    "f8_reference_range", "groupingsets_segment_year", "scd2_intervals",
    "scd2_merge_incremental", "window_lead_lag", "window_value_battery",
}

def strict_violations(name, tbl, rel, d_rows):
    """BASELINE.md round-10 rules: no numeric NULLs (outside the
    NULL-semantics packs), no HUGEINT oracle columns against integer
    Spark columns."""
    null_ok = name in NULL_SEMANTICS_OK
    out = []
    num_idx = {}
    for i, f in enumerate(tbl.schema):
        if pa.types.is_integer(f.type) or pa.types.is_floating(f.type) \
                or pa.types.is_decimal(f.type):
            num_idx[f.name] = i
            if not null_ok and tbl.column(i).null_count > 0:
                out.append(f"spark numeric col '{f.name}' has NULLs")
    for i, (cname, ctype) in enumerate(zip(rel.columns, rel.types)):
        ts = str(ctype)
        if cname in num_idx:
            sf = tbl.schema.field(cname)
            if ts == "HUGEINT" and pa.types.is_integer(sf.type):
                out.append(f"duckdb col '{cname}' is HUGEINT vs spark {sf.type}")
            if ts.startswith("DECIMAL(38,0)") and pa.types.is_integer(sf.type):
                out.append(f"duckdb col '{cname}' is {ts} vs spark {sf.type}")
        if not null_ok and (ts in ("HUGEINT", "BIGINT", "INTEGER",
                "SMALLINT", "TINYINT", "DOUBLE", "FLOAT")
                or ts.startswith("DECIMAL")):
            if any(r[i] is None for r in d_rows):
                out.append(f"duckdb numeric col '{cname}' has NULLs")
    return out

sql = json.load(open(f"{outdir}/oracle_sql.json"))
n_ok = n_bad = n_strict = 0
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
        viol = strict_violations(name, tbl, rel, d_rows) if strict else []
        if viol:
            n_strict += 1
            for v in viol:
                print(f"TYPE {name}: {v}")
        else:
            n_ok += 1
            print(f"ok   {name} ({len(sr)} rows)")
msg = f"== {n_ok} ok, {n_bad} fail"
if strict:
    msg += f", {n_strict} type-hazard"
print(msg + " ==")
sys.exit(1 if (n_bad or n_strict) else 0)
