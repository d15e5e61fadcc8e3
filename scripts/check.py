#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 scripts/check.py [sfdir] [outdir]

Runs DuckDB on every oracle_sql.json entry (tables = parquet files in sfdir),
loads the corresponding Verify parquet output, sorts columns by name and rows
by all columns, and compares values. Reports per-query: row count match,
schema (column name) match, exact value match, and max float deviation.
"""
import json
import math
import sys

import duckdb

SFDIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUTDIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SFDIR}/{t}.parquet'")

oracle = json.load(open(f"{OUTDIR}/oracle_sql.json"))

# Verify writes a manifest of Spark-side failures (query -> error message);
# surface it first so a red board names its cause, not just "output missing"
try:
    spark_failures = json.load(open(f"{OUTDIR}/failures.json"))
except Exception:
    spark_failures = {}
if spark_failures:
    print(f"!! Verify reported {len(spark_failures)} Spark-side failures:")
    for qname, msg in spark_failures.items():
        print(f"!!   {qname}: {msg.splitlines()[0][:200] if msg else msg}")

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v

def key(row):
    return tuple((x is None, str(x)) for x in row)

fails = 0
for name, sql in sorted(oracle.items()):
    try:
        exp = con.sql(sql)
        exp_cols = sorted(exp.columns)
        exp_rows = sorted([tuple(norm(v) for v in r)
                           for r in exp.select(", ".join(f'"{c}"' for c in exp_cols)).fetchall()],
                          key=key)
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}")
        fails += 1
        continue
    try:
        got = con.sql(f"SELECT * FROM '{OUTDIR}/{name}/*.parquet'")
        got_cols = sorted(got.columns)
        got_rows = sorted([tuple(norm(v) for v in r)
                           for r in got.select(", ".join(f'"{c}"' for c in got_cols)).fetchall()],
                          key=key)
    except Exception as e:
        print(f"FAIL {name}: spark output missing/unreadable: {e}")
        fails += 1
        continue

    if got_cols != exp_cols:
        print(f"FAIL {name}: schema mismatch spark={got_cols} oracle={exp_cols}")
        fails += 1
        continue
    if len(got_rows) != len(exp_rows):
        print(f"FAIL {name}: rowcount spark={len(got_rows)} oracle={len(exp_rows)}")
        fails += 1
        continue
    maxdev = 0.0
    mismatch = None
    for gr, er in zip(got_rows, exp_rows):
        for c, (g, e) in zip(exp_cols, zip(gr, er)):
            if g == e:
                continue
            if isinstance(g, float) and isinstance(e, float):
                dev = abs(g - e) / max(abs(e), 1e-12)
                maxdev = max(maxdev, dev)
                if dev > 0:
                    mismatch = mismatch or (c, g, e)
            else:
                mismatch = (c, g, e)
                break
        if mismatch and not isinstance(mismatch[1], float):
            break
    if mismatch and maxdev == 0.0:
        print(f"FAIL {name}: value mismatch col={mismatch[0]} spark={mismatch[1]!r} oracle={mismatch[2]!r}")
        fails += 1
    elif maxdev > 0:
        status = "WARN(float)" if maxdev < 1e-9 else "FAIL"
        if status == "FAIL":
            fails += 1
        print(f"{status} {name}: rows={len(got_rows)} max_float_dev={maxdev:.2e} first={mismatch}")
    else:
        print(f"PASS {name}: rows={len(got_rows)} exact")

print(f"\n{len(oracle) - fails}/{len(oracle)} queries pass"
      + (f" ({len(spark_failures)} Spark-side failures — see manifest above)"
         if spark_failures else ""))
sys.exit(1 if fails else 0)
