#!/usr/bin/env python
"""Replica of the driver's verify: import __spark_entry__ the way the driver
does (its own SparkSession, no test fixtures), smoke entry(), then run every
queries() entry at the given sf and hash-compare against oracle_sql() via
DuckDB. Prints one summary line per query + a final JSON.

Usage: python scripts/driver_replica.py [--window] [sf_dir] [query_name ...]

``--window`` reproduces the driver's exact regime: ONLY the first 50
registry-order entries, run in registry order in ONE SparkSession (the
default mode runs every declared query, alphabetically). Round-3 lesson
(table_profile_orders): the driver's red row came not from session state
but from an oracle output TYPE — DuckDB SUM(CASE...) over integers is
HUGEINT (int128), which pandas/arrow fetch paths render as float
("0.0" != Spark's "0"). Both modes therefore LINT every oracle upfront:
any HUGEINT/unsigned output column is an immediate failure, before any
query runs.
"""

from __future__ import annotations

import datetime
import json
import math
import sys
import time
from decimal import Decimal

import duckdb

sys.path.insert(0, ".")

argv = [a for a in sys.argv[1:]]
WINDOW = "--window" in argv
argv = [a for a in argv if a != "--window"]
SF_DIR = argv[0] if argv else "/root/testdata/sf0.01"
ONLY = set(argv[1:])

# Oracle output types that common driver fetch paths (pandas/arrow) render
# differently than Spark's collect() (int128 -> float64/Decimal, unsigned
# widths). An oracle must never produce them — cast to BIGINT in the SQL.
BANNED_ORACLE_TYPES = {
    "HUGEINT", "UHUGEINT", "UBIGINT", "UINTEGER", "USMALLINT", "UTINYINT",
}

from pyspark.sql import SparkSession  # noqa: E402

spark = (
    SparkSession.builder.master("local[8]")
    .appName("driver_replica")
    .config("spark.sql.shuffle.partitions", "16")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as entrymod  # noqa: E402


def norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        return "nan" if math.isnan(v) else repr(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    return v


def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(repr(norm(r[i])) for i in order) for r in rows)


con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events documents embeddings").split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")


def lint_oracle_types(oracles: dict[str, str]) -> list[str]:
    """DESCRIBE every oracle; return lint failures for banned output types."""
    fails = []
    for name, sql in sorted(oracles.items()):
        try:
            desc = con.execute(f"DESCRIBE ({sql})").fetchall()
        except Exception as e:  # noqa: BLE001 — surfaced per-query below anyway
            fails.append(f"{name}: DESCRIBE failed: {str(e)[:120]}")
            continue
        for cname, ctype, *_ in desc:
            if ctype.split("(")[0].upper() in BANNED_ORACLE_TYPES:
                fails.append(f"{name}: column {cname} has banned oracle type {ctype}")
    return fails


t0 = time.time()
edf = entrymod.entry(spark)
erows = edf.collect()
print(f"entry(): {len(erows)} rows, schema={edf.columns}, {time.time()-t0:.1f}s")
assert len(erows) > 0

qs = entrymod.queries()
oracles = entrymod.oracle_sql()

lint = lint_oracle_types(oracles)
for line in lint:
    print(f"ORACLE-LINT FAIL {line}")
if lint:
    print(json.dumps({"oracle_lint_failures": lint}))
    sys.exit(2)
print(f"oracle lint: {len(oracles)} oracles, 0 banned-type columns")

if WINDOW:
    todo = list(qs.items())[:50]  # driver regime: first 50, registry order
else:
    todo = sorted(qs.items())
results = {}
for name, fn in todo:
    if ONLY and name not in ONLY:
        continue
    t0 = time.time()
    try:
        sdf = fn(spark, SF_DIR)
        scols = list(sdf.columns)
        srows = [tuple(r) for r in sdf.collect()]
        if name in oracles:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
            ok_cols = sorted(scols) == sorted(dcols)
            ok_count = len(srows) == len(drows)
            ok_vals = ok_cols and ok_count and canon(scols, srows) == canon(dcols, drows)
            status = "MATCH" if (ok_cols and ok_count and ok_vals) else "MISMATCH"
            detail = "" if status == "MATCH" else f"cols={ok_cols} count={len(srows)}/{len(drows)} vals={ok_vals}"
        else:
            status, detail = "ROWS_ONLY", f"{len(srows)} rows"
        results[name] = status
        print(f"{status:9s} {name:35s} {len(srows):7d} rows {time.time()-t0:6.1f}s {detail}")
    except Exception as e:
        results[name] = "ERROR"
        print(f"ERROR     {name:35s} {type(e).__name__}: {str(e)[:200]}")

summary = {
    "sf_dir": SF_DIR,
    "n": len(results),
    "match": sum(1 for v in results.values() if v == "MATCH"),
    "rows_only": sum(1 for v in results.values() if v == "ROWS_ONLY"),
    "mismatch": sorted(n for n, v in results.items() if v == "MISMATCH"),
    "error": sorted(n for n, v in results.items() if v == "ERROR"),
}
print(json.dumps(summary))
