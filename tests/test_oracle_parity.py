"""Local replica of the driver's t2 correctness gate: run every declared
query in Spark AND its DuckDB oracle twin on the same parquet tables, and
compare row count + column names + order-insensitive values.

Catches name/typing/rounding mismatches before the driver does.
"""

from __future__ import annotations

import datetime
import math
from decimal import Decimal

import duckdb
import pytest

from mb_crdb_cdc_dlgen2_synapse_spark.catalog import registry
from mb_crdb_cdc_dlgen2_synapse_spark.sources.tables import TABLE_NAMES

REG = registry()
ORACLE_QUERIES = sorted(n for n, qd in REG.items() if qd.oracle is not None)
ROWS_ONLY_QUERIES = sorted(n for n, qd in REG.items() if qd.oracle is None)

# SURVEY.md §2's full operator inventory: the driver records only the
# FIRST 50 registry entries per round, so every id must keep >=1
# certifying query inside that window across rotations.
_SURVEY_IDS = {
    f"{prefix}{i}"
    for prefix, count in [
        ("S", 8), ("P", 9), ("A", 6), ("J", 6),
        ("W", 4), ("Q", 5), ("T", 8), ("X", 6),
    ]
    for i in range(1, count + 1)
}


def test_driver_window_covers_every_survey_id():
    window = list(REG)[:50]
    covered = {
        ref.strip()
        for name in window
        for ref in REG[name].survey_ref.split(",")
    }
    assert _SURVEY_IDS <= covered, sorted(_SURVEY_IDS - covered)


def test_every_declared_survey_id_is_known():
    for name, qd in REG.items():
        for ref in qd.survey_ref.split(","):
            assert ref.strip() in _SURVEY_IDS, (name, ref)


def _norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    return v


def _normalize_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        [tuple(repr(_norm(r[i])) for i in order) for r in rows]
    )


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, sf_dir, duck, name):
    qd = REG[name]
    sdf = qd.builder(spark, sf_dir)
    spark_cols = list(sdf.columns)
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(qd.oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={spark_cols} duck={duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    s_norm = _normalize_rows(spark_cols, spark_rows)
    d_norm = _normalize_rows(duck_cols, duck_rows)
    mismatches = [
        (a, b) for a, b in zip(s_norm, d_norm) if a != b
    ]
    assert not mismatches, f"{name}: {len(mismatches)} value mismatches; first: {mismatches[:3]}"


@pytest.mark.parametrize("name", [n for n in ROWS_ONLY_QUERIES if n != "cdc_streaming_pipeline"])
def test_rows_only_queries_run(spark, sf_dir, name):
    qd = REG[name]
    sdf = qd.builder(spark, sf_dir)
    assert sdf.count() >= 0
    assert len(sdf.columns) > 0
