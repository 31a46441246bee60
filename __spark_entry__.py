"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in ``mb_crdb_cdc_dlgen2_synapse_spark``; this module
just exposes the catalog in the driver's shape.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# robust against being loaded by path from a different working directory
_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)

from mb_crdb_cdc_dlgen2_synapse_spark import catalog


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's revenue-per-city query over CDC envelope
    lines (/root/reference/README.md:173-192), on sf0.001."""
    return catalog.flagship_cdc_city_revenue(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: qd.builder for name, qd in catalog.registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin per query (omitted for non-SQL ops)."""
    return {
        name: qd.oracle
        for name, qd in catalog.registry().items()
        if qd.oracle is not None
    }
