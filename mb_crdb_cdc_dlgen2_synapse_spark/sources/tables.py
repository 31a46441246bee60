"""Parquet table sources for the analytics zone.

The reference's lake is raw NDJSON re-parsed per query
(/root/reference/README.md:181-190); our engine's silver zone is typed
columnar parquet so Catalyst gets predicate pushdown + column pruning for
free (SURVEY.md §4.3).  These loaders are the single binding point between
query builders and storage paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to always broadcast in star joins.
BROADCAST_TABLES = frozenset({"region", "nation", "supplier", "part", "customer"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table from an sf directory (one parquet file/dir per table).

    ``events.ts`` is TIMESTAMP(NANOS) parquet, which Spark runtimes read
    differently: older ones reject it from the vectorized reader (we read
    nanos-long via the legacy config and convert with integer ``div`` —
    never float division, 1.7e18 doesn't fit a double's 53-bit mantissa);
    newer ones return a micro-truncated ``timestamp_ntz``, which we cast to
    a session-zone (UTC) timestamp so downstream epoch arithmetic
    (``cast("double")``/``unix_timestamp``) stays legal and value-identical
    to DuckDB's micro-truncation of the same column. Both paths land on the
    same micros-precision UTC timestamp.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif ts_type == "timestamp_ntz":
            # NTZ wall-clock reinterpreted in the session zone (UTC, pinned
            # in session.py) — epoch values unchanged
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str, names=TABLE_NAMES) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str, names=TABLE_NAMES) -> None:
    """Register temp views so operators can be expressed in Spark SQL too."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
