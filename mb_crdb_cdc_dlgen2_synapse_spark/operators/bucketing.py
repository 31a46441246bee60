"""Bucketed tables: shuffle-free co-located joins (SURVEY.md §4.3).

At 100 TB the orders<->lineitem join is the dominant shuffle.  Bucketing
both tables by the join key at write time makes every subsequent join
between them exchange-free: Spark reads matching buckets task-by-task.
This is the batch analog of co-partitioned state in the streaming merge.

Bucketed tables must live in a catalog (``saveAsTable``); the local
warehouse dir stands in for the metastore a cluster would use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort_col: str | None = None,
) -> None:
    """Persist ``df`` bucketed (and optionally sorted) by the join key."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, left_key: str, right_key: str
) -> DataFrame:
    """Join two same-bucketed tables — the plan must contain no Exchange on
    either side (asserted in tests/test_plans.py)."""
    lt = spark.table(left_table)
    rt = spark.table(right_table)
    return lt.join(rt, lt[left_key] == rt[right_key])
