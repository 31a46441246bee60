"""A6: incrementally-maintained aggregate — the reference's flagship query
(revenue per city, /root/reference/README.md:173-192) kept continuously
fresh instead of recomputed over the ever-growing file set each run.

Exactly-once without a transactional table format: each micro-batch writes
its *partial* aggregate to a batch-id partition (``batch=N``), and a batch
replay after failure overwrites the same partition — idempotent by
construction.  Readers merge partials with an exact decimal sum, so the
merged result is independent of batch boundaries.  The journal doubles as
an audit log; a compaction pass (operators/lake.py) folds old partials.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def maintain_city_revenue(
    stream: DataFrame,
    journal_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """foreachBatch journal-writer: per-batch partial revenue by city.

    Input: the (deduplicated) typed envelope stream. Tombstones contribute
    nothing (their ``after`` is NULL).
    """

    def write_partial(batch: DataFrame, batch_id: int) -> None:
        partial = (
            batch.filter(F.col("after").isNotNull())
            .groupBy(F.col("after.city").alias("city"))
            .agg(
                F.sum(F.col("after.revenue").cast("decimal(18,6)")).alias("partial_rev"),
                F.count(F.lit(1)).alias("partial_n"),
            )
        )
        # idempotent under replay: same batch_id -> same directory overwritten
        partial.write.mode("overwrite").parquet(f"{journal_dir}/batch={batch_id}")

    writer = (
        stream.writeStream.foreachBatch(write_partial)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_city_revenue(spark: SparkSession, journal_dir: str) -> DataFrame:
    """Merge the partial-aggregate journal into current totals (exact
    decimal merge — result independent of how events split into batches)."""
    return (
        spark.read.parquet(journal_dir)
        .groupBy("city")
        .agg(
            F.sum("partial_rev").cast("double").alias("total_revenue"),
            F.sum("partial_n").alias("n_events"),
        )
    )
