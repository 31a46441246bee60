"""Lake materialization (SURVEY.md §7 phase 2, §4.3 "parse once, early").

The reference pays a whole-line JSON parse on every query
(/root/reference/README.md:183-190).  This module builds the silver zone:
bronze NDJSON envelopes parsed ONCE into typed, date-partitioned parquet —
after which every query gets columnar pruning + predicate pushdown for free,
and the flagship aggregate reads two columns instead of the full text.

Layout: ``<silver>/ingest_date=YYYY-MM-DD/*.parquet`` — the typed mirror of
the reference's ``<date>/*.ndjson`` landing layout (README.md:182).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.ndjson import read_typed_envelopes


def materialize_silver(
    spark: SparkSession,
    landing_glob: str,
    after_schema: T.StructType,
    out_dir: str,
    dedup_keys: tuple[str, ...] = ("key", "updated"),
    partition_granularity: str | None = "date",
) -> None:
    """Bronze -> silver: typed parse, at-least-once dedup, flatten the
    ``after`` image to top-level columns, partition by ingest date/month.

    One pass over the raw text; every downstream query then scans columnar
    data.  At cluster scale this is the job you run continuously via
    ``streaming.stream_to_lake``; the batch form here backfills history.

    ``partition_granularity``: "date" for a live CDC zone (few distinct
    days per backfill), "month" when event time spans years (daily dirs
    would mean thousands of tiny files — the small-files failure mode),
    None to skip hive partitioning entirely.
    """
    env = read_typed_envelopes(spark, landing_glob, after_schema)
    flat = env.dropDuplicates(list(dedup_keys)).select(
        "key",
        "updated",
        "updated_ts",
        F.to_date("updated_ts").alias("ingest_date"),
        F.col("after.*"),
        F.col("after").isNull().alias("is_tombstone"),
    )
    writer = flat.write.mode("overwrite")
    if partition_granularity == "date":
        writer = writer.partitionBy("ingest_date")
    elif partition_granularity == "month":
        flat = flat.withColumn(
            "ingest_month", F.date_format("updated_ts", "yyyy-MM")
        )
        # co-locate each month's rows into one task before the partitioned
        # write: avoids n_tasks x n_months tiny output files
        writer = flat.repartition(F.col("ingest_month")).write.mode(
            "overwrite"
        ).partitionBy("ingest_month")
    writer.parquet(out_dir)


def read_silver(spark: SparkSession, silver_dir: str) -> DataFrame:
    return spark.read.parquet(silver_dir)


def silver_revenue_by_city(spark: SparkSession, silver_dir: str) -> DataFrame:
    """The flagship aggregate over the silver zone: identical semantics to
    the raw-line form (tombstones excluded — their columns are NULL), but
    the scan reads exactly two columns with pushdown."""
    from ..functions.numeric import exact_sum

    return (
        read_silver(spark, silver_dir)
        .filter(~F.col("is_tombstone"))
        .groupBy("city")
        .agg(exact_sum("revenue").alias("total_revenue"))
    )


def compact(
    spark: SparkSession,
    data_dir: str,
    target_rows_per_file: int = 1_000_000,
) -> tuple[int, int]:
    """Small-files compaction (the OPTIMIZE analog for a plain-parquet
    zone): rewrite the directory with file count sized to the data.

    Streaming sinks and per-batch journals accrete small files; scan cost at
    100 TB is dominated by file-open overhead once files fall well under the
    HDFS-block / maxPartitionBytes sweet spot. Returns (files_before,
    files_after).

    Swap protocol: write to ``.compact_tmp``, rename the old dir aside to
    ``.compact_bak``, rename tmp into place, then delete the backup — the
    window with no directory present is a single rename, and a crash at any
    step leaves either the old or the new data recoverable on disk. This is
    still NOT transactional for concurrent readers (a reader can catch the
    rename gap or a half-deleted backup); true concurrent-reader atomicity
    needs a table format's metadata commit (Delta/Iceberg), which is the
    deployment recommendation at scale.
    """
    import glob
    import shutil

    df = spark.read.parquet(data_dir)
    n_rows = df.count()
    n_files_before = len(glob.glob(f"{data_dir}/**/*.parquet", recursive=True))
    n_out = max(1, min(n_files_before, (n_rows + target_rows_per_file - 1) // target_rows_per_file))
    tmp_dir = data_dir.rstrip("/") + ".compact_tmp"
    bak_dir = data_dir.rstrip("/") + ".compact_bak"
    df.localCheckpoint(eager=True).repartition(n_out).write.mode("overwrite").parquet(tmp_dir)
    shutil.rmtree(bak_dir, ignore_errors=True)  # stale backup from a crash
    shutil.move(data_dir, bak_dir)
    shutil.move(tmp_dir, data_dir)
    shutil.rmtree(bak_dir)
    n_files_after = len(glob.glob(f"{data_dir}/**/*.parquet", recursive=True))
    return n_files_before, n_files_after
