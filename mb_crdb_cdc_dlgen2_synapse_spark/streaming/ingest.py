"""Structured Streaming ingestion — the reference pipeline's CDC half
(/root/reference/README.md:131-138): unbounded changefeed consumption,
at-least-once dedup, lake materialization, and keyed latest-state merge.

Mapping to reference semantics (SURVEY.md §2.7):
  T1 unbounded file-arrival micro-batches  -> ``readStream`` file source
     (tests use ``Trigger.AvailableNow`` for bounded replay)
  T2 event time (``updated``) vs arrival date (dir name) -> both kept
  T3 watermark / late data                 -> ``withWatermark``
  T6 stateful latest-state                 -> ``foreachBatch`` merge
  T8 exactly-once                          -> checkpoint + idempotent batch
     overwrite (at-least-once input x idempotent sink = effectively-once)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.ndjson import cdc_envelope_schema
from ..operators.cdc import latest_state


def changefeed_stream(
    spark: SparkSession,
    landing_dir: str,
    after_schema: T.StructType,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """T1/T2: unbounded typed envelope stream from the NDJSON landing zone.

    Adds ``updated_ts`` (event time, from the changefeed's decimal-nanos
    string) and ``ingest_date`` (arrival partition, from the date dir name —
    README.md:182's layout).
    """
    reader = (
        spark.readStream.schema(cdc_envelope_schema(after_schema))
        .option("pathGlobFilter", "*.ndjson")
        .option("recursiveFileLookup", "false")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    df = reader.json(f"{landing_dir}/*")
    return (
        df.withColumn(
            "updated_ts",
            F.timestamp_micros(
                (F.col("updated").cast("decimal(38,10)") / F.lit(1000)).cast("long")
            ),
        )
        .withColumn(
            "ingest_date",
            F.to_date(F.element_at(F.split(F.input_file_name(), "/"), -2)),
        )
    )


def dedup_stream(stream: DataFrame, watermark_delay: str = "1 day") -> DataFrame:
    """Q4 streaming: drop at-least-once duplicate emissions within the
    watermark horizon. State is bounded by the watermark — duplicates are
    only possible within a changefeed's retry window, so '1 day' is ample."""
    return stream.withWatermark("updated_ts", watermark_delay).dropDuplicatesWithinWatermark(
        ["key", "updated"]
    )


def stream_to_lake(
    stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    fmt: str = "parquet",
    available_now: bool = True,
):
    """S3: bronze materialization — append the (deduped) envelope stream to a
    date-partitioned lake, exactly the reference's landing layout but typed
    and columnar. Checkpointing makes the sink restartable (T8)."""
    writer = (
        stream.writeStream.format(fmt)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("ingest_date")
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start(out_dir)


def materialize_latest_state(
    stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    key_expr: str = "cast(key as string)",
    available_now: bool = True,
):
    """T6/T7/T8: maintain the current-state table with a ``foreachBatch``
    keyed merge.

    Each micro-batch: union the incoming events with the existing state
    (kept as (key, updated, after) rows), take latest-per-key, drop
    tombstones, and atomically overwrite. Overwrite-per-batch is the
    plain-parquet stand-in for a Delta ``MERGE`` — idempotent under batch
    replay, which is what upgrades at-least-once delivery to effectively-once.
    On Delta/Iceberg the body becomes ``MERGE WHEN MATCHED AND after IS NULL
    THEN DELETE ...`` with the same dataflow.
    """

    def merge_batch(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        incoming = batch.select(
            F.expr(key_expr).alias("row_key"),
            F.col("updated"),
            F.col("after"),
        )
        try:
            current = spark.read.parquet(state_dir)
            merged_input = current.unionByName(incoming)
        except Exception:
            merged_input = incoming
        new_state = (
            latest_state(merged_input, ["row_key"], "updated")
            .filter(F.col("after").isNotNull())
        )
        # localCheckpoint breaks lineage from the directory we overwrite
        new_state.localCheckpoint(eager=True).write.mode("overwrite").parquet(state_dir)

    writer = (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
