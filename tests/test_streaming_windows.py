"""Streaming windowed aggregation tests (T4/T5): replay the events table as
a bounded file stream (availableNow) and check the streaming results against
the equivalent batch computation — the streaming-native form of the
reference's recompute-from-scratch aggregate (SURVEY.md §2.3 A6).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mb_crdb_cdc_dlgen2_synapse_spark.functions.numeric import exact_sum
from mb_crdb_cdc_dlgen2_synapse_spark.sources.tables import load_table
from mb_crdb_cdc_dlgen2_synapse_spark.streaming.windows import (
    session_windows,
    sliding_counts,
    tumbling_revenue,
)


@pytest.fixture(scope="module")
def event_stream(spark, sf_dir, tmp_path_factory):
    """events table re-landed as NDJSON and read back as a file stream."""
    src = str(tmp_path_factory.mktemp("events_stream") / "json")
    events = load_table(spark, sf_dir, "events")
    events.select(
        "event_id", F.col("ts").cast("string").alias("ts"), "user_id", "event_type", "value"
    ).coalesce(4).write.mode("overwrite").json(src)
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    stream = spark.readStream.schema(schema).json(src)
    assert stream.isStreaming
    return stream, events


def _run_to_memory(spark, sdf, name, mode="append"):
    """complete mode for bounded replays: append only emits windows the
    watermark has closed, so the trailing windows would never appear."""
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def test_tumbling_window_matches_batch(spark, event_stream):
    stream, events = event_stream
    windowed = tumbling_revenue(
        stream, ts_col="ts", key_col="event_type", value_col="value",
        window_len="1 day", watermark="2 days",
    )
    got = _run_to_memory(spark, windowed, "t4_tumbling", mode="complete").collect()
    exp = (
        events.groupBy(
            F.date_trunc("day", "ts").alias("window_start"), "event_type"
        )
        .agg(exact_sum("value").alias("total_revenue"))
        .collect()
    )
    g = {(r["window_start"], r["city"]): r["total_revenue"] for r in got}
    e = {(r["window_start"], r["event_type"]): r["total_revenue"] for r in exp}
    assert g == e


def test_sliding_window_counts(spark, event_stream):
    stream, events = event_stream
    windowed = sliding_counts(
        stream, ts_col="ts", key_col="event_type",
        window_len="2 hours", slide="1 hour", watermark="4 hours",
    )
    got = _run_to_memory(spark, windowed, "t4_sliding", mode="complete")
    # every event lands in exactly len/slide = 2 windows
    total = got.agg(F.sum("n_events")).collect()[0][0]
    assert total == 2 * events.count()


def test_session_windows_match_batch_sessionization(spark, event_stream):
    stream, events = event_stream
    sess = session_windows(
        stream, ts_col="ts", key_col="user_id", gap="30 minutes", watermark="1 hour"
    )
    got = _run_to_memory(spark, sess, "t5_sessions", mode="complete")
    from mb_crdb_cdc_dlgen2_synapse_spark.operators.cdc import sessionize

    batch = sessionize(events, gap_minutes=30)
    # same number of sessions per user, same total event count
    g = got.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"), F.sum("n_events").alias("ev")
    )
    b = batch.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"), F.sum("n_events").alias("ev")
    )
    diff = g.alias("g").join(b.alias("b"), "user_id").filter(
        (F.col("g.n") != F.col("b.n")) | (F.col("g.ev") != F.col("b.ev"))
    )
    assert diff.count() == 0
    assert g.count() == b.count()
