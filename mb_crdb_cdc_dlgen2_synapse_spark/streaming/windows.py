"""Streaming windowed aggregation (SURVEY.md §2.7 T3-T5): the incremental
form of the reference's per-day revenue rollup — what the Synapse query
recomputes from scratch each run (/root/reference/README.md:173-192), kept
continuously up to date instead."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.numeric import exact_sum


def tumbling_revenue(
    stream: DataFrame,
    ts_col: str = "updated_ts",
    key_col: str = "after.city",
    value_col: str = "after.revenue",
    window_len: str = "1 day",
    watermark: str = "1 day",
) -> DataFrame:
    """T4: tumbling event-time window x key -> revenue sum. With a watermark,
    state for closed windows is dropped — bounded memory on an unbounded
    stream; late rows beyond the watermark are discarded from windows.
    The sum goes through exact decimal accumulation (functions/numeric):
    order-independent, so streaming and batch recomputation agree to the bit."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_len).alias("win"), F.col(key_col).alias("city"))
        .agg(exact_sum(F.col(value_col)).alias("total_revenue"))
        .select(F.col("win.start").alias("window_start"), "city", "total_revenue")
    )


def sliding_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window_len: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """T4: sliding window counts (each event lands in len/slide windows)."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_len, slide).alias("win"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("win.start").alias("window_start"), key_col, "n_events")
    )


def session_windows(
    stream: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """T5: native session windows — dynamic gap-merged state per key,
    closed (and emitted) once the watermark passes the gap."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("sess"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"), exact_sum("value").alias("sum_value"))
        .select(
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            key_col,
            "n_events",
            "sum_value",
        )
    )
