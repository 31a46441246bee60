"""Stream-stream and stream-static joins (SURVEY.md §2.4 extended into
§2.7's streaming semantics): event correlation between two unbounded inputs,
and dimension enrichment of a stream.

Scale behavior, which is the whole design problem here:

- **Stream-static enrichment** is a broadcast hash join per micro-batch —
  the stream side never shuffles, the dim is broadcast once per batch. Use
  it for slowly-changing dimensions; the batch re-reads the dim, so updates
  flow in without restarts.
- **Stream-stream inner join** buffers BOTH sides in the state store until
  the watermark says a match can no longer arrive. Unbounded without
  bounds: the two watermarks plus the explicit event-time range condition
  are what let Spark evict state — state size tracks the join window, not
  stream length. Both inputs shuffle on the join key (co-partitioned state).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_stream(stream: DataFrame, dim: DataFrame, on: str) -> DataFrame:
    """Stream-static broadcast enrichment: per-batch hash lookup against a
    (small) dimension; the unbounded side never shuffles."""
    return stream.join(F.broadcast(dim), on, "left")


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    max_delay: str = "1 hour",
    left_watermark: str = "2 hours",
    right_watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked stream-stream inner join: rows match when keys are equal
    and the right event lands within ``[left_ts, left_ts + max_delay]`` —
    the event-correlation shape (click after impression, ack after send).

    The time-range predicate is REQUIRED for bounded state: with both
    watermarks set, Spark evicts a buffered left row once
    ``watermark > left_ts + max_delay`` (no future match possible), so the
    state store holds only the active window of both streams.
    """
    return _interval_join(
        left, right, key, left_ts, right_ts, max_delay,
        left_watermark, right_watermark, "inner",
    )


def interval_join_outer(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    max_delay: str = "1 hour",
    left_watermark: str = "2 hours",
    right_watermark: str = "2 hours",
) -> DataFrame:
    """Left-outer variant: unmatched left rows ARE emitted (right columns
    NULL) — but only once the watermark proves no match can still arrive,
    so outer results trail the watermark delay. This is the
    "impression with no click" shape; the same time-range condition keeps
    state bounded, and Spark requires it for outer stream-stream joins."""
    return _interval_join(
        left, right, key, left_ts, right_ts, max_delay,
        left_watermark, right_watermark, "left_outer",
    )


def _interval_join(
    left, right, key, left_ts, right_ts, max_delay,
    left_watermark, right_watermark, how,
):
    lt, rt = f"__l_{left_ts}", f"__r_{right_ts}"
    l = left.withColumnRenamed(left_ts, lt).withWatermark(lt, left_watermark)
    r = right.withColumnRenamed(right_ts, rt).withWatermark(rt, right_watermark)
    lk, rk = f"__l_{key}", f"__r_{key}"
    l = l.withColumnRenamed(key, lk)
    r = r.withColumnRenamed(key, rk)
    cond = (
        (F.col(lk) == F.col(rk))
        & (F.col(rt) >= F.col(lt))
        & (F.col(rt) <= F.col(lt) + F.expr(f"INTERVAL {max_delay}"))
    )
    return (
        l.join(r, cond, how)
        .withColumnRenamed(lk, key)
        .withColumnRenamed(lt, left_ts)
        .withColumnRenamed(rt, f"right_{right_ts}")
        .drop(rk)
    )
