"""Custom stateful streaming operator (SURVEY.md §2.7 / X6): arbitrary
per-key state beyond what windowed aggregation expresses, via
``applyInPandasWithState`` (Arrow-batched; state lives in the state store,
partitioned by key — the Spark-native form of a custom stateful operator).

Example operator: per-row-key CDC version tracking — how many versions of
each row have flowed through the changefeed, plus the latest image. The
same shape handles sessionization variants, fraud counters, or feature
accumulation at 100 TB: state scales with keys, not events, and each
micro-batch touches only the keys present in it.
"""

from __future__ import annotations

from collections.abc import Iterator
from decimal import Decimal
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

def _nanos(s: Any) -> Decimal:
    """Numeric value of the changefeed's decimal-nanos ``updated`` string.
    'Latest' must be compared numerically — lexicographic string order breaks
    the moment producer timestamps differ in digit count."""
    return Decimal(str(s))


OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("row_id", T.StringType()),
        T.StructField("n_versions", T.LongType()),
        T.StructField("latest_updated", T.StringType()),
        T.StructField("latest_revenue", T.DoubleType()),
        T.StructField("deleted", T.BooleanType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_versions", T.LongType()),
        T.StructField("latest_updated", T.StringType()),
        T.StructField("latest_revenue", T.DoubleType()),
        T.StructField("deleted", T.BooleanType()),
    ]
)


def _track_versions(
    key: Any, pdf_iter: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        n, latest_updated, latest_revenue, deleted = state.get
    else:
        n, latest_updated, latest_revenue, deleted = 0, "", float("nan"), False
    for pdf in pdf_iter:
        n += len(pdf)
        # per-key ordering guarantee: within a batch, max(updated) is latest
        idx = pdf["updated"].map(_nanos).idxmax()
        if not latest_updated or _nanos(pdf.loc[idx, "updated"]) >= _nanos(latest_updated):
            latest_updated = str(pdf.loc[idx, "updated"])
            rev = pdf.loc[idx, "revenue"]
            deleted = bool(pd.isna(rev))
            latest_revenue = float("nan") if deleted else float(rev)
    state.update((n, latest_updated, latest_revenue, deleted))
    yield pd.DataFrame(
        {
            "row_id": [key[0]],
            "n_versions": [n],
            "latest_updated": [latest_updated],
            "latest_revenue": [latest_revenue],
            "deleted": [deleted],
        }
    )


def track_row_versions(envelope_stream: DataFrame) -> DataFrame:
    """Per-row-key version counter + latest image over a CDC envelope stream.

    Input: the typed envelope stream from ``changefeed_stream`` (columns
    ``after`` struct, ``updated`` string). Output (update mode): one row per
    key per batch with the running version count and latest revenue/delete
    flag.
    """
    keyed = envelope_stream.select(
        F.coalesce(F.col("after.id"), F.element_at("key", 2)).alias("row_id"),
        F.col("updated"),
        F.col("after.revenue").alias("revenue"),
    )
    return keyed.groupBy("row_id").applyInPandasWithState(
        _track_versions,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# transformWithStateInPandas variant — the Spark 4 successor API (typed state
# handles + timers, RocksDB-backed). Same operator semantics as
# track_row_versions; kept side by side so both stateful surfaces are covered.
# ---------------------------------------------------------------------------

try:  # pragma: no cover - availability guard for older Spark
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _VersionTrackerProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("ver", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            if self._state.exists():
                n, latest_updated, latest_revenue, deleted = self._state.get()
            else:
                n, latest_updated, latest_revenue, deleted = 0, "", float("nan"), False
            for pdf in rows:
                n += len(pdf)
                idx = pdf["updated"].map(_nanos).idxmax()
                if not latest_updated or _nanos(pdf.loc[idx, "updated"]) >= _nanos(latest_updated):
                    latest_updated = str(pdf.loc[idx, "updated"])
                    rev = pdf.loc[idx, "revenue"]
                    deleted = bool(pd.isna(rev))
                    latest_revenue = float("nan") if deleted else float(rev)
            self._state.update((n, latest_updated, latest_revenue, deleted))
            yield pd.DataFrame(
                {
                    "row_id": [key[0]],
                    "n_versions": [n],
                    "latest_updated": [latest_updated],
                    "latest_revenue": [latest_revenue],
                    "deleted": [deleted],
                }
            )

        def close(self) -> None:
            pass

    def track_row_versions_tws(envelope_stream: DataFrame) -> DataFrame:
        """transformWithStateInPandas port of ``track_row_versions``.
        Requires the RocksDB state store provider (set by the caller/session:
        spark.sql.streaming.stateStore.providerClass)."""
        keyed = envelope_stream.select(
            F.coalesce(F.col("after.id"), F.element_at("key", 2)).alias("row_id"),
            F.col("updated"),
            F.col("after.revenue").alias("revenue"),
        )
        return keyed.groupBy("row_id").transformWithStateInPandas(
            statefulProcessor=_VersionTrackerProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )

except ImportError:  # pragma: no cover
    track_row_versions_tws = None
