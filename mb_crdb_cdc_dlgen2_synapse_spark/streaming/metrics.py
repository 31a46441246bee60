"""Pipeline observability: per-micro-batch progress capture and in-plan
``observe()`` metrics.

Production streaming needs throughput/lag visibility without a second job
reading its own output. Two public-Spark mechanisms cover it:

- ``StreamingQueryListener`` — the engine pushes per-batch progress
  (rows, duration, sink description) to registered listeners; we buffer
  them driver-side (bounded) for dashboards/tests.
- ``DataFrame.observe`` — named aggregates evaluated INSIDE the running
  plan (no extra pass, codegen'd alongside the query); the CDC helper
  counts rows and tombstones per batch this way.
"""

from __future__ import annotations

from collections import deque

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming import StreamingQueryListener


class ProgressCapture(StreamingQueryListener):
    """Buffers the last ``max_batches`` micro-batch progress events.

    Listener callbacks run on the driver's listener bus — keep them O(1):
    we only append to a bounded deque; aggregation happens on read.
    """

    def __init__(self, max_batches: int = 256):
        self.events: deque = deque(maxlen=max_batches)

    # -- listener interface --------------------------------------------------
    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API names)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        self.events.append(
            {
                "batch_id": p.batchId,
                "num_input_rows": p.numInputRows,
                "duration_ms": (p.durationMs or {}).get("triggerExecution"),
            }
        )

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    # -- accessors -----------------------------------------------------------
    def total_rows(self) -> int:
        return sum(e["num_input_rows"] for e in self.events)

    def batches(self) -> list[dict]:
        return list(self.events)


def observe_cdc_batch(envelopes: DataFrame, name: str = "cdc_metrics") -> DataFrame:
    """Attach in-plan CDC metrics: total rows, tombstones, distinct-ish key
    pressure. Read them from the Observation/`observedMetrics` after an
    action — zero extra scans."""
    return envelopes.observe(
        name,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("after").isNull(), 1).otherwise(0)).alias("n_tombstones"),
    )
