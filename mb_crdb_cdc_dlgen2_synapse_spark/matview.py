"""Incremental materialized-view maintenance over the txlog table format.

The engine analog of Delta Live Tables / Materialize-style IVM for the
distributive aggregates (COUNT, SUM — AVG derives): a grouped aggregate over
a ``TxTable`` is kept current by applying the *file-level delta* between the
last refreshed snapshot and the head snapshot, never by recomputing from the
full table.

Why this is the 100 TB design: a refresh reads only the files ADDED or
REMOVED since the last refresh (both immutable until ``vacuum``), shuffles
only those delta rows by the grouping keys, and joins the per-key delta into
the stored view — whose cardinality is the number of groups, not the number
of rows. Per-refresh cost tracks the size of the change, exactly like the
bucket-partitioned CDC state merge (streaming/ingest.py) tracks batch size.
A full recompute — the Synapse-serverless model in the reference tutorial,
which re-scans every NDJSON file per query (/root/reference/README.md:173-192)
— is what this module exists to avoid.

Correctness model:
- additions contribute +1-weighted rows, removals -1-weighted rows; a
  rewrite (compact) contributes +all -all and cancels to a per-key no-op;
- SUM columns accumulate in DECIMAL(18,6) (functions/numeric rationale):
  exact in any order, so ANY refresh cadence — per commit, batched, or one
  shot — yields a bit-identical view (asserted in tests/test_matview.py);
- a key whose row count reaches zero leaves the view, so overwrites that
  drop keys are handled, not just monotone appends;
- the view itself is a ``TxTable``; each refresh is one atomic overwrite
  commit stamped ``txn={app: "mv:...", batch: <base_version>}``, so a
  re-driven refresh of an already-applied base version is a no-op
  (exactly-once under retries).

Limits (documented, not silent): aggregates must be distributive over +/-
(MIN/MAX are not maintainable under deletes without keeping per-key
multisets); the base table must be refreshed past a version before
``vacuum`` reclaims that version's removed files — same contract as any
Delta/Iceberg incremental consumer. A missing delta file raises with that
explanation rather than producing a silently stale view.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .txlog import TxTable

_DEC = "decimal(18,6)"


class IncrementalAggView:
    """COUNT + SUM grouped aggregate over ``base``, maintained incrementally.

    The stored schema is ``keys..., n_rows (long), sum_<col> (decimal)`` —
    sums live on the exact decimal grid inside the view and are cast to
    double only by readers that want doubles.
    """

    def __init__(
        self,
        spark: SparkSession,
        base: TxTable,
        path: str,
        keys: list[str],
        sum_cols: list[str],
        view_files: int = 4,
    ):
        self.spark = spark
        self.base = base
        self.keys = list(keys)
        self.sum_cols = list(sum_cols)
        self.view_files = view_files
        self.view = TxTable(spark, path)

    # -- state ---------------------------------------------------------------

    def refreshed_version(self) -> int:
        """Base-table version the stored view reflects (-1 = never built).
        Read from the view log's per-app txn watermark (checkpoint-carried,
        so it survives log pruning on the view table)."""
        got = self.view._state()["txn"].get(self._app())
        return -1 if got is None else got

    def _app(self) -> str:
        return f"mv:{os.path.basename(self.view.path)}"

    # -- delta plumbing ------------------------------------------------------

    def _read_files(self, relpaths: list[str], weight: int) -> DataFrame | None:
        if not relpaths:
            return None
        missing = [f for f in relpaths if not os.path.exists(os.path.join(self.base.path, f))]
        if missing:
            raise FileNotFoundError(
                f"matview delta needs {len(missing)} base-table file(s) already "
                f"vacuumed (e.g. {missing[0]!r}): refresh views BEFORE vacuum — "
                "the same retention contract as any incremental table reader"
            )
        paths = [os.path.join(self.base.path, f) for f in relpaths]
        df = self.spark.read.option("basePath", self.base.path).parquet(*paths)
        cols = [F.col(k) for k in self.keys]
        cols.append(F.lit(weight).alias("__w"))
        for c in self.sum_cols:
            cols.append((F.col(c).cast(_DEC) * weight).alias(f"__d_{c}"))
        return df.select(*cols)

    def _delta(self, from_v: int, to_v: int) -> DataFrame | None:
        """Per-key aggregate of the file-level diff between two snapshots."""
        _, active_from, _ = (
            self.base.snapshot(from_v) if from_v >= 0 else (None, [], None)
        )
        _, active_to, _ = self.base.snapshot(to_v)
        from_set, to_set = set(active_from), set(active_to)
        plus = self._read_files([f for f in active_to if f not in from_set], +1)
        minus = self._read_files([f for f in active_from if f not in to_set], -1)
        if plus is None and minus is None:
            return None
        rows = plus if minus is None else (minus if plus is None else plus.unionByName(minus))
        aggs = [F.sum("__w").alias("d_rows")]
        for c in self.sum_cols:
            aggs.append(F.sum(f"__d_{c}").alias(f"d_{c}"))
        return rows.groupBy(*self.keys).agg(*aggs)

    # -- public --------------------------------------------------------------

    def refresh(self) -> dict:
        """Apply all base commits past ``refreshed_version()``; returns
        ``{from_version, to_version, files_read}`` (files_read counts the
        delta files only — the only-reads-the-change invariant the tests
        assert)."""
        from_v, to_v = self.refreshed_version(), self.base.version()
        if to_v <= from_v:
            return {"from_version": from_v, "to_version": from_v, "files_read": 0}
        _, active_from, _ = (
            self.base.snapshot(from_v) if from_v >= 0 else (None, [], None)
        )
        _, active_to, _ = self.base.snapshot(to_v)
        n_files = len(set(active_from) ^ set(active_to))
        delta = self._delta(from_v, to_v)
        if delta is None:
            new = self.read_stored()
        else:
            old = self.read_stored() if self.refreshed_version() >= 0 else None
            if old is None:
                merged = delta
                new_cols = [
                    F.col("d_rows").alias("n_rows"),
                    *[F.col(f"d_{c}").alias(f"sum_{c}") for c in self.sum_cols],
                ]
            else:
                cond = [old[k].eqNullSafe(delta[k]) for k in self.keys]
                merged = old.join(delta, cond, "full_outer").select(
                    *[F.coalesce(old[k], delta[k]).alias(k) for k in self.keys],
                    *old.drop(*self.keys).columns,
                    *delta.drop(*self.keys).columns,
                )
                zero = F.lit(0).cast(_DEC)
                new_cols = [
                    (
                        F.coalesce(F.col("n_rows"), F.lit(0))
                        + F.coalesce(F.col("d_rows"), F.lit(0))
                    ).alias("n_rows"),
                    *[
                        (
                            F.coalesce(F.col(f"sum_{c}"), zero)
                            + F.coalesce(F.col(f"d_{c}"), zero)
                        ).cast(_DEC).alias(f"sum_{c}")
                        for c in self.sum_cols
                    ],
                ]
            new = merged.select(*self.keys, *new_cols).filter(F.col("n_rows") != 0)
        # the stored view has #groups rows — collapse the shuffle's 32 tiny
        # output files to a handful before the overwrite commit; checkpoint
        # severs lineage from the old view files
        new = new.coalesce(self.view_files).localCheckpoint(eager=True)
        self.view.overwrite(new, txn={"app": self._app(), "batch": to_v})
        return {"from_version": from_v, "to_version": to_v, "files_read": n_files}

    def read_stored(self) -> DataFrame:
        """The view exactly as stored (sums as decimals)."""
        return self.view.read()

    def read(self) -> DataFrame:
        """Reader-facing view: sums cast to double."""
        df = self.read_stored()
        return df.select(
            *self.keys,
            "n_rows",
            *[F.col(f"sum_{c}").cast("double").alias(f"sum_{c}") for c in self.sum_cols],
        )
