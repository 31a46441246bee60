"""Minimal transaction-logged parquet table ("txlog") — the engine's
stand-in for a lakehouse table format in a container without one.

The reference's north star is a durable, concurrently readable lake landing
(/root/reference/README.md:136,182; BASELINE.json "Delta sink to Datalake").
Plain directory-of-parquet cannot give readers a consistent view across a
rewrite. This module implements the core of the publicly documented
log-structured table design (Delta Lake, VLDB 2020; Iceberg spec): data
files are immutable, and the table's CONTENT is defined by an append-only
log of JSON commits, each listing files added and removed.

Guarantees (and their mechanisms):

- **Atomic commits** — a commit becomes visible via a single
  put-if-absent of ``_txlog/<version>.json`` (``os.link`` from a temp file:
  fails if the version exists). Readers either see the whole commit or none
  of it; a crash mid-write leaves only invisible staging/tmp files.
- **Optimistic concurrency** — two writers racing for version N: one wins
  the link, the loser re-reads the snapshot and retries at N+1.
- **Snapshot isolation** — readers resolve the file list once; removed
  files stay on disk until ``vacuum()``, so an in-flight reader keeps a
  consistent view across concurrent overwrites.
- **Exactly-once streaming appends** — commits can carry a
  ``txn={"app": ..., "batch": n}`` marker; re-delivered micro-batches (the
  at-least-once half of T8) are detected in the log and skipped.

Scale notes: the log holds file METADATA only (O(files), not O(rows));
commits are a driver-side metadata operation, data moves are per-file
renames (object stores: metadata copies). Partition-aware overwrite
(``overwrite_partitions``) rewrites only the named partition directories —
the transactional twin of dynamic partition overwrite used by the state
merge. A production deployment swaps this for Delta/Iceberg unchanged in
shape; every caller goes through ``append/overwrite/read``.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_LOG_DIR = "_txlog"
_STAGING = "_staging"


class TxConflictError(RuntimeError):
    """Raised internally on a version race; commits retry automatically."""


class TxTable:
    """A transaction-logged parquet table rooted at ``path`` (local/posix
    paths; an object-store deployment maps these to FS-API calls)."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = os.path.abspath(path)
        os.makedirs(os.path.join(self.path, _LOG_DIR), exist_ok=True)

    # -- log primitives ------------------------------------------------------

    def _log_path(self, version: int) -> str:
        return os.path.join(self.path, _LOG_DIR, f"{version:020d}.json")

    def _commits(self) -> list[dict]:
        log_dir = os.path.join(self.path, _LOG_DIR)
        out = []
        for name in sorted(os.listdir(log_dir)):
            # only canonical committed versions: 20 digits + .json — tmp
            # files from in-flight/crashed commits never parse as commits
            if name.endswith(".json") and name[:-5].isdigit():
                with open(os.path.join(log_dir, name)) as f:
                    out.append(json.load(f))
        return out

    def version(self) -> int:
        """Latest committed version, -1 for an empty log."""
        commits = self._commits()
        return commits[-1]["version"] if commits else -1

    def history(self) -> list[dict]:
        """All commits, oldest first (the audit log)."""
        return self._commits()

    def snapshot(self) -> tuple[int, list[str], str | None]:
        """(version, active data files relative to root, latest schema json).
        Resolved ONCE per call — the reader's consistent view."""
        active: list[str] = []
        schema = None
        commits = self._commits()
        for c in commits:
            removed = set(c.get("removed", []))
            active = [f for f in active if f not in removed]
            active.extend(c.get("added", []))
            schema = c.get("schema") or schema
        return (commits[-1]["version"] if commits else -1), active, schema

    def _txn_seen(self, txn: dict | None) -> bool:
        if not txn:
            return False
        for c in self._commits():
            t = c.get("txn")
            if t and t.get("app") == txn["app"] and t.get("batch") == txn["batch"]:
                return True
        return False

    # -- staging -------------------------------------------------------------

    def _stage(self, df: DataFrame, partition_by: list[str] | None) -> list[str]:
        """Write df's files into a staging dir, move them under the table
        root (immutable, invisible until committed), return their relpaths."""
        stage = os.path.join(self.path, _STAGING, uuid.uuid4().hex)
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(stage)
        moved: list[str] = []
        for dirpath, _dirnames, filenames in os.walk(stage):
            for name in filenames:
                if not name.endswith(".parquet"):
                    continue
                src = os.path.join(dirpath, name)
                rel = os.path.relpath(src, stage)
                dst = os.path.join(self.path, rel)
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                os.rename(src, dst)
                moved.append(rel)
        shutil.rmtree(stage, ignore_errors=True)
        return moved

    def _commit(
        self,
        added: list[str],
        removed_fn,
        schema_json: str,
        txn: dict | None,
        op: str,
        max_retries: int = 20,
    ) -> int:
        """Put-if-absent commit with optimistic retry. ``removed_fn`` maps the
        freshly re-read active file list -> files this commit removes (it is
        re-evaluated on every retry, so overwrites stay correct under races).
        """
        for _ in range(max_retries):
            version, active, _ = self.snapshot()
            entry = {
                "version": version + 1,
                "op": op,
                "added": added,
                "removed": removed_fn(active),
                "schema": schema_json,
                "txn": txn,
                "utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            }
            tmp = os.path.join(
                self.path, _LOG_DIR, f".tmp-{uuid.uuid4().hex}.json"
            )
            with open(tmp, "w") as f:
                json.dump(entry, f)
            target = self._log_path(version + 1)
            try:
                os.link(tmp, target)  # atomic put-if-absent
                return version + 1
            except FileExistsError:
                continue  # lost the race — re-read snapshot, retry
            finally:
                os.remove(tmp)
        raise TxConflictError(f"gave up after {max_retries} commit races")

    # -- public write ops ----------------------------------------------------

    def _check_schema(self, df: DataFrame, merge_schema: bool) -> None:
        """Delta-style write-time schema enforcement: appends must match the
        table schema exactly unless the caller opts into evolution."""
        _v, _files, schema = self.snapshot()
        if schema is not None and schema != df.schema.json() and not merge_schema:
            raise ValueError(
                "txlog schema mismatch: incoming write schema differs from the "
                "table schema; pass merge_schema=True to evolve (readers then "
                "merge parquet footers)"
            )

    def append(
        self,
        df: DataFrame,
        partition_by: list[str] | None = None,
        txn: dict | None = None,
        merge_schema: bool = False,
    ) -> int:
        """Atomic append; with ``txn`` a re-delivered batch is a no-op."""
        if self._txn_seen(txn):
            return self.version()
        self._check_schema(df, merge_schema)
        added = self._stage(df, partition_by)
        return self._commit(added, lambda active: [], df.schema.json(), txn, "append")

    def overwrite(self, df: DataFrame, partition_by: list[str] | None = None) -> int:
        """Atomically replace the ENTIRE table content."""
        added = self._stage(df, partition_by)
        return self._commit(
            added, lambda active: list(active), df.schema.json(), None, "overwrite"
        )

    def overwrite_partitions(self, df: DataFrame, partition_by: list[str]) -> int:
        """Transactional dynamic partition overwrite: replace exactly the
        partition directories present in ``df`` (other partitions' files are
        untouched). The MERGE-shaped commit used by the CDC state sink."""
        added = self._stage(df, partition_by)
        touched_dirs = {os.path.dirname(rel) for rel in added}

        def removed(active: list[str]) -> list[str]:
            return [f for f in active if os.path.dirname(f) in touched_dirs]

        return self._commit(added, removed, df.schema.json(), None, "overwrite_partitions")

    def compact(self, target_files: int = 1) -> int:
        """Rewrite current content into ``target_files`` files in ONE commit —
        the OPTIMIZE analog; concurrent readers keep their snapshot."""
        df = self.read().coalesce(target_files).localCheckpoint(eager=True)
        added = self._stage(df, None)
        return self._commit(
            added, lambda active: list(active), df.schema.json(), None, "compact"
        )

    # -- read / maintenance --------------------------------------------------

    def read(self) -> DataFrame:
        """DataFrame over the current snapshot's files (partition columns
        recovered via basePath). Empty table -> empty DF with the last
        committed schema."""
        _version, active, schema = self.snapshot()
        if not active:
            st = T.StructType.fromJson(json.loads(schema)) if schema else T.StructType([])
            return self.spark.createDataFrame([], st)
        paths = [os.path.join(self.path, f) for f in active]
        reader = self.spark.read.option("basePath", self.path)
        # evolved tables (ACTIVE files written under >1 schema) need footer
        # merging; tables whose old schemas were fully overwritten don't
        file_schema: dict[str, str | None] = {}
        for c in self._commits():
            for f in c.get("removed", []):
                file_schema.pop(f, None)
            for f in c.get("added", []):
                file_schema[f] = c.get("schema")
        if len(set(file_schema.values())) > 1:
            reader = reader.option("mergeSchema", "true")
        return reader.parquet(*paths)

    def vacuum(self) -> int:
        """Delete data files no longer referenced by the CURRENT snapshot.
        Run only when no reader older than the latest snapshot is in flight
        (same contract as Delta VACUUM). Returns files deleted."""
        _v, active, _s = self.snapshot()
        keep = set(active)
        deleted = 0
        for dirpath, dirnames, filenames in os.walk(self.path):
            dirnames[:] = [d for d in dirnames if d not in (_LOG_DIR, _STAGING)]
            for name in filenames:
                full = os.path.join(dirpath, name)
                rel = os.path.relpath(full, self.path)
                if name.endswith(".parquet") and rel not in keep:
                    os.remove(full)
                    deleted += 1
        shutil.rmtree(os.path.join(self.path, _STAGING), ignore_errors=True)
        return deleted


def stream_to_tx_table(
    stream: DataFrame,
    table_dir: str,
    checkpoint_dir: str,
    partition_by: list[str] | None = None,
    available_now: bool = True,
):
    """T8 with real transactions: stream -> ``foreachBatch`` txlog append.

    Each micro-batch commits atomically with a ``txn`` marker derived from
    the checkpoint identity + batch id, so a batch re-delivered after a
    crash/restart is recognized in the log and skipped — exactly-once lake
    appends over at-least-once delivery, the same protocol Structured
    Streaming uses with Delta's idempotent writes.
    """
    app_id = os.path.abspath(checkpoint_dir)

    def commit_batch(batch: DataFrame, batch_id: int) -> None:
        table = TxTable(batch.sparkSession, table_dir)
        table.append(batch, partition_by=partition_by, txn={"app": app_id, "batch": batch_id})

    writer = (
        stream.writeStream.foreachBatch(commit_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
