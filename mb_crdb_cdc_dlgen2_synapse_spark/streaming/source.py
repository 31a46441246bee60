"""Structured Streaming SOURCE over a transaction-logged table — the
published Delta Lake streaming-source design (``spark.readStream
.format("delta")``) re-expressed through PySpark 4's Python Data Source
API (SPARK-44076): a txlog table becomes a first-class micro-batch
source with checkpointable offsets, so bronze -> silver -> gold table
chains run as ordinary Structured Streaming queries with exactly-once
progress tracking.

Reference surface: the reference lake is a changefeed landing zone that
downstream queries poll (/root/reference/README.md:131-192); this is the
incremental-consumption half of that contract — a consumer that never
re-reads data it has seen, across restarts.

Design (mirrors Delta's DeltaSource semantics, from the public docs):

- **Offsets** are ``{"base": B|None, "v": v, "i": i}`` — versions < v
  fully consumed, ``i`` files of version ``v``'s serve-list consumed.
  The serve-list of the snapshot-base version ``B`` is the table's
  ACTIVE file list at ``B`` (the initial snapshot); every later
  version's serve-list is the files its commit ADDED. Offsets are pure
  functions of the immutable log, so replaying a checkpointed offset
  range plans byte-identical partitions — exactly-once without a sink
  coordinator.
- **Initial position**: default = initial snapshot at the current head
  (Delta's default); ``startingVersion=N`` serves commit N onward with
  no snapshot; ``startingVersion="latest"`` serves only commits after
  stream start.
- **Change commits**: a commit that REMOVES files or adds deletion
  vectors is a data update a forward-only stream cannot represent —
  refuse by default (Delta: "Detected a data update... not supported"),
  ``skipChangeCommits=true`` skips them wholesale, ``ignoreChanges=true``
  serves their added files (documented may-duplicate semantics).
  ``op="compact"`` commits (compaction / Z-order / Hilbert relayout,
  dataChange=false) are skipped automatically — logical rows unchanged.
  Schema-changing commits always fail the stream (restart required).
- **Rate limiting**: ``maxFilesPerTrigger`` caps how far
  ``latestOffset`` advances per micro-batch (admission control the way
  Delta's source does it). After a driver restart the FIRST trigger is
  uncapped if Spark asks for the latest offset before replaying the
  checkpointed position (the engine then calls ``partitions(latest,
  latest)`` via AcceptsLatestSeenOffset, which re-pins the position and
  re-arms the cap).
- **Workers read parquet via Arrow** (``pyarrow`` batch iteration):
  each InputPartition is ONE file plus its read recipe — physical
  column names (column mapping), logged logical types (type widening
  upcasts), typed hive partition values from the path, the file's
  deletion vectors (snapshot files only), and the identity-column
  affine map (``base_row_id`` + position). No driver-side row
  materialization anywhere: the driver handles file LISTS, workers
  stream record batches — at 100 TB the per-trigger driver cost is
  O(files in the batch), the data plane is executor-parallel.

Not supported (documented refusals, not silent wrongness): tables with
NESTED column-mapping renames (the field-wise rebuild lives in the
batch reader; streaming refuses at start), and unknown reader features
(the protocol gate raises inside state resolution).
"""

from __future__ import annotations

import json
import os
from typing import Iterator

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

from ..txlog import TxTable, _nullable_normalized, _partition_values

FORMAT_NAME = "txtable"


def register_tx_source(spark) -> None:
    """Register the ``txtable`` streaming format on this session (idempotent
    — re-registering replaces the entry)."""
    spark.dataSource.register(TxStreamDataSource)


class TxFilePartition(InputPartition):
    """One data file + everything a worker needs to serve its rows under
    the stream's pinned logical schema. Plain attributes only (pickled to
    executors)."""

    def __init__(
        self,
        path: str,
        rel: str,
        schema_json: str,
        colmap: dict,
        parts: dict,
        dv_paths: list,
        base_row_id,
        identity: dict,
    ):
        self.path = path
        self.rel = rel
        self.schema_json = schema_json
        self.colmap = colmap
        self.parts = parts
        self.dv_paths = dv_paths
        self.base_row_id = base_row_id
        self.identity = identity


def _typed_partition_value(raw: str, dtype):
    """Hive path partition value (already unescaped) -> python value per
    the LOGGED type — the log types partition columns, not path inference."""
    if raw == "__HIVE_DEFAULT_PARTITION__":
        return None
    t = dtype.typeName()
    if t in ("integer", "long", "short", "byte"):
        return int(raw)
    if t in ("double", "float"):
        return float(raw)
    if t == "boolean":
        return raw.lower() == "true"
    if t == "date":
        import datetime

        return datetime.date.fromisoformat(raw)
    if t.startswith("decimal"):
        import decimal

        return decimal.Decimal(raw)
    return raw


def _read_tx_file(part: TxFilePartition) -> Iterator:
    """Worker-side scan: parquet -> Arrow record batches conforming to the
    stream's logical schema. Column-mapped physical names project back to
    logical, missing columns (pre-evolution files) read as typed NULLs,
    hive partition values inject as constants, deletion-vector positions
    filter out, identity columns resolve coalesce(stored, start + step *
    (base_row_id + position)), and every column CASTS to the logical
    arrow type (type widening: files keep the narrow type, readers serve
    the wide one)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import to_arrow_schema

    logical = T.StructType.fromJson(json.loads(part.schema_json))
    target = to_arrow_schema(logical)
    pf = pq.ParquetFile(part.path)
    file_cols = set(pf.schema_arrow.names)
    phys_of = {f.name: part.colmap.get(f.name, f.name) for f in logical.fields}
    want = [p for p in phys_of.values() if p in file_cols]

    dropped: set[int] = set()
    for dvp in part.dv_paths:
        dvt = pq.read_table(dvp, columns=["rel_file", "row_index"])
        mask = pc.equal(dvt.column("rel_file"), part.rel)
        dropped.update(dvt.filter(mask).column("row_index").to_pylist())

    pos = 0
    for batch in pf.iter_batches(columns=want or None, batch_size=1 << 16):
        n = batch.num_rows
        if n == 0:
            continue
        lo = pos
        pos += n
        cols = []
        for f in logical.fields:
            tt = target.field(f.name).type
            p = phys_of[f.name]
            if p in file_cols:
                arr = batch.column(batch.schema.get_field_index(p))
            elif f.name in part.parts:
                v = _typed_partition_value(part.parts[f.name], f.dataType)
                arr = pa.array([v] * n).cast(tt) if v is not None else pa.nulls(n, tt)
            else:
                arr = pa.nulls(n, tt)
            arr = arr.cast(tt) if arr.type != tt else arr
            spec = part.identity.get(f.name)
            if spec is not None and part.base_row_id is not None:
                import numpy as np

                ids = int(spec["start"]) + int(spec["step"]) * (
                    int(part.base_row_id) + np.arange(lo, lo + n, dtype="int64")
                )
                arr = pc.coalesce(arr, pa.array(ids).cast(tt))
            cols.append(arr)
        out = pa.RecordBatch.from_arrays(cols, schema=target)
        if dropped:
            keep = pa.array(
                [i not in dropped for i in range(lo, lo + n)], type=pa.bool_()
            )
            out = out.filter(keep)
        if out.num_rows:
            yield out


class TxStreamReader(DataSourceStreamReader):
    """Micro-batch planner for a txlog table (driver-side; file lists and
    log JSON only — no row I/O)."""

    def __init__(self, schema: T.StructType, options: dict):
        self.path = os.path.abspath(options["path"])
        self.tbl = TxTable(None, self.path)
        sv = options.get("startingversion")
        self.starting_version = sv  # None | "latest" | int-string
        mft = options.get("maxfilespertrigger")
        self.max_files = int(mft) if mft else None
        self.skip_change = str(options.get("skipchangecommits", "")).lower() == "true"
        self.ignore_changes = str(options.get("ignorechanges", "")).lower() == "true"
        self.schema_struct = schema
        self.schema_json = json.dumps(schema.jsonValue())
        self._norm = _nullable_normalized(self.schema_json)
        self._pos: dict | None = None
        self._base: int | None = None
        st = self.tbl._state()  # also runs the reader-feature protocol gate
        if any("." in k for k in st["colmap"]):
            raise ValueError(
                "txtable streaming source does not support nested column "
                "mapping renames yet; read this table in batch (TxTable."
                "read) or restart the stream after flattening the renames"
            )

    # -- log walking ---------------------------------------------------------

    def _commit(self, v: int) -> dict:
        return self.tbl._read_json(self.tbl._log_path(v))

    def _serve_list(self, v: int, base: int | None) -> list[str]:
        """Files offset coordinate ``(v, i)`` indexes into. Deterministic
        given the immutable log + the offset's own ``base`` — replays plan
        identical partitions."""
        if base is not None and v == base:
            return list(self.tbl._state(v)["active"])
        if v < 0:
            return []
        c = self._commit(v)
        if c.get("schema") is not None and _nullable_normalized(
            c["schema"]
        ) != self._norm:
            raise RuntimeError(
                f"txtable stream: commit v{v} changed the table schema; a "
                "running stream pins its schema at start — restart the "
                "stream to pick up the new one (Delta streaming contract)"
            )
        added = list(c.get("added") or [])
        is_change = bool(c.get("removed")) or bool(c.get("dv_added")) or (
            "dv_reset" in c
        )
        if not is_change:
            return added  # append-shaped (or metadata-only -> [])
        if c.get("op") == "compact":
            # dataChange=false: same logical rows in new files — skip
            return []
        if self.skip_change:
            return []
        if self.ignore_changes:
            return added
        raise RuntimeError(
            f"txtable stream: commit v{v} (op={c.get('op')!r}) is a data "
            "UPDATE (removed files or deletion vectors) — a forward-only "
            "stream cannot represent it. Set skipChangeCommits=true to "
            "skip such commits, or ignoreChanges=true to receive their "
            "rewritten files (may duplicate rows), matching Delta's "
            "options"
        )

    # -- DataSourceStreamReader contract -------------------------------------

    def initialOffset(self) -> dict:
        head = self.tbl.version()
        if self.starting_version is None:
            off = {"base": head if head >= 0 else None, "v": max(head, 0), "i": 0}
        elif str(self.starting_version).lower() == "latest":
            off = {"base": None, "v": head + 1, "i": 0}
        else:
            off = {"base": None, "v": int(self.starting_version), "i": 0}
        self._pos, self._base = dict(off), off["base"]
        return off

    def latestOffset(self) -> dict:
        pos = self._pos
        if pos is None:
            # restart path: Spark pins the checkpointed position via
            # partitions(latest, latest) (AcceptsLatestSeenOffset) before
            # planning; if latestOffset lands first, serve everything —
            # uncapped but correct (the next trigger re-arms the cap)
            pos = self.initialOffset()
        head = self.tbl.version()
        v, i, base = pos["v"], pos["i"], pos.get("base")
        budget = self.max_files if self.max_files is not None else None
        while True:
            lst = self._serve_list(v, base) if v <= head else []
            avail = max(len(lst) - i, 0)
            if budget is not None and avail > budget:
                i += budget
                break
            if budget is not None:
                budget -= avail
            i = len(lst)
            if v >= head:
                break
            if budget is not None and budget == 0:
                break
            v, i = v + 1, 0
        out = {"base": base, "v": v, "i": i}
        self._pos = dict(out)
        return out

    def partitions(self, start: dict, end: dict):
        self._base = start.get("base")
        self._pos = dict(end)
        if (start["v"], start["i"]) >= (end["v"], end["i"]):
            return [_EmptyPartition()]
        parts: list[InputPartition] = []
        for v in range(start["v"], end["v"] + 1):
            lst = self._serve_list(v, self._base)
            lo = start["i"] if v == start["v"] else 0
            hi = end["i"] if v == end["v"] else len(lst)
            if lo >= hi:
                continue
            st = self.tbl._state(v)
            colmap = {k: p for k, p in st["colmap"].items() if "." not in k}
            identity = st["identity"]
            logged_stats = st["stats"]
            dvs = (
                [os.path.join(self.path, d) for d in st["dvs"]]
                if (self._base is not None and v == self._base)
                else []
            )
            dv_files = set(st["dv_counts"]) if dvs else set()
            for rel in lst[lo:hi]:
                fstat = logged_stats.get(rel) or {}
                parts.append(
                    TxFilePartition(
                        path=os.path.join(self.path, rel),
                        rel=rel,
                        schema_json=self.schema_json,
                        colmap=colmap,
                        parts=_partition_values(rel),
                        dv_paths=dvs if rel in dv_files else [],
                        base_row_id=fstat.get("base_row_id"),
                        identity=identity,
                    )
                )
        return parts or [_EmptyPartition()]

    def read(self, partition) -> Iterator:
        if isinstance(partition, _EmptyPartition):
            return iter(())
        return _read_tx_file(partition)

    def commit(self, end: dict) -> None:
        self._pos = dict(end)

    def stop(self) -> None:
        pass


class _EmptyPartition(InputPartition):
    """Planned when an offset range is empty (e.g. the restart position
    probe): Spark requires >= 1 partition per batch."""

    def __init__(self):
        self.value = 0


class TxStreamDataSource(DataSource):
    """``spark.readStream.format("txtable").option("path", p).load()``.

    Options: ``path`` (table root, required), ``startingVersion``
    (int | "latest"; default = initial snapshot + tail),
    ``maxFilesPerTrigger``, ``skipChangeCommits``, ``ignoreChanges``."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> T.StructType:
        tbl = TxTable(None, self.options["path"])
        schema_json = tbl._state()["schema"]
        if not schema_json:
            raise ValueError(
                f"txtable source: table at {self.options['path']!r} has no "
                "committed schema yet (write to it first)"
            )
        return T.StructType.fromJson(json.loads(schema_json))

    def streamReader(self, schema: T.StructType) -> TxStreamReader:
        return TxStreamReader(schema, dict(self.options))
