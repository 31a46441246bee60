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
- **Change feed streaming** (``readChangeFeed=true`` — Delta's CDF
  streaming option): the stream serves row-level CHANGES instead of rows
  — the initial snapshot as ``insert`` images, then per-commit ``delete``
  images of removed files (DVs active at v-1 applied), ``insert`` images
  of added files, and merge-on-read deletes' DV'd positions as ``delete``
  images — with ``_change_type`` / ``_commit_version`` columns appended,
  exactly the batch ``read_changes`` rendering served incrementally with
  exactly-once offsets. Compaction commits contribute nothing
  (dataChange=false) — the ONE contract shared with batch
  ``read_changes`` (whose ``include_carried=True`` is the batch-only
  escape hatch for file-delta consumers; the stream never emits carried
  pairs), pinned by ``test_cdf_stream_batch_parity_fuzz``. Identity columns resolve feed-side through each
  file's era base map (pre-enablement eras through the enablement era,
  batch parity). ``rowIds=true`` (requires row tracking) appends
  ``_row_id`` so a consumer pairs each update's pre/post images
  KEYLESSLY on the stream — delete+insert sharing a ``_row_id`` at one
  version are an update (the ``read_update_pairs`` contract,
  incremental).
- **Rate limiting**: ``maxFilesPerTrigger`` caps how far
  ``latestOffset`` advances per micro-batch (admission control the way
  Delta's source does it). After a driver restart the FIRST trigger is
  uncapped if Spark asks for the latest offset before replaying the
  checkpointed position (the engine then calls ``partitions(latest,
  latest)`` via AcceptsLatestSeenOffset, which re-pins the position and
  re-arms the cap).
- **Task packing**: ``packBytes`` (default 32MB ceiling; 0 = one task
  per file) groups small files into shared tasks by logged size — the
  Python DataSource protocol pays a fixed per-task toll, and a CDC
  table is many small commit files. The packing target is
  ``total/packTasks`` (default 64) floored at 1MB so a large snapshot
  still fans out; the target derives only from options and logged
  bytes — never host properties — so planning is plan-order greedy and
  replay-identical for a given offset range on ANY hardware.
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
    DataSourceStreamArrowWriter,
    DataSourceStreamReader,
    InputPartition,
    WriterCommitMessage,
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
    executors). ``emit`` selects which rows of the file this partition
    serves relative to its deletion-vector positions: ``"keep"`` = the
    visible rows (DV'd rows filtered out), ``"dropped"`` = ONLY the DV'd
    rows (a merge-on-read delete's deleted images). ``change_type`` /
    ``commit_version``, when set, append as CDF constant columns."""

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
        emit: str = "keep",
        change_type=None,
        commit_version=None,
        with_row_ids: bool = False,
    ):
        self.path = path
        self.rel = rel
        self.schema_json = schema_json
        self.colmap = colmap
        self.parts = parts
        self.dv_paths = dv_paths
        self.base_row_id = base_row_id
        self.identity = identity
        self.emit = emit
        self.change_type = change_type
        self.commit_version = commit_version
        self.with_row_ids = with_row_ids


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


def _pack_plan(
    sizes: list[int], pack_bytes: int, pack_tasks: int
) -> list[tuple[int, int]]:
    """Greedy plan-order packing of per-file logged byte sizes into task
    groups, returned as ``[lo, hi)`` index ranges. PURE function of its
    arguments — no host properties — so the same offset range plans the
    same task groups on any machine (the replay-determinism contract; a
    cpu-count-derived target broke it across hardware).

    A file never splits; a group closes once it holds the target bytes.
    ``pack_bytes`` is the CEILING; a large batch still fans out to
    ~``pack_tasks`` groups (packing a 600k-row snapshot into one task
    would serialize what the cluster should scan in parallel); tiny
    batches keep the 1MB floor so a handful of small CDC commits stays
    one task. O(n) time, O(groups) extra space — planning a multi-
    thousand-file CDC backlog is a driver-side list walk, no I/O."""
    total = sum(sizes)
    target = min(pack_bytes, max(total // max(pack_tasks, 1), 1 << 20))
    groups: list[tuple[int, int]] = []
    lo = 0
    acc = 0
    for i, b in enumerate(sizes):
        if i > lo and acc + b > target:
            groups.append((lo, i))
            lo, acc = i, 0
        acc += b
    groups.append((lo, len(sizes)))
    return groups


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
    # rewritten files materialize each row's id as __row_id (the
    # row-tracking contract); readers coalesce(stored, base + position) —
    # base+position ALONE is wrong after a compaction reorders rows
    need_ids = part.with_row_ids or any(
        part.identity.get(f.name) is not None for f in logical.fields
    )
    has_stored_ids = need_ids and "__row_id" in file_cols
    if has_stored_ids:
        want = want + ["__row_id"]

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
        row_ids = None
        if need_ids:
            import numpy as np

            if part.base_row_id is not None:
                row_ids = pa.array(
                    int(part.base_row_id) + np.arange(lo, lo + n, dtype="int64")
                )
            else:
                row_ids = pa.nulls(n, pa.int64())
            if has_stored_ids:
                stored = batch.column(
                    batch.schema.get_field_index("__row_id")
                ).cast(pa.int64())
                row_ids = pc.coalesce(stored, row_ids)
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
            if spec is not None and row_ids is not None:
                affine = pc.add(
                    pa.scalar(int(spec["start"]), pa.int64()),
                    pc.multiply(
                        pa.scalar(int(spec["step"]), pa.int64()), row_ids
                    ),
                )
                arr = pc.coalesce(arr, affine.cast(tt))
            cols.append(arr)
        if part.with_row_ids:
            target_ids = pa.schema(
                list(target) + [pa.field("_row_id", pa.int64())]
            )
            out = pa.RecordBatch.from_arrays(
                cols + [row_ids], schema=target_ids
            )
        else:
            out = pa.RecordBatch.from_arrays(cols, schema=target)
        if part.emit == "dropped":
            mask = pa.array(
                [i in dropped for i in range(lo, lo + n)], type=pa.bool_()
            )
            out = out.filter(mask)
        elif dropped:
            keep = pa.array(
                [i not in dropped for i in range(lo, lo + n)], type=pa.bool_()
            )
            out = out.filter(keep)
        if part.change_type is not None:
            m = out.num_rows
            ext = pa.schema(
                list(out.schema)
                + [
                    pa.field("_change_type", pa.string()),
                    pa.field("_commit_version", pa.int64()),
                ]
            )
            out = pa.RecordBatch.from_arrays(
                out.columns
                + [
                    pa.array([part.change_type] * m, type=pa.string()),
                    pa.array([part.commit_version] * m, type=pa.int64()),
                ],
                schema=ext,
            )
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
        self.starting_timestamp = options.get("startingtimestamp")
        if sv is not None and self.starting_timestamp is not None:
            raise ValueError(
                "set startingVersion OR startingTimestamp, not both"
            )
        mft = options.get("maxfilespertrigger")
        self.max_files = int(mft) if mft else None
        mbt = options.get("maxbytespertrigger")
        self.max_bytes = int(mbt) if mbt else None
        # Python DataSource tasks pay a fixed protocol toll (worker spawn
        # + Arrow IPC setup) — CDC tables are MANY SMALL commit files, so
        # one-task-per-file multiplies that toll. Files pack into tasks by
        # LOGGED size up to packBytes (0 disables, one task per file).
        pb = options.get("packbytes")
        self.pack_bytes = int(pb) if pb is not None else 32 << 20
        # fan-out target for a large batch: total/packTasks bounded by
        # packBytes. A FIXED constant (not os.cpu_count()) so the greedy
        # packing is a pure function of the offset range — a checkpoint
        # restart on different hardware replans IDENTICAL task groups
        # (round-7 advisory: cpu-derived targets made the determinism
        # claim hold only per machine).
        pt = options.get("packtasks")
        self.pack_tasks = int(pt) if pt is not None else 64
        self.skip_change = str(options.get("skipchangecommits", "")).lower() == "true"
        self.ignore_changes = str(options.get("ignorechanges", "")).lower() == "true"
        self.cdf = str(options.get("readchangefeed", "")).lower() == "true"
        self.row_ids = str(options.get("rowids", "")).lower() == "true"
        data_fields = [
            f
            for f in schema.fields
            if not (self.cdf and f.name in ("_change_type", "_commit_version"))
            and not (self.row_ids and f.name == "_row_id")
        ]
        self.schema_struct = T.StructType(data_fields)
        self.schema_json = json.dumps(self.schema_struct.jsonValue())
        self._norm = _nullable_normalized(self.schema_json)
        self._pos: dict | None = None
        self._base: int | None = None
        self._serve_memo: dict[tuple, list] = {}
        st = self.tbl._state()  # also runs the reader-feature protocol gate
        if self.row_ids and not st["rowtrack"].get("enabled"):
            raise ValueError(
                "rowIds=true requires enable_row_tracking() on this table"
            )
        # Commits up to the version whose schema this stream pinned render
        # fine under the pinned end-state vocabulary (typed NULLs for
        # later-added columns, frozen physical names across renames — the
        # batch reader/CDF contract); only a schema change AFTER the pin
        # forces a restart.
        self._pin_head = st["version"]
        # row images render under the PINNED vocabulary (batch read/CDF
        # contract): the end mapping reads every era's frozen physical
        # names, the end identity rules resolve every era's rows
        self._colmap = {k: p for k, p in st["colmap"].items() if "." not in k}
        self._identity = {k: dict(v) for k, v in st["identity"].items()}
        if any("." in k for k in st["colmap"]):
            raise ValueError(
                "txtable streaming source does not support nested column "
                "mapping renames yet; read this table in batch (TxTable."
                "read) or restart the stream after flattening the renames"
            )
        # batch-CDF parity: pre-row-tracking eras resolve identity /
        # _row_id bases through the ENABLEMENT era's backfilled map (the
        # only commit carrying ``rowid_assign``) — found once, driver-side
        self._enable_v: int | None = None
        if self.cdf and st["rowtrack"].get("enabled"):
            commits_map, _ = self.tbl._list_log()
            self._enable_v = next(
                (
                    v
                    for v in sorted(commits_map)
                    if "rowid_assign" in self.tbl._read_json(commits_map[v])
                ),
                None,
            )

    # -- log walking ---------------------------------------------------------

    def _commit(self, v: int) -> dict:
        try:
            return self.tbl._read_json(self.tbl._log_path(v))
        except OSError:
            raise RuntimeError(
                f"txtable stream: commit v{v} is no longer in the log "
                "(pruned by vacuum while this stream lagged). Restart the "
                "stream from a retained position — a fresh checkpoint "
                "takes the current snapshot; keep consumers ahead of the "
                "vacuum retention window"
            ) from None

    def _serve_list(self, v: int, base: int | None) -> list[tuple[str, str]]:
        """``(rel_file, kind)`` entries offset coordinate ``(v, i)``
        indexes into — deterministic given the immutable log + the
        offset's own ``base``, so replays plan identical partitions.
        Kinds: ``data`` (plain row stream), or in CDF mode
        ``insert_snap`` / ``insert`` / ``delete`` / ``dv_delete``.
        Memoized: ``latestOffset`` + ``partitions`` re-ask the same
        versions every trigger, and the snapshot entry alone is O(active
        files) — a million-file table must not rebuild it per trigger."""
        key = (v, base)
        got = self._serve_memo.get(key)
        if got is not None:
            return got
        out = self._serve_list_uncached(v, base)
        if len(self._serve_memo) > 64:  # lagging-range walks stay bounded
            self._serve_memo.clear()
        self._serve_memo[key] = out
        return out

    def _serve_list_uncached(self, v: int, base: int | None) -> list[tuple[str, str]]:
        if base is not None and v == base:
            kind = "insert_snap" if self.cdf else "data"
            return [(r, kind) for r in self.tbl._state(v)["active"]]
        if v < 0:
            return []
        c = self._commit(v)
        if v > self._pin_head and c.get("schema") is not None and (
            _nullable_normalized(c["schema"]) != self._norm
        ):
            raise RuntimeError(
                f"txtable stream: commit v{v} changed the table schema; a "
                "running stream pins its schema at start — restart the "
                "stream to pick up the new one (Delta streaming contract)"
            )
        added = list(c.get("added") or [])
        if c.get("op") == "compact":
            # dataChange=false: same logical rows in new files — no rows
            # and no changes to serve in either mode
            return []
        if self.cdf:
            # the change feed: delete images of removed files, insert
            # images of added files (a rewrite nets to its true changes
            # downstream), DV'd positions as delete images — exactly the
            # batch read_changes rendering, one entry per file
            ent = [(r, "delete") for r in (c.get("removed") or [])]
            ent += [(r, "insert") for r in added]
            if c.get("dv_added"):
                ent += [(f, "dv_delete") for f in sorted(c.get("dv_counts") or {})]
            return ent
        is_change = bool(c.get("removed")) or bool(c.get("dv_added")) or (
            "dv_reset" in c
        )
        if not is_change:
            return [(r, "data") for r in added]  # append (or metadata -> [])
        if self.skip_change:
            return []
        if self.ignore_changes:
            return [(r, "data") for r in added]
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
        if self.starting_timestamp is not None:
            # Delta's startingTimestamp: changes from the FIRST commit at
            # or after the timestamp (no snapshot)
            ts = str(self.starting_timestamp)
            commits_map, _ = self.tbl._list_log()
            v0 = next(
                (
                    v
                    for v in sorted(commits_map)
                    if (self.tbl._read_json(commits_map[v]).get("utc") or "")
                    >= ts
                ),
                None,
            )
            if v0 is None:
                raise ValueError(
                    f"startingTimestamp {ts!r} is after the latest commit; "
                    "use startingVersion='latest' to tail only new commits"
                )
            off = {"base": None, "v": v0, "i": 0}
        elif self.starting_version is None:
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
        if self.max_bytes is not None:
            # byte-budgeted admission (Delta's maxBytesPerTrigger): walk
            # entries, charging each file's LOGGED size — driver metadata
            # only. Always admit >=1 file per trigger so progress is
            # guaranteed even for files larger than the budget.
            remaining, admitted = self.max_bytes, 0
            while v <= head:
                lst = self._serve_list(v, base)
                stats = self.tbl._state(v)["stats"] if lst else {}
                while i < len(lst):
                    rel = lst[i][0]
                    size = int((stats.get(rel) or {}).get("bytes") or 0)
                    if admitted > 0 and (
                        size > remaining
                        or (budget is not None and budget <= 0)
                    ):
                        out = {"base": base, "v": v, "i": i}
                        self._pos = dict(out)
                        return out
                    remaining -= size
                    admitted += 1
                    if budget is not None:
                        budget -= 1
                    i += 1
                if v >= head:
                    break
                v, i = v + 1, 0
            out = {"base": base, "v": v, "i": i}
            self._pos = dict(out)
            return out
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

    def _era_stats(self, at: int) -> dict:
        """Per-file logged stats under the state where a CDF entry's file
        was ACTIVE; pre-row-tracking eras fall back to the enablement
        era's backfilled base map (batch read_changes parity)."""
        st = self.tbl._state(at) if at >= 0 else self.tbl._empty_state()
        if not st["rowtrack"].get("enabled") and self._enable_v is not None:
            st = self.tbl._state(self._enable_v)
        return st["stats"]

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
            colmap, identity = self._colmap, self._identity
            logged_stats = st["stats"]
            snap_dvs = (
                [os.path.join(self.path, d) for d in st["dvs"]]
                if (self._base is not None and v == self._base)
                else []
            )
            snap_dv_files = set(st["dv_counts"]) if snap_dvs else set()
            c = self._commit(v) if (self._base is None or v != self._base) else {}
            prev_st = prev_stats = None
            for rel, kind in lst[lo:hi]:
                fstat = logged_stats.get(rel) or {}
                dvs: list = []
                emit, change, cv = "keep", None, None
                if kind == "data":
                    dvs = snap_dvs if rel in snap_dv_files else []
                elif kind == "insert_snap":
                    dvs = snap_dvs if rel in snap_dv_files else []
                    change, cv = "insert", v
                elif kind == "insert":
                    # restore commits re-add files together with the
                    # restored snapshot's DV set (dv_reset): apply it so
                    # rows that snapshot had deleted don't re-insert
                    if c.get("dv_reset") and rel in st["dv_counts"]:
                        dvs = [
                            os.path.join(self.path, d) for d in c["dv_reset"]
                        ]
                    change, cv = "insert", v
                elif kind in ("delete", "dv_delete"):
                    if prev_st is None:
                        prev_st = (
                            self.tbl._state(v - 1)
                            if v > 0
                            else self.tbl._empty_state()
                        )
                        prev_stats = self._era_stats(v - 1) if self.cdf else {}
                    if kind == "delete":
                        # delete images = the rows VISIBLE at v-1: apply
                        # the DVs active just before this commit
                        if rel in prev_st["dv_counts"]:
                            dvs = [
                                os.path.join(self.path, d)
                                for d in prev_st["dvs"]
                            ]
                    else:  # only the NEW dv positions are this change
                        dvs = [
                            os.path.join(self.path, d)
                            for d in (c.get("dv_added") or [])
                        ]
                        emit = "dropped"
                    fstat = prev_stats.get(rel) or {}
                    change, cv = "delete", v
                if self.cdf and kind == "insert":
                    fstat = self._era_stats(v).get(rel) or fstat
                fp = TxFilePartition(
                    path=os.path.join(self.path, rel),
                    rel=rel,
                    schema_json=self.schema_json,
                    colmap=colmap,
                    parts=_partition_values(rel),
                    dv_paths=dvs,
                    base_row_id=fstat.get("base_row_id"),
                    identity=identity,
                    emit=emit,
                    change_type=change,
                    commit_version=cv,
                    with_row_ids=self.row_ids,
                )
                # unknown logged size: assume big enough to stand alone
                fp.bytes = int(fstat.get("bytes") or self.pack_bytes or 1)
                parts.append(fp)
        if not parts:
            return [_EmptyPartition()]
        if self.pack_bytes <= 0 or len(parts) <= 1:
            return parts
        groups = _pack_plan(
            [fp.bytes for fp in parts], self.pack_bytes, self.pack_tasks
        )
        return [
            parts[lo] if hi - lo == 1 else TxFilesPartition(parts[lo:hi])
            for lo, hi in groups
        ]

    def read(self, partition) -> Iterator:
        if isinstance(partition, _EmptyPartition):
            return iter(())
        if isinstance(partition, TxFilesPartition):
            return (
                batch
                for fp in partition.entries
                for batch in _read_tx_file(fp)
            )
        return _read_tx_file(partition)

    def commit(self, end: dict) -> None:
        self._pos = dict(end)

    def stop(self) -> None:
        pass


class TxFilesPartition(InputPartition):
    """Several small files served by ONE task. The Python DataSource
    protocol pays a fixed per-task toll (Python worker spawn + Arrow IPC
    setup), so a CDC table's thousands of small commit files must not
    become thousands of tasks; files pack by logged bytes up to the
    reader's ``packBytes`` (plan-order greedy, deterministic across
    replays). A file never splits across tasks."""

    def __init__(self, entries: list[TxFilePartition]):
        self.entries = entries


class _EmptyPartition(InputPartition):
    """Planned when an offset range is empty (e.g. the restart position
    probe): Spark requires >= 1 partition per batch."""

    def __init__(self):
        self.value = 0


class _StagedSinkFile(WriterCommitMessage):
    """One executor task's staged parquet output (rel path under the
    table's ``_staging/``; None when the task saw no rows)."""

    def __init__(self, rel):
        self.rel = rel


class TxStreamSinkWriter(DataSourceStreamArrowWriter):
    """``writeStream.format("txtable")`` — a txlog table as a Structured
    Streaming SINK with exactly-once commits, the Delta sink protocol:

    - executors stream their Arrow record batches straight into staged
      parquet files (one per task, no driver row I/O);
    - the driver's ``commit(messages, batchId)`` moves the staged files
      into the table and writes ONE txlog commit carrying the
      ``{app: txnAppId, batch: batchId}`` transaction marker — a batch
      re-delivered after a crash/restart is at-or-below the logged
      watermark and commits nothing (idempotent replay, Delta's
      ``txnAppId``/``txnVersion`` contract). ``txnAppId`` is REQUIRED:
      the Python DataSource API does not expose the query id, and an
      auto-generated id would silently downgrade restarts to
      at-least-once.
    - ``abort`` removes the staged files; the table never sees them.

    Hive partitioning is native: the table's partition spec (or the
    sink's ``partitionBy`` option) splits each task's batches into
    per-partition staged files under Spark's own ``escapePathName``
    rendering — the commit lands them as ``col=value/`` directories
    exactly like the batch writer, so per-file partition pruning covers
    sink-written files identically.

    Feature-rich tables (checks, generated/identity/default columns,
    column mapping) REFUSE — enforcing those needs the full DataFrame
    write path; use ``stream_to_tx_table`` (foreachBatch) there. Plain
    append tables — the shape of every bronze landing zone — get the
    native-format surface."""

    UNSUPPORTED = (
        ("checks", "CHECK constraints"),
        ("generated", "generated columns"),
        ("identity", "identity columns"),
        ("defaults", "column defaults"),
        ("colmap", "column mapping"),
    )
    #: partition-column types the sink can render into hive paths the
    #: way Spark's writer does (timestamps have format subtleties: refuse)
    PARTITION_TYPES = ("string", "integer", "long", "short", "byte", "date")

    def __init__(self, schema: T.StructType, options: dict, overwrite: bool):
        if overwrite:
            raise ValueError(
                "txtable sink supports append output mode only (complete/"
                "update rewrites belong to batch overwrite / merge_into)"
            )
        self.path = os.path.abspath(options["path"])
        app = options.get("txnappid")
        if not app:
            raise ValueError(
                "txtable sink requires .option('txnAppId', <stable id>) — "
                "the idempotence key that makes batch replays after a "
                "restart commit nothing (Delta's txnAppId contract). Use "
                "one stable string per (checkpoint, table) pair."
            )
        self.app_id = str(app)
        self.schema_json = json.dumps(schema.jsonValue())
        # opt-in schema evolution (Delta's sink mergeSchema): new stream
        # columns are ADDED (metadata-only), stream types wider than the
        # table's WIDEN it (the published typeWidening matrix) — applied
        # at commit time on the driver, refused per-field otherwise
        self.merge_schema = (
            str(options.get("mergeschema", "")).lower() == "true"
        )
        opt_pb = options.get("partitionby")
        self.part_cols = (
            [c.strip() for c in str(opt_pb).split(",") if c.strip()]
            if opt_pb
            else []
        )
        tbl = TxTable(None, self.path)
        spec = tbl.partitioning()
        if spec:
            if self.part_cols and self.part_cols != spec:
                raise ValueError(
                    f"txtable sink: partitionBy={self.part_cols} conflicts "
                    f"with the table's partition spec {spec}"
                )
            self.part_cols = spec
        by_name = {f.name: f for f in schema.fields}
        for c in self.part_cols:
            if c not in by_name:
                raise ValueError(
                    f"txtable sink: partition column {c!r} missing from the "
                    "stream schema"
                )
            if by_name[c].dataType.typeName() not in self.PARTITION_TYPES:
                raise ValueError(
                    f"txtable sink: partition column {c!r} has type "
                    f"{by_name[c].dataType.simpleString()} — only "
                    f"{'/'.join(self.PARTITION_TYPES)} render into hive "
                    "paths here; use stream_to_tx_table for other types"
                )
        self._validate(tbl)

    def _validate(self, tbl: TxTable) -> None:
        st = tbl._state()
        for key, label in self.UNSUPPORTED:
            if st[key]:
                raise ValueError(
                    f"txtable sink: table at {self.path!r} declares {label}"
                    " — enforcing them needs the DataFrame write path; use "
                    "stream_to_tx_table (foreachBatch) for this table"
                )
        if st["schema"]:
            tnorm = _nullable_normalized(st["schema"])
            if tnorm != _nullable_normalized(self.schema_json):
                from ..txlog import _type_widens

                table_fields = {
                    f.name: f.dataType
                    for f in T.StructType.fromJson(
                        json.loads(st["schema"])
                    ).fields
                }
                mine = T.StructType.fromJson(json.loads(self.schema_json))

                def _field_ok(f: T.StructField) -> bool:
                    if f.name not in table_fields:
                        # new column: legal only under mergeSchema (the
                        # commit hook adds it metadata-only)
                        return self.merge_schema
                    t = table_fields[f.name]
                    if t == f.dataType:
                        return True
                    if self.merge_schema:
                        # wider stream type -> table widens at commit;
                        # narrower stream type -> narrow producer, files
                        # carry the narrow physical type and the logged
                        # (wide) schema upcasts on read — both are the
                        # published typeWidening directions. Anything
                        # outside the lossless matrix still refuses.
                        return _type_widens(t, f.dataType) or _type_widens(
                            f.dataType, t
                        )
                    return False

                if not all(_field_ok(f) for f in mine.fields):
                    raise ValueError(
                        "txtable sink: stream schema does not match the "
                        "table schema (and is not a subset-compatible "
                        "producer)"
                        + (
                            " under mergeSchema: a field change falls "
                            "outside add-column / lossless type widening"
                            if self.merge_schema
                            else "; set .option('mergeSchema', 'true') to "
                            "add columns / widen types mid-stream"
                        )
                    )

    def _evolve(self, tbl: TxTable) -> None:
        """Apply opt-in mergeSchema evolution BEFORE the data commit:
        add stream-only columns (metadata-only ADD COLUMN), widen table
        columns the stream carries wider (typeWidening matrix — the
        table's own ALTER stamps the reader feature and refuses
        partition columns). Each step is conditional on current state,
        so a crash between evolution and the data commit replays as a
        no-op. Metadata-only throughout: no SparkSession needed in the
        data-source runner."""
        from ..txlog import _type_widens

        st = tbl._state()
        if not st["schema"]:
            return
        table_struct = T.StructType.fromJson(json.loads(st["schema"]))
        table_fields = {f.name: f.dataType for f in table_struct.fields}
        mine = T.StructType.fromJson(json.loads(self.schema_json))
        for f in mine.fields:
            if f.name not in table_fields:
                if f.name in tbl._taken_physicals(st):
                    # re-adding a dropped column's name would need column
                    # mapping, which this sink refuses — fail the batch
                    # with the real reason instead of a colmap refusal on
                    # the NEXT trigger
                    raise ValueError(
                        f"txtable sink mergeSchema: column {f.name!r} "
                        "reuses a retired physical name (needs column "
                        "mapping) — use stream_to_tx_table for this table"
                    )
                tbl.add_column(f.name, f.dataType)
            elif _type_widens(table_fields[f.name], f.dataType):
                tbl.widen_column_type(f.name, f.dataType)

    # -- executor side --------------------------------------------------------

    #: chars Hive/Spark escapePathName percent-encodes in partition values
    #: (space is NOT escaped — verified against Spark 4's writer output)
    _ESCAPE = set('"#%\'*/:=?\\{[]^') | {chr(c) for c in range(0x20)} | {
        "\x7f"
    }

    @classmethod
    def _escape_path_value(cls, v: str) -> str:
        return "".join(
            f"%{ord(c):02X}" if c in cls._ESCAPE else c for c in v
        )

    def write(self, iterator) -> _StagedSinkFile:
        import uuid as _uuid

        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        full_struct = T.StructType.fromJson(json.loads(self.schema_json))
        target = to_arrow_schema(full_struct)
        data_struct = T.StructType(
            [f for f in full_struct.fields if f.name not in self.part_cols]
        )
        data_target = to_arrow_schema(data_struct)
        stage_rel = os.path.join("_staging", f"sink-{_uuid.uuid4().hex}")
        stage = os.path.join(self.path, stage_rel)
        writers: dict[str, pq.ParquetWriter] = {}
        sentinel = "__HIVE_DEFAULT_PARTITION__"  # hive's NULL rendering

        def _writer(rel_dir: str) -> pq.ParquetWriter:
            w = writers.get(rel_dir)
            if w is None:
                d = os.path.join(stage, rel_dir) if rel_dir else stage
                os.makedirs(d, exist_ok=True)
                w = pq.ParquetWriter(
                    os.path.join(d, "part-0.parquet"), data_target
                )
                writers[rel_dir] = w
            return w

        try:
            for batch in iterator:
                if batch.num_rows == 0:
                    continue
                if batch.schema != target:
                    batch = pa.RecordBatch.from_arrays(
                        [
                            batch.column(i).cast(target.field(i).type)
                            for i in range(batch.num_columns)
                        ],
                        schema=target,
                    )
                if not self.part_cols:
                    _writer("").write_batch(batch)
                    continue
                # split the batch by partition values. Each segment is
                # ESCAPED (dictionary-wise: python only on unique values)
                # BEFORE joining, so the "/" join delimiter and the "="
                # prefix can never appear inside a value — a raw join on
                # a control char mis-split values containing it (zip
                # truncation landed rows under wrong partitions). The
                # joined key IS the hive rel_dir.
                segs = []
                for c in self.part_cols:
                    d = pc.cast(
                        batch.column(batch.schema.get_field_index(c)),
                        pa.string(),
                    ).dictionary_encode()
                    uniq = d.dictionary.to_pylist()
                    if sentinel in uniq:
                        raise ValueError(
                            f"partition column {c!r} holds the literal "
                            f"string {sentinel!r}, which is hive's NULL "
                            "rendering — it would round-trip as NULL; "
                            "store NULL or a different value"
                        )
                    esc = pa.array(
                        [
                            None if v is None else self._escape_path_value(v)
                            for v in uniq
                        ],
                        pa.string(),
                    )
                    seg = pc.coalesce(
                        pc.take(esc, d.indices),
                        pa.scalar(sentinel, pa.string()),
                    )
                    segs.append(
                        pc.binary_join_element_wise(
                            pa.scalar(f"{c}=", pa.string()), seg, ""
                        )
                    )
                key = (
                    segs[0]
                    if len(segs) == 1
                    else pc.binary_join_element_wise(*segs, "/")
                )
                data_cols = [
                    batch.column(batch.schema.get_field_index(f.name))
                    for f in data_struct.fields
                ]
                data = pa.RecordBatch.from_arrays(
                    data_cols, schema=data_target
                )
                for rel_dir in pc.unique(key).to_pylist():
                    mask = pc.equal(key, rel_dir)
                    _writer(rel_dir).write_batch(
                        pa.Table.from_batches([data.filter(mask)])
                        .combine_chunks()
                        .to_batches()[0]
                    )
        finally:
            for w in writers.values():
                w.close()
        if not writers:
            import shutil

            shutil.rmtree(stage, ignore_errors=True)
            return _StagedSinkFile(None)
        return _StagedSinkFile(stage_rel)

    # -- driver side -----------------------------------------------------------

    def _cleanup(self, stage_rels: list) -> None:
        import shutil

        for rel in stage_rels:
            shutil.rmtree(os.path.join(self.path, rel), ignore_errors=True)

    def commit(self, messages, batchId: int) -> None:
        from ..txlog import _footer_stats

        stage_rels = [m.rel for m in messages if m is not None and m.rel]
        tbl = TxTable(None, self.path)
        txn = {"app": self.app_id, "batch": batchId}
        if tbl._txn_seen(txn):
            self._cleanup(stage_rels)  # replayed batch: already durable
            return
        if self.merge_schema:
            self._evolve(tbl)
        self._validate(tbl)  # metadata may have evolved mid-stream
        import uuid as _uuid

        added: list[str] = []
        stats: dict[str, dict] = {}
        for rel in stage_rels:
            stage = os.path.join(self.path, rel)
            for dirpath, _d, files in os.walk(stage):
                for name in files:
                    if not name.endswith(".parquet"):
                        continue
                    src = os.path.join(dirpath, name)
                    rel_dir = os.path.relpath(dirpath, stage)
                    final = f"{_uuid.uuid4().hex}.parquet"
                    if rel_dir != ".":
                        final = os.path.join(rel_dir, final)
                    stats[final] = _footer_stats(src)
                    os.makedirs(
                        os.path.dirname(os.path.join(self.path, final)),
                        exist_ok=True,
                    )
                    os.rename(src, os.path.join(self.path, final))
                    added.append(final)
        self._cleanup(stage_rels)
        st = tbl._state()
        eff_schema = st["schema"] or self.schema_json
        # an empty batch still commits: the txn watermark must advance or
        # a replay after restart would re-run a later non-empty batch
        tbl._commit(
            added, lambda active: [], eff_schema, txn, "stream_sink",
            stats=stats,
        )
        # NOTE: the table's autoCompact policy is NOT applied here — this
        # commit hook runs in the Python data-source runner worker, which
        # has no SparkSession to drive a compaction job (verified:
        # getActiveSession() is None there). Streaming deployments on the
        # native sink should schedule Engine.maintain()/compact()
        # out-of-band, or use stream_to_tx_table (foreachBatch), whose
        # per-batch hook runs on the real driver and honors the policy.

    def abort(self, messages, batchId: int) -> None:
        self._cleanup([m.rel for m in messages if m is not None and m.rel])


class TxStreamDataSource(DataSource):
    """``spark.readStream.format("txtable").option("path", p).load()``.

    Options: ``path`` (table root, required), ``startingVersion``
    (int | "latest"; default = initial snapshot + tail),
    ``startingTimestamp`` (changes from the first commit at/after the
    UTC timestamp), ``maxFilesPerTrigger``, ``maxBytesPerTrigger``
    (logged-size admission; always >=1 file per trigger),
    ``skipChangeCommits``, ``ignoreChanges``,
    ``readChangeFeed`` (serve row-level changes with ``_change_type`` /
    ``_commit_version`` — Delta's CDF streaming)."""

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
        st = T.StructType.fromJson(json.loads(schema_json))
        extra = []
        if str(self.options.get("rowids", "")).lower() == "true":
            extra.append(T.StructField("_row_id", T.LongType()))
        if str(self.options.get("readchangefeed", "")).lower() == "true":
            extra += [
                T.StructField("_change_type", T.StringType()),
                T.StructField("_commit_version", T.LongType()),
            ]
        return T.StructType(list(st.fields) + extra) if extra else st

    def streamReader(self, schema: T.StructType) -> TxStreamReader:
        return TxStreamReader(schema, dict(self.options))

    def streamWriter(self, schema: T.StructType, overwrite: bool):
        return TxStreamSinkWriter(schema, dict(self.options), overwrite)
