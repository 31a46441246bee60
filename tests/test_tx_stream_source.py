"""txlog table as a Structured Streaming SOURCE (streaming/source.py) —
the Delta streaming-source contract: initial snapshot + exactly-once
commit tailing, change-commit refusal/skip options, rate limiting,
restart recovery, and read-path parity (partitions, DVs, column
mapping, type widening, identity columns) with the batch reader."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from mb_crdb_cdc_dlgen2_synapse_spark.streaming.source import register_tx_source
from mb_crdb_cdc_dlgen2_synapse_spark.txlog import TxTable


@pytest.fixture(autouse=True)
def _register(spark):
    register_tx_source(spark)


def _drain(spark, table_path, ckpt, out, **options):
    """One availableNow pass through the source into a parquet sink;
    returns the sink DataFrame."""
    reader = spark.readStream.format("txtable").option("path", table_path)
    for k, v in options.items():
        reader = reader.option(k, str(v))
    q = (
        reader.load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.read.parquet(out)


def test_snapshot_then_tail_exactly_once(spark, tmp_path):
    """Pass 1 serves the initial snapshot; pass 2 over the SAME checkpoint
    serves only the commit that landed in between — no re-reads, no loss."""
    tp = str(tmp_path / "t")
    t = TxTable(spark, tp)
    t.append(spark.range(0, 10).select("id", (F.col("id") * 2).alias("val")))
    t.append(spark.range(10, 20).select("id", (F.col("id") * 2).alias("val")))
    ckpt, out = str(tmp_path / "ck"), str(tmp_path / "out")
    assert _drain(spark, tp, ckpt, out).count() == 20
    t.append(spark.range(20, 25).select("id", (F.col("id") * 2).alias("val")))
    df = _drain(spark, tp, ckpt, out)
    assert df.count() == 25
    assert df.select("id").distinct().count() == 25  # exactly-once
    assert df.agg(F.sum("val")).collect()[0][0] == sum(i * 2 for i in range(25))


def test_compaction_is_skipped_no_duplicates(spark, tmp_path):
    """compact() commits are dataChange=false: the stream skips them —
    logical rows arrive exactly once even though every file was rewritten."""
    tp = str(tmp_path / "t")
    t = TxTable(spark, tp)
    t.append(spark.range(0, 10).select("id"))
    ckpt, out = str(tmp_path / "ck"), str(tmp_path / "out")
    assert _drain(spark, tp, ckpt, out).count() == 10
    t.append(spark.range(10, 15).select("id"))
    t.compact()
    t.append(spark.range(15, 20).select("id"))
    df = _drain(spark, tp, ckpt, out)
    assert df.count() == 20
    assert df.select("id").distinct().count() == 20


def test_change_commit_refused_by_default(spark, tmp_path):
    tp = str(tmp_path / "t")
    t = TxTable(spark, tp)
    t.append(spark.range(0, 10).select("id"))
    ckpt, out = str(tmp_path / "ck"), str(tmp_path / "out")
    _drain(spark, tp, ckpt, out)
    t.delete_where([("id", "<", 3)])
    with pytest.raises(Exception, match="data UPDATE|STREAM_FAILED"):
        _drain(spark, tp, ckpt, out)


def test_skip_change_commits_continues(spark, tmp_path):
    tp = str(tmp_path / "t")
    t = TxTable(spark, tp)
    t.append(spark.range(0, 10).select("id"))
    ckpt, out = str(tmp_path / "ck"), str(tmp_path / "out")
    _drain(spark, tp, ckpt, out, skipChangeCommits=True)
    t.delete_where([("id", "<", 3)])  # skipped
    t.append(spark.range(10, 12).select("id"))  # served
    df = _drain(spark, tp, ckpt, out, skipChangeCommits=True)
    assert df.count() == 12
    assert df.select("id").distinct().count() == 12


def test_ignore_changes_serves_rewritten_files(spark, tmp_path):
    """ignoreChanges serves a CoW rewrite's output files — carried rows
    duplicate (the documented Delta semantics), deleted rows vanish from
    the rewritten copy."""
    tp = str(tmp_path / "t")
    t = TxTable(spark, tp)
    # one file, so the CoW delete rewrites exactly that file (the carried
    # 7 rows land in the rewrite's output and re-serve under ignoreChanges)
    t.append(spark.range(0, 10).select("id").coalesce(1))
    ckpt, out = str(tmp_path / "ck"), str(tmp_path / "out")
    _drain(spark, tp, ckpt, out, ignoreChanges=True)
    t.delete_where([("id", "<", 3)], mode="cow")
    df = _drain(spark, tp, ckpt, out, ignoreChanges=True)
    # 10 original + 7 carried copies from the rewrite
    assert df.count() == 17
    assert df.filter(F.col("id") < 3).count() == 3  # only the pass-1 copies


def test_starting_version_modes(spark, tmp_path):
    tp = str(tmp_path / "t")
    t = TxTable(spark, tp)
    t.append(spark.range(0, 5).select("id"))  # v0
    t.append(spark.range(5, 9).select("id"))  # v1
    # startingVersion=1: only commit 1 onward, no snapshot
    df = _drain(
        spark, tp, str(tmp_path / "c1"), str(tmp_path / "o1"), startingVersion=1
    )
    assert sorted(r.id for r in df.collect()) == list(range(5, 9))
    # startingVersion=latest: nothing until a NEW commit lands
    ck2, o2 = str(tmp_path / "c2"), str(tmp_path / "o2")
    reader = (
        spark.readStream.format("txtable")
        .option("path", tp)
        .option("startingVersion", "latest")
    )
    q = (
        reader.load()
        .writeStream.format("parquet")
        .option("path", o2)
        .option("checkpointLocation", ck2)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    t.append(spark.range(9, 11).select("id"))
    df2 = _drain(spark, tp, ck2, o2, startingVersion="latest")
    assert sorted(r.id for r in df2.collect()) == [9, 10]


def test_max_files_per_trigger_rate_limits(spark, tmp_path):
    """4 single-file commits under maxFilesPerTrigger=1 drain over >= 4
    micro-batches; total content is exactly-once regardless of pacing."""
    tp = str(tmp_path / "t")
    t = TxTable(spark, tp)
    for k in range(4):
        t.append(
            spark.range(k * 5, k * 5 + 5).select("id").coalesce(1)
        )
    ckpt, out = str(tmp_path / "ck"), str(tmp_path / "out")
    q = (
        spark.readStream.format("txtable")
        .option("path", tp)
        .option("maxFilesPerTrigger", "1")
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    deadline = time.time() + 120
    seen = 0
    while time.time() < deadline and seen < 20:
        try:
            seen = spark.read.parquet(out).count()
        except Exception:
            seen = 0
        time.sleep(1)
    q.stop()
    df = spark.read.parquet(out)
    assert df.count() == 20
    assert df.select("id").distinct().count() == 20
    # at least one offsets entry per file => >= 4 committed batches
    offsets = os.listdir(os.path.join(ckpt, "offsets"))
    assert len([f for f in offsets if not f.endswith(".tmp")]) >= 4


def test_restart_recovers_position_from_checkpoint(spark, tmp_path):
    """Each _drain call builds a FRESH reader (fresh python worker): the
    position must come from the checkpoint via the engine's latest-seen
    probe, never from reader memory."""
    tp = str(tmp_path / "t")
    t = TxTable(spark, tp)
    ckpt, out = str(tmp_path / "ck"), str(tmp_path / "out")
    total = 0
    for k in range(3):
        t.append(spark.range(k * 7, k * 7 + 7).select("id"))
        total += 7
        df = _drain(spark, tp, ckpt, out)
        assert df.count() == total
        assert df.select("id").distinct().count() == total


def test_partitioned_table_with_snapshot_dvs(spark, tmp_path):
    """Hive-partitioned table whose snapshot carries deletion vectors:
    partition values come back typed from the path, DV-deleted rows never
    reach the sink — parity with TxTable.read()."""
    tp = str(tmp_path / "t")
    t = TxTable(spark, tp)
    df = spark.range(0, 100).select(
        "id", (F.col("id") % 4).alias("bucket"), (F.col("id") * 1.5).alias("m")
    )
    t.append(df, partition_by=["bucket"])
    t.delete_where([("id", "<", 10)], mode="dv")
    got = _drain(spark, tp, str(tmp_path / "ck"), str(tmp_path / "out"))
    batch = t.read()
    assert got.count() == 90
    # nullable flags are not schema (sink round-trip relaxes them)
    assert got.schema.simpleString() == batch.schema.simpleString()
    assert sorted(r.id for r in got.collect()) == sorted(
        r.id for r in batch.collect()
    )


def test_column_mapping_and_type_widening(spark, tmp_path):
    """Renamed + widened column: old files carry the frozen physical name
    and narrow type; the stream serves the logical name at the wide type,
    matching the batch reader."""
    tp = str(tmp_path / "t")
    t = TxTable(spark, tp)
    t.append(
        spark.range(0, 5).select(
            F.col("id").cast("int").alias("a"), F.lit("x").alias("s")
        )
    )
    t.rename_column("a", "b")
    t.widen_column_type("b", "long")
    t.append(
        spark.range(5, 8).select(
            F.col("id").cast("long").alias("b"), F.lit("y").alias("s")
        )
    )
    got = _drain(spark, tp, str(tmp_path / "ck"), str(tmp_path / "out"))
    assert got.schema.simpleString() == t.read().schema.simpleString()
    assert got.agg(F.sum("b")).collect()[0][0] == 28


def test_identity_columns_resolve_in_stream(spark, tmp_path):
    """Virtually-resolved identity values (stored NULL, affine of the
    row-tracking id) must match the batch reader's resolution exactly."""
    tp = str(tmp_path / "t")
    t = TxTable(spark, tp)
    t.append(spark.range(0, 5).select((F.col("id") * 10).alias("v")))
    t.enable_row_tracking()
    t.set_identity_column("rid", start=100, step=2)
    t.append(spark.range(5, 9).select((F.col("id") * 10).alias("v")))
    got = _drain(spark, tp, str(tmp_path / "ck"), str(tmp_path / "out"))
    assert sorted((r.v, r.rid) for r in got.collect()) == sorted(
        (r.v, r.rid) for r in t.read().collect()
    )


def test_schema_change_fails_running_stream(spark, tmp_path):
    """A RUNNING stream pins its schema at start: serving a later commit
    that changed the table schema raises (Delta's restart-required
    contract). Unit-level on the reader so the pinned schema is genuinely
    the OLD one."""
    from mb_crdb_cdc_dlgen2_synapse_spark.streaming.source import TxStreamReader

    tp = str(tmp_path / "t")
    t = TxTable(spark, tp)
    t.append(spark.range(0, 5).select("id"))
    reader = TxStreamReader(t.read().schema, {"path": tp})
    start = reader.initialOffset()
    end = reader.latestOffset()
    list(reader.partitions(start, end))  # snapshot serves fine
    t.add_column("extra", "string")
    t.append(spark.range(5, 7).select("id", F.lit("z").alias("extra")))
    with pytest.raises(RuntimeError, match="changed the table schema"):
        reader.latestOffset()


def test_schema_change_restart_picks_up_new_schema(spark, tmp_path):
    """A RESTARTED stream re-derives the schema at head (Delta's restart
    semantics): already-consumed rows are not re-served, the tail commit
    arrives under the new schema, and pre-change files conform with typed
    NULLs like the batch reader."""
    tp = str(tmp_path / "t")
    t = TxTable(spark, tp)
    t.append(spark.range(0, 5).select("id"))
    ckpt, out = str(tmp_path / "ck"), str(tmp_path / "out")
    assert _drain(spark, tp, ckpt, out).count() == 5
    t.add_column("extra", "string")
    t.append(spark.range(5, 7).select("id", F.lit("z").alias("extra")))
    _drain(spark, tp, ckpt, out)
    got = spark.read.option("mergeSchema", "true").parquet(out)
    assert sorted(got.columns) == ["extra", "id"]
    rows = sorted((r.id, r.extra) for r in got.collect())
    # 5 pass-1 rows (extra NULL in their files) + the 2 tail rows, no re-read
    assert rows == [(i, None) for i in range(5)] + [(5, "z"), (6, "z")]


def test_nested_column_mapping_refused(spark, tmp_path):
    tp = str(tmp_path / "t")
    t = TxTable(spark, tp)
    t.append(
        spark.range(0, 3).select(
            "id", F.struct(F.lit("c").alias("city")).alias("after")
        )
    )
    t.rename_column("after.city", "town")
    with pytest.raises(Exception, match="nested column mapping|STREAM_FAILED"):
        _drain(spark, tp, str(tmp_path / "ck"), str(tmp_path / "out"))


def test_bronze_to_silver_tx_chain_exactly_once(spark, tmp_path):
    """End-to-end table chaining: txtable source -> transform ->
    stream_to_tx_table sink (txn-marker idempotent commits). Re-running
    the drained stream adds nothing; a new bronze commit flows through."""
    from mb_crdb_cdc_dlgen2_synapse_spark.txlog import stream_to_tx_table

    bronze_p = str(tmp_path / "bronze")
    silver_p = str(tmp_path / "silver")
    ckpt = str(tmp_path / "ck")
    bronze = TxTable(spark, bronze_p)
    bronze.append(
        spark.range(0, 50).select("id", (F.col("id") % 5).alias("k"))
    )

    def run():
        stream = (
            spark.readStream.format("txtable").option("path", bronze_p).load()
        )
        shaped = stream.filter(F.col("id") % 2 == 0).withColumn(
            "doubled", F.col("id") * 2
        )
        q = stream_to_tx_table(
            shaped, silver_p, ckpt, available_now=True
        )
        q.awaitTermination(180)

    run()
    silver = TxTable(spark, silver_p)
    assert silver.read().count() == 25
    run()  # drained: no new rows, no new duplicate commits
    assert silver.read().count() == 25
    bronze.append(spark.range(50, 60).select("id", (F.col("id") % 5).alias("k")))
    run()
    df = silver.read()
    assert df.count() == 30
    assert df.select("id").distinct().count() == 30


def test_starting_timestamp(spark, tmp_path):
    """startingTimestamp serves changes from the first commit at/after the
    timestamp; a timestamp past the head refuses with advice."""
    import time as _time

    tp = str(tmp_path / "t")
    t = TxTable(spark, tp)
    t.append(spark.range(0, 5).select("id"))  # v0
    _time.sleep(1.2)  # commit utc is second-granular
    cut = _time.strftime("%Y-%m-%dT%H:%M:%SZ", _time.gmtime())
    _time.sleep(1.2)
    t.append(spark.range(5, 8).select("id"))  # v1, utc >= cut
    df = _drain(
        spark,
        tp,
        str(tmp_path / "ck"),
        str(tmp_path / "out"),
        startingTimestamp=cut,
    )
    assert sorted(r.id for r in df.collect()) == [5, 6, 7]
    from mb_crdb_cdc_dlgen2_synapse_spark.streaming.source import TxStreamReader

    with pytest.raises(ValueError, match="after the latest commit"):
        TxStreamReader(
            t.read().schema,
            {"path": tp, "startingtimestamp": "2999-01-01T00:00:00Z"},
        ).initialOffset()
    with pytest.raises(ValueError, match="not both"):
        TxStreamReader(
            t.read().schema,
            {"path": tp, "startingtimestamp": cut, "startingversion": "0"},
        )


def test_max_bytes_per_trigger_admits_one_file_at_a_time(spark, tmp_path):
    """A byte budget below every file's size still admits exactly one file
    per trigger (guaranteed progress), pacing the drain file by file."""
    tp = str(tmp_path / "t")
    t = TxTable(spark, tp)
    for k in range(4):
        t.append(spark.range(k * 5, k * 5 + 5).select("id").coalesce(1))
    ckpt, out = str(tmp_path / "ck"), str(tmp_path / "out")
    prev, runs = -1, 0
    while True:
        n = _drain(
            spark, tp, ckpt, out, startingVersion=0, maxBytesPerTrigger=1
        ).count()
        runs += 1
        if n == prev:
            break
        prev = n
    assert runs >= 5  # 4 files -> 4 admitting runs + 1 no-progress probe
    df = spark.read.parquet(out)
    assert df.count() == 20
    assert df.select("id").distinct().count() == 20


def test_lagging_stream_past_vacuum_gets_friendly_error(spark, tmp_path):
    """A stream whose checkpoint points before the vacuum horizon fails
    with an actionable message, not a raw missing-file error."""
    tp = str(tmp_path / "t")
    t = TxTable(spark, tp)
    for k in range(3):
        t.append(spark.range(k * 5, k * 5 + 5).select("id").coalesce(1))
    ckpt, out = str(tmp_path / "ck"), str(tmp_path / "out")
    # consume only the first file-entry, leaving the checkpoint lagging
    _drain(spark, tp, ckpt, out, startingVersion=0, maxFilesPerTrigger=1)
    t.compact()
    t.vacuum(retain_versions=1, prune_log=True)
    with pytest.raises(Exception, match="pruned by vacuum|STREAM_FAILED"):
        _drain(spark, tp, ckpt, out, startingVersion=0, maxFilesPerTrigger=1)


def test_small_files_pack_into_shared_tasks(spark, tmp_path):
    """The Python DataSource protocol pays a fixed per-task toll, so small
    commit files pack into shared tasks (packBytes, default 32MB): 12
    tiny files plan far fewer partitions, packBytes=0 restores
    one-task-per-file, and the same offset range re-plans IDENTICALLY
    (replay determinism). Values are unaffected either way."""
    from mb_crdb_cdc_dlgen2_synapse_spark.streaming.source import (
        TxStreamReader,
        TxFilesPartition,
    )

    tp = str(tmp_path / "t")
    t = TxTable(spark, tp)
    for k in range(12):
        t.append(
            spark.createDataFrame([(k, float(k))], "k long, v double")
            .coalesce(1)
        )
    reader = TxStreamReader(
        t.read().schema, {"path": tp, "startingversion": "0"}
    )
    start = reader.initialOffset()  # tail from v0: every file in one range
    end = reader.latestOffset()
    packed = reader.partitions(start, end)
    assert len(packed) < 12
    assert sum(
        len(p.entries) if isinstance(p, TxFilesPartition) else 1
        for p in packed
    ) == 12
    # deterministic replay: identical plan for the same range
    again = reader.partitions(start, end)
    assert [
        [e.rel for e in p.entries] if isinstance(p, TxFilesPartition) else [p.rel]
        for p in packed
    ] == [
        [e.rel for e in p.entries] if isinstance(p, TxFilesPartition) else [p.rel]
        for p in again
    ]
    # packing off: one task per file
    flat_reader = TxStreamReader(
        t.read().schema,
        {"path": tp, "packbytes": "0", "startingversion": "0"},
    )
    flat_reader.initialOffset()
    flat = flat_reader.partitions(start, end)
    assert len(flat) == 12
    # a packed task serves every file's rows
    rows = [
        (r["k"], r["v"])
        for p in packed
        for b in reader.read(p)
        for r in b.to_pylist()
    ]
    assert sorted(rows) == [(k, float(k)) for k in range(12)]


# -- packing plan (round-8: pure-function determinism + planning cost) -------


def test_pack_plan_is_pure_and_deterministic():
    """The greedy packing is a pure function of (sizes, packBytes,
    packTasks) — NO host properties (round-7 advisory: a cpu-derived
    target made checkpoint restarts on different hardware plan different
    task groups). Identical inputs -> identical groups, every time."""
    from mb_crdb_cdc_dlgen2_synapse_spark.streaming.source import _pack_plan

    sizes = [((i * 2654435761) % 4_000_000) + 1000 for i in range(2048)]
    a = _pack_plan(sizes, 32 << 20, 64)
    b = _pack_plan(list(sizes), 32 << 20, 64)
    assert a == b
    # groups tile the index space exactly: no file lost, none duplicated
    assert a[0][0] == 0 and a[-1][1] == len(sizes)
    assert all(a[i][1] == a[i + 1][0] for i in range(len(a) - 1))


def test_pack_plan_design_point_properties():
    """The 2k/4k-file CDC-backlog design point (VERDICT r7 item 6): a
    trigger admitting thousands of tiny commit files must (a) collapse
    them into ~packTasks groups, not one task per file; (b) never build
    a group beyond the packBytes ceiling unless it is a single oversized
    file; (c) keep tiny batches at one group (the 1MB floor)."""
    from mb_crdb_cdc_dlgen2_synapse_spark.streaming.source import _pack_plan

    for n in (2000, 4000):
        sizes = [64 << 10] * n  # 64KB commit files, the CDC shape
        groups = _pack_plan(sizes, 32 << 20, 64)
        # total = n*64KB (125/250MB) < 64*32MB, so target = max(total/64, 1MB)
        assert 60 <= len(groups) <= 70, (n, len(groups))
        target = max((n * (64 << 10)) // 64, 1 << 20)
        for lo, hi in groups:
            gbytes = sum(sizes[lo:hi])
            assert gbytes <= max(target, 32 << 20) + (64 << 10)
    # ceiling: huge backlog caps groups at packBytes each
    sizes = [1 << 20] * 4000  # 4GB total
    groups = _pack_plan(sizes, 32 << 20, 64)
    for lo, hi in groups:
        assert sum(sizes[lo:hi]) <= 32 << 20
    # tiny batch: stays one task
    assert _pack_plan([10_000] * 5, 32 << 20, 64) == [(0, 5)]
    # a single oversized file stands alone, never splits
    groups = _pack_plan([100 << 20, 1000, 1000], 32 << 20, 64)
    assert groups[0] == (0, 1)


def test_pack_plan_planning_cost_is_linear():
    """Planning a 4k-file trigger is a driver-side list walk: O(files)
    with a small constant, no I/O. Pin the budget so a regression to
    quadratic grouping (or per-file stat calls) fails loudly."""
    import time

    from mb_crdb_cdc_dlgen2_synapse_spark.streaming.source import _pack_plan

    sizes = [((i * 48271) % 2_000_000) + 500 for i in range(4000)]
    t0 = time.time()
    for _ in range(50):
        _pack_plan(sizes, 32 << 20, 64)
    per_call = (time.time() - t0) / 50
    assert per_call < 0.01, f"packing 4k files took {per_call * 1e3:.1f}ms"
