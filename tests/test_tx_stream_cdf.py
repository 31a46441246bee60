"""Change-feed STREAMING over a txlog table (streaming/source.py,
``readChangeFeed=true``) — Delta's CDF streaming option: the initial
snapshot arrives as insert images, every later commit as its row-level
changes (delete/insert images, DV'd positions as deletes), exactly-once
across checkpointed restarts, with batch ``read_changes`` parity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mb_crdb_cdc_dlgen2_synapse_spark.streaming.source import register_tx_source
from mb_crdb_cdc_dlgen2_synapse_spark.txlog import TxTable


@pytest.fixture(autouse=True)
def _register(spark):
    register_tx_source(spark)


def _drain_cdf(spark, table_path, ckpt, out, **options):
    reader = (
        spark.readStream.format("txtable")
        .option("path", table_path)
        .option("readChangeFeed", "true")
    )
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


def _key(r):
    return tuple(str(x) for x in r)


def test_snapshot_as_inserts_then_tail_changes(spark, tmp_path):
    """Pass 1: the whole snapshot as inserts stamped with the snapshot
    version. Pass 2 over the same checkpoint: only the new commit's
    inserts."""
    tp = str(tmp_path / "t")
    t = TxTable(spark, tp)
    t.append(spark.range(0, 6).select("id"))  # v0
    t.append(spark.range(6, 10).select("id"))  # v1
    ckpt, out = str(tmp_path / "ck"), str(tmp_path / "out")
    df = _drain_cdf(spark, tp, ckpt, out)
    rows = [(r.id, r._change_type, r._commit_version) for r in df.collect()]
    assert sorted(rows) == [(i, "insert", 1) for i in range(10)]
    t.append(spark.range(10, 12).select("id"))  # v2
    df = _drain_cdf(spark, tp, ckpt, out)
    assert df.count() == 12
    new = df.filter(F.col("_commit_version") == 2).collect()
    assert sorted(r.id for r in new) == [10, 11]
    assert all(r._change_type == "insert" for r in new)


def test_cow_delete_emits_delete_and_carried_insert_images(spark, tmp_path):
    """A copy-on-write DELETE appears as delete images of the removed
    file's rows + insert images of the carried rows — net = the deleted
    rows, the batch read_changes rendering."""
    tp = str(tmp_path / "t")
    t = TxTable(spark, tp)
    t.append(spark.range(0, 10).select("id").coalesce(1))  # v0, one file
    ckpt, out = str(tmp_path / "ck"), str(tmp_path / "out")
    _drain_cdf(spark, tp, ckpt, out)
    t.delete_where([("id", "<", 3)], mode="cow")  # v1
    df = _drain_cdf(spark, tp, ckpt, out).filter(F.col("_commit_version") == 1)
    dels = sorted(r.id for r in df.filter(F.col("_change_type") == "delete").collect())
    ins = sorted(r.id for r in df.filter(F.col("_change_type") == "insert").collect())
    assert dels == list(range(10))  # whole removed file
    assert ins == list(range(3, 10))  # carried rows re-inserted
    # net view: delete-minus-insert = the actually deleted rows
    net = sorted(set(dels) - set(ins))
    assert net == [0, 1, 2]


def test_dv_delete_emits_exactly_the_dropped_rows(spark, tmp_path):
    """A merge-on-read (deletion-vector) DELETE moves no data files: the
    feed renders exactly the DV'd positions as delete images."""
    tp = str(tmp_path / "t")
    t = TxTable(spark, tp)
    t.append(spark.range(0, 20).select("id", (F.col("id") * 3).alias("m")))
    ckpt, out = str(tmp_path / "ck"), str(tmp_path / "out")
    _drain_cdf(spark, tp, ckpt, out)
    t.delete_where([("id", "<", 5)], mode="dv")  # v1
    df = _drain_cdf(spark, tp, ckpt, out).filter(F.col("_commit_version") == 1)
    rows = [(r.id, r.m, r._change_type) for r in df.collect()]
    assert sorted(rows) == [(i, i * 3, "delete") for i in range(5)]


def test_second_dv_on_same_file_emits_only_new_positions(spark, tmp_path):
    """Two successive DV deletes on one file: the second commit's feed
    carries ONLY its newly-dropped rows (prior DV positions excluded)."""
    tp = str(tmp_path / "t")
    t = TxTable(spark, tp)
    t.append(spark.range(0, 20).select("id").coalesce(1))
    t.delete_where([("id", "<", 4)], mode="dv")  # v1
    t.delete_where([("id", "<", 8)], mode="dv")  # v2: rows 4..7 only
    ckpt, out = str(tmp_path / "ck"), str(tmp_path / "out")
    df = _drain_cdf(spark, tp, ckpt, out, startingVersion=2)
    rows = sorted((r.id, r._change_type, r._commit_version) for r in df.collect())
    assert rows == [(i, "delete", 2) for i in range(4, 8)]


def test_snapshot_applies_existing_dvs(spark, tmp_path):
    """DV'd rows are not part of the snapshot's insert images."""
    tp = str(tmp_path / "t")
    t = TxTable(spark, tp)
    t.append(spark.range(0, 10).select("id"))
    t.delete_where([("id", "<", 4)], mode="dv")
    df = _drain_cdf(spark, tp, str(tmp_path / "ck"), str(tmp_path / "out"))
    assert sorted(r.id for r in df.collect()) == list(range(4, 10))
    assert df.filter(F.col("_change_type") != "insert").count() == 0


def test_compaction_contributes_no_changes(spark, tmp_path):
    tp = str(tmp_path / "t")
    t = TxTable(spark, tp)
    t.append(spark.range(0, 10).select("id"))
    ckpt, out = str(tmp_path / "ck"), str(tmp_path / "out")
    _drain_cdf(spark, tp, ckpt, out)
    t.compact()  # v1, dataChange=false
    t.append(spark.range(10, 12).select("id"))  # v2
    df = _drain_cdf(spark, tp, ckpt, out)
    assert df.count() == 12  # 10 snapshot inserts + 2 tail inserts, no dupes
    assert df.filter(F.col("_commit_version") == 1).count() == 0


def test_parity_with_batch_read_changes(spark, tmp_path):
    """startingVersion=0 streams the SAME multiset of (row image,
    change_type, version) as batch read_changes over the full history —
    through appends, CoW update, DV delete, and an overwrite."""
    tp = str(tmp_path / "t")
    t = TxTable(spark, tp)
    t.append(spark.range(0, 12).select("id", (F.col("id") % 3).alias("k")))
    t.update_where([("k", "==", 1)], {"k": F.lit(7).cast("long")}, mode="cow")
    t.delete_where([("id", ">=", 10)], mode="dv")
    t.append(spark.range(12, 15).select("id", F.lit(9).cast("long").alias("k")))
    got = _drain_cdf(
        spark, tp, str(tmp_path / "ck"), str(tmp_path / "out"), startingVersion=0
    )
    want = t.read_changes(-1)
    cols = ["id", "k", "_change_type", "_commit_version"]
    assert sorted(map(_key, got.select(*cols).collect())) == sorted(
        map(_key, want.select(*cols).collect())
    )


def test_exactly_once_across_restarts_with_rate_limit(spark, tmp_path):
    """maxFilesPerTrigger paces the feed one file-entry per micro-batch
    (each availableNow run under the Python DataSource API executes a
    single batch — the documented fallback), so restarts double as pacing:
    draining to a fixed point yields exactly the batch feed, no dupes."""
    tp = str(tmp_path / "t")
    t = TxTable(spark, tp)
    for k in range(3):
        t.append(spark.range(k * 5, k * 5 + 5).select("id").coalesce(1))
    t.delete_where([("id", "<", 2)], mode="cow")
    ckpt, out = str(tmp_path / "ck"), str(tmp_path / "out")
    prev, runs = -1, 0
    while True:
        n = _drain_cdf(
            spark, tp, ckpt, out, startingVersion=0, maxFilesPerTrigger=1
        ).count()
        runs += 1
        if n == prev:
            break
        prev = n
    assert runs >= 5  # paced: one file-entry per restart, not one gulp
    df = spark.read.parquet(out)
    want = t.read_changes(-1)
    cols = ["id", "_change_type", "_commit_version"]
    assert sorted(map(_key, df.select(*cols).collect())) == sorted(
        map(_key, want.select(*cols).collect())
    )


def test_identity_columns_resolve_in_cdf_stream(spark, tmp_path):
    """Virtually-stored identity values resolve in the streamed feed
    exactly as the batch feed resolves them."""
    tp = str(tmp_path / "t")
    t = TxTable(spark, tp)
    t.append(spark.range(0, 5).select((F.col("id") * 10).alias("v")))
    t.enable_row_tracking()
    t.set_identity_column("rid", start=100, step=2)
    t.append(spark.range(5, 9).select((F.col("id") * 10).alias("v")))
    got = _drain_cdf(
        spark, tp, str(tmp_path / "ck"), str(tmp_path / "out"), startingVersion=0
    )
    want = t.read_changes(-1)
    cols = ["v", "rid", "_change_type", "_commit_version"]
    assert sorted(map(_key, got.select(*cols).collect())) == sorted(
        map(_key, want.select(*cols).collect())
    )


def test_identity_survives_compaction_in_snapshot(spark, tmp_path):
    """A compaction reorders rows into new files; the stream must resolve
    identity from the MATERIALIZED __row_id column (base+position alone
    would renumber) — parity with the batch reader."""
    tp = str(tmp_path / "t")
    t = TxTable(spark, tp)
    t.append(spark.range(0, 5).select((F.col("id") * 10).alias("v")))
    t.enable_row_tracking()
    t.set_identity_column("rid", start=100, step=2)
    t.append(spark.range(5, 9).select((F.col("id") * 10).alias("v")))
    t.compact()  # rewrites every file, materializing __row_id
    got = _drain_cdf(spark, tp, str(tmp_path / "ck"), str(tmp_path / "out"))
    want = {(r.v, r.rid) for r in t.read().collect()}
    assert {(r.v, r.rid) for r in got.collect()} == want
    # plain (non-CDF) stream over the same compacted table agrees too
    q = (
        spark.readStream.format("txtable")
        .option("path", tp)
        .load()
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "o2"))
        .option("checkpointLocation", str(tmp_path / "c2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    plain = spark.read.parquet(str(tmp_path / "o2"))
    assert {(r.v, r.rid) for r in plain.collect()} == want


def test_row_ids_option_matches_batch_feed(spark, tmp_path):
    """rowIds=true appends _row_id to the streamed feed, matching batch
    read_changes(row_ids=True) — the keyless update-pairing contract on a
    stream. Refuses without row tracking."""
    tp = str(tmp_path / "t")
    t = TxTable(spark, tp)
    t.append(spark.range(0, 8).select("id", (F.col("id") % 2).alias("k")))
    t.enable_row_tracking()
    t.update_where([("k", "==", 1)], {"k": F.lit(5).cast("long")}, mode="cow")
    got = _drain_cdf(
        spark,
        tp,
        str(tmp_path / "ck"),
        str(tmp_path / "out"),
        startingVersion=0,
        rowIds=True,
    )
    want = t.read_changes(-1, row_ids=True)
    cols = ["id", "k", "_row_id", "_change_type", "_commit_version"]
    assert sorted(map(_key, got.select(*cols).collect())) == sorted(
        map(_key, want.select(*cols).collect())
    )
    # the streamed feed pairs the update keylessly: one _row_id appears as
    # both a delete image and an insert image at the update's version
    upd = (
        got.filter(F.col("_commit_version") == 2)
        .groupBy("_row_id")
        .agg(
            F.collect_set("_change_type").alias("types"),
            F.size(F.collect_set("k")).alias("n_k"),
        )
        .filter(F.size("types") == 2)
    )
    assert upd.count() == 8  # every rewritten row pairs (carried included)
    assert upd.filter(F.col("n_k") == 2).count() == 4  # value-changed: k==1
    t2 = TxTable(spark, str(tmp_path / "t2"))
    t2.append(spark.range(0, 3).select("id"))
    from mb_crdb_cdc_dlgen2_synapse_spark.streaming.source import TxStreamReader

    with pytest.raises(ValueError, match="enable_row_tracking"):
        TxStreamReader(
            t2.read().schema, {"path": str(tmp_path / "t2"), "rowids": "true"}
        )


@pytest.mark.parametrize("seed", [7, 23, 91])
def test_cdf_stream_batch_parity_fuzz(spark, tmp_path, seed):
    """Seeded random DML histories (append / CoW delete / DV delete / CoW
    update / compact): the streamed change feed from version 0 equals
    batch read_changes row-for-row, and a plain snapshot stream equals
    read(). One sequence proves a path; the fuzz proves the composition."""
    import random

    rng = random.Random(seed)
    tp = str(tmp_path / "t")
    t = TxTable(spark, tp)
    nxt = 0

    def appender():
        nonlocal nxt
        lo, hi = nxt, nxt + rng.randint(3, 8)
        nxt = hi
        t.append(
            spark.range(lo, hi).select(
                "id", (F.col("id") % 4).alias("k")
            ).coalesce(1)
        )

    appender()
    ops = [
        lambda: appender(),
        lambda: t.delete_where([("id", "<", rng.randint(1, nxt))], mode="cow"),
        lambda: t.delete_where([("k", "==", rng.randint(0, 3))], mode="dv"),
        lambda: t.update_where(
            [("k", "==", rng.randint(0, 3))],
            {"k": F.lit(rng.randint(5, 9)).cast("long")},
            mode="cow",
        ),
        lambda: t.compact(),
    ]
    for _ in range(6):
        rng.choice(ops)()
    got = _drain_cdf(
        spark, tp, str(tmp_path / "ck"), str(tmp_path / "out"), startingVersion=0
    )
    want = t.read_changes(-1)
    cols = ["id", "k", "_change_type", "_commit_version"]
    assert sorted(map(_key, got.select(*cols).collect())) == sorted(
        map(_key, want.select(*cols).collect())
    )
    # plain snapshot stream == batch read
    q = (
        spark.readStream.format("txtable")
        .option("path", tp)
        .load()
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "o2"))
        .option("checkpointLocation", str(tmp_path / "c2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    plain = spark.read.parquet(str(tmp_path / "o2"))
    assert sorted(map(_key, plain.select("id", "k").collect())) == sorted(
        map(_key, t.read().select("id", "k").collect())
    )
