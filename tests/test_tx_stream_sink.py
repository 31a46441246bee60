"""txlog table as a Structured Streaming SINK (streaming/source.py
``writeStream.format("txtable")`` via DataSourceStreamArrowWriter) —
exactly-once commits through txn watermarks (Delta's txnAppId contract),
staged-file atomicity, replay idempotence, and refusal contracts."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mb_crdb_cdc_dlgen2_synapse_spark.streaming.source import (
    TxStreamSinkWriter,
    _StagedSinkFile,
    register_tx_source,
)
from mb_crdb_cdc_dlgen2_synapse_spark.txlog import TxTable


@pytest.fixture(autouse=True)
def _register(spark):
    register_tx_source(spark)


def _write_stream(spark, src_dir, table_path, ckpt, app="app1"):
    q = (
        spark.readStream.schema("id long, v double")
        .json(src_dir)
        .writeStream.format("txtable")
        .option("path", table_path)
        .option("txnAppId", app)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def _land(src_dir, name, rows):
    os.makedirs(src_dir, exist_ok=True)
    with open(os.path.join(src_dir, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_end_to_end_exactly_once(spark, tmp_path):
    src, tp, ckpt = str(tmp_path / "src"), str(tmp_path / "t"), str(tmp_path / "ck")
    _land(src, "a.json", [{"id": i, "v": i * 1.5} for i in range(10)])
    _write_stream(spark, src, tp, ckpt)
    t = TxTable(spark, tp)
    assert t.read().count() == 10
    # drained re-run: the replayed batch commits nothing
    _write_stream(spark, src, tp, ckpt)
    assert t.read().count() == 10
    assert t.read().select("id").distinct().count() == 10
    # new file flows through; totals exact
    _land(src, "b.json", [{"id": i, "v": i * 1.5} for i in range(10, 15)])
    _write_stream(spark, src, tp, ckpt)
    df = t.read()
    assert df.count() == 15
    assert df.agg(F.sum("id")).collect()[0][0] == sum(range(15))
    # no staging residue
    stage = os.path.join(tp, "_staging")
    assert not os.path.isdir(stage) or not os.listdir(stage)


def test_requires_txn_app_id(spark, tmp_path):
    src, tp = str(tmp_path / "src"), str(tmp_path / "t")
    _land(src, "a.json", [{"id": 1, "v": 1.0}])
    with pytest.raises(Exception, match="txnAppId|STREAM_FAILED"):
        q = (
            spark.readStream.schema("id long, v double")
            .json(src)
            .writeStream.format("txtable")
            .option("path", tp)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)


def test_refuses_feature_rich_tables(spark, tmp_path):
    tp = str(tmp_path / "t")
    t = TxTable(spark, tp)
    t.append(spark.range(0, 5).select("id", (F.col("id") * 1.0).alias("v")))
    t.add_check("positive", "id >= 0")
    src = str(tmp_path / "src")
    _land(src, "a.json", [{"id": 9, "v": 1.0}])
    with pytest.raises(Exception, match="CHECK constraints|STREAM_FAILED"):
        _write_stream(spark, src, tp, str(tmp_path / "ck"))


def test_commit_replay_is_idempotent_unit(spark, tmp_path):
    """Driver-level replay: commit() called twice with one batch id lands
    the rows once; the second call discards its staged files."""
    tp = str(tmp_path / "t")
    os.makedirs(tp)
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.DoubleType())]
    )
    import pyarrow as pa

    def staged():
        w = TxStreamSinkWriter(schema, {"path": tp, "txnappid": "u1"}, False)
        msg = w.write(
            iter(
                [
                    pa.RecordBatch.from_pydict(
                        {"id": [1, 2], "v": [1.0, 2.0]},
                        schema=pa.schema(
                            [
                                pa.field("id", pa.int64()),
                                pa.field("v", pa.float64()),
                            ]
                        ),
                    )
                ]
            )
        )
        return w, msg

    w1, m1 = staged()
    w1.commit([m1], 0)
    t = TxTable(spark, tp)
    assert t.read().count() == 2
    w2, m2 = staged()  # fresh writer, same app — the restart shape
    w2.commit([m2], 0)  # replayed batch id
    assert t.read().count() == 2
    assert not os.path.exists(os.path.join(tp, m2.rel))  # staged residue gone
    w3, m3 = staged()
    w3.commit([m3], 1)  # next batch lands
    assert t.read().count() == 4


def test_abort_removes_staged_files(spark, tmp_path):
    tp = str(tmp_path / "t")
    os.makedirs(tp)
    schema = T.StructType([T.StructField("id", T.LongType())])
    import pyarrow as pa

    w = TxStreamSinkWriter(schema, {"path": tp, "txnappid": "u1"}, False)
    msg = w.write(
        iter(
            [
                pa.RecordBatch.from_pydict(
                    {"id": [1]}, schema=pa.schema([pa.field("id", pa.int64())])
                )
            ]
        )
    )
    assert os.path.exists(os.path.join(tp, msg.rel))
    w.abort([msg], 0)
    assert not os.path.exists(os.path.join(tp, msg.rel))
    assert TxTable(spark, tp).version() == -1  # nothing ever committed


def test_native_bronze_to_silver_chain(spark, tmp_path):
    """txtable SOURCE -> transform -> txtable SINK, both native formats:
    exactly-once end to end across re-runs and a new bronze commit."""
    bp, sp, ckpt = str(tmp_path / "b"), str(tmp_path / "s"), str(tmp_path / "ck")
    bronze = TxTable(spark, bp)
    bronze.append(spark.range(0, 20).select("id", (F.col("id") % 4).alias("k")))

    def run():
        q = (
            spark.readStream.format("txtable")
            .option("path", bp)
            .load()
            .filter(F.col("id") % 2 == 0)
            .withColumn("doubled", F.col("id") * 2)
            .writeStream.format("txtable")
            .option("path", sp)
            .option("txnAppId", "chain1")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run()
    silver = TxTable(spark, sp)
    assert silver.read().count() == 10
    run()  # drained
    assert silver.read().count() == 10
    bronze.append(spark.range(20, 26).select("id", (F.col("id") % 4).alias("k")))
    run()
    df = silver.read()
    assert df.count() == 13
    assert df.select("id").distinct().count() == 13
    assert df.agg(F.sum("doubled")).collect()[0][0] == sum(
        i * 2 for i in range(0, 26, 2)
    )


def test_partitioned_sink_hive_layout(spark, tmp_path):
    """partitionBy on a fresh table: hive col=value dirs, partition values
    escaped the way Spark's own writer escapes them, read parity, and
    partition pruning over sink-written files."""
    src, tp, ckpt = str(tmp_path / "src"), str(tmp_path / "t"), str(tmp_path / "ck")
    rows = [{"id": i, "v": i * 1.0, "p": f"g{i % 3}"} for i in range(30)]
    rows.append({"id": 99, "v": 9.9, "p": "x:y"})  # needs escaping
    rows.append({"id": 100, "v": 1.0, "p": None})  # default partition
    _land(src, "a.json", rows)
    q = (
        spark.readStream.schema("id long, v double, p string")
        .json(src)
        .writeStream.format("txtable")
        .option("path", tp)
        .option("txnAppId", "part1")
        .option("partitionBy", "p")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    t = TxTable(spark, tp)
    df = t.read()
    assert df.count() == 32
    got = {(r.id, r.p) for r in df.collect()}
    assert (99, "x:y") in got and (100, None) in got
    # dir names match Spark's escapePathName rendering
    assert os.path.isdir(os.path.join(tp, "p=x%3Ay"))
    assert os.path.isdir(os.path.join(tp, "p=__HIVE_DEFAULT_PARTITION__"))
    # partition pruning: a p-filter scans only that partition's files
    active = t._state()["active"]
    assert all("=" in rel.split(os.sep)[0] for rel in active)
    n_g1 = t.count_rows(predicates=[("p", "==", "g1")])
    assert n_g1 == 10


def test_partitioned_sink_inherits_table_spec(spark, tmp_path):
    """A table with a partition spec: the sink uses it with NO option; a
    conflicting partitionBy refuses."""
    src, tp = str(tmp_path / "src"), str(tmp_path / "t")
    t = TxTable(spark, tp)
    t.append(
        spark.range(0, 4).select(
            "id", (F.col("id") * 1.0).alias("v"), (F.col("id") % 2).alias("p")
        ),
        partition_by=["p"],
    )
    t.set_partitioning(["p"])
    _land(src, "a.json", [{"id": 10 + i, "v": 1.0, "p": i % 2} for i in range(6)])
    q = (
        spark.readStream.schema("id long, v double, p long")
        .json(src)
        .writeStream.format("txtable")
        .option("path", tp)
        .option("txnAppId", "spec1")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert t.read().count() == 10
    # every active file sits under a p= dir
    assert all(
        rel.split(os.sep)[0].startswith("p=") for rel in t._state()["active"]
    )
    with pytest.raises(Exception, match="conflicts|STREAM_FAILED"):
        q = (
            spark.readStream.schema("id long, v double, p long")
            .json(src)
            .writeStream.format("txtable")
            .option("path", tp)
            .option("txnAppId", "spec2")
            .option("partitionBy", "v")
            .option("checkpointLocation", str(tmp_path / "ck2"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)


def test_partitioned_sink_streamed_rows_survive_roundtrip(spark, tmp_path):
    """Sink-written partitioned files read back through BOTH the batch
    reader and the txtable streaming source with identical values."""
    src, tp = str(tmp_path / "src"), str(tmp_path / "t")
    _land(
        src,
        "a.json",
        [{"id": i, "v": i * 0.5, "p": f"d{i % 2}"} for i in range(12)],
    )
    q = (
        spark.readStream.schema("id long, v double, p string")
        .json(src)
        .writeStream.format("txtable")
        .option("path", tp)
        .option("txnAppId", "rt1")
        .option("partitionBy", "p")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    t = TxTable(spark, tp)
    want = sorted((r.id, r.v, r.p) for r in t.read().collect())
    q2 = (
        spark.readStream.format("txtable")
        .option("path", tp)
        .load()
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(180)
    got = sorted(
        (r.id, r.v, r.p)
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    )
    assert got == want and len(got) == 12


def test_partitioned_sink_hostile_partition_values_roundtrip(spark, tmp_path):
    """Multi-column partition keys escape each segment BEFORE joining:
    values containing the historical \\x01 join delimiter, '=', '/', or
    '%' land under correctly-escaped hive dirs and round-trip exactly
    (a raw join mis-split such values and silently re-partitioned rows);
    NULL renders as __HIVE_DEFAULT_PARTITION__ and reads back as NULL."""
    src, tp = str(tmp_path / "src"), str(tmp_path / "t")
    hostile = ["a\x01b", "x=y", "p/q", "50%", "\x00N", None]
    _land(
        src,
        "a.json",
        [
            {"id": i, "p": hostile[i % len(hostile)], "q": f"g{i % 2}"}
            for i in range(12)
        ],
    )
    q = (
        spark.readStream.schema("id long, p string, q string")
        .json(src)
        .writeStream.format("txtable")
        .option("path", tp)
        .option("txnAppId", "hostile1")
        .option("partitionBy", "p,q")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = sorted(
        (r.id, r.p, r.q) for r in TxTable(spark, tp).read().collect()
    )
    want = sorted(
        (i, hostile[i % len(hostile)], f"g{i % 2}") for i in range(12)
    )
    assert got == want


def test_partitioned_sink_refuses_literal_hive_null_sentinel(spark, tmp_path):
    """A literal string value equal to hive's NULL rendering cannot be
    distinguished from NULL in the path — refused at write time instead
    of silently round-tripping to NULL."""
    src, tp = str(tmp_path / "src"), str(tmp_path / "t")
    _land(src, "a.json", [{"id": 1, "p": "__HIVE_DEFAULT_PARTITION__"}])
    q = (
        spark.readStream.schema("id long, p string")
        .json(src)
        .writeStream.format("txtable")
        .option("path", tp)
        .option("txnAppId", "sent1")
        .option("partitionBy", "p")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="HIVE_DEFAULT_PARTITION"):
        q.awaitTermination(180)
        q.processAllAvailable()


def test_sink_small_files_bounded_by_out_of_band_maintain(spark, tmp_path):
    """The native sink's commit hook runs in the data-source runner worker
    (no SparkSession — it cannot drive a compaction job), so the
    documented pattern is out-of-band maintenance: Engine.maintain after
    the drain applies the table's autoCompact policy and the sink's
    streamed rows survive it exactly-once."""
    from mb_crdb_cdc_dlgen2_synapse_spark.txlog import maybe_autocompact

    src, tp = str(tmp_path / "src"), str(tmp_path / "t")
    t = TxTable(spark, tp)
    t.append(spark.range(0, 2).select("id", (F.col("id") * 1.0).alias("v")))
    t.set_properties({"autoCompact.maxFiles": "3", "autoCompact.targetFiles": "1"})
    for k in range(4):
        _land(src, f"f{k}.json", [{"id": 10 + k, "v": 1.0}])
        _write_stream(spark, src, tp, str(tmp_path / "ck"), app="ac1")
    assert len(t._state()["active"]) > 3  # the sink alone accumulates
    assert maybe_autocompact(t)  # policy from the table's OWN properties
    assert len(t._state()["active"]) <= 3
    assert t.read().count() == 6
    # the compaction is dataChange=false: a still-running source over this
    # table would not re-serve the rows (covered in test_tx_stream_source)
    assert any(c["op"] == "compact" for c in t.history())


def test_merge_schema_evolves_across_stream_restart(spark, tmp_path):
    """Opt-in mergeSchema (round-8, VERDICT r7 item 5): a stream restart
    with a WIDER schema — one new column, one widened type — evolves the
    table mid-stream via the table's own metadata-only contracts (ADD
    COLUMN + typeWidening), batch and stream reads agree afterwards, and
    the CDF renders the pre-evolution rows under the end schema with the
    new column NULL (column-mapping-era CDF contract, unaffected rows)."""
    src, tp, ckpt = str(tmp_path / "src"), str(tmp_path / "t"), str(tmp_path / "ck")
    _land(src, "a.json", [{"id": i, "v": i * 1.5} for i in range(5)])
    _write_stream(spark, src, tp, ckpt)  # schema: id long, v double
    t = TxTable(spark, tp)
    assert [f["name"] for f in json.loads(t.snapshot()[2])["fields"]] == ["id", "v"]
    # restart with an evolved PRODUCER: id stays, v stays, new tag column;
    # without mergeSchema this refuses
    _land(src, "b.json", [{"id": 100 + i, "v": 9.0, "tag": f"t{i}"} for i in range(3)])
    q = (
        spark.readStream.schema("id long, v double, tag string")
        .json(src)
        .writeStream.format("txtable")
        .option("path", tp)
        .option("txnAppId", "app1")  # SAME checkpoint + app id: a true
        # restart — batch ids continue past the logged watermark, and
        # only the new file is read
        .option("checkpointLocation", ckpt)
        .option("mergeSchema", "true")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    df = TxTable(spark, tp).read()
    assert set(df.columns) == {"id", "v", "tag"}
    assert df.count() == 8
    # pre-evolution rows project the new column as typed NULLs
    assert df.filter(F.col("id") < 5).filter(F.col("tag").isNull()).count() == 5
    assert sorted(
        r.tag for r in df.filter(F.col("id") >= 100).collect()
    ) == ["t0", "t1", "t2"]
    # CDF: every historical insert renders under the END schema
    cdf = TxTable(spark, tp).read_changes(-1)
    assert set(cdf.columns) >= {"id", "v", "tag", "_change_type", "_commit_version"}
    assert cdf.filter(F.col("_change_type") == "insert").count() == 8


def test_merge_schema_widens_types_and_refuses_incompatible(spark, tmp_path):
    src, tp = str(tmp_path / "src"), str(tmp_path / "t")
    _land(src, "a.json", [{"id": i, "n": i} for i in range(4)])
    q = (
        spark.readStream.schema("id long, n integer")
        .json(src)
        .writeStream.format("txtable")
        .option("path", tp)
        .option("txnAppId", "w1")
        .option("checkpointLocation", str(tmp_path / "ck1"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    # restart producing n as LONG: lossless widening, table evolves
    _land(src, "b.json", [{"id": 10, "n": 1 << 40}])
    q = (
        spark.readStream.schema("id long, n long")
        .json(src)
        .writeStream.format("txtable")
        .option("path", tp)
        .option("txnAppId", "w1")  # same checkpoint: true restart
        .option("checkpointLocation", str(tmp_path / "ck1"))
        .option("mergeSchema", "true")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    t = TxTable(spark, tp)
    fields = {f["name"]: f["type"] for f in json.loads(t.snapshot()[2])["fields"]}
    assert fields["n"] == "long"
    got = t.read().agg(F.sum("n")).collect()[0][0]
    assert got == sum(range(4)) + (1 << 40)
    # a NON-widening change (long -> string) refuses even under mergeSchema
    _land(src, "c.json", [{"id": 11, "n": "nope"}])
    q = (
        spark.readStream.schema("id long, n string")
        .json(src)
        .writeStream.format("txtable")
        .option("path", tp)
        .option("txnAppId", "w3")
        .option("checkpointLocation", str(tmp_path / "ck3"))
        .option("mergeSchema", "true")
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="widening|does not match"):
        q.awaitTermination(180)
        raise RuntimeError("stream should have failed")  # pragma: no cover


def test_without_merge_schema_new_column_refuses(spark, tmp_path):
    src, tp = str(tmp_path / "src"), str(tmp_path / "t")
    _land(src, "a.json", [{"id": 1, "v": 1.0}])
    _write_stream(spark, src, tp, str(tmp_path / "ck1"))
    _land(src, "b.json", [{"id": 2, "v": 2.0, "extra": "x"}])
    q = (
        spark.readStream.schema("id long, v double, extra string")
        .json(src)
        .writeStream.format("txtable")
        .option("path", tp)
        .option("txnAppId", "app1")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="mergeSchema"):
        q.awaitTermination(180)
        raise RuntimeError("stream should have failed")  # pragma: no cover
