"""Throughput measurement for the native txtable streaming endpoints
(streaming/source.py) at sf0.1: the SOURCE drain vs the batch reader over
the same table, and the SINK vs the foreachBatch append path landing the
same rows — the numbers SCALING.md records.

Run: python scripts/stream_endpoint_scale.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402

from mb_crdb_cdc_dlgen2_synapse_spark.session import get_spark  # noqa: E402
from mb_crdb_cdc_dlgen2_synapse_spark.sources.tables import load_table  # noqa: E402
from mb_crdb_cdc_dlgen2_synapse_spark.streaming.source import (  # noqa: E402
    register_tx_source,
)
from mb_crdb_cdc_dlgen2_synapse_spark.txlog import (  # noqa: E402
    TxTable,
    stream_to_tx_table,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark()
    register_tx_source(spark)
    root = tempfile.mkdtemp(prefix="stream_scale_")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice", "l_shipdate"
    )
    n = li.count()
    print(f"rows: {n}")

    # source table: 8 commits (a realistic tailing shape)
    bp = os.path.join(root, "bronze")
    t = TxTable(spark, bp)
    for k in range(8):
        t.append(li.filter(F.col("l_orderkey") % 8 == k))

    t0 = time.time()
    batch_cnt = t.read().count()
    batch_s = time.time() - t0
    print(f"batch read+count:      {batch_s:6.2f}s  ({batch_cnt} rows)")

    t0 = time.time()
    q = (
        spark.readStream.format("txtable")
        .option("path", bp)
        .load()
        .writeStream.format("noop")
        .option("checkpointLocation", os.path.join(root, "ck_src"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    src_s = time.time() - t0
    print(f"txtable source drain:  {src_s:6.2f}s  ({n / src_s / 1e3:.0f}k rows/s)")

    # sink comparison: land the same rows from a parquet directory stream
    stage = os.path.join(root, "stage")
    li.repartition(8).write.parquet(stage)
    schema = spark.read.parquet(stage).schema

    t0 = time.time()
    q = (
        spark.readStream.schema(schema)
        .parquet(stage)
        .writeStream.format("txtable")
        .option("path", os.path.join(root, "sink_native"))
        .option("txnAppId", "bench")
        .option("checkpointLocation", os.path.join(root, "ck_native"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    native_s = time.time() - t0
    native_cnt = TxTable(spark, os.path.join(root, "sink_native")).read().count()
    print(
        f"txtable native sink:   {native_s:6.2f}s  "
        f"({n / native_s / 1e3:.0f}k rows/s, {native_cnt} rows)"
    )

    t0 = time.time()
    q = stream_to_tx_table(
        spark.readStream.schema(schema).parquet(stage),
        os.path.join(root, "sink_feb"),
        os.path.join(root, "ck_feb"),
        available_now=True,
    )
    q.awaitTermination(600)
    feb_s = time.time() - t0
    feb_cnt = TxTable(spark, os.path.join(root, "sink_feb")).read().count()
    print(
        f"foreachBatch sink:     {feb_s:6.2f}s  "
        f"({n / feb_s / 1e3:.0f}k rows/s, {feb_cnt} rows)"
    )
    assert native_cnt == feb_cnt == n
    shutil.rmtree(root, ignore_errors=True)

    # many-small-commits sweep: the CDC shape (one small file per commit)
    # is where the Python DataSource per-task toll multiplies — measure
    # the packed planner against one-task-per-file on the SAME table
    root = tempfile.mkdtemp(prefix="stream_pack_")
    bp = os.path.join(root, "bronze_small")
    t = TxTable(spark, bp)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    n_commits = 96
    for k in range(n_commits):
        t.append(
            orders.filter(F.col("o_orderkey") % n_commits == k).coalesce(1)
        )
    n_small = t.read().count()
    for tag, pack in (("packed (default)", None), ("one task/file", "0")):
        rd = (
            spark.readStream.format("txtable")
            .option("path", bp)
            .option("startingVersion", "0")
        )
        if pack is not None:
            rd = rd.option("packBytes", pack)
        q = (
            rd.load()
            .writeStream.format("noop")
            .option("checkpointLocation", os.path.join(root, f"ck_{tag[:4]}"))
            .trigger(availableNow=True)
            .start()
        )
        t0 = time.time()
        q.awaitTermination(600)
        s = time.time() - t0
        print(
            f"{n_commits}-commit drain, {tag:17s}: {s:6.2f}s  "
            f"({n_small / s / 1e3:.0f}k rows/s)"
        )
    shutil.rmtree(root, ignore_errors=True)

    # 2k/4k-file backlog sweep (round-8, VERDICT r7 item 6): the design
    # point where packing's multiplier returns — thousands of files in
    # ONE trigger's admitted range, interacting with maxBytesPerTrigger
    # admission. Files come from a single many-partition append (same
    # logged-size planning shape as thousands of tiny commits, without
    # paying thousands of real _commit calls to set up the fixture);
    # planning cost is pinned separately in
    # tests/test_tx_stream_source.py::test_pack_plan_planning_cost_is_linear.
    for n_files in (2000, 4000):
        root = tempfile.mkdtemp(prefix="stream_backlog_")
        bp = os.path.join(root, "bronze_many")
        t = TxTable(spark, bp)
        t.append(
            load_table(spark, sf_dir, "lineitem")
            .select("l_orderkey", "l_extendedprice")
            .repartition(n_files)
        )
        n_rows = t.read().count()
        for tag, pack in (("packed (default)", None), ("one task/file", "0")):
            rd = (
                spark.readStream.format("txtable")
                .option("path", bp)
                .option("startingVersion", "0")
                .option("maxBytesPerTrigger", str(64 << 20))
            )
            if pack is not None:
                rd = rd.option("packBytes", pack)
            q = (
                rd.load()
                .writeStream.format("noop")
                .option(
                    "checkpointLocation",
                    os.path.join(root, f"ck_{n_files}_{tag[:4]}"),
                )
                .trigger(availableNow=True)
                .start()
            )
            t0 = time.time()
            q.awaitTermination(1200)
            s = time.time() - t0
            print(
                f"{n_files}-file backlog drain, {tag:17s}: {s:7.2f}s  "
                f"({n_rows / s / 1e3:.0f}k rows/s)"
            )
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
