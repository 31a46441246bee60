#!/usr/bin/env python
"""Receipt: typed-silver ingestion (streaming/ingest.materialize_silver_tx)
per-batch cost vs state size. The claim SCALING.md records: because the
virgin bootstrap lands key-CLUSTERED files with a declared clustering +
key bloom, every later batch's keyed merge prunes its candidate files by
key span — per-batch merge cost and write volume track the BATCH, not the
table. This script bootstraps a silver table at N keys, then lands small
changefeed drops (fixed batch size) and measures per-drop wall time,
bytes written, and merge-candidate files as the table grows.

Run: python scripts/silver_ingest_scale.py [n_rows] [n_drops] [drop_size]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

from mb_crdb_cdc_dlgen2_synapse_spark.session import get_spark  # noqa: E402
from mb_crdb_cdc_dlgen2_synapse_spark.streaming.ingest import (  # noqa: E402
    changefeed_stream,
    materialize_silver_tx,
)
from mb_crdb_cdc_dlgen2_synapse_spark.txlog import TxTable  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
DROPS = int(sys.argv[2]) if len(sys.argv) > 2 else 4
DROP_SIZE = int(sys.argv[3]) if len(sys.argv) > 3 else 500

spark = get_spark(app_name="silver_scale", master="local[32]", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
root = tempfile.mkdtemp(prefix="silver_scale_")
landing = os.path.join(root, "landing")
tdir, ckpt = os.path.join(root, "silver"), os.path.join(root, "ckpt")

AFTER = T.StructType(
    [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
)
COLS = {
    "doc_id": "cast(element_at(key, 1) as bigint)",
    "text": "after.text",
}


def land(rel, date):
    d = os.path.join(landing, date)
    rel.coalesce(4).write.mode("overwrite").text(d)
    for fn in os.listdir(d):
        if fn.startswith("part-") and not fn.endswith(".ndjson"):
            os.rename(os.path.join(d, fn), os.path.join(d, fn + ".ndjson"))


def envelope(rel, phase):
    return rel.select(
        F.to_json(
            F.struct(
                F.struct("doc_id", "text").alias("after"),
                F.array(F.col("doc_id").cast("string")).alias("key"),
                F.lit(f"{phase}.0000000000").alias("updated"),
            )
        ).alias("value")
    )


def ingest():
    materialize_silver_tx(
        changefeed_stream(spark, landing, AFTER), tdir, ckpt, "doc_id", COLS
    ).awaitTermination()


def table_bytes(files):
    return sum(
        os.path.getsize(os.path.join(tdir, f)) for f in files
    )


try:
    corpus = spark.range(N).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("doc body text token "), F.col("id").cast("string"),
            F.lit(" filler payload words for realistic row width"),
        ).alias("text"),
    )
    t0 = time.time()
    land(envelope(corpus, 1), "2022-12-12")
    t_land = time.time() - t0
    t0 = time.time()
    ingest()
    boot = time.time() - t0
    table = TxTable(spark, tdir)
    v0, files0, _ = table.snapshot()
    n_files = len(files0)
    base_bytes = table_bytes(files0)
    print(
        f"bootstrap: {N} keys in {boot:.2f}s (landing {t_land:.1f}s untimed) "
        f"-> {n_files} clustered files, {base_bytes / 1e6:.1f} MB, "
        f"clustering={table.clustering()}, bloom={sorted(table.bloom_index())}"
    )
    for i in range(DROPS):
        upd = corpus.filter(
            F.col("doc_id") % (N // DROP_SIZE) == i
        ).select(
            "doc_id", F.concat(F.col("text"), F.lit(f" upd{i}")).alias("text")
        )
        land(envelope(upd, 2 + i), f"2022-12-{13 + i}")
        tab = TxTable(spark, tdir)
        before = set(tab.snapshot()[1])
        t0 = time.time()
        ingest()
        dt = time.time() - t0
        tab = TxTable(spark, tdir)
        after = set(tab.snapshot()[1])
        added = after - before
        removed = before - after
        print(
            json.dumps(
                {
                    "drop": i,
                    "batch_rows": DROP_SIZE,
                    "state_rows": N,
                    "wall_sec": round(dt, 2),
                    "files_rewritten": len(removed),
                    "files_total": len(after),
                    "bytes_written": table_bytes(added),
                }
            )
        )
finally:
    shutil.rmtree(root, ignore_errors=True)
