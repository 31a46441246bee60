#!/usr/bin/env python
"""Receipt: the multiplexed document-index fold
(operators/doc_indexes.stream_document_indexes_to_tx_tables) reads the
documents CDF ONCE where the two single-index maintenance streams read
it twice — measured from the streams' own progress counters (rows
ingested per stream) over an identical corpus + mutation history — and
leaves BOTH indexes at one shared source watermark after every fold
(VERDICT r11 item 1).

Run: python scripts/doc_index_fold_scale.py [n_rows] [n_drops] [drop_size]
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

from mb_crdb_cdc_dlgen2_synapse_spark.operators.bm25_index import (  # noqa: E402
    stream_bm25_index_to_tx_table,
)
from mb_crdb_cdc_dlgen2_synapse_spark.operators.doc_indexes import (  # noqa: E402
    stream_document_indexes_to_tx_tables,
)
from mb_crdb_cdc_dlgen2_synapse_spark.operators.lsh_index import (  # noqa: E402
    stream_lsh_index_to_tx_table,
)
from mb_crdb_cdc_dlgen2_synapse_spark.session import get_spark  # noqa: E402
from mb_crdb_cdc_dlgen2_synapse_spark.txlog import TxTable  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
DROPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
DROP_SIZE = int(sys.argv[3]) if len(sys.argv) > 3 else 1_000

spark = get_spark(app_name="doc_fold_scale", master="local[32]", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
root = tempfile.mkdtemp(prefix="doc_fold_scale_")


def docs(ids):
    return ids.select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("document about topic "), (F.col("id") % 89).cast("string"),
            F.lit(" spark vector lake tokens payload "),
            F.col("id").cast("string"),
        ).alias("text"),
    )


def ingested(q) -> int:
    q.awaitTermination()
    return sum(p["numInputRows"] for p in q.recentProgress)


def mutate(src, i):
    upd = src.read().filter(F.col("doc_id") % (N // DROP_SIZE) == i).select(
        "doc_id", F.concat("text", F.lit(f" upd{i}")).alias("text")
    )
    src.merge_into(upd, on=["doc_id"], mode="dv")


try:
    src_m = TxTable(spark, os.path.join(root, "docs_m"))
    src_s = TxTable(spark, os.path.join(root, "docs_s"))
    for s in (src_m, src_s):
        s.append(docs(spark.range(N)))

    # ---- multiplexed: one stream, both indexes
    bm_m, lsh_m = os.path.join(root, "bm_m"), os.path.join(root, "lsh_m")
    rows_m, wall_m = 0, 0.0
    for i in range(DROPS + 1):  # fold 0 is the bootstrap
        if i:
            mutate(src_m, i - 1)
        t0 = time.time()
        rows_m += ingested(
            stream_document_indexes_to_tx_tables(
                spark, src_m.path, bm_m, lsh_m, os.path.join(root, "ck_m")
            )
        )
        wall_m += time.time() - t0
        wb = TxTable(spark, bm_m).properties()["bm25.srcVersion"]
        wl = TxTable(spark, lsh_m).properties()["lsh.srcVersion"]
        assert wb == wl == str(src_m.version()), "fold watermarks diverged"

    # ---- separate: two streams over the identical history
    bm_s, lsh_s = os.path.join(root, "bm_s"), os.path.join(root, "lsh_s")
    rows_s, wall_s = 0, 0.0
    for i in range(DROPS + 1):
        if i:
            mutate(src_s, i - 1)
        t0 = time.time()
        rows_s += ingested(
            stream_bm25_index_to_tx_table(
                spark, src_s.path, bm_s, os.path.join(root, "ck_s1")
            )
        )
        rows_s += ingested(
            stream_lsh_index_to_tx_table(
                spark, src_s.path, lsh_s, os.path.join(root, "ck_s2")
            )
        )
        wall_s += time.time() - t0

    print(
        json.dumps(
            {
                "corpus_keys": N,
                "folds": DROPS + 1,
                "multiplexed_rows_ingested": rows_m,
                "separate_rows_ingested": rows_s,
                "read_ratio": round(rows_s / max(rows_m, 1), 3),
                "multiplexed_wall_sec": round(wall_m, 2),
                "separate_wall_sec": round(wall_s, 2),
                "shared_watermark_after_every_fold": True,
            }
        )
    )
finally:
    shutil.rmtree(root, ignore_errors=True)
