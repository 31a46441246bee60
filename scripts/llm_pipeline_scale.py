#!/usr/bin/env python
"""Receipt: the llm_pipeline_e2e capstone's COMPOSITION at scale. Each
stage of the pipeline (NDJSON changefeed -> typed silver merge ->
CDF-fed BM25+LSH multiplexed fold + ANN fold -> hybrid search) has its
own per-stage receipt; this script measures the composed pipeline
end-to-end at ~500k keys and receipts that a trickle DROP's total cost
— wall time, files rewritten, bytes written, per stage — tracks the
DROP, not the corpus (additivity measured, not asserted; VERDICT r11
item 6).

Run: python scripts/llm_pipeline_scale.py [n_rows] [n_drops] [drop_size]
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

from mb_crdb_cdc_dlgen2_synapse_spark.engine import Engine  # noqa: E402
from mb_crdb_cdc_dlgen2_synapse_spark.session import get_spark  # noqa: E402
from mb_crdb_cdc_dlgen2_synapse_spark.streaming.ingest import (  # noqa: E402
    changefeed_stream,
    materialize_silver_tx,
)
from mb_crdb_cdc_dlgen2_synapse_spark.txlog import TxTable  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
DROPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
DROP_SIZE = int(sys.argv[3]) if len(sys.argv) > 3 else 500

spark = get_spark(app_name="llm_pipeline_scale", master="local[32]", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
eng = Engine(spark)
root = tempfile.mkdtemp(prefix="llm_pipe_scale_")
d_land = os.path.join(root, "docs_landing")
e_land = os.path.join(root, "emb_landing")
DIRS = {
    "docs_silver": os.path.join(root, "docs_silver"),
    "emb_silver": os.path.join(root, "emb_silver"),
    "bm25": os.path.join(root, "bm25"),
    "lsh": os.path.join(root, "lsh"),
    "ann": os.path.join(root, "ann"),
}

DOC_AFTER = T.StructType(
    [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
)
EMB_AFTER = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.DoubleType())),
    ]
)


def corpus_docs(ids):
    return ids.select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("document body about topic "), (F.col("id") % 97).cast("string"),
            F.lit(" with spark vector lake tokens payload "),
            F.col("id").cast("string"),
        ).alias("text"),
    )


def corpus_embs(ids):
    return ids.select(
        F.col("id").alias("vec_id"),
        F.array(
            *[F.sin(F.col("id") * F.lit(0.37 * (j + 1))) for j in range(64)]
        ).alias("embedding"),
    )


def land(rel, ddir, date):
    d = os.path.join(ddir, date)
    rel.coalesce(4).write.mode("overwrite").text(d)
    for fn in os.listdir(d):
        if fn.startswith("part-") and not fn.endswith(".ndjson"):
            os.rename(os.path.join(d, fn), os.path.join(d, fn + ".ndjson"))


def envelope(rel, key, phase, tomb=False):
    cols = [c for c in rel.columns]
    return rel.select(
        F.to_json(
            F.struct(
                F.when(
                    F.lit(not tomb), F.struct(*[F.col(c) for c in cols])
                ).alias("after"),
                F.array(F.col(key).cast("string")).alias("key"),
                F.lit(f"{phase}.0000000000").alias("updated"),
            )
        ).alias("value")
    )


def run_stage(name, fn):
    """Time a stage and measure its table's file/bytes delta."""
    tdir = DIRS[name.split(":")[0]] if ":" in name else DIRS[name]
    tab = TxTable(spark, tdir)
    before = set(tab.snapshot()[1]) if tab.version() >= 0 else set()
    t0 = time.time()
    fn()
    dt = time.time() - t0
    after = set(TxTable(spark, tdir).snapshot()[1])
    added = after - before
    return {
        "stage": name,
        "wall_sec": round(dt, 2),
        "files_rewritten": len(before - after),
        "files_written": len(added),
        "files_total": len(after),
        "bytes_written": sum(
            os.path.getsize(os.path.join(tdir, f)) for f in added
        ),
    }


def pipeline_pass():
    """One full pipeline advance over whatever landed: both silver
    merges, the multiplexed doc-index fold, the ANN fold."""
    return [
        run_stage(
            "docs_silver",
            lambda: materialize_silver_tx(
                changefeed_stream(spark, d_land, DOC_AFTER),
                DIRS["docs_silver"], os.path.join(root, "ck_d"), "doc_id",
                {"doc_id": "cast(element_at(key, 1) as bigint)", "text": "after.text"},
            ).awaitTermination(),
        ),
        run_stage(
            "emb_silver",
            lambda: materialize_silver_tx(
                changefeed_stream(spark, e_land, EMB_AFTER),
                DIRS["emb_silver"], os.path.join(root, "ck_e"), "vec_id",
                {
                    "vec_id": "cast(element_at(key, 1) as bigint)",
                    "embedding": "after.embedding",
                },
            ).awaitTermination(),
        ),
        run_stage(
            "bm25",  # the multiplexed fold advances bm25 AND lsh; the
            # lsh delta is read separately below from the same fold
            lambda: eng.start_document_index_maintenance(
                DIRS["docs_silver"], DIRS["bm25"], DIRS["lsh"],
                os.path.join(root, "ck_di"),
            ).awaitTermination(),
        ),
        run_stage(
            "ann",
            lambda: eng.start_ann_index_maintenance(
                DIRS["emb_silver"], DIRS["ann"], os.path.join(root, "ck_a"),
                prefix_bits=4,
            ).awaitTermination(),
        ),
    ]


try:
    ids = spark.range(N)
    land(envelope(corpus_docs(ids), "doc_id", 1), d_land, "2022-12-12")
    land(envelope(corpus_embs(ids), "vec_id", 1), e_land, "2022-12-12")
    t0 = time.time()
    boot = pipeline_pass()
    print(json.dumps({"bootstrap_keys": N, "wall_sec": round(time.time() - t0, 2),
                      "stages": boot}))
    wm_b = TxTable(spark, DIRS["bm25"]).properties()["bm25.srcVersion"]
    wm_l = TxTable(spark, DIRS["lsh"]).properties()["lsh.srcVersion"]
    assert wm_b == wm_l, "multiplexed fold watermarks diverged"
    for i in range(DROPS):
        sel = spark.range(N).filter(F.col("id") % (N // DROP_SIZE) == i)
        upd_docs = corpus_docs(sel).select(
            "doc_id", F.concat("text", F.lit(f" upd{i}")).alias("text")
        )
        upd_embs = corpus_embs(sel).select(
            "vec_id", F.transform("embedding", lambda x: -x).alias("embedding")
        )
        land(envelope(upd_docs, "doc_id", 2 + i), d_land, f"2022-12-{13 + i}")
        land(envelope(upd_embs, "vec_id", 2 + i), e_land, f"2022-12-{13 + i}")
        lsh_before = set(TxTable(spark, DIRS["lsh"]).snapshot()[1])
        t0 = time.time()
        stages = pipeline_pass()
        total = round(time.time() - t0, 2)
        lsh_after = set(TxTable(spark, DIRS["lsh"]).snapshot()[1])
        lsh_added = lsh_after - lsh_before
        stages.append(
            {
                "stage": "lsh (same fold as bm25)",
                "files_rewritten": len(lsh_before - lsh_after),
                "files_written": len(lsh_added),
                "files_total": len(lsh_after),
                "bytes_written": sum(
                    os.path.getsize(os.path.join(DIRS["lsh"], f))
                    for f in lsh_added
                ),
            }
        )
        wm_b = TxTable(spark, DIRS["bm25"]).properties()["bm25.srcVersion"]
        wm_l = TxTable(spark, DIRS["lsh"]).properties()["lsh.srcVersion"]
        assert wm_b == wm_l, "multiplexed fold watermarks diverged"
        print(json.dumps({
            "drop": i, "drop_rows": DROP_SIZE, "corpus_keys": N,
            "end_to_end_wall_sec": total,
            "shared_doc_index_watermark": wm_b,
            "stages": stages,
        }))
    # the composed read path still answers over the final indexes
    q_terms = spark.createDataFrame(
        [(1, "vector"), (1, "spark"), (2, "lake")], "query_id int, term string"
    )
    q_vecs = corpus_embs(spark.range(2)).select(
        F.col("vec_id").cast("int").alias("query_id"), "embedding"
    )
    t0 = time.time()
    n = eng.hybrid_search(
        DIRS["bm25"], DIRS["ann"], q_terms, q_vecs, k=10, per_system_k=10
    ).count()
    print(json.dumps({"hybrid_search_rows": n,
                      "hybrid_wall_sec": round(time.time() - t0, 2)}))
finally:
    shutil.rmtree(root, ignore_errors=True)
