#!/usr/bin/env python
"""Capture .explain("formatted") for the round-13 touched queries into
plans/r13/<query>_<tag>.txt (tag = before/after). Lifecycle queries run
their maintenance eagerly inside the builder; the captured plan is the
final answer plan (probe/retrieval stage) — the part the bench's noop
sink times last — plus, where a mechanism changes an internal relation,
a dedicated internal plan is captured by its own name."""
from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TAG = sys.argv[1] if len(sys.argv) > 1 else "before"
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13")

QUERIES = [
    "semantic_dedup_incremental",
    "ann_topk_lsh",
    "knn_cosine_bruteforce",
    "hybrid_fusion_eval",
    "hybrid_index_retrieval",
    "hybrid_ivfpq_retrieval",
    "ivf_index_incremental",
    "ann_index_incremental",
    "bm25_index_incremental",
    "lsh_index_incremental",
    "ivfpq_index_incremental",
    "cross_corpus_dedup",
    "tx_symlink_manifest",
]


def main() -> None:
    from mb_crdb_cdc_dlgen2_synapse_spark import catalog
    from mb_crdb_cdc_dlgen2_synapse_spark.session import get_spark

    os.makedirs(OUT, exist_ok=True)
    spark = get_spark(
        app_name="plans_r13", master="local[8]", shuffle_partitions=8
    )
    spark.sparkContext.setLogLevel("ERROR")
    reg = catalog.registry()
    for name in QUERIES:
        df = reg[name].builder(spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(OUT, f"{name}_{TAG}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
