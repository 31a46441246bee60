#!/usr/bin/env python
"""Sweep every catalog query's physical plan for scale red flags:
CartesianProduct, BroadcastNestedLoopJoin with a non-trivial build side,
row-at-a-time Python eval (BatchEvalPython), and exchange counts.

Usage: python scripts/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

from mb_crdb_cdc_dlgen2_synapse_spark import catalog  # noqa: E402
from mb_crdb_cdc_dlgen2_synapse_spark.plans.explain import explain_str  # noqa: E402
from mb_crdb_cdc_dlgen2_synapse_spark.session import get_spark  # noqa: E402

spark = get_spark(app_name="plan_audit", master="local[4]", shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")

SKIP = {
    "cdc_streaming_pipeline",
    "flagship_silver_lake",
    "silver_partition_pruning",
    "streaming_dedup_ingest",
    "streaming_semantic_dedup_ingest",
    "tx_time_travel",
}
# ^ these build temp dirs as a side effect; their plans are covered by tests

flags = 0
for name, qd in sorted(catalog.registry().items()):
    if name in SKIP:
        continue
    df = qd.builder(spark, SF_DIR)
    plan = explain_str(df)
    issues = []
    if "CartesianProduct" in plan:
        issues.append("CARTESIAN")
    if "BroadcastNestedLoopJoin" in plan and name not in (
        "dedup_embedding_cosine",  # intentional: bounded 300-row broadcast
        "knn_cosine_bruteforce",   # intentional: tiny query side broadcast
        "knn_cosine_arrow",        # same broadcast shape, Arrow cosine
        "ann_topk_lsh",
        "cdc_dedup_counts",        # crossJoin of two single-row aggregates
        "knn_ivf_probe",           # query-set x centroid-table, both tiny
        "q22_wealthy_inactive_customers",  # 1-row scalar-aggregate broadcast
        "q11_important_part_stock",  # 1-row global-threshold aggregate broadcast
        "tfidf_top_terms",  # 1-row corpus-size aggregate broadcast
        "bm25_retrieval",  # 1-row corpus-stats (n_docs/total_dl) broadcast
        "hybrid_rrf_retrieval",  # tiny (3-row) query-side cosine broadcast
        "retrieval_eval_metrics",  # same 1-row corpus-stats broadcast (BM25 tail)
        "bm25_index_incremental",  # 1-row props-scalar broadcast (shared tail)
        "bm25_index_timetravel",  # same 1-row props-scalar broadcast, read
        # at the pinned as_of version
        "filtered_ann_topk",  # tiny (3-row) query-side broadcast, same
        # bounded shape as knn_hamming_bucketed; the allowed-key side is a
        # distributed SEMI join, not part of the BNLJ
        "hybrid_filtered_retrieval",  # the hybrid gates' bounded
        # broadcasts (1-row corpus-stats + 3-row query side); the allowed
        # sides are distributed SEMI joins
        "dedup_jaccard_dfcap",  # 1-row corpus-size aggregate broadcast
        "dsir_importance_weights",  # 1-row vocab-totals aggregate broadcast
        "doc_lm_quality",  # 1-row vocabulary-size aggregate broadcast
        "corpus_temperature_mix",  # 1-row corpus-total + weight-sum aggregates
        "corpus_curation_v2",  # same scalar aggregates, composed pipeline
        "knn_hamming_binary",  # tiny (3-row) query side broadcast
        "knn_rerank_two_stage",  # same bounded query-side broadcast
        "knn_hamming_bucketed",  # same bounded query-side broadcast, pruned scan
        "knn_rerank_bucketed",  # same bounded query-side broadcast, pruned scan
        "ivfpq_index_incremental",  # same bounded broadcasts: centroid
        # table, per-query LUT, shortlist keys
        "ivf_index_incremental",  # k-bounded centroid-table broadcast
        # (assign_clusters) + tiny probed-list broadcast
        "ann_index_incremental",  # same bounded query-side broadcast over the
        # CDF-maintained index's pruned buckets
        "sketch_price_quantiles",  # 1-row merged-quantile-estimates broadcast
        # feeding the rank-contract certification aggregate
        "knn_pq_adc",  # 1-row query-LUT broadcast onto the code relation
        "knn_ivf_pq",  # same LUT broadcast + tiny probed-list broadcast
        "hybrid_index_retrieval",  # 1-row BM25 corpus-stats broadcast +
        # tiny (3-row) probed query-side broadcast — both index read paths
        "hybrid_fusion_eval",  # same 1-row corpus-stats broadcast (BM25
        # tail) + tiny (3-row) query-embedding broadcast (brute-force tail)
        "hybrid_ivfpq_retrieval",  # same bounded broadcasts: corpus-stats
        # scalar + centroid table + per-(query,cid) residual LUT
        "llm_pipeline_e2e",  # the hybrid_index_retrieval read path over
        # stream-ingested silver: same 1-row corpus-stats + tiny query
        # broadcasts
        "training_snapshot_export",  # 1-row snapshot-cardinality scalar
        # broadcast onto the per-lang aggregate of the exported read
    ):
        issues.append("BNLJ")
    if "BatchEvalPython" in plan and name not in (
        "doc_chunks_udtf",  # the X6 UDTF demo IS deliberately Python
    ):
        issues.append("ROW_PYTHON_UDF")
    n_exchange = plan.count("Exchange")
    if issues:
        flags += 1
        print(f"FLAG {name}: {issues} exchanges={n_exchange}")
    else:
        print(f"ok   {name}: exchanges={n_exchange}")

print(f"\n{flags} flagged")
sys.exit(1 if flags else 0)
