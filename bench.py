#!/usr/bin/env python
"""Benchmark harness (BASELINE.md protocol): times the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"q": sec, ...}, "sf": <sf>}

Execution is measured with the noop sink (full plan runs, zero driver
transfer) so we time the engine, not row serialization to Python.

The ``flagship_e2e_ndjson`` entry is the analog of the reference's measured
number (2:48 for revenue-per-city over a day of NDJSON CDC files,
/root/reference/images/synapse-img1.png): raw ``spark.read.text`` over real
NDJSON files on disk -> JSON_VALUE -> cast -> group-aggregate.  File
generation is setup, not timed — the reference's timer also starts at query
submit, not at changefeed creation.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))

#: catalog queries timed per round — one per operator family (SURVEY.md §2)
HEADLINE = [
    "flagship_cdc_city_revenue",   # raw-line JSON analytics (reference query)
    "q1_pricing_summary",          # scan+filter+hash agg
    "q3_shipping_priority",        # selective 3-way join + top-k
    "q5_region_revenue",           # star join, broadcast dims
    "range_join_ship_window",      # equi+range join
    "customer_order_counts",       # outer join + agg
    "latest_order_per_customer",   # ranking window (CDC merge shape)
    "cumulative_daily_revenue",    # running window aggregate
    "cdc_latest_state_events",     # latest-per-key over event stream
    "session_stats",               # gap sessionization
    "daily_event_rollup",          # tumbling-window batch form
    "doc_token_counts",            # tokenize/explode/count
    "doc_quality_scores",          # regexp scoring pipeline
    "dedup_exact_survivors",       # hash dedup
    "dedup_minhash_lsh",           # MinHash signatures + band join
    "knn_cosine_bruteforce",       # vector top-k
    "media_features",              # Arrow mapInPandas plumbing
    "q7_nation_volume",            # dual-alias dim joins
    "q10_returned_revenue",        # selective fact join + top-k
    "q18_large_orders",            # HAVING over grouped join
    "tfidf_top_terms",             # two-aggregation text pipeline
    # round-2 additions
    "q8_market_share",             # 6-way broadcast star + conditional ratio
    "paragraph_dedup_stats",       # segment explode + hash agg + join-back
    "benchmark_contamination",     # 8-gram overlap join
    "last_click_before_error",     # as-of join (union-tag window)
    "training_sequence_packing",   # sharded running-total window
    "knn_cosine_arrow",            # Arrow/numpy vectorized top-k
    # session-3 additions
    "record_linkage_parts",        # blocked equi-join + levenshtein argmin
    "tx_merge_upsert",             # txlog MERGE INTO (span-pruned rewrite)
    "incremental_matview_revenue", # file-delta incremental view refresh
    "dsir_importance_weights",     # corpus-selection LLR scoring
    # session-4 additions
    "semantic_dedup_embeddings",   # LSH buckets + centroid cosine dedup
    "crossmodal_paraphrase_pairs", # bucketed pair join + text-hash filter
    "sketch_distinct_rollup",      # mergeable HLL sketch build + rollup
    "tx_schema_evolution",         # metadata-only DDL + conformed read
    "knn_rerank_two_stage",        # hamming prefilter + cosine re-rank
    "corpus_curation_v2",          # LM gate + semantic dedup + mix, one plan
    # round-3 additions
    "knn_hamming_bucketed",        # LSH-prefix-bucketed probe (pruned scan)
    "doc_text_profile",            # 5 text metrics off one explode
    "tx_checkpointed_stream",      # 13-commit ingest + checkpoint + log prune
    # round-3 session-2 additions
    "cross_corpus_dedup",          # batch-vs-corpus LSH dedup + Jaccard verify
    "winnowing_partial_dups",      # MOSS fingerprints, partial-dup pairs
    "tx_replace_where",            # atomic region backfill (one commit)
    "tx_generated_columns",        # declare-once derived column fills
    "training_shuffle_shards",     # seeded shard-shuffle, no global sort
    # round-4 additions
    "tx_bloom_point_lookup",       # bloom index build + pruned id lookup
    # round-5 additions
    "tx_nested_rename",            # dotted-path column mapping, cast staging
    # round-6 additions
    "tx_row_tracking",             # row-id allocation + rewrite carry
    "tx_sql_ddl",                  # SQL lifecycle incl. MERGE INTO
    "media_png_decode",            # real PNG encode+decode round trip
    "media_jpeg_decode",           # real baseline-JPEG encode+decode
    "tx_identity_defaults",        # identity + defaults + type widening
    "substring_dedup_stats",       # ExactSubstr-style span coverage
    "bpe_tokenize_invariants",     # learned-BPE train + distributed encode
    "tx_trigram_substring_search", # ngrambf substring file skipping
    "tx_hilbert_clustering",       # Hilbert-curve compact + pruned read
    "tx_copy_into_idempotent",     # COPY INTO exactly-once loading
    # round-7 additions
    "doc_quality_linear_probe",    # one-pass exact-stats ridge fit + score
    # round-8 additions
    "ann_index_incremental",       # CDF-fed bucketed ANN index maintenance
    "ivf_index_incremental",       # CDF-fed IVF lists, frozen quantizer
    # round-9 additions
    "ann_topk_lsh",                # multi-probe LSH ANN top-k
    "knn_pq_adc",                  # PQ train+encode+ADC shortlist+rerank
    "ivfpq_index_incremental",     # CDF-fed compressed lists, IVFADC+R probe
    # round-9 session-2 additions
    "bm25_retrieval",              # sorted-fold BM25 ranked retrieval
    "hybrid_rrf_retrieval",        # lexical x vector RRF fusion
    "dedup_jaccard_ppjoin",        # prefix-filtered exact set-sim join
    "media_wav_features",          # real WAV round-trip + integer features
    "bm25_index_incremental",      # CDF-fed inverted index, pruned query
    "retrieval_eval_metrics",      # precision@k/MRR/nDCG vs boolean-AND truth
    # round-10 additions
    "hybrid_index_retrieval",      # both incremental indexes -> RRF, full lifecycle
    "hybrid_fusion_eval",          # 3-system retrieval grading on seeded corpus
    "lsh_index_incremental",       # CDF-fed MinHash bands index, pairs from entries
    "lsh_index_probe_batch",       # band_key-pruned incoming-batch near-dup probe
    "hybrid_ivfpq_retrieval",      # BM25 index x IVF-PQ IVFADC+R -> RRF, dual lifecycle
    # round-11 additions
    "hybrid_index_operator",       # composed hybrid READ path over prebuilt indexes
    "filtered_ann_topk",           # metadata-predicate semi-join filtered ANN probe
    # (llm_pipeline_e2e and bm25_index_timetravel are certification
    # gates, not bench entries: their wall time is streaming-machinery /
    # duplicate-lifecycle noise whose components are already benched —
    # BASELINE.md round-11 note)
    # round-12 additions
    "semantic_dedup_incremental",  # index-probed batch-vs-corpus embedding dedup
    # (streaming_semantic_dedup_ingest is a certification gate, not a
    # bench entry: streaming trigger/checkpoint machinery noise; its
    # data-proportional components — ANN index maintenance, the bucket
    # probe, the exact-cosine verify — are already bench rows via
    # ann_index_incremental + semantic_dedup_incremental)
    # (training_snapshot_export is a certification gate, not a bench
    # entry: a duplicate two-table + two-index lifecycle whose unique
    # work — the manifest write and the manifest-list parquet read —
    # is metadata-sized; every data-proportional component is already
    # a bench row via the index lifecycle gates and, for the manifest
    # write + external manifest-driven read itself, the
    # tx_symlink_manifest row below)
    # round-13 additions
    "tx_symlink_manifest",         # manifest publish + external URI-list read
]


def main() -> None:
    from pyspark.sql import SparkSession

    from mb_crdb_cdc_dlgen2_synapse_spark import catalog
    from mb_crdb_cdc_dlgen2_synapse_spark.operators.cdc import (
        orders_as_ride_envelopes,
        revenue_by_city_from_lines,
    )
    from mb_crdb_cdc_dlgen2_synapse_spark.session import get_spark
    from mb_crdb_cdc_dlgen2_synapse_spark.sources.ndjson import read_raw_lines
    from mb_crdb_cdc_dlgen2_synapse_spark.sources.tables import load_table

    spark = get_spark(app_name="bench", master=f"local[{CPUS}]", shuffle_partitions=int(CPUS))
    spark.sparkContext.setLogLevel("ERROR")

    def run_noop(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    reg = catalog.registry()
    times: dict[str, float] = {}

    # -- setup for the end-to-end flagship: land real NDJSON files (untimed)
    lake = "/tmp/bench_ndjson_lake"
    shutil.rmtree(lake, ignore_errors=True)
    orders_as_ride_envelopes(load_table(spark, SF_DIR, "orders")).write.mode(
        "overwrite"
    ).text(lake)
    # -- setup for the hybrid read-path twin: prebuild both index
    # lifecycles ONCE, untimed (VERDICT r10 item 4 protocol split) —
    # the gate entry hybrid_index_retrieval keeps timing the lifecycles
    hybrid_paths = catalog.hybrid_index_prebuild(spark, SF_DIR)

    # warm the JVM/codegen once (untimed)
    run_noop(reg["flagship_cdc_city_revenue"].builder(spark, SF_DIR))
    run_noop(spark.range(1_000_000).selectExpr("sum(id * 2654435761 % 1000000007) AS s"))

    # Protocol: best-of-2 with INTERLEAVED passes + adaptive re-runs.
    # This host's I/O throughput stalls for multi-second windows; running a
    # query's two passes back-to-back lets ONE stall window poison both
    # samples. So pass 1 runs every query (also the per-query warmup), then
    # pass 2 runs every query again — the two samples of each query are
    # minutes apart and a stall can't cover both. If a query's two samples
    # still disagree by >1.5x the measurement is unstable (a stall hit one
    # of them): re-run up to 2 more times until the two smallest samples
    # agree. Reported value stays the MINIMUM — plan cost, not host luck.
    def build(name):
        if name == "flagship_e2e_ndjson":
            return revenue_by_city_from_lines(read_raw_lines(spark, lake))
        if name == "sketch_distinct_rollup":
            # bench times the OPERATOR (sketch build + union rollup); the
            # registered gate additionally computes exact-distinct anchors
            # that certify the error envelope — certification work, kept
            # out of the timed region (BASELINE.md round-8 note)
            return catalog.sketch_distinct_rollup_estimates(spark, SF_DIR)
        if name == "ann_index_incremental":
            # same split (round-9): time the maintenance lifecycle +
            # probe; the incremental==scratch equality proof is gate-only
            # certification work
            return catalog.ann_index_incremental_operator(spark, SF_DIR)
        if name == "ivf_index_incremental":
            # ditto, plus the brute-force recall certification stays out
            return catalog.ivf_index_incremental_operator(spark, SF_DIR)
        if name == "ann_topk_lsh":
            # retrieval only; the gate's brute-force reference + contract
            # aggregate are certification work
            return catalog.ann_topk_lsh_operator(spark, SF_DIR)
        if name == "knn_pq_adc":
            return catalog.knn_pq_adc_operator(spark, SF_DIR)
        if name == "ivfpq_index_incremental":
            return catalog.ivfpq_index_incremental_operator(spark, SF_DIR)
        if name == "bm25_index_incremental":
            # same split: lifecycle + pruned query; postings==scratch
            # proof is gate-only certification work
            return catalog.bm25_index_incremental_operator(spark, SF_DIR)
        if name == "lsh_index_incremental":
            # same split: lifecycle + pairs; bands==scratch proof is
            # gate-only certification work
            return catalog.lsh_index_incremental_operator(spark, SF_DIR)
        if name == "hybrid_index_operator":
            # composed hybrid READ path only — indexes prebuilt in setup
            return catalog.hybrid_index_operator(spark, SF_DIR, *hybrid_paths)
        return reg[name].builder(spark, SF_DIR)

    # -- host-speed calibration (VERDICT r4 item 2): a fixed,
    # engine-independent workload timed in the SAME process, sampled at the
    # start, middle, and end of the measurement window. A uniform shift of
    # every query that ALSO shifts the calibration row is host drift; a
    # query shift against a stable calibration row is a plan regression.
    # cpu: pure whole-stage-codegen arithmetic over spark.range (no I/O);
    # io: a raw parquet scan+sum of a pinned table file (bypasses every
    # engine code path — plain spark.read.parquet).
    cal: dict[str, list[float]] = {"cpu": [], "io": []}
    cal_io_path = os.path.join(SF_DIR, "lineitem.parquet")

    def calibrate() -> None:
        t0 = time.time()
        run_noop(
            spark.range(200_000_000).selectExpr(
                "sum(id * 2654435761 % 1000000007) AS s"
            )
        )
        cal["cpu"].append(round(time.time() - t0, 3))
        t0 = time.time()
        run_noop(
            spark.read.parquet(cal_io_path).selectExpr(
                "sum(l_extendedprice) AS s", "count(*) AS n"
            )
        )
        cal["io"].append(round(time.time() - t0, 3))

    all_names = HEADLINE + ["flagship_e2e_ndjson"]
    samples: dict[str, list[float]] = {n: [] for n in all_names}
    for _pass in range(2):
        calibrate()
        for name in all_names:
            t0 = time.time()
            run_noop(build(name))
            samples[name].append(time.time() - t0)
    calibrate()
    for name in all_names:
        s = samples[name]
        for _ in range(2):
            lo = sorted(s)
            if lo[1] <= lo[0] * 1.5:
                break  # two smallest agree: stable
            t0 = time.time()
            run_noop(build(name))
            s.append(time.time() - t0)
        times[name] = round(min(s), 3)
    shutil.rmtree(lake, ignore_errors=True)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf = float(sf)
    except ValueError:
        sf = SF_DIR
    out = {
        "metric": "headline query wall-clock (noop sink), incl. e2e raw-NDJSON flagship",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "calibration": {
            "cpu_sec": min(cal["cpu"]),
            "io_sec": min(cal["io"]),
            "cpu_samples": cal["cpu"],
            "io_samples": cal["io"],
            "workload": "range(2e8) hash-sum (codegen CPU); raw parquet "
            "scan+sum of lineitem (I/O) — engine-independent, sampled "
            "start/middle/end of the window",
        },
    }
    print(json.dumps(out))
    # SIDECAR (VERDICT r8 item 6): the driver's bounded tail capture can
    # truncate the long per-query line (BENCH_r08 lost its first ~6
    # queries). Persist the FULL record to a repo file so per-query
    # regression checks never depend on tail luck.
    try:
        sidecar = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_PERQUERY.json"
        )
        with open(sidecar, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
            f.write("\n")
    except OSError:
        pass  # read-only checkout: stdout record still carries everything
    # The full record above is one LONG line (per-query dict + calibration
    # samples); a bounded tail capture can truncate its head and lose the
    # headline total (observed: a recorded round artifact with parsed=null).
    # Emit a guaranteed-short final line with the summary fields so any
    # last-line / last-bytes capture always catches a parseable record.
    # The per-query map rides in this final line too (ms precision,
    # compact separators — ~2 KB for ~80 entries): both r11 and r12 the
    # driver's per-query comparison came back EMPTY because its bounded
    # tail capture truncated the long line above and the short line only
    # carried the total (VERDICT r12 defect #2). Compact-encoding the map
    # here keeps the final line small enough for any last-KB capture
    # while restoring PERF.per_query.
    print(
        json.dumps(
            {
                "metric": "headline total (full per-query record on the previous line)",
                "value": out["value"],
                "unit": "sec",
                "sf": sf,
                "n_queries": len(times),
                "queries": times,
                "calibration": {
                    "cpu_sec": out["calibration"]["cpu_sec"],
                    "io_sec": out["calibration"]["io_sec"],
                },
            },
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()
