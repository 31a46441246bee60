#!/usr/bin/env python
"""Recall/latency measurement for the bucketed-probe Hamming ANN
(operators/similarity.py) at realistic cardinality — the evidence behind
plans/planner.py's ANN_MIN_ROWS crossover and the recall bound asserted in
tests/test_ann_recall.py.

Protocol:
- corpus: N synthetic 64-dim vectors, fully deterministic (sin(id*p_j)
  per dimension — no RNG, reproducible across runs/engines);
- queries: NQ perturbed copies of corpus vectors (small additive noise,
  flipping ~5% of sign bits — the near-neighbor regime ANN exists for);
- ground truth: full-scan Hamming top-k over the SAME binary codes
  (knn_hamming_topk);
- measured: probed_hamming_topk over a materialize_binary_codes table for
  each (prefix_bits, radius); recall@k = |probed ∩ truth| / k averaged
  over queries, latency = wall time of the probed query (table build time
  reported separately — it amortizes over the query stream).

Usage: python scripts/ann_recall_curve.py [N ...]   (default 10k 100k 1M)
Prints one JSON line per (N, prefix_bits, radius) + a summary.
"""

from __future__ import annotations

import json
import math
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from mb_crdb_cdc_dlgen2_synapse_spark.operators import similarity  # noqa: E402

K = 10
NQ = 20

spark = (
    SparkSession.builder.master("local[16]")
    .appName("ann_recall_curve")
    .config("spark.driver.memory", "48g")  # 1M x 64 doubles in flight
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

def corpus(n: int):
    return similarity.synthetic_embeddings(spark, n)


def queries(n: int):
    """NQ perturbed corpus vectors (ids spread through the corpus)."""
    ids = [int(i * n / NQ) + 1 for i in range(NQ)]
    return similarity.perturbed_queries(spark, ids)


def _clustered_queries(n: int, prefix_bits: int):
    """Perturbed copies of CLUSTERED corpus vectors (the hot-bucket
    regime's query stream)."""
    ids = [int(i * n / NQ) + 1 for i in range(NQ)]
    base = similarity.clustered_embeddings(spark, n, prefix_bits).filter(
        F.col("vec_id").isin(ids)
    )
    qid = F.array_position(
        F.array(*[F.lit(i) for i in ids]), F.col("vec_id")
    ).cast("int") - 1
    return base.select(
        qid.alias("query_id"),
        F.transform(
            F.col("embedding"),
            lambda x, i: x
            + 0.1 * F.sin(F.col("vec_id") * 31.0 + i.cast("double") * 1.3),
        ).alias("embedding"),
    )


def run(n: int, results: list):
    import tempfile

    # Three regimes (VERDICT r4 item 4): "easy" — perturbed near-neighbor
    # queries on the uniform corpus (recall ~1 by construction: the
    # harness check); "boundary" — queries pinned onto the prefix
    # hyperplane margins (the adversarial case multi-probe actually
    # loses); "clustered" — uniform queries on a hot-bucket corpus
    # (recall holds, SPEEDUP collapses — the skew failure mode).
    for prefix_bits in (4, 6, 8):
        regimes = {
            "easy": (corpus(n), queries(n)),
            "boundary": (
                corpus(n),
                similarity.boundary_queries(
                    spark, [int(i * n / NQ) + 1 for i in range(NQ)], prefix_bits
                ),
            ),
            "clustered": (
                similarity.clustered_embeddings(spark, n, prefix_bits),
                _clustered_queries(n, prefix_bits),
            ),
            # the fix for the clustered failure: balance-aware prefix dims
            # (persisted as the table's ann.prefixDims property)
            "clustered_auto": (
                similarity.clustered_embeddings(spark, n, prefix_bits),
                _clustered_queries(n, prefix_bits),
            ),
        }
        for regime, (c, q_df) in regimes.items():
            q = q_df.localCheckpoint(eager=True)
            t0 = time.time()
            truth_df = similarity.knn_hamming_topk(c, q, k=K)
            truth = {(r.query_id, r.vec_id) for r in truth_df.collect()}
            brute_s = time.time() - t0
            tdir = tempfile.mkdtemp(prefix=f"ann_{regime}_{n}_{prefix_bits}_")
            t0 = time.time()
            table = similarity.materialize_binary_codes(
                c, tdir, prefix_bits=prefix_bits,
                auto_bits=(regime == "clustered_auto"),
            )
            build_s = time.time() - t0
            # bucket occupancy + query buckets -> the fraction of corpus
            # ROWS the probe actually scans (probed_frac counts buckets;
            # under skew the two diverge — that divergence IS the
            # clustered-regime finding)
            hist = {
                r.bucket: r.cnt
                for r in table.read()
                .groupBy("bucket")
                .agg(F.count(F.lit(1)).alias("cnt"))
                .collect()
            }
            prop = table.properties().get("ann.prefixDims")
            dims = (
                [int(x) for x in prop.split(",")]
                if prop
                else list(range(prefix_bits))
            )
            qbuckets = {
                r.b
                for r in similarity.binary_quantize(q)
                .select(similarity._prefix_bucket_expr(dims).alias("b"))
                .distinct()
                .collect()
            }
            for radius in (1, 2):
                probe_set: set = set()
                for b in qbuckets:
                    probe_set.update(
                        similarity.prefix_probe_buckets(b, prefix_bits, radius)
                    )
                scanned_frac = sum(hist.get(b, 0) for b in probe_set) / n
                t0 = time.time()
                got_df = similarity.probed_hamming_topk(
                    table, q, k=K, prefix_bits=prefix_bits, radius=radius
                )
                got = {(r.query_id, r.vec_id) for r in got_df.collect()}
                probe_s = time.time() - t0
                recall = len(got & truth) / len(truth)
                n_probe = len(
                    similarity.prefix_probe_buckets(0, prefix_bits, radius)
                )
                rec = {
                    "n": n,
                    "regime": regime,
                    "prefix_bits": prefix_bits,
                    "radius": radius,
                    "probed_frac": round(n_probe / (1 << prefix_bits), 4),
                    "scanned_frac": round(scanned_frac, 4),
                    "recall_at_k": round(recall, 4),
                    "brute_s": round(brute_s, 2),
                    "probe_s": round(probe_s, 2),
                    "build_s": round(build_s, 2),
                    "speedup_vs_brute": round(brute_s / probe_s, 2) if probe_s else None,
                }
                results.append(rec)
                print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    sizes = [int(float(a)) for a in sys.argv[1:]] or [10_000, 100_000, 1_000_000]
    results: list = []
    for n in sizes:
        run(n, results)
    # crossover: smallest N where the best >=0.9-recall probe beats brute
    xover = None
    for n in sizes:
        best = [
            r for r in results
            if r["n"] == n and r["regime"] == "easy" and r["recall_at_k"] >= 0.9
            and r["speedup_vs_brute"] and r["speedup_vs_brute"] > 1.0
        ]
        if best and xover is None:
            xover = n
    worst_boundary = {}
    for r in results:
        if r["regime"] == "boundary":
            key = (r["prefix_bits"], r["radius"])
            worst_boundary[key] = min(
                worst_boundary.get(key, 1.0), r["recall_at_k"]
            )
    print(
        json.dumps(
            {
                "summary": True,
                "sizes": sizes,
                "crossover_n": xover,
                "boundary_worst_recall": {
                    f"p{p}_r{r}": v for (p, r), v in sorted(worst_boundary.items())
                },
            }
        )
    )
