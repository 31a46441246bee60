#!/usr/bin/env python
"""Per-query profiling harness for the optimization rounds (guide §1).

Mirrors bench.py's methodology exactly — same session config, same noop
sink — but for a chosen subset of queries, with N repeats, and optional
formatted-plan capture:

    python scripts/profile_query.py [-n 3] [--plan TAG] query [query ...]

Prints one line per sample and a min-per-query summary.  With --plan TAG,
writes ``plans/r12/<query>_<TAG>.txt`` (the judge-facing plan files).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("-n", type=int, default=2, help="samples per query")
    ap.add_argument("--plan", default=None, help="write plans/r12/<q>_<TAG>.txt")
    ap.add_argument("--no-warm", action="store_true")
    args = ap.parse_args()

    from mb_crdb_cdc_dlgen2_synapse_spark import catalog
    from mb_crdb_cdc_dlgen2_synapse_spark.session import get_spark

    spark = get_spark(
        app_name="profile", master=f"local[{CPUS}]", shuffle_partitions=int(CPUS)
    )
    spark.sparkContext.setLogLevel("ERROR")
    reg = catalog.registry()

    def run_noop(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    hybrid_paths = None

    def build(name):
        nonlocal hybrid_paths
        # the same operator/gate splits bench.py uses
        op = getattr(catalog, f"{name}_operator", None)
        if name == "hybrid_index_operator":
            if hybrid_paths is None:
                hybrid_paths = catalog.hybrid_index_prebuild(spark, SF_DIR)
            return catalog.hybrid_index_operator(spark, SF_DIR, *hybrid_paths)
        if name == "sketch_distinct_rollup":
            return catalog.sketch_distinct_rollup_estimates(spark, SF_DIR)
        if op is not None and name in (
            "ann_index_incremental", "ivf_index_incremental", "ann_topk_lsh",
            "knn_pq_adc", "ivfpq_index_incremental", "bm25_index_incremental",
            "lsh_index_incremental",
        ):
            return op(spark, SF_DIR)
        return reg[name].builder(spark, SF_DIR)

    if not args.no_warm:
        run_noop(
            spark.range(1_000_000).selectExpr(
                "sum(id * 2654435761 % 1000000007) AS s"
            )
        )

    best: dict[str, float] = {}
    for _ in range(args.n):
        for name in args.queries:
            spark.sparkContext.setJobDescription(f"profile:{name}")
            t0 = time.time()
            run_noop(build(name))
            dt = time.time() - t0
            print(f"{name:40s} {dt:8.3f}", flush=True)
            best[name] = min(best.get(name, 1e9), dt)
    if best:
        print("--- min ---")
        for name in args.queries:
            print(f"{name:40s} {best[name]:8.3f}")
    if args.plan:
        os.makedirs("plans/r12", exist_ok=True)
        for name in args.queries:
            df = build(name)
            p = f"plans/r12/{name}_{args.plan}.txt"
            txt = spark.sparkContext._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(p, "w") as f:
                f.write(txt)
            print("wrote", p)


if __name__ == "__main__":
    main()
