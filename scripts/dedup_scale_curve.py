#!/usr/bin/env python
"""MinHash-LSH dedup scale measurement: end-to-end near-dup clustering
wall-clock at synthetic corpus sizes far beyond the test SFs, recorded in
SCALING.md alongside the ANN curves.

Corpus: n docs, ~dup_frac of them near-duplicates of an earlier doc
(shared 8-word base text with a 1-2 word suffix edit — the regime banded
MinHash is built for), the rest unique md5-word documents. Deterministic,
no RNG (doc text derives from md5 of the id), generated as one codegen
projection — generating 5M docs is the same one-stage plan as 50k.

Measured stages: shingle+signature build, banded candidate generation
(with the round-6 hot-bucket guard), Jaccard verify, iterative min-label
connected components. Prints one JSON line per n.

Usage: python scripts/dedup_scale_curve.py [n ...]  (default 100000 400000)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mb_crdb_cdc_dlgen2_synapse_spark.operators import dedup  # noqa: E402
from mb_crdb_cdc_dlgen2_synapse_spark.session import get_spark  # noqa: E402

NS = [int(a) for a in sys.argv[1:]] or [100_000, 400_000]


def synthetic_corpus(spark, n: int, dup_every: int = 20):
    """Every dup_every-th doc is a near-dup of the doc dup_every//2 before
    it (same 8 md5 words + 'suffix edit'); others are unique."""
    base_id = F.when(
        (F.col("id") % dup_every == 0) & (F.col("id") >= dup_every),
        F.col("id") - dup_every // 2,
    ).otherwise(F.col("id"))
    words = [
        F.md5(F.concat(base_id.cast("string"), F.lit(f"|w{i}")))
        for i in range(8)
    ]
    text = F.concat_ws(" ", *words)
    text = F.when(
        F.col("id") % dup_every == 0,
        F.concat(text, F.lit(" suffix edit")),
    ).otherwise(text)
    return spark.range(n).select(F.col("id").alias("doc_id"), text.alias("text"))


def main():
    spark = get_spark(app_name="dedup_scale_curve")
    for n in NS:
        docs = synthetic_corpus(spark, n).localCheckpoint(eager=True)
        t0 = time.time()
        sigs = dedup.minhash_signatures(docs).localCheckpoint(eager=True)
        t_sig = time.time() - t0
        t0 = time.time()
        pairs = dedup.lsh_candidates(docs).localCheckpoint(eager=True)
        n_pairs = pairs.count()
        t_band = time.time() - t0
        t0 = time.time()
        clusters = dedup.duplicate_clusters(docs, pairs)
        n_clustered = clusters.filter(F.col("cluster_id") != F.col("doc_id")).count()
        t_comp = time.time() - t0
        print(
            json.dumps(
                {
                    "n_docs": n,
                    "candidate_pairs": n_pairs,
                    "rows_relabeled": n_clustered,
                    "sig_sec": round(t_sig, 2),
                    "band_sec": round(t_band, 2),
                    "components_sec": round(t_comp, 2),
                    "total_sec": round(t_sig + t_band + t_comp, 2),
                }
            )
        )
        sigs.unpersist()


if __name__ == "__main__":
    main()
