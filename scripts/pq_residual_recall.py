#!/usr/bin/env python
"""Receipt: IVF-PQ shortlist recall, RESIDUAL vs RAW encoding (VERDICT
r10 item 3). Canonical IVFADC (Jégou et al. §IV-A) quantizes the residual
(vector − assigned coarse centroid) instead of the raw vector: residuals
concentrate around the origin, so the shared per-subspace codebooks spend
their 4 bits on a smaller dynamic range and the same 8-byte code buys a
finer ADC shortlist. At 100 TB the shortlist quality decides how big
``shortlist`` must be before the exact re-rank — this script MEASURES the
uplift on the testdata distribution at several shortlist sizes.

Protocol: one corpus snapshot, ONE shared coarse quantizer + assignment
(so probe coverage is identical for both encodings), then per encoding:
train codebooks, encode, ADC-rank the probed lists per query, and report
recall@shortlist = |shortlist ∩ exact cosine top-10| / 10 averaged over
queries. Identical probe sets mean any recall difference is PURELY the
code quality.

Usage: python scripts/pq_residual_recall.py [sf_dir] [n_queries]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from mb_crdb_cdc_dlgen2_synapse_spark.operators.ann_index import (
    _residuals_from_assigned,
    _unit_vecs,
)
from mb_crdb_cdc_dlgen2_synapse_spark.operators.clustering import (
    assign_clusters,
    kmeans,
)
from mb_crdb_cdc_dlgen2_synapse_spark.operators.pq import (
    _adc_dist,
    _pq_lut,
    pq_encode_arrow,
    train_pq_codebooks,
)
from mb_crdb_cdc_dlgen2_synapse_spark.operators.similarity import (
    brute_force_topk,
)
from mb_crdb_cdc_dlgen2_synapse_spark.session import get_spark
from mb_crdb_cdc_dlgen2_synapse_spark.sources.tables import load_table

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
N_QUERIES = int(sys.argv[2]) if len(sys.argv) > 2 else 24
N_LISTS, NPROBE, M, KQ, K = 16, 4, 16, 16, 10
SHORTLISTS = [20, 50, 100, 200]

spark = get_spark(
    app_name="pq_residual_recall", master="local[32]", shuffle_partitions=32
)
spark.sparkContext.setLogLevel("ERROR")

if SF_DIR.startswith("synthetic:"):
    # deterministic CLUSTERED corpus (the regime IVF exists for): 16
    # hash-jittered clusters, one dominant axis per cluster — no RNG
    # state, same shape as the tests' clustered fixtures
    n_rows = int(SF_DIR.split(":", 1)[1])
    emb = spark.range(n_rows).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(0, 63), i -> "
            " (pmod(xxhash64(id, i), 1000) / 1000.0 - 0.5)"
            " + IF(i = CAST(pmod(id, 16) AS INT), 10.0D, 0.0D))"
        ).alias("embedding"),
    )
else:
    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
snap = _unit_vecs(emb).localCheckpoint(eager=True)
n = snap.count()
cents, _ = kmeans(snap, k=N_LISTS, n_iter=3)
cents = cents.select("cid", "c_vec").localCheckpoint(eager=True)
assigned = assign_clusters(snap, cents).localCheckpoint(eager=True)
res = _residuals_from_assigned(assigned, cents).localCheckpoint(eager=True)

queries = (
    snap.withColumn("__r", F.md5(F.col("vec_id").cast("string")))
    .orderBy("__r")
    .limit(N_QUERIES)
    .select(F.col("vec_id").alias("query_id"), "embedding")
    .localCheckpoint(eager=True)
)
exact = brute_force_topk(snap, queries, k=K).select("query_id", "vec_id")
exact_sets: dict[int, set] = {}
for r in exact.collect():
    exact_sets.setdefault(r.query_id, set()).add(r.vec_id)

# shared probe plan: nprobe nearest lists per query (identical for both
# encodings — same quantizer, same assignment)
from mb_crdb_cdc_dlgen2_synapse_spark.operators.clustering import _sq_dist

qs = queries.join(F.broadcast(cents)).select(
    "query_id", "cid", _sq_dist(F.col("embedding"), F.col("c_vec")).alias("d")
)
wp = W.partitionBy("query_id").orderBy(F.col("d").asc(), F.col("cid").asc())
probe = (
    qs.withColumn("pr", F.row_number().over(wp))
    .filter(F.col("pr") <= NPROBE)
    .select("query_id", "cid")
    .localCheckpoint(eager=True)
)


def shortlist_ranks(codes, lut_df):
    """(query_id, vec_id, rk) ADC rank within each query's probed lists."""
    scored = codes.join(F.broadcast(lut_df.drop("embedding")), "cid").select(
        "query_id", "vec_id", "cid", _adc_dist(M).alias("adc_dist")
    ).join(probe, ["query_id", "cid"], "semi")
    ws = W.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("vec_id").asc()
    )
    return scored.withColumn("rk", F.row_number().over(ws)).select(
        "query_id", "vec_id", "rk"
    )


def recall_curve(tag, train_input, encode_input):
    t0 = time.time()
    model = train_pq_codebooks(train_input, m=M, k=KQ, n_iter=3)
    codes = (
        pq_encode_arrow(encode_input.select("vec_id", "embedding"), model)
        .join(encode_input.select("vec_id", "cid"), "vec_id")
        .localCheckpoint(eager=True)
    )
    if tag == "residual":
        shifted = (
            queries.join(probe, "query_id")
            .join(F.broadcast(cents), "cid")
            .select(
                "query_id",
                "cid",
                F.zip_with("embedding", "c_vec", lambda x, c: x - c).alias(
                    "embedding"
                ),
            )
        )
        lut = _pq_lut(shifted, model, passthrough={"cid": "int"})
    else:
        lut = _pq_lut(queries, model).join(probe, "query_id").select(
            "query_id", "cid", "embedding", "__lut"
        )
    ranks = shortlist_ranks(codes, lut).localCheckpoint(eager=True)
    out = {}
    for s in SHORTLISTS:
        hits = {
            r.query_id: set()
            for r in ranks.select("query_id").distinct().collect()
        }
        for r in ranks.filter(F.col("rk") <= s).collect():
            hits.setdefault(r.query_id, set()).add(r.vec_id)
        recs = [
            len(hits.get(q, set()) & ex) / len(ex)
            for q, ex in exact_sets.items()
        ]
        out[s] = sum(recs) / len(recs)
    print(
        f"[{tag:8s}] n={n}  "
        + "  ".join(f"recall@{s}={out[s]:.4f}" for s in SHORTLISTS)
        + f"  ({time.time() - t0:.1f}s)"
    )
    return out


raw = recall_curve("raw", snap, assigned.select("vec_id", "embedding", "cid"))
resid = recall_curve("residual", res.select("vec_id", "embedding"), res)
for s in SHORTLISTS:
    d = resid[s] - raw[s]
    print(f"delta@{s}: {d:+.4f} ({'residual wins' if d > 0 else 'raw wins or tie'})")
