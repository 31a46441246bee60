"""Product quantization (operators/pq.py): determinism, the exact
degenerate case (corpus ⊆ codebook ⇒ ADC distance IS the true squared
distance ⇒ top-k equals brute force), measured recall floor, and model
validation errors."""

from __future__ import annotations

import pytest
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from mb_crdb_cdc_dlgen2_synapse_spark.operators import pq, similarity


def _brute_l2_topk(emb, queries, k):
    qq = queries.select("query_id", F.col("embedding").alias("q_emb"))
    d2 = F.aggregate(
        F.zip_with(
            F.col("embedding"), F.col("q_emb"), lambda x, y: (x - y) * (x - y)
        ),
        F.lit(0.0),
        lambda a, v: a + v,
    )
    scored = emb.join(F.broadcast(qq)).select(
        "query_id", "vec_id", d2.alias("d2")
    )
    w = W.partitionBy("query_id").orderBy(F.col("d2").asc(), F.col("vec_id").asc())
    return scored.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= k
    )


def test_pq_encode_deterministic(spark):
    emb = similarity.synthetic_embeddings(spark, 500).localCheckpoint(eager=True)
    books = pq.train_pq_codebooks(emb, m=8, k=16, n_iter=2, sample=256)
    a = sorted(map(tuple, pq.pq_encode(emb, books).collect()))
    b = sorted(map(tuple, pq.pq_encode(emb.repartition(7), books).collect()))
    assert a == b  # partitioning-independent, run-stable


def test_pq_exact_when_corpus_in_codebook(spark):
    """16 distinct corpus vectors, k=16, sample covers them all: k-means
    init takes every vector as its own centroid, so every subvector
    encodes losslessly and ADC == true L2 — top-k must EQUAL brute."""
    emb = similarity.synthetic_embeddings(spark, 16).localCheckpoint(eager=True)
    books = pq.train_pq_codebooks(emb, m=8, k=16, n_iter=1, sample=16)
    codes = pq.pq_encode(emb, books)
    q = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = pq.pq_adc_topk(codes, q, books, k=5)
    brute = _brute_l2_topk(emb, q, 5)
    assert {(r.query_id, r.rk, r.vec_id) for r in got.collect()} == {
        (r.query_id, r.rk, r.vec_id) for r in brute.collect()
    }
    # and the ADC distance of the self-match is exactly 0
    zero = got.filter(
        (F.col("query_id") == F.col("vec_id")) & (F.col("adc_dist") != 0.0)
    )
    assert zero.count() == 0


def test_pq_recall_floor_vs_brute(spark):
    """Measured 0.70 recall@10 at 5k synthetic vectors (m=8, k=16);
    pinned conservatively at 0.5 — the compression trade the method
    makes, far above the 10/5000 = 0.002 random floor."""
    n, nq = 5_000, 5
    emb = similarity.synthetic_embeddings(spark, n).localCheckpoint(eager=True)
    books = pq.train_pq_codebooks(emb, m=8, k=16, n_iter=2, sample=1024)
    codes = pq.pq_encode(emb, books).localCheckpoint(eager=True)
    ids = [int(i * n / nq) + 1 for i in range(nq)]
    q = similarity.perturbed_queries(spark, ids)
    got = {
        (r.query_id, r.vec_id)
        for r in pq.pq_adc_topk(codes, q, books, k=10).collect()
    }
    truth = {(r.query_id, r.vec_id) for r in _brute_l2_topk(emb, q, 10).collect()}
    recall = len(got & truth) / len(truth)
    assert recall >= 0.5, f"PQ recall@10 = {recall:.2f}"


def test_pq_model_validation(spark):
    emb = similarity.synthetic_embeddings(spark, 64)
    with pytest.raises(ValueError, match="divisible"):
        pq.train_pq_codebooks(emb, m=7)
    with pytest.raises(ValueError, match="nibble"):
        pq.train_pq_codebooks(emb, m=8, k=32)


def test_ivfpq_recall_and_probe_restriction(spark):
    """IVF-PQ composition: nprobe = n_lists (probe everything) must equal
    plain PQ ADC top-k exactly (probing is a pure candidate restriction),
    and a narrow probe keeps a measured recall floor vs brute force."""
    n, nq = 4_000, 5
    emb = similarity.synthetic_embeddings(spark, n).localCheckpoint(eager=True)
    ids = [int(i * n / nq) + 1 for i in range(nq)]
    q = similarity.perturbed_queries(spark, ids).localCheckpoint(eager=True)
    books = pq.train_pq_codebooks(emb, m=8, k=16, n_iter=2, sample=1024)
    codes = pq.pq_encode(emb, books).localCheckpoint(eager=True)
    full_pq = {
        (r.query_id, r.vec_id)
        for r in pq.pq_adc_topk(codes, q, books, k=10).collect()
    }
    # probing every list == no restriction (same codebooks via same seed)
    all_lists = {
        (r.query_id, r.vec_id)
        for r in pq.ivfpq_topk(
            emb, q, k=10, n_lists=4, nprobe=4, m=8, kq=16, sample=1024
        ).collect()
    }
    assert all_lists == full_pq
    # narrow probe: recall floor vs true L2 neighbors
    probed = {
        (r.query_id, r.vec_id)
        for r in pq.ivfpq_topk(
            emb, q, k=10, n_lists=8, nprobe=3, m=8, kq=16, sample=1024
        ).collect()
    }
    truth = {(r.query_id, r.vec_id) for r in _brute_l2_topk(emb, q, 10).collect()}
    recall = len(probed & truth) / len(truth)
    assert recall >= 0.4, f"IVF-PQ recall@10 = {recall:.2f}"


def test_pq_encode_arrow_matches_expression(spark):
    """The Arrow encode twin (numpy argmin) produces bit-identical packed
    codes to the literal-expression form — same codebooks, same ties."""
    emb = similarity.synthetic_embeddings(spark, 400).localCheckpoint(eager=True)
    books = pq.train_pq_codebooks(emb, m=8, k=16, n_iter=2, sample=256)
    a = sorted(map(tuple, pq.pq_encode(emb, books).collect()))
    b = sorted(map(tuple, pq.pq_encode_arrow(emb, books).collect()))
    assert a == b


def test_pq_adc_rerank_recall_floor(spark):
    """The certified two-stage pipeline (ADC shortlist -> exact cosine
    re-rank): recall@5 vs exact cosine clears the gate floor on the
    normalized-space m=16 configuration used by knn_pq_adc."""
    emb = similarity.synthetic_embeddings(spark, 1000).localCheckpoint(eager=True)
    unit = similarity.with_normalized(emb).select(
        "vec_id", F.col("unit_vec").alias("embedding")
    ).localCheckpoint(eager=True)
    books = pq.train_pq_codebooks(unit, m=16, k=16, n_iter=2, sample=512)
    codes = pq.pq_encode_arrow(unit, books).localCheckpoint(eager=True)
    queries = unit.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = pq.pq_adc_rerank_topk(codes, queries, books, emb, k=5, shortlist=200)
    raw_q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = similarity.brute_force_topk(emb, raw_q, k=5)
    contract = similarity.retrieval_contract(
        got.select("query_id", "vec_id"),
        exact.select("query_id", "vec_id"),
        floor=0.8,
    ).collect()
    assert len(contract) == 3
    for r in contract:
        assert r.n_results == 5
        assert r.recall_ok, f"query {r.query_id} below 0.8 recall"
