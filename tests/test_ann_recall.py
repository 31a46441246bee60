"""Recall bound for the bucketed-probe Hamming ANN at REALISTIC
cardinality (1M vectors) — the pinned evidence behind the
prefix-radius recall argument (operators/similarity.py:
prefix_probe_buckets) and the planner's measured ANN_MIN_ROWS
crossover (plans/planner.py, scripts/ann_recall_curve.py).

Exact ground truth is computed from the SAME materialized code table by
probing at radius=prefix_bits (every bucket within distance
prefix_bits = ALL buckets -> a full, exact scan through the identical
scoring path), so the 1M-row comparison costs two cheap integer scans
of a 24 MB code table instead of re-quantizing 512 MB of floats."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mb_crdb_cdc_dlgen2_synapse_spark.operators import similarity
from mb_crdb_cdc_dlgen2_synapse_spark.plans import choose_knn_strategy
from mb_crdb_cdc_dlgen2_synapse_spark.plans.planner import ANN_MIN_ROWS

N = 1_000_000
NQ = 10
K = 10
PREFIX_BITS = 4


def test_full_radius_probe_is_exact(spark, tmp_path):
    """radius == prefix_bits probes every bucket — sanity that the
    'truth' side of the 1M test below is exact (vs the independent
    brute-force path) at a small N where both are cheap."""
    c = similarity.synthetic_embeddings(spark, 2000)
    q = similarity.perturbed_queries(spark, [100, 900, 1500])
    table = similarity.materialize_binary_codes(
        c, str(tmp_path / "codes"), prefix_bits=PREFIX_BITS
    )
    full = similarity.probed_hamming_topk(
        table, q, k=K, prefix_bits=PREFIX_BITS, radius=PREFIX_BITS
    )
    brute = similarity.knn_hamming_topk(c, q, k=K)
    assert {tuple(r) for r in full.collect()} == {
        tuple(r) for r in brute.collect()
    }


def test_recall_bound_at_1m_rows(spark, tmp_path):
    """recall@10 >= 0.9 at 1M vectors for the production setting
    (prefix_bits=4, radius=1 — 5/16 buckets scanned per query).
    Measured 1.0 on the curve run; 0.9 is the asserted floor."""
    c = similarity.synthetic_embeddings(spark, N)
    ids = [int(i * N / NQ) + 1 for i in range(NQ)]
    q = similarity.perturbed_queries(spark, ids)
    table = similarity.materialize_binary_codes(
        c, str(tmp_path / "codes1m"), prefix_bits=PREFIX_BITS
    )
    truth = {
        (r.query_id, r.vec_id)
        for r in similarity.probed_hamming_topk(
            table, q, k=K, prefix_bits=PREFIX_BITS, radius=PREFIX_BITS
        ).collect()
    }
    got = {
        (r.query_id, r.vec_id)
        for r in similarity.probed_hamming_topk(
            table, q, k=K, prefix_bits=PREFIX_BITS, radius=1
        ).collect()
    }
    assert len(truth) == NQ * K
    recall = len(got & truth) / len(truth)
    assert recall >= 0.9, f"recall@{K} = {recall:.3f} at {N} rows"


def test_planner_threshold_matches_measurement():
    """ANN_MIN_ROWS is the measured crossover (see planner.py comment +
    scripts/ann_recall_curve.py): brute below 100k, bucketed above."""
    assert ANN_MIN_ROWS == 100_000
    assert choose_knn_strategy({"rows": 50_000})["strategy"] == "brute_force"
    assert (
        choose_knn_strategy({"rows": 150_000})["strategy"] == "hamming_bucketed"
    )


def test_boundary_adversarial_recall_tracks_binomial_floor(spark, tmp_path):
    """VERDICT r4 item 4: the regime where the method actually BREAKS.
    Queries with margin-pinned prefix dimensions have ~uniform prefixes
    relative to their true neighbors, so recall collapses to the probed
    bucket fraction (ann_recall_floor's binomial). Pins: (a) the curve
    records a regime with recall < 1, (b) radius buys recall back, and
    (c) the measurement stays within sampling noise of the analytic
    floor the planner's advice cites."""
    from mb_crdb_cdc_dlgen2_synapse_spark.plans.planner import ann_recall_floor

    n, nq, prefix_bits = 50_000, 20, 4
    c = similarity.synthetic_embeddings(spark, n)
    ids = [int(i * n / nq) + 1 for i in range(nq)]
    q = similarity.boundary_queries(
        spark, ids, prefix_bits
    ).localCheckpoint(eager=True)
    truth = {
        (r.query_id, r.vec_id)
        for r in similarity.knn_hamming_topk(c, q, k=K).collect()
    }
    table = similarity.materialize_binary_codes(
        c, str(tmp_path / "codes"), prefix_bits=prefix_bits
    )
    recalls = {}
    for radius in (1, 2):
        got = {
            (r.query_id, r.vec_id)
            for r in similarity.probed_hamming_topk(
                table, q, k=K, prefix_bits=prefix_bits, radius=radius
            ).collect()
        }
        recalls[radius] = len(got & truth) / len(truth)
    assert recalls[1] < 0.7          # the failure regime is real
    assert recalls[2] > recalls[1]   # radius buys recall back
    for radius in (1, 2):
        floor = ann_recall_floor(prefix_bits, radius)
        assert abs(recalls[radius] - floor) < 0.25  # binomial model holds
    # analytic floor sanity: probing every bucket is exact
    assert ann_recall_floor(prefix_bits, prefix_bits) == 1.0


def test_min_radius_for_recall_clears_the_floor():
    """VERDICT r5 item 3: the sharp edge (p8/r1 floor 0.035) gets a
    floor-aware guard. min_recall=0.5 at prefix_bits=8 must escalate the
    radius to >= 3 (in fact 4: floor(8,3)=0.363 < 0.5 <= floor(8,4)=0.637),
    and out-of-range demands raise."""
    import pytest

    from mb_crdb_cdc_dlgen2_synapse_spark.operators.similarity import (
        min_radius_for_recall,
    )
    from mb_crdb_cdc_dlgen2_synapse_spark.plans.planner import ann_recall_floor

    r = min_radius_for_recall(8, 0.5)
    assert r >= 3 and ann_recall_floor(8, r) >= 0.5
    assert min_radius_for_recall(8, 1.0) == 8   # only the full scan is exact
    assert min_radius_for_recall(4, 0.0) == 0
    with pytest.raises(ValueError):
        min_radius_for_recall(8, 1.5)


def test_probed_topk_min_recall_escalates_end_to_end(spark, tmp_path):
    """probed_hamming_topk(min_recall=0.5) on a p8 table returns exactly
    the radius-4 probe's results (the escalation is real, not advisory),
    and the adversarial measured recall of the escalated config clears
    its floor within sampling noise."""
    from mb_crdb_cdc_dlgen2_synapse_spark.plans.planner import ann_recall_floor

    n, nq, pb = 20_000, 20, 8
    c = similarity.synthetic_embeddings(spark, n)
    ids = [int(i * n / nq) + 1 for i in range(nq)]
    q = similarity.boundary_queries(spark, ids, pb).localCheckpoint(eager=True)
    table = similarity.materialize_binary_codes(
        c, str(tmp_path / "codes8"), prefix_bits=pb
    )
    guarded = {
        (r.query_id, r.vec_id)
        for r in similarity.probed_hamming_topk(
            table, q, k=K, prefix_bits=pb, radius=1, min_recall=0.5
        ).collect()
    }
    explicit4 = {
        (r.query_id, r.vec_id)
        for r in similarity.probed_hamming_topk(
            table, q, k=K, prefix_bits=pb, radius=4
        ).collect()
    }
    assert guarded == explicit4
    truth = {
        (r.query_id, r.vec_id)
        for r in similarity.knn_hamming_topk(c, q, k=K).collect()
    }
    recall = len(guarded & truth) / len(truth)
    assert recall >= ann_recall_floor(pb, 4) - 0.25, f"recall {recall:.3f}"
