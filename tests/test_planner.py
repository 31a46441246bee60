"""Metadata-driven plan construction (plans/planner.py — SURVEY §4.2's
custom logic candidates): size estimates come from the txlog commit log
only, and the join/operator choices they drive are asserted on the
physical plan, not just returned."""

from __future__ import annotations

from pyspark.sql import functions as F

from mb_crdb_cdc_dlgen2_synapse_spark.plans import (
    choose_dedup_strategy,
    choose_join_strategy,
    choose_knn_strategy,
    explain_str,
    planned_equi_join,
    tx_size_estimate,
)
from mb_crdb_cdc_dlgen2_synapse_spark.txlog import TxTable


def _mk(spark, path, n, part=False):
    t = TxTable(spark, path)
    df = spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") % 10).alias("part"),
        F.concat(F.lit("v"), F.col("id")).alias("v"),
    )
    t.append(df, partition_by=["part"] if part else None)
    return t


def test_estimate_matches_log_metadata_exactly(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"), 1000)
    est = tx_size_estimate(t)
    assert est["rows"] == t.count_rows() == 1000
    assert est["bytes"] > 0
    assert est["files"] == len(t.snapshot()[1])


def test_estimate_respects_predicate_pruning_and_dvs(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"), 1000, part=True)
    full = tx_size_estimate(t)
    pruned = tx_size_estimate(t, predicates=[("part", "==", "3")])
    assert pruned["files"] < full["files"]
    assert pruned["rows"] == 100  # file-exact here: one partition dir
    t.delete_where([("part", "==", "3")], mode="dv")
    assert tx_size_estimate(t)["rows"] == 900  # DV counts subtracted


def test_planned_join_broadcasts_the_small_side(spark, tmp_path):
    dim = _mk(spark, str(tmp_path / "dim"), 50)
    fact = _mk(spark, str(tmp_path / "fact"), 5000)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out, decision = planned_equi_join(
            fact.read(),
            dim.read().select("k", F.col("v").alias("dim_v")),
            "k",
            tx_size_estimate(fact),
            tx_size_estimate(dim),
        )
        # Catalyst's own threshold is OFF: the BroadcastHashJoin below is
        # forced by OUR metadata decision, nothing else
        assert decision["strategy"] == "broadcast_right"
        assert "BroadcastHashJoin" in explain_str(out)
        assert out.count() == 50

        out2, decision2 = planned_equi_join(
            fact.read(),
            dim.read().select("k", F.col("v").alias("dim_v")),
            "k",
            tx_size_estimate(fact),
            tx_size_estimate(dim),
            threshold_bytes=1,  # nothing fits: fall back to shuffle join
        )
        assert decision2["strategy"] == "shuffle"
        assert "BroadcastHashJoin" not in explain_str(out2)
        assert out2.count() == 50
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_operator_strategy_choosers(spark):
    assert choose_dedup_strategy({"rows": 10})["strategy"] == "shingle_buckets"
    assert choose_dedup_strategy({"rows": 10**7})["strategy"] == "minhash_lsh"
    assert choose_knn_strategy({"rows": 10})["strategy"] == "brute_force"
    assert choose_knn_strategy({"rows": 10**8})["strategy"] == "hamming_bucketed"
    assert choose_join_strategy({"bytes": 10}, {"bytes": 10**12})[
        "strategy"
    ] == "broadcast_left"


def test_size_estimate_prunes_on_renamed_partition_column(spark, tmp_path):
    """tx_size_estimate speaks LOGICAL names: after a partition-column
    rename, predicates on the new name still prune files (the raw
    physical-keyed stats would silently stop pruning and inflate the
    estimate)."""
    t = _mk(spark, str(tmp_path / "t"), 1000, part=True)
    t.rename_column("part", "bucket")
    full = tx_size_estimate(t)
    pruned = tx_size_estimate(t, predicates=[("bucket", "==", 3)])
    assert pruned["files"] < full["files"]
    assert pruned["rows"] == t.read(predicates=[("bucket", "==", 3)]).count()
