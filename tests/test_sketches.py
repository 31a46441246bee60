"""Mergeable DataSketches aggregation (operators/sketches.py): HLL
merge-consistency (exact equality — sketch build and union are
deterministic set functions), error bounds vs exact counts, KLL rank-error
bounds, and the persist-then-merge roundtrip the 100 TB pattern relies on.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mb_crdb_cdc_dlgen2_synapse_spark.operators import sketches
from mb_crdb_cdc_dlgen2_synapse_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def orders(spark, sf_dir):
    return load_table(spark, sf_dir, "orders")


def test_hll_merged_equals_direct(spark, orders):
    """estimate(union(per-group sketches)) == estimate(direct sketch) —
    exact, not approximate: HLL build/union are deterministic."""
    sk = sketches.hll_group_sketches(
        orders, ["o_orderpriority", "o_orderstatus"], "o_custkey"
    )
    merged = {
        r["o_orderpriority"]: r["n"]
        for r in sketches.hll_rollup(sk, ["o_orderpriority"], "n").collect()
    }
    direct = {
        r["o_orderpriority"]: r["n"]
        for r in sketches.hll_rollup(
            sketches.hll_group_sketches(orders, ["o_orderpriority"], "o_custkey"),
            ["o_orderpriority"],
            "n",
        ).collect()
    }
    assert merged == direct
    # global rollup likewise
    g_merged = sketches.hll_rollup(sk, [], "n").collect()[0]["n"]
    g_direct = sketches.hll_rollup(
        sketches.hll_group_sketches(orders.withColumn("g", F.lit(1)), ["g"], "o_custkey"),
        [],
        "n",
    ).collect()[0]["n"]
    assert g_merged == g_direct


def test_hll_estimate_within_bounds(spark, orders):
    """lg_k=12 → ~1.6% RSE; assert a loose 5% envelope per priority."""
    sk = sketches.hll_group_sketches(orders, ["o_orderpriority"], "o_custkey")
    est = {
        r["o_orderpriority"]: r["n"]
        for r in sketches.hll_rollup(sk, ["o_orderpriority"], "n").collect()
    }
    exact = {
        r["o_orderpriority"]: r["n"]
        for r in orders.groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    assert est.keys() == exact.keys()
    for k, e in exact.items():
        assert abs(est[k] - e) <= max(2, 0.05 * e), (k, est[k], e)


def test_hll_sketches_survive_parquet_roundtrip(spark, orders, tmp_path):
    """The point of mergeable sketches: persist the binary column, read it
    back later, and merge — identical estimates, no base-data access."""
    sk = sketches.hll_group_sketches(
        orders, ["o_orderpriority", "o_orderstatus"], "o_custkey"
    )
    before = sketches.hll_rollup(sk, [], "n").collect()[0]["n"]
    path = str(tmp_path / "sketch_table")
    sk.write.mode("overwrite").parquet(path)
    re_read = spark.read.parquet(path)
    after = sketches.hll_rollup(re_read, [], "n").collect()[0]["n"]
    assert before == after


def test_kll_merged_quantiles_rank_error(spark, sf_dir):
    """Merged-KLL quantile estimates land within a 3%-rank envelope of the
    true quantile (k=200 → ~1.7% normalized rank error)."""
    li = load_table(spark, sf_dir, "lineitem")
    sk = sketches.kll_group_sketches(li, ["l_returnflag"], "l_extendedprice")
    got = sketches.kll_rollup_quantiles(sk, [], [0.5, 0.9]).collect()[0]
    n = li.count()
    for q, col in ((0.5, "q0_5"), (0.9, "q0_9")):
        est = got[col]
        rank = li.filter(F.col("l_extendedprice") <= est).count() / n
        assert abs(rank - q) <= 0.03, (q, est, rank)


def test_streaming_sketch_state_equals_batch_sketch(spark, sf_dir, tmp_path):
    """Micro-batch sketch-union maintenance lands on the SAME estimates as a
    one-shot batch sketch (register-max union is deterministic), and within
    5% of exact distinct counts. State = one sketch per key, not the value
    set — the bounded-state streaming distinct pattern."""
    from mb_crdb_cdc_dlgen2_synapse_spark.streaming.incremental import (
        maintain_distinct_sketches,
        read_distinct_estimates,
    )

    ev = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "json")
    ev.select("event_id", "event_type", "user_id").coalesce(4).write.mode(
        "overwrite"
    ).json(src)
    stream = (
        spark.readStream.schema("event_id long, event_type string, user_id long")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    q = maintain_distinct_sketches(
        stream,
        str(tmp_path / "sketches"),
        ["event_type"],
        "user_id",
        str(tmp_path / "ckpt"),
        app_id="t_sketch",
    )
    q.awaitTermination()
    got = {
        r["event_type"]: r["approx_distinct"]
        for r in read_distinct_estimates(
            spark, str(tmp_path / "sketches"), ["event_type"]
        ).collect()
    }
    direct = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(12))).alias("n"))
        .collect()
    }
    assert got == direct  # exact: streaming union == one-shot sketch
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for k, e in exact.items():
        assert abs(got[k] - e) <= max(2, 0.05 * e), (k, got[k], e)


def test_streaming_sketch_restart_is_exactly_once(spark, sf_dir, tmp_path):
    """Restarting the sketch-maintenance stream with the same checkpoint
    must not double-merge (txn markers skip re-delivered batches; HLL union
    is also idempotent, but the commit count proves batches landed once)."""
    from mb_crdb_cdc_dlgen2_synapse_spark.streaming.incremental import (
        maintain_distinct_sketches,
        read_distinct_estimates,
    )
    from mb_crdb_cdc_dlgen2_synapse_spark.txlog import TxTable

    ev = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "json")
    ev.select("event_id", "event_type", "user_id").coalesce(3).write.mode(
        "overwrite"
    ).json(src)

    def run():
        stream = (
            spark.readStream.schema("event_id long, event_type string, user_id long")
            .option("maxFilesPerTrigger", 1)
            .json(src)
        )
        q = maintain_distinct_sketches(
            stream,
            str(tmp_path / "sketches"),
            ["event_type"],
            "user_id",
            str(tmp_path / "ckpt"),
            app_id="t_restart",
        )
        q.awaitTermination()

    run()
    first = {
        r["event_type"]: r["approx_distinct"]
        for r in read_distinct_estimates(
            spark, str(tmp_path / "sketches"), ["event_type"]
        ).collect()
    }
    n_commits = len(TxTable(spark, str(tmp_path / "sketches")).history())
    run()  # restart: same checkpoint, no new files
    second = {
        r["event_type"]: r["approx_distinct"]
        for r in read_distinct_estimates(
            spark, str(tmp_path / "sketches"), ["event_type"]
        ).collect()
    }
    assert second == first
    assert len(TxTable(spark, str(tmp_path / "sketches")).history()) == n_commits


def test_cms_never_undercounts_and_merge_equals_rebuild(spark):
    """The two CM-sketch contracts: estimates are exact-or-over (never
    under), and cell-wise merge equals the sketch of the concatenated
    stream EXACTLY (counter linearity)."""
    import random

    from pyspark.sql import functions as F

    from mb_crdb_cdc_dlgen2_synapse_spark.operators.sketches import (
        cms_build,
        cms_estimate,
        cms_merge,
    )

    rng = random.Random(5)
    # skewed stream: heavy hitters + a long tail (collision pressure)
    stream_a = [f"k{int(rng.paretovariate(1.2)) % 500}" for _ in range(4000)]
    stream_b = [f"k{rng.randrange(2000)}" for _ in range(3000)]
    df_a = spark.createDataFrame([(k,) for k in stream_a], "key string")
    df_b = spark.createDataFrame([(k,) for k in stream_b], "key string")

    cms_a = cms_build(df_a, "key")
    merged = cms_merge(cms_a, cms_build(df_b, "key"))
    rebuilt = cms_build(df_a.unionByName(df_b), "key")
    assert merged.exceptAll(rebuilt).count() == 0
    assert rebuilt.exceptAll(merged).count() == 0

    from collections import Counter

    exact = Counter(stream_a)
    keys = spark.createDataFrame([(k,) for k in set(stream_a)], "key string")
    got = {r.key: r.est_n for r in cms_estimate(cms_a, keys, "key").collect()}
    assert all(got[k] >= n for k, n in exact.items())  # one-sided error
    # and the total overestimate stays within the eps*N envelope for most keys
    n_total = len(stream_a)
    eps = 2.718 / 1024
    within = sum(1 for k, n in exact.items() if got[k] - n <= eps * n_total)
    assert within / len(exact) > 0.95
