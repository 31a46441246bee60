"""Incremental materialized-view maintenance (matview.py): every refresh
must equal a full recompute, read only delta files, and be invariant to
refresh cadence (the exact-decimal accumulation guarantee)."""

import os

import pytest
from pyspark.sql import functions as F

from mb_crdb_cdc_dlgen2_synapse_spark.matview import IncrementalAggView
from mb_crdb_cdc_dlgen2_synapse_spark.txlog import TxTable

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def orders(spark):
    from mb_crdb_cdc_dlgen2_synapse_spark.sources.tables import load_table

    return (
        load_table(spark, SF_DIR, "orders")
        .select(
            "o_orderkey",
            "o_orderpriority",
            "o_totalprice",
            (F.col("o_orderkey") % 4).alias("bucket"),
        )
        .localCheckpoint(eager=True)
    )


def _recompute(df):
    return {
        (r["o_orderpriority"],): (r["n_rows"], round(r["sum_o_totalprice"], 6))
        for r in df.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_o_totalprice"),
        )
        .collect()
    }


def _stored(view):
    return {
        (r["o_orderpriority"],): (r["n_rows"], round(r["sum_o_totalprice"], 6))
        for r in view.read().collect()
    }


def _mk(spark, tmp_path, orders):
    t = TxTable(spark, str(tmp_path / "base"))
    mv = IncrementalAggView(
        spark, t, str(tmp_path / "mv"), ["o_orderpriority"], ["o_totalprice"]
    )
    return t, mv


def test_refresh_tracks_full_recompute(spark, tmp_path, orders):
    t, mv = _mk(spark, tmp_path, orders)
    t.append(orders.filter(F.col("o_orderkey") % 2 == 0), partition_by=["bucket"])
    mv.refresh()
    assert _stored(mv) == _recompute(t.read())

    t.append(orders.filter(F.col("o_orderkey") % 2 == 1), partition_by=["bucket"])
    mv.refresh()
    assert _stored(mv) == _recompute(t.read())

    # partition overwrite: removals must be subtracted, not just adds added
    t.overwrite_partitions(
        orders.filter(F.col("bucket") == 0).withColumn(
            "o_totalprice", F.col("o_totalprice") * 2
        ),
        ["bucket"],
    )
    mv.refresh()
    assert _stored(mv) == _recompute(t.read())


def test_refresh_reads_only_delta_files(spark, tmp_path, orders):
    t, mv = _mk(spark, tmp_path, orders)
    t.append(orders.filter(F.col("o_orderkey") % 2 == 0), partition_by=["bucket"])
    first = mv.refresh()
    assert first["files_read"] == len(t.snapshot()[1])

    t.append(
        orders.filter(F.col("o_orderkey") % 100 == 1), partition_by=["bucket"]
    )
    v_before = t.version() - 1
    second = mv.refresh()
    n_total = len(t.snapshot()[1])
    n_delta = len(set(t.snapshot()[1]) - set(t.snapshot(v_before)[1]))
    assert second["files_read"] == n_delta < n_total

    # no new commits -> no-op, zero files
    assert mv.refresh()["files_read"] == 0


def test_cadence_invariance(spark, tmp_path, orders):
    """Refreshing per-commit vs once at the end gives the identical view —
    decimal accumulation makes the merge order immaterial."""
    t1, mv_each = _mk(spark, tmp_path / "a", orders)
    t2, mv_once = _mk(spark, tmp_path / "b", orders)
    steps = [
        lambda t: t.append(
            orders.filter(F.col("o_orderkey") % 2 == 0), partition_by=["bucket"]
        ),
        lambda t: t.append(
            orders.filter(F.col("o_orderkey") % 2 == 1), partition_by=["bucket"]
        ),
        lambda t: t.overwrite_partitions(
            orders.filter(F.col("bucket") == 1).withColumn(
                "o_totalprice", F.col("o_totalprice") * 3
            ),
            ["bucket"],
        ),
    ]
    for s in steps:
        s(t1)
        mv_each.refresh()
    for s in steps:
        s(t2)
    mv_once.refresh()
    # bit-identical, not approximately equal: compare stored decimals
    a = {tuple(r) for r in mv_each.read_stored().collect()}
    b = {tuple(r) for r in mv_once.read_stored().collect()}
    assert a == b


def test_compact_is_a_view_noop(spark, tmp_path, orders):
    t, mv = _mk(spark, tmp_path, orders)
    t.append(orders, partition_by=["bucket"])
    mv.refresh()
    before = _stored(mv)
    t.compact(target_files=2)
    mv.refresh()  # +all -all cancels per key
    assert _stored(mv) == before


def test_key_disappears_when_count_hits_zero(spark, tmp_path, orders):
    t, mv = _mk(spark, tmp_path, orders)
    t.append(orders, partition_by=["bucket"])
    mv.refresh()
    keys_before = {k for (k,) in _stored(mv)}
    doomed = sorted(keys_before)[0]
    t.overwrite(
        t.read().filter(F.col("o_orderpriority") != doomed).localCheckpoint(eager=True),
        partition_by=["bucket"],
    )
    mv.refresh()
    assert {k for (k,) in _stored(mv)} == keys_before - {doomed}


def test_vacuumed_delta_raises(spark, tmp_path, orders):
    t, mv = _mk(spark, tmp_path, orders)
    t.append(orders, partition_by=["bucket"])
    t.overwrite(orders.filter(F.col("bucket") == 2), partition_by=["bucket"])
    t.vacuum()  # reclaims v0's files before the view ever saw them
    mv.refresh()  # initial build: reads only the live snapshot, fine
    assert _stored(mv) == _recompute(t.read())
    # now create history the view HAS seen, vacuum it away, and expect a
    # loud failure instead of a silently stale view
    t.overwrite(orders.filter(F.col("bucket") == 3), partition_by=["bucket"])
    t.overwrite(orders.filter(F.col("bucket") == 1), partition_by=["bucket"])
    t.vacuum()
    with pytest.raises(FileNotFoundError, match="vacuum"):
        mv.refresh()
