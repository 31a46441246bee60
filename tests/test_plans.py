"""Physical-plan property tests (SURVEY.md §4.3): the scale guarantees are
asserted, not eyeballed — filters/projections reach the parquet scan, dim
joins go broadcast, hot paths stay inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mb_crdb_cdc_dlgen2_synapse_spark.operators import relational
from mb_crdb_cdc_dlgen2_synapse_spark.plans import (
    explain_str,
    has_broadcast_join,
    pushed_filters,
    wholestage_codegen_spans,
)
from mb_crdb_cdc_dlgen2_synapse_spark.sources.tables import load_table


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    df = relational.filter_project_lineitem(load_table(spark, sf_dir, "lineitem"))
    filters = " ".join(pushed_filters(df))
    assert "l_shipdate" in filters or "l_returnflag" in filters, filters


def test_column_pruning_reaches_scan(spark, sf_dir):
    df = relational.filter_project_lineitem(load_table(spark, sf_dir, "lineitem"))
    plan = explain_str(df)
    # ReadSchema should carry only the needed columns, never l_comment-ish width
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schema, plan
    assert "l_quantity" not in read_schema[0], read_schema[0]


def test_star_join_broadcasts_dimensions(spark, sf_dir):
    df = relational.order_revenue_by_nation(
        load_table(spark, sf_dir, "region"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
    )
    assert has_broadcast_join(df)


def test_agg_has_partial_combine(spark, sf_dir):
    df = relational.pricing_summary(load_table(spark, sf_dir, "lineitem"))
    plan = explain_str(df)
    assert plan.count("HashAggregate") >= 2, "expected partial+final hash agg"


def test_hot_path_stays_in_codegen(spark, sf_dir):
    # AQE defers codegen markers to the final plan; plan without it
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = relational.pricing_summary(load_table(spark, sf_dir, "lineitem"))
        assert wholestage_codegen_spans(df) >= 1
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_topk_uses_take_ordered(spark, sf_dir):
    df = relational.top_orders_global(load_table(spark, sf_dir, "orders"))
    assert "TakeOrderedAndProject" in explain_str(df)


def test_range_join_is_not_cartesian(spark, sf_dir):
    df = relational.lineitems_shipped_within(
        load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "lineitem")
    )
    plan = explain_str(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_no_collect_in_operator_paths():
    """Operators must never pull DATA to the driver. A collect is allowed
    only when tagged ``# plan-bounded:`` on its own line — reserved for
    probe PLANNING whose result size is bounded by metadata, not by data
    (e.g. the <=2^prefix_bits bucket ids the bucketed-ANN file-pruning
    predicate needs driver-side). Each tag must state the bound."""
    import inspect

    from mb_crdb_cdc_dlgen2_synapse_spark.operators import (
        cdc,
        dedup,
        multimodal,
        relational,
        similarity,
        textops,
    )

    for mod in (relational, cdc, dedup, similarity, textops, multimodal):
        for line in inspect.getsource(mod).splitlines():
            if ".collect()" in line:
                assert "# plan-bounded:" in line, f"{mod.__name__}: {line.strip()}"
            assert ".toPandas()" not in line, mod.__name__


def test_silver_partition_pruning_in_plan(spark, sf_dir, tmp_path):
    """S5: a filter on the hive partition column must become PartitionFilters
    (directory-level pruning), not a post-scan filter."""
    from pyspark.sql import types as T

    from mb_crdb_cdc_dlgen2_synapse_spark.operators.cdc import orders_as_ride_envelopes
    from mb_crdb_cdc_dlgen2_synapse_spark.operators.lake import (
        materialize_silver,
        read_silver,
    )
    from mb_crdb_cdc_dlgen2_synapse_spark.sources.tables import load_table

    landing = str(tmp_path / "landing")
    orders_as_ride_envelopes(load_table(spark, sf_dir, "orders")).write.mode(
        "overwrite"
    ).text(landing)
    schema = T.StructType(
        [
            T.StructField("city", T.StringType()),
            T.StructField("id", T.StringType()),
            T.StructField("rider_id", T.StringType()),
            T.StructField("revenue", T.DoubleType()),
        ]
    )
    silver = str(tmp_path / "silver")
    materialize_silver(spark, landing, schema, silver, partition_granularity="month")
    df = read_silver(spark, silver).filter(F.col("ingest_month") == "1997-03")
    plan = explain_str(df)
    assert "PartitionFilters" in plan
    m = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert "ingest_month" in m[0], m[0]


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    """Co-located join: same bucketing on both sides -> zero Exchange."""
    from mb_crdb_cdc_dlgen2_synapse_spark.operators.bucketing import (
        bucketed_join,
        write_bucketed,
    )

    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    try:
        write_bucketed(
            load_table(spark, sf_dir, "orders"), "b_orders", "o_orderkey", 8,
            sort_col="o_orderkey",
        )
        write_bucketed(
            load_table(spark, sf_dir, "lineitem"), "b_lineitem", "l_orderkey", 8,
            sort_col="l_orderkey",
        )
        joined = bucketed_join(spark, "b_orders", "b_lineitem", "o_orderkey", "l_orderkey")
        plan = explain_str(joined)
        assert "Exchange" not in plan, plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_asof_join_single_exchange_no_join_explosion(spark, sf_dir):
    """The as-of join must plan as union + one hash-partition exchange per
    input + window — never a physical join node (no BNLJ/cartesian, no
    range-join row explosion)."""
    ev = load_table(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    right = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("ts").alias("click_ts"), "value"
    )
    df = relational.asof_join(left, right, "user_id", "ts", "ts", ["click_ts", "value"])
    plan = explain_str(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert "Window" in plan


def test_text_profile_single_explode(spark, sf_dir):
    """The multi-metric text profile derives >=3 per-doc metrics (and the
    token document-frequency) from ONE tokenize/explode: exactly one
    Generate node in the physical plan — the pay-the-explode-once reuse
    pattern for corpus profiling."""
    from mb_crdb_cdc_dlgen2_synapse_spark.operators import textops
    from mb_crdb_cdc_dlgen2_synapse_spark.plans import explain_str

    df = textops.text_profile(load_table(spark, sf_dir, "documents"))
    plan = explain_str(df)
    # formatted mode lists each node once as "(n) Generate"
    import re

    gens = re.findall(r"\(\d+\) Generate", plan)
    assert len(gens) == 1, plan[:2000]
    assert len(df.columns) == 6
