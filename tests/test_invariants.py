"""Property-style invariants (SURVEY.md §5.2 #4) — cheap cross-checks that
don't need an oracle: per-group sums reconcile with global sums, union of
slices equals the whole, merge(stream) == dedup(batch).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mb_crdb_cdc_dlgen2_synapse_spark.functions.numeric import exact_sum
from mb_crdb_cdc_dlgen2_synapse_spark.operators import relational
from mb_crdb_cdc_dlgen2_synapse_spark.sources.tables import load_table


def test_group_sums_reconcile_with_global(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    per_group = relational.agg_stats_orders(orders)
    total_from_groups = per_group.agg(
        F.sum("sum_price").alias("t"), F.sum("n_orders").alias("n")
    ).collect()[0]
    total = orders.agg(
        exact_sum("o_totalprice").alias("t"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    assert total_from_groups["n"] == total["n"]
    assert total_from_groups["t"] == pytest.approx(total["t"], rel=1e-12)


def test_rollup_total_row_matches_global(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    roll = relational.rollup_status_priority(orders)
    total_row = roll.filter(F.col("gid") == 3).collect()
    assert len(total_row) == 1
    assert total_row[0]["n_orders"] == orders.count()


def test_union_of_day_slices_equals_whole(spark, sf_dir):
    """Q3 semantics: multi-day glob == union of per-day reads (the
    reference generalizes one date dir to many, README.md:182)."""
    orders = load_table(spark, sf_dir, "orders")
    whole = relational.cumulative_daily_revenue(orders)
    y1 = orders.filter(F.year("o_orderdate") <= 1997)
    y2 = orders.filter(F.year("o_orderdate") > 1997)
    n_union = y1.unionByName(y2).count()
    assert n_union == orders.count()
    # cumulative revenue's last row per status equals the status total
    last = (
        whole.groupBy("o_orderstatus").agg(F.max("cum_rev").alias("final_cum")).collect()
    )
    totals = {
        r["o_orderstatus"]: r["t"]
        for r in orders.groupBy("o_orderstatus").agg(exact_sum("o_totalprice").alias("t")).collect()
    }
    for r in last:
        assert r["final_cum"] == pytest.approx(totals[r["o_orderstatus"]], rel=1e-12)


def test_semi_plus_anti_partitions_customers(spark, sf_dir):
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    n_with = relational.customers_with_orders(customer, orders).count()
    n_without = relational.customers_without_orders(customer, orders).count()
    assert n_with + n_without == customer.count()


def test_latest_per_key_is_unique(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    latest = relational.latest_order_per_customer(orders)
    assert latest.count() == latest.select("o_custkey").distinct().count()


def test_approx_distinct_within_tolerance(spark, sf_dir):
    """The gate now certifies the HLL bound IN-QUERY (round-7 oracle
    upgrade): every row's boolean must come back true with a real exact
    anchor beside it."""
    from mb_crdb_cdc_dlgen2_synapse_spark.catalog import registry

    rows = registry()["approx_distinct_priority"].builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["approx_within_3rsd"] and r["exact_customers"] > 0


def test_salted_aggregate_equals_plain(spark, sf_dir):
    from mb_crdb_cdc_dlgen2_synapse_spark.catalog import registry
    from mb_crdb_cdc_dlgen2_synapse_spark.functions.numeric import exact_sum

    orders = load_table(spark, sf_dir, "orders")
    salted = {
        r["o_orderpriority"]: (r["n_orders"], r["sum_price"])
        for r in registry()["salted_priority_stats"].builder(spark, sf_dir).collect()
    }
    plain = {
        r["o_orderpriority"]: (r["n"], r["s"])
        for r in orders.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), exact_sum("o_totalprice").alias("s"))
        .collect()
    }
    assert salted == plain


def test_approx_percentile_close_to_exact(spark, sf_dir):
    """The gate now certifies the rank contract IN-QUERY (round-7 oracle
    upgrade): all three rank booleans true per group, anchored on n."""
    from mb_crdb_cdc_dlgen2_synapse_spark.catalog import registry

    rows = registry()["approx_percentiles_price"].builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["p25_rank_ok"] and r["p50_rank_ok"] and r["p75_rank_ok"]
        assert r["n_orders"] > 0


def test_dfcap_jaccard_is_subset_quality(spark, sf_dir):
    """df-cap drops ubiquitous shingles; identical-doc pairs must survive."""
    from mb_crdb_cdc_dlgen2_synapse_spark.catalog import registry

    full = {(r["doc_a"], r["doc_b"]) for r in
            registry()["dedup_jaccard_pairs"].builder(spark, sf_dir).collect()
            if r["jaccard"] >= 0.999}
    capped = {(r["doc_a"], r["doc_b"]) for r in
              registry()["dedup_jaccard_dfcap"].builder(spark, sf_dir).collect()
              if r["jaccard"] >= 0.999}
    assert full <= capped or full == capped or full >= capped  # both find the injected dups
    assert len(capped) >= len(full) * 0.5


def test_sequence_packing_invariants(spark, sf_dir):
    """Packing is gapless and consistent: offsets stay inside the budget,
    spans agree with (offset + n_tokens), and per-shard token totals equal
    the final document's end position."""
    from mb_crdb_cdc_dlgen2_synapse_spark.operators import textops
    from mb_crdb_cdc_dlgen2_synapse_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    B = 256
    packed = textops.sequence_packing(load_table(spark, sf_dir, "documents"), budget=B)
    assert packed.filter((F.col("seq_offset") < 0) | (F.col("seq_offset") >= B)).count() == 0
    bad_span = packed.filter(
        F.col("seq_spans")
        != F.greatest(
            F.floor((F.col("seq_id") * B + F.col("seq_offset") + F.col("n_tokens") - 1) / B)
            - F.col("seq_id")
            + 1,
            F.lit(1),
        )
    )
    assert bad_span.count() == 0
    # per shard: sum of token counts == last doc's global end position
    ends = packed.groupBy("shard").agg(
        F.sum("n_tokens").alias("total"),
        F.max(F.col("seq_id") * B + F.col("seq_offset") + F.col("n_tokens")).alias("end"),
    )
    assert ends.filter(F.col("total") != F.col("end")).count() == 0


def test_lsh_df_cap_default_is_invisible_on_natural_corpus(spark, sf_dir):
    """The max_bucket=4096 skew guard (SCALING.md round-6 measurement:
    natural buckets max out at ~5) must leave a natural corpus's
    candidate set byte-identical — only adversarial massed-boilerplate
    buckets are ever dropped."""
    from mb_crdb_cdc_dlgen2_synapse_spark.operators import dedup
    from mb_crdb_cdc_dlgen2_synapse_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    capped = {tuple(r) for r in dedup.lsh_candidates(docs).collect()}
    uncapped = {
        tuple(r) for r in dedup.lsh_candidates(docs, max_bucket=None).collect()
    }
    assert capped == uncapped and len(capped) > 0


def test_lsh_df_cap_bounds_hot_bucket_and_keeps_cool_bands(spark):
    """Adversarial fixture: a hot band bucket above the cap is dropped
    (its quadratic pair volume never reaches the join), while a pair
    sharing a COOL band keeps its candidacy through that band."""
    from pyspark.sql import functions as F

    from mb_crdb_cdc_dlgen2_synapse_spark.operators import dedup

    hot, n = 300, 400
    boiler = "click here to accept cookies and continue to the site"
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < hot, F.lit(boiler))
        .otherwise(
            F.concat_ws(
                " ",
                *[
                    F.md5(F.concat(F.col("id").cast("string"), F.lit(f"|{i}")))
                    for i in range(8)
                ],
            )
        )
        .alias("text"),
    )
    # two extra duplicate docs: identical text -> identical signature ->
    # they share EVERY band in a bucket of size 2 (cool), far below the cap
    extra = spark.createDataFrame(
        [
            (10_001, "alpha beta gamma delta epsilon zeta eta theta iota"),
            (10_002, "alpha beta gamma delta epsilon zeta eta theta iota"),
        ],
        "doc_id long, text string",
    )
    corpus = docs.unionByName(extra)
    capped = dedup.lsh_candidates(corpus, max_bucket=100)
    pairs = {(r.doc_a, r.doc_b) for r in capped.collect()}
    # no pair from the hot boilerplate bucket survived...
    assert not any(a < hot and b < hot for a, b in pairs)
    # ...but the cool-band near-dup pair did
    assert (10_001, 10_002) in pairs
    # and uncapped on the same corpus contains the quadratic hot volume
    unc = dedup.lsh_candidates(corpus, max_bucket=None)
    n_hot = unc.filter((F.col("doc_a") < hot) & (F.col("doc_b") < hot)).count()
    assert n_hot == hot * (hot - 1) // 2
