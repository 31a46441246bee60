"""Stream-stream / stream-static joins (streaming/joins.py): the streaming
interval join must reproduce the equivalent batch range join exactly on a
bounded replay, and enrichment must broadcast without shuffling the stream."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mb_crdb_cdc_dlgen2_synapse_spark.sources.tables import load_table
from mb_crdb_cdc_dlgen2_synapse_spark.streaming.joins import enrich_stream, interval_join

from test_streaming_windows import _run_to_memory, event_stream  # noqa: F401


def _split(events):
    views = events.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").alias("view_id")
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id")
    )
    return views, purchases


def test_interval_join_matches_batch_range_join(spark, event_stream):  # noqa: F811
    stream, events = event_stream
    sviews, spurch = _split(stream)
    joined = interval_join(
        sviews.withColumnRenamed("view_id", "event_id"),
        spurch.withColumnRenamed("purchase_id", "event_id_r"),
        key="user_id",
        max_delay="30 minutes",
    ).select("user_id", "event_id", "event_id_r")
    got = _run_to_memory(spark, joined, "ss_join", mode="append").collect()

    bviews, bpurch = _split(events)
    exp = (
        bviews.alias("v")
        .join(
            bpurch.alias("p"),
            (F.col("v.user_id") == F.col("p.user_id"))
            & (F.col("p.ts") >= F.col("v.ts"))
            & (F.col("p.ts") <= F.col("v.ts") + F.expr("INTERVAL 30 minutes")),
        )
        .select(F.col("v.user_id"), F.col("v.view_id"), F.col("p.purchase_id"))
        .collect()
    )
    assert len(exp) > 0  # fixture actually exercises the join
    g = sorted((r.user_id, r.event_id, r.event_id_r) for r in got)
    e = sorted((r.user_id, r.view_id, r.purchase_id) for r in exp)
    assert g == e


def test_enrich_stream_broadcasts_dim(spark, event_stream, sf_dir):  # noqa: F811
    stream, events = event_stream
    dim = spark.createDataFrame(
        [("view", "browse"), ("click", "browse"), ("purchase", "convert")],
        "event_type string, funnel_stage string",
    )
    enriched = enrich_stream(stream, dim, "event_type")
    got = _run_to_memory(spark, enriched, "enriched", mode="append")
    assert got.count() == events.count()
    assert got.filter(F.col("funnel_stage").isNull()).count() == (
        events.filter(~F.col("event_type").isin("view", "click", "purchase")).count()
    )


def test_interval_join_outer_emits_unmatched_left(spark, event_stream):  # noqa: F811
    """Left-outer stream-stream join on a bounded replay: matched pairs equal
    the batch left range join exactly; unmatched views are emitted with NULL
    purchase ids once the watermark CLOSES them. Views inside the final
    ``max_delay + watermark`` horizon of the stream are legitimately
    withheld — no further batch advances the watermark past them — so the
    assertion is: emitted ⊆ batch expectation, and every unmatched view the
    final watermark provably closed is present."""
    from datetime import timedelta

    from mb_crdb_cdc_dlgen2_synapse_spark.streaming.joins import interval_join_outer

    stream, events = event_stream
    sviews, spurch = _split(stream)
    joined = interval_join_outer(
        sviews.withColumnRenamed("view_id", "event_id"),
        spurch.withColumnRenamed("purchase_id", "event_id_r"),
        key="user_id",
        max_delay="30 minutes",
        left_watermark="1 minute",
        right_watermark="1 minute",
    ).select("user_id", "event_id", "event_id_r")
    got = _run_to_memory(spark, joined, "ss_ljoin", mode="append").collect()

    bviews, bpurch = _split(events)
    exp = (
        bviews.alias("v")
        .join(
            bpurch.alias("p"),
            (F.col("v.user_id") == F.col("p.user_id"))
            & (F.col("p.ts") >= F.col("v.ts"))
            & (F.col("p.ts") <= F.col("v.ts") + F.expr("INTERVAL 30 minutes")),
            "left",
        )
        .select(
            F.col("v.user_id"), F.col("v.view_id"), F.col("v.ts"), F.col("p.purchase_id")
        )
        .collect()
    )
    n_unmatched = sum(1 for r in exp if r.purchase_id is None)
    assert n_unmatched > 0  # fixture exercises the outer half

    # final global watermark = min over both inputs of (max event time - 1m)
    max_v = max(r.ts for r in bviews.collect())
    max_p = max(r.ts for r in bpurch.collect())
    wm = min(max_v, max_p) - timedelta(minutes=1)

    g = sorted((r.user_id, r.event_id, r.event_id_r) for r in got)
    e_all = sorted((r.user_id, r.view_id, r.purchase_id) for r in exp)
    # nothing spurious, no duplicates
    assert set(g) <= set(e_all) and len(g) == len(set(g))
    # matched pairs are exact
    g_matched = [t for t in g if t[2] is not None]
    e_matched = [t for t in e_all if t[2] is not None]
    assert g_matched == e_matched
    # every unmatched view the final watermark closed (with a 2-minute margin
    # for trigger boundary semantics) must have been emitted
    must_emit = sorted(
        (r.user_id, r.view_id, None)
        for r in exp
        if r.purchase_id is None
        and r.ts + timedelta(minutes=32) < wm
    )
    assert len(must_emit) > 0
    g_unmatched = set(t for t in g if t[2] is None)
    missing = [t for t in must_emit if t not in g_unmatched]
    assert missing == []
