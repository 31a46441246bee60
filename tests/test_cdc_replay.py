"""Golden CDC replay (SURVEY.md §5.2 #2): the seeded changefeed fixture has
an independently-computed expected final state; the engine's dedup + merge +
tombstone pipeline must reproduce it exactly — batch and streaming forms.

This covers the semantics the DuckDB oracle can't: at-least-once duplicates,
out-of-order/late files, per-key ordering, DELETE tombstones, availableNow
streaming with checkpoint restart.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mb_crdb_cdc_dlgen2_synapse_spark.operators.cdc import (
    dedup_events,
    merge_full_image,
    revenue_by_city_from_lines,
)
from mb_crdb_cdc_dlgen2_synapse_spark.sources.changegen import generate_changefeed
from mb_crdb_cdc_dlgen2_synapse_spark.sources.ndjson import (
    read_raw_lines,
    read_typed_envelopes,
)
from mb_crdb_cdc_dlgen2_synapse_spark.streaming.ingest import (
    changefeed_stream,
    dedup_stream,
    materialize_latest_state,
    stream_to_lake,
)

AFTER_SCHEMA = T.StructType(
    [
        T.StructField("city", T.StringType()),
        T.StructField("id", T.StringType()),
        T.StructField("rider_id", T.StringType()),
        T.StructField("revenue", T.DoubleType()),
    ]
)


@pytest.fixture(scope="module")
def fixture(tmp_path_factory):
    landing = str(tmp_path_factory.mktemp("cdc") / "landing")
    return generate_changefeed(landing, n_rows=400, seed=42)


def _expected_df(spark, fixture):
    return spark.createDataFrame(fixture.expected_state)


def test_fixture_has_failure_modes(fixture):
    assert fixture.n_duplicates > 0
    assert fixture.n_deletes > 0
    assert fixture.n_updates > 0
    assert len(fixture.files) > 1
    assert len(fixture.expected_state) == 400 - fixture.n_deletes


def test_batch_merge_reproduces_expected_state(spark, fixture):
    env = read_typed_envelopes(spark, f"{fixture.landing_dir}/*", AFTER_SCHEMA)
    deduped = dedup_events(env, ["key"], "updated")
    state = merge_full_image(deduped, ["key"], "updated")
    got = (
        state.select(
            F.col("after.id").alias("id"),
            F.col("after.city").alias("city"),
            F.col("after.rider_id").alias("rider_id"),
            F.col("after.revenue").alias("revenue"),
        )
        .orderBy("id")
        .collect()
    )
    exp = sorted(fixture.expected_state, key=lambda r: r["id"])
    assert len(got) == len(exp)
    for g, e in zip(got, exp):
        assert g["id"] == e["id"]
        assert g["city"] == e["city"]
        assert g["rider_id"] == e["rider_id"]
        assert g["revenue"] == pytest.approx(e["revenue"])


def test_dedup_collapses_exact_duplicates(spark, fixture):
    env = read_typed_envelopes(spark, f"{fixture.landing_dir}/*", AFTER_SCHEMA)
    n_raw = env.count()
    n_dedup = dedup_events(env, ["key"], "updated").count()
    assert n_raw == fixture.n_events
    assert n_raw - n_dedup == fixture.n_duplicates


def test_streaming_merge_matches_batch(spark, fixture, tmp_path):
    stream = changefeed_stream(spark, fixture.landing_dir, AFTER_SCHEMA)
    assert stream.isStreaming
    state_dir = str(tmp_path / "state")
    q = materialize_latest_state(
        stream, state_dir, str(tmp_path / "ckpt")
    )
    q.awaitTermination()
    got = (
        spark.read.parquet(state_dir)
        .select(F.col("after.id").alias("id"), F.col("after.revenue").alias("revenue"))
        .orderBy("id")
        .collect()
    )
    exp = sorted(fixture.expected_state, key=lambda r: r["id"])
    assert [g["id"] for g in got] == [e["id"] for e in exp]
    assert [g["revenue"] for g in got] == pytest.approx([e["revenue"] for e in exp])


def test_streaming_restart_is_idempotent(spark, fixture, tmp_path):
    """T8: re-running with the same checkpoint must not change the state."""
    state_dir = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    for _ in range(2):
        stream = changefeed_stream(spark, fixture.landing_dir, AFTER_SCHEMA)
        q = materialize_latest_state(stream, state_dir, ckpt)
        q.awaitTermination()
    got = spark.read.parquet(state_dir)
    assert got.count() == len(fixture.expected_state)


def test_stream_to_lake_preserves_rows_and_partitions(spark, fixture, tmp_path):
    stream = dedup_stream(changefeed_stream(spark, fixture.landing_dir, AFTER_SCHEMA))
    out = str(tmp_path / "bronze")
    q = stream_to_lake(stream, out, str(tmp_path / "ckpt"))
    q.awaitTermination()
    bronze = spark.read.parquet(out)
    # dedup within watermark collapsed the duplicate re-emissions
    assert bronze.count() == fixture.n_events - fixture.n_duplicates
    # date-partitioned layout (ingest_date=... dirs), mirroring README.md:182
    assert any(d.startswith("ingest_date=") for d in os.listdir(out))


def test_flagship_rawline_equals_merged_state_revenue(spark, fixture):
    """The reference's query over raw lines counts every version of a row;
    over the merged state it matches the golden totals exactly."""
    lines = read_raw_lines(spark, [f + "" for f in [fixture.landing_dir + "/*/*.ndjson"]])
    raw_totals = revenue_by_city_from_lines(lines)
    assert raw_totals.count() == 9  # all 9 movr cities present
    exp_by_city = {}
    for r in fixture.expected_state:
        exp_by_city[r["city"]] = exp_by_city.get(r["city"], 0.0) + r["revenue"]
    env = read_typed_envelopes(spark, f"{fixture.landing_dir}/*", AFTER_SCHEMA)
    state = merge_full_image(dedup_events(env, ["key"], "updated"), ["key"], "updated")
    got = {
        r["city"]: r["total"]
        for r in state.groupBy(F.col("after.city").alias("city"))
        .agg(F.sum("after.revenue").alias("total"))
        .collect()
    }
    assert set(got) == set(exp_by_city)
    for c in got:
        assert got[c] == pytest.approx(exp_by_city[c])


def test_csv_compat_reader_equals_text_reader(spark, fixture):
    """The OPENROWSET FORMAT='csv' 0x0b trick (README.md:183-190) and the
    plain text source must produce identical line relations."""
    from mb_crdb_cdc_dlgen2_synapse_spark.sources.ndjson import (
        read_raw_lines_csv_compat,
    )

    glob = f"{fixture.landing_dir}/*/*.ndjson"
    a = read_raw_lines(spark, glob)
    b = read_raw_lines_csv_compat(spark, glob)
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # and the flagship query agrees over both
    ra = {t["city"]: t["total_revenue"] for t in revenue_by_city_from_lines(a).collect()}
    rb = {t["city"]: t["total_revenue"] for t in revenue_by_city_from_lines(b).collect()}
    assert ra == rb
