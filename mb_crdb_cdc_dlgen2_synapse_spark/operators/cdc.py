"""CDC semantics (SURVEY.md §2.7, §2.4 J5): envelope construction, the
reference's flagship raw-NDJSON analytics query, at-least-once dedup, keyed
latest-state merge, and tombstone handling — batch forms here (oracle-able);
streaming forms in ``streaming/``.

The flagship replays /root/reference/README.md:173-192: revenue per city over
changefeed envelope lines, via whole-line scan + JSON path extraction + cast
+ group-aggregate — exactly the `OPENROWSET ... JSON_VALUE ... SUM(CAST(...))
GROUP BY` pipeline, Spark-natively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from ..functions.numeric import exact_sum
from ..sources.changegen import CITIES


def orders_as_ride_envelopes(orders: DataFrame, keep_month: bool = False) -> DataFrame:
    """Derive a movr-``rides``-shaped changefeed line stream from ``orders``.

    Deterministic envelope per order: city drawn from the 9 movr cities
    (synapse-img1.png shows 9 groups), revenue = o_totalprice, ``updated`` =
    epoch-nanos of o_orderdate as a decimal string (README.md:137-138 format).
    Returns one string column ``line`` — the same shape ``spark.read.text``
    yields from real landed NDJSON. With ``keep_month`` an ``ingest_month``
    routing column (from o_orderdate) is kept so callers can land the lines
    under date-named directories, the reference's lake layout (README.md:182).
    """
    city = F.element_at(
        F.array(*[F.lit(c) for c in CITIES]),
        (F.col("o_orderkey") % len(CITIES) + 1).cast("int"),
    )
    after = F.struct(
        city.alias("city"),
        F.col("o_orderkey").cast("string").alias("id"),
        F.col("o_custkey").cast("string").alias("rider_id"),
        F.col("o_totalprice").alias("revenue"),
    )
    envelope = F.struct(
        after.alias("after"),
        F.array(city, F.col("o_orderkey").cast("string")).alias("key"),
        F.concat(
            (F.unix_timestamp("o_orderdate") * F.lit(1_000_000_000)).cast("string"),
            F.lit(".0000000000"),
        ).alias("updated"),
    )
    # CPU-bound JSON encoding: spread small single-file inputs across cores
    orders = orders.repartition(orders.sparkSession.sparkContext.defaultParallelism)
    cols = [F.to_json(envelope).alias("line")]
    if keep_month:
        cols.append(F.date_format("o_orderdate", "yyyy-MM").alias("ingest_month"))
    return orders.select(*cols)


def revenue_by_city_from_lines(lines: DataFrame, line_col: str = "line") -> DataFrame:
    """The reference's flagship query over raw envelope lines
    (README.md:173-192): JSON_VALUE city / revenue -> CAST -> SUM -> GROUP BY.

    ``get_json_object`` returns NULL for missing paths — including DELETE
    tombstones where ``after`` is null — matching JSON_VALUE semantics, so
    tombstone lines drop out of the aggregate exactly as in Synapse.
    """
    return (
        lines.select(
            F.get_json_object(F.col(line_col), "$.after.city").alias("city"),
            F.get_json_object(F.col(line_col), "$.after.revenue")
            .cast("double")
            .alias("revenue"),
        )
        .filter(F.col("city").isNotNull())
        .groupBy("city")
        .agg(exact_sum("revenue").alias("total_revenue"))
    )


# --------------------------------------------------------------------------
# At-least-once dedup (Q4) and keyed merge (J5/T6/T7) — batch forms
# --------------------------------------------------------------------------

def dedup_events(changes: DataFrame, key_cols: list[str], ts_col: str) -> DataFrame:
    """Q4: collapse exact duplicate re-emissions of (key, ts).

    Changefeeds are at-least-once: the same envelope may be emitted twice.
    A (key, commit-ts) pair identifies an emission uniquely, so dropDuplicates
    on it restores effectively-once. Streaming twin:
    ``dropDuplicatesWithinWatermark`` (streaming/ingest.py).
    """
    return changes.dropDuplicates(key_cols + [ts_col])


def latest_state(
    changes: DataFrame,
    key_cols: list[str],
    ts_col: str,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """J5/T6: latest event per key wins — ranking-window merge.

    At scale this is one shuffle on the key; with the landing zone bucketed
    by key the shuffle disappears entirely. Tombstones survive into the
    output (caller filters / MERGE deletes them — see ``merge_full_image``).
    """
    order = [F.col(ts_col).desc()] + [F.col(c).desc() for c in (tiebreak_cols or [])]
    w = W.partitionBy(*key_cols).orderBy(*order)
    return (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def merge_full_image(
    changes: DataFrame,
    key_cols: list[str],
    ts_col: str,
    image_col: str = "after",
) -> DataFrame:
    """T6+T7: materialize current state from full-image CDC events.

    latest-per-key, then drop keys whose final image is a tombstone
    (``after IS NULL`` — the changefeed DELETE encoding, FIXTURES.md §B).
    Equivalent to a Delta ``MERGE ... WHEN MATCHED AND after IS NULL THEN
    DELETE`` executed over the whole history in one pass.
    """
    last = latest_state(changes, key_cols, ts_col)
    return last.filter(F.col(image_col).isNotNull()).select(key_cols + [ts_col, image_col])


# --------------------------------------------------------------------------
# Event-time analytics over the events stream table (T4/T5 batch forms)
# --------------------------------------------------------------------------

def daily_event_rollup(events: DataFrame) -> DataFrame:
    """T4 batch form: tumbling 1-day window aggregate by event type."""
    return (
        events.groupBy(
            F.col("ts").cast("date").alias("event_date"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            exact_sum("value").alias("sum_value"),
        )
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """T5 batch form: gap-based sessionization via lag + running count.

    A new session starts when the gap to the previous event (per user)
    exceeds ``gap_minutes``.  One shuffle on user_id; both windows share the
    same partitioning so Catalyst plans a single exchange.
    """
    w = W.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    gap_s = gap_minutes * 60
    with_flag = events.withColumn(
        "new_session",
        (
            F.col("ts").cast("double")
            - F.lag(F.col("ts").cast("double")).over(w)
            > gap_s
        )
        .cast("int"),
    ).withColumn(
        "new_session", F.coalesce(F.col("new_session"), F.lit(1))
    )
    with_id = with_flag.withColumn(
        "session_seq",
        F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    return (
        with_id.groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.max(F.col("ts").cast("double")) - F.min(F.col("ts").cast("double"))).alias(
                "duration_s"
            ),
        )
    )


def session_stats(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Per-user session summary built on ``sessionize``."""
    s = sessionize(events, gap_minutes)
    return s.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.avg("n_events").alias("avg_events_per_session"),
        F.max("duration_s").alias("max_duration_s"),
    )


def route_dead_letters(
    lines: DataFrame,
    after_schema,
    line_col: str = "line",
    required: tuple[str, ...] = ("updated",),
) -> DataFrame:
    """Dead-letter routing for at-least-once changefeed landing zones: every
    raw NDJSON line is parsed against the envelope schema with a
    ``_corrupt_record`` capture column (PERMISSIVE mode yields an all-null
    struct for malformed input, so NULL-struct checks alone cannot tell
    "corrupt" from "all fields absent" — the capture column can). Each line
    gets a ``dlq_reason``:

    - ``malformed_json`` — the parser captured the raw line;
    - ``missing_<field>`` — valid JSON lacking a ``required`` envelope field
      (producer drift / truncated writers);
    - NULL — a well-formed envelope (the processable stream).

    Callers split on ``dlq_reason IS NULL``: the good side feeds the normal
    silver pipeline, the DLQ side lands raw lines + reason for replay —
    nothing is dropped silently, the at-least-once contract a 100 TB
    landing zone needs. Pure JVM path (from_json), one pass, no UDF."""
    from pyspark.sql import types as T

    from ..sources.ndjson import cdc_envelope_schema

    schema = cdc_envelope_schema(after_schema).add(
        T.StructField("_corrupt_record", T.StringType(), True)
    )
    parsed = F.from_json(
        F.col(line_col),
        schema,
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt_record"},
    )
    reason = F.when(
        parsed["_corrupt_record"].isNotNull(), F.lit("malformed_json")
    )
    for field in required:
        reason = reason.when(
            parsed[field].isNull(), F.lit(f"missing_{field}")
        )
    return lines.withColumn("envelope", parsed).withColumn(
        "dlq_reason", reason
    )
