"""Mergeable-sketch aggregation (Apache DataSketches, Spark SQL builtins).

The 100 TB re-aggregation pattern: compute per-group/per-partition sketches
ONCE as a map-side-combinable aggregate, persist the (few-KB, binary)
sketches as an ordinary column, then answer distinct-count and quantile
questions at ANY coarser grouping by MERGING sketches — never rescanning
the base data. A day's 100 TB scan becomes a one-time sketch build; every
later rollup (per week, per region, per cohort union) is metadata-sized.
This is exactly what `approx_count_distinct` cannot do: its HLL++ state is
internal to one aggregation and cannot be stored or re-merged by a later
query. All functions here are JVM builtins (`hll_sketch_agg`,
`hll_union_agg`, `kll_sketch_agg_double`, ...) — whole-stage-codegen'd, no
UDF, and the sketch build parallelizes per partition with a tiny shuffle
(one sketch per group per partition).

Determinism: HLL sketch construction and union are deterministic functions
of the input SET, so merged-estimate == direct-estimate holds exactly (the
equality is asserted in tests, not just within tolerance). Estimates are
still engine-specific (DuckDB's approx uses a different sketch), so the
declared query is a rows-only entry; correctness is covered by the
merge-consistency equality plus error bounds vs exact counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_group_sketches(
    df: DataFrame, keys: list[str], value_col: str, lg_k: int = 12
) -> DataFrame:
    """One HLL sketch per key group (binary column ``sketch``). lg_k=12 →
    ~1.6% relative standard error at a few KB per sketch."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_k)).alias("sketch")
    )


def hll_rollup(sketches: DataFrame, keys: list[str], out_col: str) -> DataFrame:
    """Re-aggregate persisted sketches to a coarser grouping: union-merge,
    then estimate. No base-data access."""
    merged = F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias(out_col)
    if keys:
        return sketches.groupBy(*keys).agg(merged)
    return sketches.agg(merged)


def kll_group_sketches(
    df: DataFrame, keys: list[str], value_col: str, k: int = 200
) -> DataFrame:
    """One KLL quantile sketch per key group over a double column."""
    return df.groupBy(*keys).agg(
        F.kll_sketch_agg_double(value_col, F.lit(k)).alias("kll")
    )


def kll_fold_merge(kll_col: str = "kll") -> F.Column:
    """Fold-merge a collected list of KLL sketches into one (Spark exposes
    only the pairwise ``kll_sketch_merge_double``; the fold runs over the
    #groups-sized list, not over rows — fine at any data scale because the
    list length is the group count of the PRE-aggregated sketch table)."""
    lst = F.collect_list(kll_col)
    return F.aggregate(
        F.slice(lst, 2, 2_000_000),
        F.element_at(lst, 1),
        lambda acc, s: F.kll_sketch_merge_double(acc, s),
    )


def kll_rollup_quantiles(
    sketches: DataFrame, keys: list[str], quantiles: list[float]
) -> DataFrame:
    """Quantile estimates at a coarser grouping from persisted KLL sketches."""
    merged = kll_fold_merge()
    aggs = [
        F.kll_sketch_get_quantile_double(merged, F.lit(q)).alias(
            f"q{str(q).replace('.', '_')}"
        )
        for q in quantiles
    ]
    if keys:
        return sketches.groupBy(*keys).agg(*aggs)
    return sketches.agg(*aggs)


# ---------------------------------------------------------------------------
# Count-min sketch as a RELATION (the published Cormode/Muthukrishnan CM
# sketch): approximate per-key frequencies in sublinear space, with the
# same relational-mergeability trick as operators/bloom.py — the sketch is
# a (d, w, cnt) DataFrame (depth x width counter grid), built with one
# hash aggregate, merged by cell-wise SUM (merge == rebuild over the
# union, asserted exactly), and probed with a broadcast join + MIN over
# the d rows per key. md5-derived positions keep every number
# oracle-reproducible in DuckDB; estimates can only OVERcount (never
# under — the CMS guarantee, property-tested).
#
# At 100 TB: exact per-key counts of a high-cardinality column shuffle the
# whole key set; the CMS shuffles at most depth x width cells (a few
# thousand rows at any input size) and still answers point frequency and
# heavy-hitter queries within eps = e/width of the total count.
# ---------------------------------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 1024


def _cms_pos(key_col, d: int, width: int):
    """Row-``d`` counter index for a key: md5(key || ':' || d) mod width —
    the same engine-portable arithmetic as the bloom positions."""
    return F.pmod(
        F.conv(
            F.substring(F.md5(F.concat(key_col, F.lit(f":{d}"))), 1, 8), 16, 10
        ).cast("long"),
        F.lit(width),
    )


def cms_build(
    df: DataFrame, key_col: str, depth: int = CMS_DEPTH, width: int = CMS_WIDTH
) -> DataFrame:
    """(d, w, cnt) count-min sketch over ``df[key_col]`` occurrences: one
    explode to ``depth`` rows per input row, one hash aggregate — partial
    sums combine map-side, so the shuffle carries at most depth*width
    cells regardless of input size."""
    pos = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(d).alias("d"),
                    _cms_pos(F.col(key_col), d, width).alias("w"),
                )
                for d in range(depth)
            ]
        )
    ).alias("p")
    return (
        df.select(pos)
        .select("p.d", "p.w")
        .groupBy("d", "w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Cell-wise sum — the CM sketch of the concatenated streams (merged ==
    rebuilt exactly; linearity of the counter grid)."""
    return (
        a.unionByName(b).groupBy("d", "w").agg(F.sum("cnt").alias("cnt"))
    )


def cms_estimate(
    cms: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    out_col: str = "est_n",
) -> DataFrame:
    """``keys`` + ``out_col``: the CM estimate (min over the depth rows'
    counters; missing cell = 0). The sketch side broadcasts (<= depth*width
    rows); estimates are exact-or-over, never under."""
    probe = keys.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        _cms_pos(F.col(key_col), d, width).alias("w"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("p"),
    ).select(key_col, "p.d", "p.w")
    return (
        probe.join(F.broadcast(cms), ["d", "w"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias(out_col))
    )
