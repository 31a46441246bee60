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
