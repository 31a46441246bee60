"""Record linkage / entity resolution (SURVEY.md §2.8 X-family extension).

The classic LLM-corpus and warehouse problem: a dirty feed re-ingests
entities whose names carry typos, and each dirty record must be linked back
to its master. The scalable shape is the same as MinHash-LSH dedup
(operators/dedup.py): a *blocking* key turns the O(n·m) all-pairs distance
computation into a bucketed equi-join whose cost tracks bucket sizes, then an
exact distance (Levenshtein, a JVM codegen'd builtin — no UDF) verifies only
the candidates, and a per-record argmin picks the best master.

At 100 TB the pattern holds: blocking keys partition the shuffle, hot blocks
can be split with composite keys (first word + length bucket) exactly like
the df-capped shingle join, and nothing is broadcast or collected. The
distance function stays JVM-side whole-stage-codegen.

Reference parity note: the reference tutorial (/root/reference/README.md)
has no fuzzy-match stage; this extends the engine's LLM-data-pipeline
surface alongside dedup/similarity per the build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def corrupt_names(
    master: DataFrame,
    id_col: str,
    name_col: str,
    every: int = 5,
    id_offset: int = 1_000_000,
) -> DataFrame:
    """Deterministic dirty feed: every ``every``-th master row re-arrives with
    one character deleted near the END of its name (position len-2), the rest
    verbatim. Deleting near the end keeps the leading block word intact —
    mirroring real feeds where the stable prefix is what you block on.
    Offset ids model a second source system.
    """
    name, ln = F.col(name_col), F.length(name_col)
    corrupted = F.concat(
        name.substr(F.lit(1), ln - 3),
        name.substr(ln - 1, F.lit(2)),
    )
    return master.select(
        (F.col(id_col) + F.lit(id_offset)).alias("dirty_id"),
        F.when((F.col(id_col) % every) == 0, corrupted)
        .otherwise(name)
        .alias("dirty_name"),
    )


def block_link(
    dirty: DataFrame,
    master: DataFrame,
    master_id: str,
    master_name: str,
    max_dist: int = 2,
) -> DataFrame:
    """Link each dirty record to its best master candidate.

    Candidate generation: equi-join on the blocking key (first word of the
    name) — the join the shuffle partitions by, never a cross product.
    Verification: exact Levenshtein distance, kept only under ``max_dist``.
    Resolution: argmin distance per dirty record, ties broken by the lowest
    master id so the result is deterministic even when the master itself
    carries exact-duplicate names.

    Returns (dirty_id, dirty_name, master_key, dist) — unmatched dirty rows
    (no candidate within ``max_dist`` in their block) are absent, exactly as
    the SQL oracle's inner join drops them.

    The pairwise work runs on the DISTINCT-NAME relations, not the row
    relations: row-level argmin by (dist, master_key) equals name-level
    argmin by (dist, min master_key of the name) — the min over a union of
    groups is the min of the group minima — so both sides collapse to their
    name vocabularies before any Levenshtein is computed, and per-row
    results come from a cheap equi-join back on the dirty name. On the
    synthetic corpus this is 20000²-per-block -> 128-per-block (52 s ->
    sub-second at sf0.1); on a real feed it degrades gracefully to the
    blocking bound as names approach uniqueness, which is when you refine
    the blocking key (composite length buckets), not the plan shape.
    """
    first_word = lambda c: F.split_part(F.col(c), F.lit(" "), F.lit(1))  # noqa: E731
    d_names = (
        dirty.select("dirty_name")
        .distinct()
        .withColumn("block", first_word("dirty_name"))
    )
    m_names = (
        master.groupBy(F.col(master_name).alias("master_name"))
        .agg(F.min(master_id).alias("master_key"))
        .withColumn("block", first_word("master_name"))
    )
    cand = (
        d_names.join(m_names, "block")
        .withColumn("dist", F.levenshtein("dirty_name", "master_name").cast("bigint"))
        .filter(F.col("dist") <= max_dist)
    )
    w = Window.partitionBy("dirty_name").orderBy("dist", "master_key")
    best = (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("dirty_name", "master_key", "dist")
    )
    return dirty.join(best, "dirty_name").select(
        "dirty_id", "dirty_name", "master_key", "dist"
    )
