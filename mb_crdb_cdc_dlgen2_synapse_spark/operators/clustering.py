"""K-means over embedding columns — the iterative-algorithm class
(SURVEY.md §2.8), built from the same declarative primitives as the rest of
the engine: broadcast centroid join for assignment, positional-explode
average for the update step.

Per iteration: one broadcast join (no corpus shuffle) + one map-side
combinable aggregate over (cluster, position).  ``localCheckpoint``
truncates the growing lineage between iterations — the standard pattern for
iterative algorithms on Spark.  Deterministic throughout: init takes the k
lowest vec_ids, distance ties break by cluster id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from ..localrel import local_df


def _sq_dist(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x.cast("double") - y.cast("double")) ** 2),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _sq_dist_expr(a: str, b: str, dims: int) -> F.Column:
    """Codegen'd twin of ``_sq_dist`` for a KNOWN dimension count: the
    identical left-fold of POWER(x - y, 2) terms built as one parsed
    expression. The HOF form's lambdas run interpreted per element —
    measured ~1.5 s for 512k 4-dim evals in the grouped PQ trainer —
    while this tree whole-stage-codegens (guide §4.1: built-ins over
    lambdas). Same subtract/power/add nodes in the same association
    order, so the result is bit-identical to ``_sq_dist``."""
    d = "CAST(0.0 AS DOUBLE)"
    for t in range(dims):
        x = (
            f"(CAST(element_at(`{a}`, {t + 1}) AS DOUBLE) - "
            f"CAST(element_at(`{b}`, {t + 1}) AS DOUBLE))"
        )
        d = f"({d} + power({x}, 2))"
    return F.expr(d)


def assign_clusters(
    embeddings: DataFrame, centroids: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """Nearest-centroid assignment (tie -> lowest cid), Arrow-batched:
    the k-bounded centroid table collects driver-side and each batch
    pays ONE numpy broadcast kernel — (B, d) against (k, d). The old
    broadcast-join + HOF form cost O(B·k·d) interpreted lambda calls
    and a k-fold row blowup through a window: measured ~5 minutes for
    a 200k×16×64 IVF bootstrap; the batch kernel is seconds. Output
    schema preserves the input's vec_id/vector types; assignment is
    partitioning-independent (per-row arithmetic only)."""
    import numpy as np
    import pandas as pd

    cents = sorted(
        (int(r["cid"]), [float(x) for x in r["c_vec"]])
        for r in centroids.collect()  # k-bounded: model, not data
    )
    if not cents:
        # empty quantizer: nothing can be assigned (callers guard, but
        # an inner-join would silently drop rows — keep that contract)
        return embeddings.select(
            "vec_id", vec_col, F.lit(None).cast("int").alias("cid"),
            F.lit(None).cast("double").alias("d2"),
        ).filter(F.lit(False))
    cids = np.asarray([c for c, _ in cents], dtype=np.int64)
    cmat = np.asarray([v for _, v in cents], dtype=np.float64)

    def kern(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            vecs = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            d2 = ((vecs[:, None, :] - cmat[None]) ** 2).sum(-1)
            j = d2.argmin(1)  # first minimum == lowest cid (cents sorted)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    vec_col: pdf[vec_col],
                    "cid": cids[j],
                    "d2": d2[np.arange(len(pdf)), j],
                }
            )

    in_fields = {f.name: f.dataType.simpleString() for f in embeddings.schema.fields}
    out_schema = (
        f"vec_id {in_fields['vec_id']}, {vec_col} {in_fields[vec_col]}, "
        "cid int, d2 double"
    )
    return embeddings.select("vec_id", vec_col).mapInPandas(kern, out_schema)


def kmeans(
    embeddings: DataFrame,
    k: int = 8,
    n_iter: int = 2,
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """Lloyd's algorithm, ``n_iter`` rounds. Returns (centroids, assignments).

    Init: the k lowest vec_ids (deterministic; k-means++ would sample by
    distance — same dataflow, more rounds).
    """
    spark = embeddings.sparkSession
    centroids = (
        embeddings.orderBy("vec_id")
        .limit(k)
        .select(
            F.row_number()
            .over(W.orderBy("vec_id"))
            .alias("cid"),
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("c_vec"),
        )
    )
    # ONE Spark job per iteration: the (cid, pos) means collect
    # driver-side (k·d doubles — model-sized, like the assignment
    # kernel's own centroid collect) and the next iteration's centroid
    # relation rebuilds as a local table. The former shape paid TWO
    # materialization jobs per iteration (assignment checkpoint +
    # centroid checkpoint); the means values are bit-identical — same
    # per-partition partial averages over the same kernel output
    # partitions, assembled in the same pos order ``_centroids_from``'s
    # array_sort used.
    assigned = None
    for _ in range(n_iter):
        assigned = assign_clusters(embeddings, centroids, vec_col)
        mean_rows = (
            assigned.select(
                "cid", F.posexplode(F.col(vec_col)).alias("pos", "x")
            )
            .groupBy("cid", "pos")
            .agg(F.avg(F.col("x").cast("double")).alias("m"))
            .collect()
        )
        byc: dict[int, list] = {}
        for r in mean_rows:
            byc.setdefault(int(r["cid"]), []).append((r["pos"], r["m"]))
        centroids = local_df(
            spark,
            [(c, [m for _, m in sorted(v)]) for c, v in sorted(byc.items())],
            "cid int, c_vec array<double>",
        )
    return centroids, assigned


def wcss(assignments: DataFrame) -> float:
    """Within-cluster sum of squares of the CURRENT assignment — the
    monotone objective (returns a scalar; driver-side by definition)."""
    return assignments.agg(F.sum("d2").alias("s")).collect()[0]["s"]
