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

from .similarity import _dot, _norm


def _sq_dist(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x.cast("double") - y.cast("double")) ** 2),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _centroids_from(assigned: DataFrame, vec_col: str) -> DataFrame:
    pos = assigned.select("cid", F.posexplode(F.col(vec_col)).alias("pos", "x"))
    means = pos.groupBy("cid", "pos").agg(F.avg(F.col("x").cast("double")).alias("m"))
    return means.groupBy("cid").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s.m
        ).alias("c_vec")
    )


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
        centroids = spark.createDataFrame(
            [(c, [m for _, m in sorted(v)]) for c, v in sorted(byc.items())],
            "cid int, c_vec array<double>",
        )
    return centroids, assigned


def kmeans_grouped(
    points: DataFrame,
    k: int = 16,
    n_iter: int = 2,
    group_col: str = "j",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """Lloyd's over MANY independent problems at once (one per value of
    ``group_col``): every iteration is ONE broadcast join + ONE
    aggregate spanning all groups, so training m PQ subspace codebooks
    costs ~2 jobs/iteration instead of 2·m (measured: 16 sequential
    kmeans() calls dominated the knn_pq_adc gate at ~30 s; grouped is
    a few seconds). Per-group math is identical to ``kmeans``: init =
    the k lowest vec_ids of the group, tie-breaks to the lowest cid.
    Returns (centroids: group, cid, c_vec; assignments: group, vec_id,
    vec, cid, d2)."""
    spark = points.sparkSession
    w0 = W.partitionBy(group_col).orderBy("vec_id")
    init = (
        points.withColumn("__rk", F.row_number().over(w0))
        .filter(F.col("__rk") <= k)
        .select(
            group_col,
            F.col("__rk").alias("cid"),
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("c_vec"),
        )
    )
    cent_schema = init.schema

    def _local(df):
        # model-sized (m·k·(d/m) floats): hold it driver-side and
        # rebuild as a local relation — a broadcast join against a
        # LocalTableScan needs no checkpoint job, and the final
        # centroids' .collect() in train_pq_codebooks becomes free
        return spark.createDataFrame(df.collect(), cent_schema)

    centroids = _local(init)
    # ONE Spark job per iteration (the means collect) instead of two
    # checkpoint jobs; the k-candidate row_number window (a k-fold row
    # blowup through a sort) becomes a min_by hash aggregate with
    # map-side partial aggregation — the same (d2 asc, cid asc) row
    # selection, no sort (guide §2.3/§2.4)
    assigned = None
    for _ in range(n_iter):
        scored = points.join(F.broadcast(centroids), group_col).select(
            group_col,
            "vec_id",
            F.col(vec_col),
            "cid",
            _sq_dist(F.col(vec_col), F.col("c_vec")).alias("d2"),
        )
        assigned = (
            scored.groupBy(group_col, "vec_id")
            .agg(
                F.min_by(
                    F.struct(vec_col, "cid", "d2"),
                    F.struct(F.col("d2"), F.col("cid")),
                ).alias("__t")
            )
            .select(
                group_col,
                "vec_id",
                F.col(f"__t.{vec_col}").alias(vec_col),
                F.col("__t.cid").alias("cid"),
                F.col("__t.d2").alias("d2"),
            )
        )
        mean_rows = (
            assigned.select(
                group_col, "cid", F.posexplode(F.col(vec_col)).alias("pos", "x")
            )
            .groupBy(group_col, "cid", "pos")
            .agg(F.avg(F.col("x").cast("double")).alias("m"))
            .collect()
        )
        byc: dict[tuple, list] = {}
        for r in mean_rows:
            byc.setdefault((r[group_col], r["cid"]), []).append(
                (r["pos"], r["m"])
            )
        centroids = spark.createDataFrame(
            [
                (g, c, [m for _, m in sorted(v)])
                for (g, c), v in sorted(byc.items())
            ],
            cent_schema,
        )
    return centroids, assigned


def wcss(assignments: DataFrame) -> float:
    """Within-cluster sum of squares of the CURRENT assignment — the
    monotone objective (returns a scalar; driver-side by definition)."""
    return assignments.agg(F.sum("d2").alias("s")).collect()[0]["s"]
