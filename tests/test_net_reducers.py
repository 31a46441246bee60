"""r12 optimization: the CDF net-change reducers were rewritten from
row_number windows (+ a full-outer join for the doc twin) into single
min_by/max_by hash aggregates. These tests pin the rewrite to the
original window-based semantics on a crafted batch covering every case:
multi-version keys, update rendered as delete+insert at one version,
insert-then-delete inside the range (must vanish from the doc-image
relation), delete-only keys, insert-only keys, and NULL payloads."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from mb_crdb_cdc_dlgen2_synapse_spark.operators.ann_index import _net_changes
from mb_crdb_cdc_dlgen2_synapse_spark.operators.bm25_index import _doc_net_images

ROWS = [
    # (key, payload, _change_type, _commit_version)
    (1, "v1", "insert", 1),              # plain insert
    (2, "v1", "insert", 1),              # update at v3: delete+insert
    (2, "v1", "delete", 3),
    (2, "v3", "insert", 3),
    (3, "old", "delete", 2),             # true delete of pre-range state
    (4, "born", "insert", 2),            # insert-then-delete inside range
    (4, "born", "delete", 4),
    (5, None, "delete", 1),              # NULL payload delete
    (5, "v5", "insert", 6),
    (6, "a", "insert", 1),               # multi-update chain
    (6, "a", "delete", 2),
    (6, "b", "insert", 2),
    (6, "b", "delete", 5),
    (6, "c", "insert", 5),
]


def _changes(spark, key_col, payload_col):
    return spark.createDataFrame(
        ROWS,
        f"{key_col} long, {payload_col} string, _change_type string, "
        "_commit_version long",
    )


def test_net_changes_equals_window_reference(spark):
    changes = _changes(spark, "vec_id", "embedding")
    w = W.partitionBy("vec_id").orderBy(
        F.col("_commit_version").desc(),
        (F.col("_change_type") == "insert").cast("int").desc(),
    )
    ref = (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    got = _net_changes(changes)
    assert got.columns == changes.columns
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, ref.collect())
    )


def test_doc_net_images_equals_window_join_reference(spark):
    changes = _changes(spark, "doc_id", "text")
    wp = W.partitionBy("doc_id")
    first = (
        changes.withColumn(
            "rn",
            F.row_number().over(
                wp.orderBy(
                    F.col("_commit_version").asc(), F.col("_change_type").asc()
                )
            ),
        )
        .filter((F.col("rn") == 1) & (F.col("_change_type") == "delete"))
        .select("doc_id", F.col("text").alias("old_text"))
    )
    last = (
        changes.withColumn(
            "rn",
            F.row_number().over(
                wp.orderBy(
                    F.col("_commit_version").desc(), F.col("_change_type").desc()
                )
            ),
        )
        .filter((F.col("rn") == 1) & (F.col("_change_type") == "insert"))
        .select("doc_id", F.col("text").alias("new_text"))
    )
    ref = first.join(last, "doc_id", "full_outer")
    got = _doc_net_images(changes, "text")
    assert got.columns == ["doc_id", "old_text", "new_text"]
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, ref.collect())
    )
    # the lived-and-died-inside-the-range doc must not appear at all
    assert got.filter(F.col("doc_id") == 4).count() == 0


def test_doc_net_images_single_exchange(spark):
    """The rewrite's point: one exchange, no window sort, no join."""
    plan = _doc_net_images(
        _changes(spark, "doc_id", "text"), "text"
    )._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan and "Window" not in plan
