"""K-means invariants: objective non-increasing across iterations,
deterministic assignments, full coverage of the corpus."""

from __future__ import annotations

import pytest

from mb_crdb_cdc_dlgen2_synapse_spark.operators.clustering import (
    assign_clusters,
    kmeans,
    wcss,
)
from mb_crdb_cdc_dlgen2_synapse_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def test_objective_non_increasing(spark, emb):
    objectives = []
    for n_iter in (1, 2, 3):
        _, assigned = kmeans(emb, k=6, n_iter=n_iter)
        objectives.append(wcss(assigned))
    assert objectives[1] <= objectives[0] + 1e-9
    assert objectives[2] <= objectives[1] + 1e-9


def test_deterministic_assignments(spark, emb):
    _, a1 = kmeans(emb, k=6, n_iter=2)
    _, a2 = kmeans(emb, k=6, n_iter=2)
    r1 = sorted((r["vec_id"], r["cid"]) for r in a1.collect())
    r2 = sorted((r["vec_id"], r["cid"]) for r in a2.collect())
    assert r1 == r2


def test_every_vector_assigned_once(spark, emb):
    cents, assigned = kmeans(emb, k=6, n_iter=1)
    assert assigned.count() == emb.count()
    assert assigned.select("vec_id").distinct().count() == emb.count()
    assert cents.count() == 6
    # re-assignment against returned centroids is stable
    re = assign_clusters(emb, cents)
    assert re.count() == emb.count()


def test_zorder_on_string_column_prunes(spark, tmp_path):
    """Z-order accepts STRING columns (sampled distinct cuts — the
    numeric approxQuantile path is numeric-only): after compacting by a
    string id, point/range predicates on it prune files via min/max."""
    from mb_crdb_cdc_dlgen2_synapse_spark.txlog import TxTable

    t = TxTable(spark, str(tmp_path / "t"))
    df = spark.createDataFrame(
        [(i, f"user-{i % 97:04d}") for i in range(2000)], "k int, uid string"
    )
    t.append(df.repartition(8))
    t.compact(target_files=8, z_order=["uid"])
    stats = t.file_stats()
    active = t.snapshot()[1]
    # range partitioning may leave a few empty ranges at low cardinality
    assert 2 <= len(active) <= 8
    # clustered layout: most files exclude any given uid by range
    cands = [
        f
        for f in active
        if stats[f]["min"]["uid"] <= "user-0050" <= stats[f]["max"]["uid"]
    ]
    assert len(cands) < len(active)
    got = {r.k for r in t.read(predicates=[("uid", "==", "user-0050")]).collect()}
    assert got >= {i for i in range(2000) if i % 97 == 50}
    # mixed numeric + string z-order works too
    t.compact(target_files=4, z_order=["k", "uid"])
    assert t.read().count() == 2000


def test_string_quantile_cuts_span_distribution(spark):
    """ADVICE r4: cuts must come from a SAMPLE of the distribution, not
    distinct().limit() (which returns whichever partitions finish first —
    on high-cardinality columns all cuts could land in one value range,
    collapsing the Z-order buckets). With range-partitioned input whose
    partitions are value-ordered, sampled cuts still span the full range."""
    from pyspark.sql import functions as F

    from mb_crdb_cdc_dlgen2_synapse_spark.txlog import _string_quantile_cuts

    n = 100_000
    df = (
        spark.range(n)
        .repartitionByRange(16, "id")  # partition i holds the i-th value slice
        .select(F.format_string("v%06d", F.col("id")).alias("s"))
    )
    cuts = _string_quantile_cuts(df, "s", 64)
    assert len(cuts) >= 32
    # cuts cover the low, middle, and high thirds of the value space
    assert min(cuts) < "v033000"
    assert any("v033000" < c < "v066000" for c in cuts)
    assert max(cuts) > "v066000"
    # and roughly equal-frequency: the median cut sits near the median value
    mid = sorted(cuts)[len(cuts) // 2]
    assert "v030000" < mid < "v070000"


def test_lloyd_means_match_avg_aggregate_form(spark, emb):
    """The fused partial-sum Lloyd update (_lloyd_means, r13) must
    reproduce the former posexplode+avg means: identical cluster
    membership (same assignment kernel), identical counts, and means
    equal up to cross-partition float-add reassociation (the invariant
    the k-means contract certifies around)."""
    import numpy as np
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from mb_crdb_cdc_dlgen2_synapse_spark.operators.clustering import (
        _lloyd_means,
    )

    cents = (
        emb.orderBy("vec_id")
        .limit(8)
        .select(
            F.row_number().over(W.orderBy("vec_id")).alias("cid"),
            F.transform(F.col("embedding"), lambda x: x.cast("double")).alias(
                "c_vec"
            ),
        )
    )
    got = dict(_lloyd_means(emb, cents, "embedding"))
    want_rows = (
        assign_clusters(emb, cents)
        .select("cid", F.posexplode(F.col("embedding")).alias("pos", "x"))
        .groupBy("cid", "pos")
        .agg(F.avg(F.col("x").cast("double")).alias("m"))
        .collect()
    )
    want: dict[int, list] = {}
    for r in want_rows:
        want.setdefault(int(r["cid"]), []).append((r["pos"], r["m"]))
    want = {c: [m for _, m in sorted(v)] for c, v in want.items()}
    assert set(got) == set(want)
    for c in want:
        assert np.allclose(got[c], want[c], rtol=0, atol=1e-12), c
