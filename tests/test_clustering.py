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
