"""Single-pass linear probe (operators/linear.py): exact sufficient
statistics, SQL-shaped 1-feature ridge, and the exact-rational general
solve."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mb_crdb_cdc_dlgen2_synapse_spark.operators import linear


def _df(spark, rows, schema="x1 long, x2 long, y long"):
    return spark.createDataFrame(rows, schema)


def test_suff_stats_exact_and_partition_invariant(spark):
    rows = [(i, (i * 7) % 13, 3 * i + 2) for i in range(200)]
    df = _df(spark, rows)
    s1 = linear.suff_stats(df.repartition(1), ["x1", "x2"], "y")
    s32 = linear.suff_stats(df.repartition(32), ["x1", "x2"], "y")
    assert s1 == s32  # exact ints: partitioning cannot move a bit
    assert s1["n"] == 200
    assert s1["sx"][0] == sum(r[0] for r in rows)
    assert s1["sxx"][(0, 1)] == sum(r[0] * r[1] for r in rows)
    assert s1["sxy"][1] == sum(r[1] * r[2] for r in rows)


def test_ridge_fit_recovers_exact_linear_relation(spark):
    # y = 5 + 2*x1 - 3*x2 exactly: the unpenalized fit must recover it
    rows = [(i, (i * i) % 17, 5 + 2 * i - 3 * ((i * i) % 17)) for i in range(60)]
    beta = linear.ridge_fit(_df(spark, rows), ["x1", "x2"], "y", l2=0)
    assert beta == pytest.approx([5.0, 2.0, -3.0], abs=1e-12)


def test_ridge_fit_matches_numpy_normal_equations(spark):
    rng = np.random.RandomState(7)
    X = rng.randint(0, 1000, size=(300, 3))
    y = rng.randint(0, 5000, size=300)
    rows = [tuple(int(v) for v in r) + (int(t),) for r, t in zip(X, y)]
    df = _df(spark, rows, "x1 long, x2 long, x3 long, y long")
    l2 = 50
    beta = linear.ridge_fit(df, ["x1", "x2", "x3"], "y", l2=l2)
    Xa = np.hstack([np.ones((300, 1)), X.astype(float)])
    A = Xa.T @ Xa + np.diag([0.0, l2, l2, l2])
    want = np.linalg.solve(A, Xa.T @ y.astype(float))
    assert beta == pytest.approx(list(want), rel=1e-9)


def test_ridge_fit_collinear_refuses_without_l2_solves_with(spark):
    rows = [(i, 2 * i, i + 1) for i in range(50)]  # x2 = 2*x1 exactly
    df = _df(spark, rows)
    with pytest.raises(ValueError, match="collinear"):
        linear.ridge_fit(df, ["x1", "x2"], "y", l2=0)
    beta = linear.ridge_fit(df, ["x1", "x2"], "y", l2=10)
    assert len(beta) == 3 and all(np.isfinite(beta))


def test_simple_ridge_matches_sql_float_shape(spark):
    rows = [(i, 0, 3 * i + 7 + (i % 5)) for i in range(100)]
    df = _df(spark, rows)
    s = linear.suff_stats(df, ["x1"], "y")
    slope, icept = linear.simple_ridge(s, l2=1000)
    n, sx, sy = s["n"], s["sx"][0], s["sy"]
    sxx, sxy = s["sxx"][(0, 0)], s["sxy"][0]
    assert slope == float(n * sxy - sx * sy) / float(n * sxx - sx * sx + 1000)
    assert icept == (float(sy) - slope * float(sx)) / float(n)
    # scoring is a pure projection: no shuffle in the plan
    pred = linear.score(df, ["x1"], [icept, slope])
    plan = df.select(pred.alias("p"))._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
