"""Randomized differential testing: seeded random predicate/projection
queries executed by BOTH Spark and DuckDB over the same parquet, results
compared exactly. Complements the per-query oracle gate with coverage of
predicate shapes nobody hand-wrote (AND/OR/NOT nesting, null-prone
comparisons, string prefixes, date bounds)."""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F

COLS = {
    "l_quantity": ("num", 1, 50),
    "l_extendedprice": ("num", 900.0, 105000.0),
    "l_discount": ("num", 0.0, 0.1),
    "l_tax": ("num", 0.0, 0.08),
    "l_returnflag": ("str", ["A", "N", "R"]),
    "l_linestatus": ("str", ["F", "O"]),
    "l_shipdate": ("date", "1995-01-01", "2001-12-31"),
}


def _rand_leaf(rng: random.Random) -> tuple[str, str]:
    col = rng.choice(list(COLS))
    kind = COLS[col][0]
    if kind == "num":
        _k, lo, hi = COLS[col]
        v = round(rng.uniform(lo, hi), 2)
        op = rng.choice(["<", "<=", ">", ">=", "=", "<>"])
        return f"{col} {op} {v}", f"{col} {op} {v}"
    if kind == "str":
        vals = COLS[col][1]
        if rng.random() < 0.5:
            v = rng.choice(vals)
            op = rng.choice(["=", "<>"])
            return f"{col} {op} '{v}'", f"{col} {op} '{v}'"
        subset = rng.sample(vals, rng.randint(1, len(vals)))
        inlist = ", ".join(f"'{v}'" for v in subset)
        return f"{col} IN ({inlist})", f"{col} IN ({inlist})"
    _k, lo, hi = COLS[col]
    y = rng.randint(1995, 2001)
    m = rng.randint(1, 12)
    d = rng.randint(1, 28)
    v = f"{y:04d}-{m:02d}-{d:02d}"
    op = rng.choice(["<", ">="])
    return (
        f"{col} {op} TIMESTAMP '{v} 00:00:00'",
        f"{col} {op} TIMESTAMP '{v} 00:00:00'",
    )


def _rand_pred(rng: random.Random, depth: int = 0) -> tuple[str, str]:
    if depth >= 2 or rng.random() < 0.4:
        return _rand_leaf(rng)
    sa, da = _rand_pred(rng, depth + 1)
    sb, db = _rand_pred(rng, depth + 1)
    junct = rng.choice(["AND", "OR"])
    neg = rng.random() < 0.2
    s = f"(NOT ({sa} {junct} {sb}))" if neg else f"({sa} {junct} {sb})"
    d = f"(NOT ({da} {junct} {db}))" if neg else f"({da} {junct} {db})"
    return s, d


@pytest.mark.parametrize("seed", range(4))
def test_random_predicates_match_duckdb(spark, sf_dir, seed):
    """30 random predicate trees per seed: COUNT(*) and SUM(l_quantity)
    must agree exactly between engines."""
    rng = random.Random(1000 + seed)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    li.createOrReplaceTempView("li_fuzz")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{sf_dir}/lineitem.parquet')"
    )
    for i in range(30):
        spred, dpred = _rand_pred(rng)
        got = spark.sql(
            f"SELECT COUNT(*) AS n, COALESCE(SUM(CAST(l_quantity AS BIGINT)), 0) AS s "
            f"FROM li_fuzz WHERE {spred}"
        ).collect()[0]
        want = con.execute(
            f"SELECT COUNT(*), COALESCE(SUM(CAST(l_quantity AS BIGINT)), 0) "
            f"FROM lineitem WHERE {dpred}"
        ).fetchone()
        assert (got.n, got.s) == want, f"seed={seed} i={i} pred={spred}"


@pytest.mark.parametrize("seed", range(3))
def test_asof_join_matches_python_model(spark, seed):
    """Randomized as-of join vs a brute-force Python reference: random keys,
    duplicate timestamps, keys with no right rows — results must agree
    exactly, including NULL payloads and equal-ts inclusion."""
    from mb_crdb_cdc_dlgen2_synapse_spark.operators.relational import asof_join

    rng = random.Random(2000 + seed)
    keys = ["a", "b", "c", "d"]
    left = [
        (rng.choice(keys), rng.randint(0, 50), i) for i in range(60)
    ]
    right = [
        (rng.choice(keys[:3]), rng.randint(0, 50), round(rng.uniform(0, 9), 2))
        for _ in range(40)
    ]
    ldf = spark.createDataFrame(left, "k string, t int, lid int")
    rdf = spark.createDataFrame(right, "k string, t int, v double")

    def model(lk, lt):
        cands = [(t, v) for (k, t, v) in right if k == lk and t <= lt]
        if not cands:
            return (None, None)
        best_t = max(t for t, _ in cands)
        # argmax tie resolution: max payload struct == max v among best_t
        return (best_t, max(v for t, v in cands if t == best_t))

    got = {
        r.lid: (r.asof_rt, r.asof_v)
        for r in asof_join(
            ldf,
            rdf.select("k", "t", F.col("t").alias("rt"), "v"),
            key="k", left_ts="t", right_ts="t", payload_cols=["rt", "v"],
        ).collect()
    }
    for lk, lt, lid in left:
        assert got[lid] == model(lk, lt), (seed, lk, lt, lid)
