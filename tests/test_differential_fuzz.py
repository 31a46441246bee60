"""Randomized differential testing: seeded random predicate/projection
queries executed by BOTH Spark and DuckDB over the same parquet, results
compared exactly. Complements the per-query oracle gate with coverage of
predicate shapes nobody hand-wrote (AND/OR/NOT nesting, null-prone
comparisons, string prefixes, date bounds)."""

from __future__ import annotations

import random
from collections import Counter

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


# ---------------------------------------------------------------------------
# Random join-tree fuzzing: chains over the star-schema join graph with
# random join types, predicates, and grouped exact aggregates — the same SQL
# text executed by both engines, full result sets compared.
# ---------------------------------------------------------------------------

_JOIN_EDGES = [
    ("lineitem", "orders", "l_orderkey = o_orderkey"),
    ("orders", "customer", "o_custkey = c_custkey"),
    ("customer", "nation", "c_nationkey = n_nationkey"),
]

_TABLE_COLS = {
    "lineitem": {
        "l_quantity": ("num", 1, 50),
        "l_returnflag": ("str", ["A", "N", "R"]),
        "l_shipdate": ("date", 1995, 2001),
    },
    "orders": {
        "o_totalprice": ("num", 1000.0, 500000.0),
        "o_orderstatus": ("str", ["F", "O", "P"]),
        "o_orderpriority": (
            "str",
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
        ),
        "o_orderdate": ("date", 1995, 2001),
    },
    "customer": {
        "c_acctbal": ("num", -1000.0, 10000.0),
        "c_mktsegment": (
            "str",
            ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"],
        ),
    },
    "nation": {"n_regionkey": ("num", 0, 4)},
}

_GROUP_COLS = {
    "lineitem": ["l_returnflag", "l_linestatus"],
    "orders": ["o_orderstatus", "o_orderpriority"],
    "customer": ["c_mktsegment", "c_nationkey"],
    "nation": ["n_regionkey", "n_name"],
}

_SUM_COLS = {
    "lineitem": "l_quantity",
    "orders": "o_totalprice",
    "customer": "c_acctbal",
    "nation": "n_regionkey",
}


def _leaf_for(rng: random.Random, table: str) -> str:
    col = rng.choice(list(_TABLE_COLS[table]))
    kind = _TABLE_COLS[table][col][0]
    if kind == "num":
        _k, lo, hi = _TABLE_COLS[table][col]
        v = round(rng.uniform(lo, hi), 2)
        return f"{col} {rng.choice(['<', '<=', '>', '>=', '=', '<>'])} {v}"
    if kind == "str":
        vals = _TABLE_COLS[table][col][1]
        if rng.random() < 0.5:
            return f"{col} {rng.choice(['=', '<>'])} '{rng.choice(vals)}'"
        subset = rng.sample(vals, rng.randint(1, len(vals)))
        return f"{col} IN ({', '.join(repr(v) for v in subset)})"
    _k, ylo, yhi = _TABLE_COLS[table][col]
    v = f"{rng.randint(ylo, yhi):04d}-{rng.randint(1, 12):02d}-{rng.randint(1, 28):02d}"
    return f"{col} {rng.choice(['<', '>='])} TIMESTAMP '{v} 00:00:00'"


def _rand_join_query(rng: random.Random) -> str:
    start = rng.randrange(len(_JOIN_EDGES))
    n_edges = rng.randint(1, len(_JOIN_EDGES) - start)
    edges = _JOIN_EDGES[start : start + n_edges]
    tables = [edges[0][0]] + [e[1] for e in edges]
    sql_from = tables[0]
    for _l, r, cond in edges:
        jt = rng.choice(["JOIN", "JOIN", "LEFT JOIN"])
        sql_from += f" {jt} {r} ON {cond}"
    preds = [
        _leaf_for(rng, t) for t in tables if rng.random() < 0.5
    ]
    where = f" WHERE {' AND '.join(preds)}" if preds else ""
    sum_t = rng.choice(tables)
    aggs = (
        f"COUNT(*) AS n, "
        f"SUM(CAST({_SUM_COLS[sum_t]} AS DECIMAL(18,2))) AS s"
    )
    if rng.random() < 0.7:
        g_t = rng.choice(tables)
        g = rng.choice(_GROUP_COLS[g_t])
        return f"SELECT {g} AS g, {aggs} FROM {sql_from}{where} GROUP BY {g}"
    return f"SELECT {aggs} FROM {sql_from}{where}"


@pytest.mark.parametrize("seed", range(3))
def test_random_join_trees_match_duckdb(spark, sf_dir, seed):
    """20 random join chains per seed over lineitem-orders-customer-nation:
    inner/left joins, random per-table predicates, exact decimal aggregates,
    optional grouping — full sorted result sets must agree."""
    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer", "nation"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    rng = random.Random(3000 + seed)
    for i in range(20):
        q = _rand_join_query(rng)
        # multiset compare: Python hashes Decimal/int/float by numeric value,
        # so scale differences (5.00 vs 5.000) and NULL group keys are safe —
        # sorted() would TypeError on None-vs-str mixed tuples
        got = Counter(tuple(r) for r in spark.sql(q).collect())
        want = Counter(tuple(r) for r in con.execute(q).fetchall())
        assert got == want, f"seed={seed} i={i} {q}"


# ---------------------------------------------------------------------------
# Random window-function fuzzing: random func x partition x order x frame
# specs over orders, identical SQL in both engines, full multiset compare.
# Every ORDER BY carries the unique o_orderkey tiebreak so ranks/frames are
# total-ordered (engine-independent); frame sums go through DECIMAL.
# ---------------------------------------------------------------------------

_WIN_FUNCS = [
    "row_number()",
    "rank()",
    "dense_rank()",
    "lag(o_orderkey, 1) ",
    "lead(o_orderkey, 1)",
    "count(*)",
    "min(o_orderkey)",
    "max(o_orderkey)",
    "sum(CAST(o_totalprice AS DECIMAL(18,2)))",
]
_WIN_PARTS = ["o_orderstatus", "o_orderpriority", "o_custkey % 10", ""]
_WIN_ORDERS = [
    "o_totalprice ASC, o_orderkey",
    "o_totalprice DESC, o_orderkey",
    "o_orderdate ASC, o_orderkey",
    "o_orderkey DESC",
]
_WIN_FRAMES = [
    "",
    " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
    " ROWS BETWEEN 3 PRECEDING AND CURRENT ROW",
    " ROWS BETWEEN 1 PRECEDING AND 2 FOLLOWING",
]


def _rand_window_query(rng: random.Random) -> str:
    fn = rng.choice(_WIN_FUNCS)
    part = rng.choice(_WIN_PARTS)
    order = rng.choice(_WIN_ORDERS)
    frame = rng.choice(_WIN_FRAMES) if fn.startswith(("sum", "min", "max", "count")) else ""
    over = f"PARTITION BY {part} " if part else ""
    pred = _leaf_for(rng, "orders")
    return (
        f"SELECT o_orderkey, {fn} OVER ({over}ORDER BY {order}{frame}) AS w "
        f"FROM orders WHERE {pred}"
    )


@pytest.mark.parametrize("seed", range(3))
def test_random_window_specs_match_duckdb(spark, sf_dir, seed):
    con = duckdb.connect()
    spark.read.parquet(f"{sf_dir}/orders.parquet").createOrReplaceTempView("orders")
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{sf_dir}/orders.parquet')"
    )
    rng = random.Random(4000 + seed)
    for i in range(20):
        q = _rand_window_query(rng)
        got = Counter(tuple(r) for r in spark.sql(q).collect())
        want = Counter(tuple(r) for r in con.execute(q).fetchall())
        assert got == want, f"seed={seed} i={i} {q}"


# ---------------------------------------------------------------------------
# Random multi-dimensional grouping fuzzing: ROLLUP / CUBE / GROUPING SETS
# over random dimension subsets with exact decimal aggregates.
# ---------------------------------------------------------------------------

_DIM_POOL = ["o_orderstatus", "o_orderpriority", "o_custkey % 7"]


def _rand_grouping_query(rng: random.Random) -> str:
    dims = rng.sample(_DIM_POOL, rng.randint(1, 3))
    aliased = [f"{d} AS g{i}" for i, d in enumerate(dims)]
    names = [f"g{i}" for i in range(len(dims))]
    kind = rng.choice(["ROLLUP", "CUBE", "SETS", "PLAIN"])
    if kind == "SETS":
        subsets = ["()"] + [f"({n})" for n in names]
        chosen = rng.sample(subsets, rng.randint(1, len(subsets)))
        grouping = f"GROUPING SETS ({', '.join(chosen)})"
        # Spark refuses a selected dim that appears in NO chosen set
        # (DuckDB would return NULL for it) — select only covered dims
        covered = [
            (a, n) for a, n in zip(aliased, names) if any(n in c for c in chosen)
        ]
        aliased = [a for a, _ in covered] or ["1 AS g_dummy"]
    elif kind == "PLAIN":
        grouping = ", ".join(names)
    else:
        grouping = f"{kind} ({', '.join(names)})"
    pred = _leaf_for(rng, "orders")
    return (
        f"SELECT {', '.join(aliased)}, COUNT(*) AS n, "
        f"SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS s "
        f"FROM orders WHERE {pred} "
        f"GROUP BY {grouping}"
    )


@pytest.mark.parametrize("seed", range(3))
def test_random_grouping_sets_match_duckdb(spark, sf_dir, seed):
    con = duckdb.connect()
    spark.read.parquet(f"{sf_dir}/orders.parquet").createOrReplaceTempView("orders")
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{sf_dir}/orders.parquet')"
    )
    rng = random.Random(5000 + seed)
    for i in range(15):
        q = _rand_grouping_query(rng)
        got = Counter(tuple(r) for r in spark.sql(q).collect())
        want = Counter(tuple(r) for r in con.execute(q).fetchall())
        assert got == want, f"seed={seed} i={i} {q}"
