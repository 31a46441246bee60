"""SQL DDL surface (sql_ddl.execute_ddl via Engine.ddl): the published
Delta statement forms mapped onto txlog metadata commits — rename (flat
and nested), properties, constraints, optimize/vacuum/restore, describe,
and predicate DML, all through strings a SQL user would type."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mb_crdb_cdc_dlgen2_synapse_spark.engine import Engine
from mb_crdb_cdc_dlgen2_synapse_spark.txlog import TxTable


@pytest.fixture
def eng(spark):
    return Engine(spark)


def _mk(spark, path, rows="k int, v string"):
    t = TxTable(spark, path)
    t.append(spark.createDataFrame([(1, "a"), (2, "b"), (30, "c")], rows))
    return t


def test_alter_rename_flat_and_nested(spark, eng, tmp_path):
    tabs = {"t": str(tmp_path / "t")}
    _mk(spark, tabs["t"])
    eng.ddl("ALTER TABLE t RENAME COLUMN v TO payload", tabs)
    t2 = TxTable(spark, str(tmp_path / "n"))
    t2.append(
        spark.createDataFrame(
            [(1, ("x", 5))], "k int, after struct<city: string, amt: int>"
        )
    )
    tabs["n"] = str(tmp_path / "n")
    eng.ddl("ALTER TABLE n RENAME COLUMN after.city TO town", tabs)
    got = eng.sql_tx("SELECT k, payload FROM t ORDER BY k", tabs).collect()
    assert [r.payload for r in got] == ["a", "b", "c"]
    r = eng.sql_tx("SELECT after.town AS town FROM n", tabs).collect()[0]
    assert r.town == "x"


def test_properties_constraints_and_errors(spark, eng, tmp_path):
    tabs = {"t": str(tmp_path / "t")}
    t = _mk(spark, tabs["t"])
    eng.ddl(
        "ALTER TABLE t SET TBLPROPERTIES ('checkpoint.interval' = '7', "
        "'owner' = 'data-eng')",
        tabs,
    )
    assert t.properties() == {"checkpoint.interval": "7", "owner": "data-eng"}
    eng.ddl("ALTER TABLE t UNSET TBLPROPERTIES ('owner')", tabs)
    assert t.properties() == {"checkpoint.interval": "7"}
    eng.ddl("ALTER TABLE t ADD CONSTRAINT k_pos CHECK (k > 0)", tabs)
    with pytest.raises(ValueError, match="k_pos"):
        t.append(spark.createDataFrame([(-1, "x")], "k int, v string"))
    eng.ddl("ALTER TABLE t DROP CONSTRAINT k_pos", tabs)
    t.append(spark.createDataFrame([(-1, "x")], "k int, v string"))
    with pytest.raises(ValueError, match="unknown table"):
        eng.ddl("VACUUM nope", tabs)
    with pytest.raises(ValueError, match="unsupported MERGE ON term"):
        eng.ddl("MERGE INTO t USING t ON 1=1 WHEN MATCHED THEN UPDATE SET *", tabs)
    with pytest.raises(ValueError, match="unsupported statement"):
        eng.ddl("TRUNCATE TABLE t", tabs)


def test_dml_optimize_vacuum_restore_describe(spark, eng, tmp_path):
    tabs = {"t": str(tmp_path / "t")}
    t = _mk(spark, tabs["t"])
    v_before = t.version()
    res = eng.ddl("DELETE FROM t WHERE k >= 10 AND k < 40", tabs)
    assert res["version"] > v_before
    assert {r.k for r in t.read().collect()} == {1, 2}
    eng.ddl("UPDATE t SET v = upper(v) WHERE k = 2", tabs)
    assert {r.v for r in t.read().collect()} == {"a", "B"}
    # string literal predicate (quote escaping)
    eng.ddl("DELETE FROM t WHERE v = 'B'", tabs)
    assert {r.v for r in t.read().collect()} == {"a"}
    eng.ddl("OPTIMIZE t", tabs)
    # history BEFORE the vacuum: the prune below may checkpoint-replace
    # old commits (legitimately), so assert on the unpruned log
    hist = eng.ddl("DESCRIBE HISTORY t", tabs)
    assert hist.filter(F.col("op") == "compact").count() == 1
    eng.ddl("VACUUM t RETAIN 0 HOURS", tabs)
    assert t.read().count() == 1
    eng.ddl(f"RESTORE t TO VERSION AS OF {t.version()}", tabs)  # no-op restore
    detail = {
        r.item: r.value for r in eng.ddl("DESCRIBE DETAIL t", tabs).collect()
    }
    assert '"version"' not in detail  # keys are bare
    assert "protocol" in detail and "properties" in detail


def test_vacuum_retain_hours_sql_form(spark, eng, tmp_path):
    tabs = {"t": str(tmp_path / "t")}
    t = TxTable(spark, tabs["t"])
    for i in range(4):
        t.overwrite(spark.createDataFrame([(i, f"v{i}")], "k int, v string"))
    eng.ddl("VACUUM t RETAIN 168 HOURS", tabs)
    # everything committed within a week survives: all versions still read
    for v in range(4):
        assert TxTable(spark, tabs["t"]).read(as_of=v).count() == 1


def test_optimize_where_scopes_the_rewrite(spark, eng, tmp_path):
    """OPTIMIZE ... WHERE only rewrites files the predicates may touch —
    the hot-partition maintenance statement; untouched partitions keep
    byte identity."""
    import os as _os

    tabs = {"t": str(tmp_path / "t")}
    t = TxTable(spark, tabs["t"])
    df = spark.createDataFrame(
        [(i, i % 2, f"v{i}") for i in range(20)], "k int, part int, v string"
    )
    t.append(df.repartition(4), partition_by=["part"])
    before = {
        f: _os.stat(_os.path.join(t.path, f)).st_mtime_ns
        for f in t.snapshot()[1]
        if "part=0" in f
    }
    eng.ddl("OPTIMIZE t WHERE part = 1 ZORDER BY (k)", tabs)
    after = {
        f: _os.stat(_os.path.join(t.path, f)).st_mtime_ns
        for f in t.snapshot()[1]
        if "part=0" in f
    }
    assert before == after  # the part=0 files were never touched
    assert t.read().count() == 20
    assert len([f for f in t.snapshot()[1] if "part=1" in f]) == 1


def test_sql_tx_time_travel_pins(spark, eng, tmp_path):
    """sql_tx(as_of=...) — VERSION AS OF / TIMESTAMP AS OF through the
    SQL surface; different views can pin different versions in one query."""
    tabs = {"t": str(tmp_path / "t")}
    t = TxTable(spark, tabs["t"])
    t.overwrite(spark.createDataFrame([(1, "old")], "k int, v string"))  # v0
    t.overwrite(spark.createDataFrame([(1, "new")], "k int, v string"))  # v1
    assert eng.sql_tx("SELECT v FROM t", tabs).collect()[0].v == "new"
    assert (
        eng.sql_tx("SELECT v FROM t", tabs, as_of={"t": 0}).collect()[0].v
        == "old"
    )
    # TIMESTAMP AS OF resolves to the latest version committed at-or-
    # before the instant (second-granular: both commits above may share a
    # second, so pin with a far-future instant = head)
    assert (
        eng.sql_tx(
            "SELECT v FROM t", tabs, as_of={"t": "2099-01-01T00:00:00Z"}
        ).collect()[0].v
        == "new"
    )


def _backdate_commits(t, versions, hours_ago: float = 2.0) -> None:
    """RETAIN-0 tests need commits strictly OLDER than the second-granular
    cutoff: a commit written in the same second as the vacuum is retained
    (utc >= cutoff), making the assertion timing-flaky."""
    import json as _json
    import time as _time

    old = _time.strftime(
        "%Y-%m-%dT%H:%M:%SZ", _time.gmtime(_time.time() - hours_ago * 3600)
    )
    for v in versions:
        p = t._log_path(v)
        with open(p) as fh:
            c = _json.load(fh)
        c["utc"] = old
        with open(p, "w") as fh:
            _json.dump(c, fh)


def test_vacuum_dry_run_deletes_nothing(spark, eng, tmp_path):
    tabs = {"t": str(tmp_path / "t")}
    t = TxTable(spark, tabs["t"])
    for i in range(3):
        t.overwrite(spark.createDataFrame([(i, f"v{i}")], "k int, v string"))
    _backdate_commits(t, range(3))
    res = eng.ddl("VACUUM t RETAIN 0 HOURS DRY RUN", tabs)
    assert res["would_delete_files"] > 0
    # nothing was touched: every version still reads
    for v in range(3):
        assert TxTable(spark, tabs["t"]).read(as_of=v).count() == 1
    res2 = eng.ddl("VACUUM t RETAIN 0 HOURS", tabs)
    # the audit predicted the real run exactly
    assert res2["deleted_files"] == res["would_delete_files"]
    assert TxTable(spark, tabs["t"]).read().count() == 1


def test_bare_vacuum_is_conservative(spark, eng, tmp_path):
    """Bare `VACUUM t` follows the Delta statement it imitates: 7-day
    default retention (or the table's vacuum.retainHours property) and NO
    log pruning — a user typing the familiar statement must not destroy
    all time travel/CDF/RESTORE history."""
    tabs = {"t": str(tmp_path / "t")}
    t = TxTable(spark, tabs["t"])
    for i in range(3):
        t.overwrite(spark.createDataFrame([(i, f"v{i}")], "k int, v string"))
    res = eng.ddl("VACUUM t", tabs)
    # every commit is minutes old -> inside the 168h default window
    assert res["deleted_files"] == 0
    for v in range(3):
        assert TxTable(spark, tabs["t"]).read(as_of=v).count() == 1
    # the table's own policy property drives the bare statement
    t.set_properties({"vacuum.retainHours": "0"})
    _backdate_commits(t, range(3))
    res2 = eng.ddl("VACUUM t", tabs)
    assert res2["deleted_files"] > 0
    # but bare VACUUM never prunes the log: history still lists v0
    hist = eng.ddl("DESCRIBE HISTORY t", tabs)
    assert hist.filter(F.col("version") == 0).count() == 1


def test_merge_into_sql_forms(spark, eng, tmp_path):
    """MERGE INTO through the SQL surface: star update/insert forms map to
    the engine's replace-matched-row merge; WHEN MATCHED AND (...) THEN
    DELETE maps to delete_when over source columns."""
    tabs = {"t": str(tmp_path / "t"), "u": str(tmp_path / "u")}
    t = TxTable(spark, tabs["t"])
    t.append(spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k int, v string"))
    u = TxTable(spark, tabs["u"])
    u.append(spark.createDataFrame([(2, "B"), (4, "D")], "k int, v string"))
    res = eng.ddl(
        "MERGE INTO t USING u ON k "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *",
        tabs,
    )
    assert isinstance(res, dict)
    got = {r.k: r.v for r in t.read().collect()}
    assert got == {1: "a", 2: "B", 3: "c", 4: "D"}
    # qualified ON form + source-condition delete
    u2_path = str(tmp_path / "u2")
    tabs["u2"] = u2_path
    u2 = TxTable(spark, u2_path)
    u2.append(spark.createDataFrame([(1, "DEL"), (4, "keep")], "k int, v string"))
    eng.ddl(
        "MERGE INTO t USING u2 ON t.k = u2.k "
        "WHEN MATCHED AND (v = 'DEL') THEN DELETE "
        "WHEN MATCHED THEN UPDATE SET *",
        tabs,
    )
    got2 = {r.k: r.v for r in t.read().collect()}
    assert got2 == {2: "B", 3: "c", 4: "keep"}
    # insert-only merge leaves matched rows untouched
    eng.ddl(
        "MERGE INTO t USING u ON k WHEN NOT MATCHED THEN INSERT *", tabs
    )
    got3 = {r.k: r.v for r in t.read().collect()}
    assert got3 == {2: "B", 3: "c", 4: "keep"}  # k=2,4 matched: unchanged
    # no WHEN clause at all is an error
    with pytest.raises(ValueError, match="at least one WHEN"):
        eng.ddl("MERGE INTO t USING u ON k", tabs)
    # mismatched column names on the two sides refuse
    with pytest.raises(ValueError, match="SAME column"):
        eng.ddl(
            "MERGE INTO t USING u ON t.k = u.j WHEN MATCHED THEN UPDATE SET *",
            tabs,
        )


def test_create_table_as_and_insert_into(spark, eng, tmp_path):
    """The SQL lifecycle statements: CTAS over snapshot views, INSERT
    INTO ... SELECT (self-referencing reads the pre-insert snapshot),
    INSERT INTO ... VALUES (positional, cast to the table schema)."""
    tabs = {"src": str(tmp_path / "src"), "t": str(tmp_path / "t")}
    src = TxTable(spark, tabs["src"])
    src.append(
        spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k int, v string")
    )
    res = eng.ddl("CREATE TABLE t AS SELECT k, upper(v) AS v FROM src WHERE k < 3", tabs)
    assert res["version"] == 0
    t = TxTable(spark, tabs["t"])
    assert {r.v for r in t.read().collect()} == {"A", "B"}
    # CTAS on an existing table refuses
    with pytest.raises(ValueError, match="already a table"):
        eng.ddl("CREATE TABLE t AS SELECT * FROM src", tabs)
    # self-referencing insert: doubles the rows (reads pre-insert snapshot)
    eng.ddl("INSERT INTO t SELECT k + 10, v FROM t", tabs)
    assert t.read().count() == 4
    # VALUES form, positional + cast (ints become the table's int type)
    eng.ddl("INSERT INTO t VALUES (100, 'z'), (101, 'y')", tabs)
    got = {r.k: r.v for r in t.read().collect()}
    assert got[100] == "z" and got[101] == "y" and len(got) == 6
    with pytest.raises(ValueError, match="values"):
        eng.ddl("INSERT INTO t VALUES (1, 'a', 'extra')", tabs)


def test_restore_to_timestamp_sql_form(spark, eng, tmp_path):
    tabs = {"t": str(tmp_path / "t")}
    t = TxTable(spark, tabs["t"])
    t.overwrite(spark.createDataFrame([(1, "old")], "k int, v string"))
    t.overwrite(spark.createDataFrame([(1, "new")], "k int, v string"))
    # pin with a far-future instant == head; restore is then a no-op
    eng.ddl("RESTORE t TO TIMESTAMP AS OF '2099-01-01T00:00:00Z'", tabs)
    assert t.read().collect()[0].v == "new"


def test_sql_dml_differential_vs_python_api(spark, eng, tmp_path):
    """Seeded differential: random conjunctive predicates executed twice —
    once as a SQL DELETE/UPDATE string through the parser, once through
    the Python API on a clone — must leave identical tables. Hardens
    _parse_predicates (quote forms, int/float literals, operator map)."""
    import random

    rng = random.Random(606)
    rows = [
        (i, float(i) * 1.5, ["red", "gre'en", "blue", "x y"][i % 4])
        for i in range(200)
    ]
    base = TxTable(spark, str(tmp_path / "base"))
    base.append(spark.createDataFrame(rows, "k int, price double, color string"))
    for trial in range(6):
        a_path = str(tmp_path / f"a{trial}")
        b_path = str(tmp_path / f"b{trial}")
        base.clone_to(a_path)
        base.clone_to(b_path)
        a, b = TxTable(spark, a_path), TxTable(spark, b_path)
        preds = []
        clauses = []
        for _ in range(rng.randint(1, 3)):
            col = rng.choice(["k", "price", "color"])
            if col == "color":
                val = rng.choice(["red", "gre'en", "x y"])
                preds.append((col, "==", val))
                clauses.append(f"color = '{val.replace(chr(39), chr(39)*2)}'")
            elif col == "price":
                v = round(rng.uniform(0, 300), 1)
                op = rng.choice([">=", "<", ">"])
                preds.append((col, op, v))
                clauses.append(f"price {op} {v}")
            else:
                v = rng.randint(0, 200)
                op = rng.choice(["==", "<=", ">"])
                preds.append((col, op, v))
                clauses.append(f"k {'=' if op == '==' else op} {v}")
        where = " AND ".join(clauses)
        tabs = {"t": a_path}
        if trial % 2 == 0:
            eng.ddl(f"DELETE FROM t WHERE {where}", tabs)
            b.delete_where(preds)
        else:
            eng.ddl(f"UPDATE t SET price = price * 2 WHERE {where}", tabs)
            b.update_where(preds, {"price": F.col("price") * 2})
        got_a = sorted(map(tuple, a.read().collect()))
        got_b = sorted(map(tuple, b.read().collect()))
        assert got_a == got_b, f"trial {trial}: SQL vs API diverged ({where})"


def test_alter_column_default_type_identity_sql_forms(spark, eng, tmp_path):
    """The round-6 ALTER COLUMN vocabulary end to end through SQL strings:
    SET/DROP DEFAULT, TYPE widening, and GENERATED AS IDENTITY."""
    tabs = {"t": str(tmp_path / "t")}
    t = _mk(spark, tabs["t"])

    eng.ddl("ALTER TABLE t ALTER COLUMN v SET DEFAULT 'dflt'", tabs)
    t.append(spark.createDataFrame([(4,)], "k int"))
    assert t.read().filter("k = 4").collect()[0].v == "dflt"
    eng.ddl("ALTER TABLE t ALTER COLUMN v DROP DEFAULT", tabs)
    t.append(spark.createDataFrame([(5,)], "k int"))
    assert t.read().filter("k = 5").collect()[0].v is None

    eng.ddl("ALTER TABLE t ALTER COLUMN k TYPE bigint", tabs)
    assert dict(t.read().dtypes)["k"] == "bigint"
    with pytest.raises(ValueError, match="widening"):
        eng.ddl("ALTER TABLE t ALTER COLUMN k TYPE int", tabs)

    eng.ddl(
        "ALTER TABLE t ADD COLUMN uid BIGINT GENERATED ALWAYS AS IDENTITY "
        "(START WITH 100 INCREMENT BY 5)",
        tabs,
    )
    uids = [r.uid for r in t.read().collect()]
    assert len(set(uids)) == len(uids)
    assert all(u >= 100 and (u - 100) % 5 == 0 for u in uids)
    with pytest.raises(ValueError, match="ALWAYS"):
        t.append(
            spark.createDataFrame([(9, "z", 1)], "k long, v string, uid long")
        )

    # BY DEFAULT spelling parses too
    t2 = TxTable(spark, str(tmp_path / "t2"))
    t2.append(spark.createDataFrame([(1, "a")], "k int, v string"))
    tabs["t2"] = str(tmp_path / "t2")
    eng.ddl(
        "ALTER TABLE t2 ADD COLUMN uid BIGINT GENERATED BY DEFAULT AS IDENTITY",
        tabs,
    )
    t2.append(spark.createDataFrame([(2, "b", 77)], "k int, v string, uid long"))
    got = {r.k: r.uid for r in t2.read().collect()}
    assert got[2] == 77 and got[1] is not None


def test_reorg_purge_and_shallow_clone_sql(spark, eng, tmp_path):
    tabs = {"t": str(tmp_path / "t"), "c": str(tmp_path / "c")}
    t = _mk(spark, tabs["t"])
    t.delete_where([("k", "==", 2)], mode="dv")
    assert t._active_dvs()  # DV present
    eng.ddl("REORG TABLE t APPLY (PURGE)", tabs)
    t2 = TxTable(spark, tabs["t"])
    assert not t2._active_dvs()  # purged into the rewrite
    assert sorted(r.k for r in t2.read().collect()) == [1, 30]

    eng.ddl("CREATE TABLE c SHALLOW CLONE t", tabs)
    c = TxTable(spark, tabs["c"])
    assert sorted(r.k for r in c.read().collect()) == [1, 30]
    # clone is independent: source DML does not leak in
    t2.delete_where([("k", "==", 1)])
    assert sorted(r.k for r in c.read().collect()) == [1, 30]


def test_show_tblproperties_sql(spark, eng, tmp_path):
    tabs = {"t": str(tmp_path / "t")}
    t = _mk(spark, tabs["t"])
    t.set_properties({"appendOnly": "false", "vacuum.retainHours": "24"})
    got = {
        r.key: r.value
        for r in eng.ddl("SHOW TBLPROPERTIES t", tabs).collect()
    }
    assert got["appendOnly"] == "false"
    assert got["vacuum.retainHours"] == "24"
