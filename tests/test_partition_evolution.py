"""Partition evolution (Iceberg's published spec-evolution design) on
txlog: the partition spec is METADATA — new writes lay out under the
current spec, old files keep their layout forever, and per-file pruning
(hive path + footer stats) keeps skipping correctly across every era, so
evolving the spec moves zero bytes at any table size."""

from __future__ import annotations

import os

import pytest

from mb_crdb_cdc_dlgen2_synapse_spark.txlog import TxTable


def _df(spark, rows, schema="k int, status string, day string"):
    return spark.createDataFrame(rows, schema)


ROWS_A = [(1, "open", "d1"), (2, "closed", "d1"), (3, "open", "d2")]
ROWS_B = [(4, "open", "d2"), (5, "closed", "d3")]


def _scanned(df) -> set[str]:
    return {os.path.basename(p) for p in df.inputFiles()}


def test_spec_inherited_by_writes_and_old_layout_kept(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, ROWS_A).coalesce(1))  # era 0: unpartitioned
    t.set_partitioning(["status"])
    assert t.partitioning() == ["status"]
    t.append(_df(spark, ROWS_B).coalesce(1))  # era 1: inherits the spec
    era1 = [f for f in t.snapshot()[1] if "status=" in f]
    assert era1 and all("status=" in f or "status=" not in f for f in t.snapshot()[1])
    # the era-0 file was not rewritten
    assert any("status=" not in f for f in t.snapshot()[1])
    got = sorted((r.k, r.status) for r in t.read().collect())
    assert got == sorted((k, s) for k, s, _ in ROWS_A + ROWS_B)


def test_pruning_works_across_both_eras(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, ROWS_A).coalesce(1))      # unpartitioned era
    t.set_partitioning(["status"])
    t.append(_df(spark, ROWS_B).coalesce(1))      # status=... era
    all_files = set(t.snapshot()[1])
    new_closed = {f for f in all_files if "status=closed" in f}
    new_open = {f for f in all_files if "status=open" in f}
    old = {f for f in all_files if "status=" not in f}
    assert new_closed and new_open and old
    # predicate on the spec column: new-era files prune by path, the
    # old-era file prunes by footer min/max when it can (here it holds
    # both statuses, so it must be scanned — conservative, never wrong)
    df = t.read(predicates=[("status", "==", "closed")])
    scanned = set(df.inputFiles())
    assert not any("status=open" in p for p in scanned)
    assert any("status=closed" in p for p in scanned)
    assert sorted(r.k for r in df.collect()) == [2, 5]
    # count_rows prunes the same way
    assert t.count_rows([("status", "==", "closed")]) == 2


def test_spec_evolves_again_and_explicit_override(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, ROWS_A).coalesce(1))
    t.set_partitioning(["status"])
    t.append(_df(spark, [(6, "open", "d4")]).coalesce(1))
    t.set_partitioning(["status", "day"])   # evolve: add a dimension
    t.append(_df(spark, [(7, "open", "d5")]).coalesce(1))
    files = t.snapshot()[1]
    assert any("status=open/day=d5" in f for f in files)
    assert any("status=open" in f and "day=" not in f for f in files)
    # explicit partition_by still overrides per call
    t.append(
        _df(spark, [(8, "open", "d6")]).coalesce(1), partition_by=["day"]
    )
    assert any(("day=d6" in f and "status=" not in f) for f in t.snapshot()[1])
    # dropping the spec: new writes land unpartitioned
    t.set_partitioning(None)
    assert t.partitioning() == []
    v = t.version()
    t.append(_df(spark, [(9, "x", "d7")]).coalesce(1))
    new = set(t.snapshot()[1]) - set(t.snapshot(v)[1])
    assert new and all("=" not in f for f in new)


def test_spec_validation_and_drop_column_refusal(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    with pytest.raises(ValueError, match="first write"):
        t.set_partitioning(["status"])
    t.append(_df(spark, ROWS_A))
    with pytest.raises(ValueError, match="does not exist"):
        t.set_partitioning(["nope"])
    with pytest.raises(ValueError, match="nested"):
        t.set_partitioning(["a.b"])
    t.set_partitioning(["status"])
    with pytest.raises(ValueError, match="partition spec"):
        t.drop_column("status")
    t.set_partitioning([])
    t.drop_column("status")  # legal once out of the spec


def test_rename_migrates_spec_and_overwrite_prunes_it(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, ROWS_A).coalesce(1))
    t.set_partitioning(["status"])
    t.rename_column("status", "state")
    assert t.partitioning() == ["state"]
    t.append(
        spark.createDataFrame([(10, "open", "d9")], "k int, state string, day string").coalesce(1)
    )
    assert any("status=open" in f for f in t.snapshot()[1])  # frozen physical
    got = t.read(predicates=[("state", "==", "open")])
    assert 10 in {r.k for r in got.collect()}
    # an overwrite that drops the spec column from the schema prunes the
    # spec in the same commit (like defaults/identity)
    t.overwrite(spark.createDataFrame([(1, "d1")], "k int, day string"))
    assert t.partitioning() == []
    t.append(spark.createDataFrame([(2, "d2")], "k int, day string"))
    assert sorted(r.k for r in t.read().collect()) == [1, 2]


def test_generated_hidden_partitioning_composes(spark, tmp_path):
    """Iceberg's hidden partitioning via the existing generated-column
    machinery: partition on a GENERATED day column; raw-ts predicates
    still prune through _derived_predicates."""
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(
        spark.createDataFrame(
            [
                (1, "2026-01-01T05:00:00", "2026-01-01"),
                (2, "2026-01-02T06:00:00", "2026-01-02"),
            ],
            "k int, ts string, day string",
        ).coalesce(1)
    )
    t.set_generated_column("day", "substring(ts, 1, 10)")
    t.set_partitioning(["day"])
    t.append(
        spark.createDataFrame(
            [(3, "2026-01-03T07:00:00"), (4, "2026-01-04T08:00:00")],
            "k int, ts string",
        ).repartition(2, "ts")
    )
    files = t.snapshot()[1]
    assert any("day=2026-01-03" in f for f in files)
    df = t.read(predicates=[("ts", "==", "2026-01-03T07:00:00")])
    scanned = _scanned(df)
    assert not any("day=2026-01-04" in p for p in scanned)
    assert [r.k for r in df.collect()] == [3]


def test_spec_survives_checkpoint_clone_and_sql_forms(spark, tmp_path, eng=None):
    from mb_crdb_cdc_dlgen2_synapse_spark.engine import Engine

    t = TxTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, ROWS_A))
    eng = Engine(spark)
    tabs = {"t": str(tmp_path / "t"), "c": str(tmp_path / "c")}
    eng.ddl("ALTER TABLE t ADD PARTITION FIELD status", tabs)
    eng.ddl("ALTER TABLE t ADD PARTITION FIELD status", tabs)  # idempotent
    assert t.partitioning() == ["status"]
    eng.ddl("ALTER TABLE t ADD PARTITION FIELD day", tabs)
    assert TxTable(spark, t.path).partitioning() == ["status", "day"]
    eng.ddl("ALTER TABLE t DROP PARTITION FIELD status", tabs)
    assert TxTable(spark, t.path).partitioning() == ["day"]
    with pytest.raises(ValueError, match="not in the partition spec"):
        eng.ddl("ALTER TABLE t DROP PARTITION FIELD status", tabs)
    # survives checkpoint + fresh handle; clone carries it (props clone)
    t2 = TxTable(spark, t.path)
    t2.write_checkpoint()
    assert TxTable(spark, t.path).partitioning() == ["day"]
    eng.ddl("CREATE TABLE c SHALLOW CLONE t", tabs)
    assert TxTable(spark, tabs["c"]).partitioning() == ["day"]


def test_compact_layout_mixed_eras_uses_declared_spec_or_refuses(
    spark, tmp_path
):
    """ADVICE-r10: compact_layout used to inherit the FIRST active file's
    hive layout, silently re-staging a mixed-era table under it. Now a
    declared spec wins (the rewrite unifies both eras under it), and an
    undeclared mixed-era table is refused with an actionable error."""
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, ROWS_A).coalesce(1))  # era 0: unpartitioned
    t.set_partitioning(["status"])
    t.append(_df(spark, ROWS_B).coalesce(1))  # era 1: status=...
    t.compact_layout()
    files = t.snapshot()[1]
    assert files and all("status=" in f for f in files)
    got = sorted((r.k, r.status) for r in t.read().collect())
    assert got == sorted((k, s) for k, s, _ in ROWS_A + ROWS_B)
    # undeclared mixed layouts refuse instead of silently flattening
    u = TxTable(spark, str(tmp_path / "u"))
    u.append(_df(spark, ROWS_A).coalesce(1), partition_by=["day"])
    u.append(_df(spark, ROWS_B).coalesce(1), partition_by=["status"])
    with pytest.raises(ValueError, match="differing partition key sets"):
        u.compact_layout()
    # uniform undeclared layout still compacts under the files' layout
    w = TxTable(spark, str(tmp_path / "w"))
    w.append(_df(spark, ROWS_A).coalesce(1), partition_by=["day"])
    w.append(_df(spark, ROWS_B).coalesce(1), partition_by=["day"])
    w.compact_layout()
    assert all("day=" in f for f in w.snapshot()[1])
