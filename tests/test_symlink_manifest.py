"""Symlink-format manifest generation (txlog.generate_manifest — the
published Delta GENERATE symlink_format_manifest statement): external
engines (Presto/Trino/Hive/Synapse serverless) read a consistent
snapshot through ``_symlink_format_manifest/<partition>/manifest`` URI
lists. Covers exact active-file listing, stale-partition cleanup, DV and
column-mapping refusals, and the manifest.autoUpdate post-commit hook."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from mb_crdb_cdc_dlgen2_synapse_spark.txlog import TxTable


def _manifest_uris(table_path: str) -> list[str]:
    root = os.path.join(table_path, TxTable.MANIFEST_DIR)
    uris = []
    for dirpath, _d, files in os.walk(root):
        if "manifest" in files:
            with open(os.path.join(dirpath, "manifest")) as f:
                uris += [ln.strip() for ln in f if ln.strip()]
    return sorted(uris)


def _active_uris(t: TxTable) -> list[str]:
    return sorted(
        "file://" + os.path.join(t.path, rel) for rel in t._state()["active"]
    )


def test_manifest_lists_exactly_the_active_snapshot(spark, tmp_path):
    tp = str(tmp_path / "t")
    t = TxTable(spark, tp)
    df = spark.range(0, 100).select(
        "id", (F.col("id") % 3).alias("p"), (F.col("id") * 2).alias("v")
    )
    t.append(df, partition_by=["p"])
    t.delete_where([("id", "<", 10)], mode="cow")
    written = t.generate_manifest()
    assert len(written) == 3  # one per partition dir
    assert _manifest_uris(tp) == _active_uris(t)
    # an external-style read through the manifest == the table read
    paths = [u.removeprefix("file://") for u in _manifest_uris(tp)]
    ext = spark.read.option("basePath", tp).parquet(*paths)
    assert sorted(r.id for r in ext.collect()) == sorted(
        r.id for r in t.read().collect()
    )


def test_regenerate_prunes_dropped_partition_manifests(spark, tmp_path):
    tp = str(tmp_path / "t")
    t = TxTable(spark, tp)
    df = spark.range(0, 40).select("id", (F.col("id") % 4).alias("p"))
    t.append(df, partition_by=["p"])
    t.generate_manifest()
    t.delete_where([("p", "==", 2)], mode="cow")  # drops the whole p=2 dir
    t.generate_manifest()
    assert _manifest_uris(tp) == _active_uris(t)
    assert not os.path.exists(
        os.path.join(tp, TxTable.MANIFEST_DIR, "p=2", "manifest")
    )


def test_refuses_deletion_vectors_and_column_mapping(spark, tmp_path):
    tp = str(tmp_path / "t")
    t = TxTable(spark, tp)
    t.append(spark.range(0, 20).select("id"))
    t.delete_where([("id", "<", 5)], mode="dv")
    with pytest.raises(ValueError, match="deletion vectors"):
        t.generate_manifest()
    t.compact()  # materializes the DVs
    t.generate_manifest()
    assert _manifest_uris(tp) == _active_uris(t)
    t2 = TxTable(spark, str(tmp_path / "t2"))
    t2.append(spark.range(0, 5).select("id", F.lit("x").alias("a")))
    t2.rename_column("a", "b")
    with pytest.raises(ValueError, match="column-mapped"):
        t2.generate_manifest()


def test_auto_update_property(spark, tmp_path):
    """Declaring manifest.autoUpdate publishes immediately; every
    data-changing commit republishes; DV DML refuses BEFORE committing."""
    tp = str(tmp_path / "t")
    t = TxTable(spark, tp)
    t.append(spark.range(0, 10).select("id"))
    t.set_properties({"manifest.autoUpdate": "true"})
    assert _manifest_uris(tp) == _active_uris(t)  # initial publish
    t.append(spark.range(10, 20).select("id"))
    assert _manifest_uris(tp) == _active_uris(t)  # post-commit hook
    t.delete_where([("id", "<", 3)], mode="cow")
    assert _manifest_uris(tp) == _active_uris(t)
    v_before = t.version()
    with pytest.raises(ValueError, match="manifest.autoUpdate"):
        t.delete_where([("id", "<", 5)], mode="dv")
    assert t.version() == v_before  # refused BEFORE the commit landed
    assert _manifest_uris(tp) == _active_uris(t)
    # unset -> DV DML allowed again, manifest no longer maintained
    t.set_properties({"manifest.autoUpdate": None})
    t.delete_where([("id", "<", 5)], mode="dv")


def test_declaring_on_dv_table_refuses(spark, tmp_path):
    tp = str(tmp_path / "t")
    t = TxTable(spark, tp)
    t.append(spark.range(0, 10).select("id"))
    t.delete_where([("id", "<", 2)], mode="dv")
    with pytest.raises(ValueError, match="symlink-representable"):
        t.set_properties({"manifest.autoUpdate": "true"})


def test_compact_keeps_manifest_fresh_under_auto_update(spark, tmp_path):
    """Compaction rewrites every file: the hook must republish or external
    readers would point at vacuumable files."""
    tp = str(tmp_path / "t")
    t = TxTable(spark, tp)
    for k in range(3):
        t.append(spark.range(k * 5, k * 5 + 5).select("id"))
    t.set_properties({"manifest.autoUpdate": "true"})
    t.compact()
    assert _manifest_uris(tp) == _active_uris(t)
    paths = [u.removeprefix("file://") for u in _manifest_uris(tp)]
    assert sorted(r.id for r in spark.read.parquet(*paths).collect()) == list(
        range(15)
    )


def test_engine_read_manifest_facade(spark, tmp_path):
    from mb_crdb_cdc_dlgen2_synapse_spark.engine import Engine

    tp = str(tmp_path / "t")
    t = TxTable(spark, tp)
    t.append(
        spark.range(0, 30).select("id", (F.col("id") % 3).alias("p")),
        partition_by=["p"],
    )
    t.delete_where([("id", "<", 5)], mode="cow")
    t.generate_manifest()
    eng = Engine(spark)
    ext = eng.read_manifest(tp)
    assert sorted(r.id for r in ext.collect()) == sorted(
        r.id for r in t.read().collect()
    )
    with pytest.raises(ValueError, match="no symlink manifest"):
        eng.read_manifest(str(tmp_path / "nope"))


def test_regeneration_is_monotone_under_unordered_writers(spark, tmp_path):
    """Unordered post-commit regenerations (a stalled writer running its
    hook AFTER the next version's winner) cannot roll external readers
    back: publication carries a _version marker and a head-of-table
    regeneration for an older-or-equal version is a no-op."""
    tp = str(tmp_path / "t")
    t = TxTable(spark, tp)
    t.append(spark.range(0, 5).select("id"))          # v0
    assert t.generate_manifest()                      # publishes v0
    marker = os.path.join(tp, TxTable.MANIFEST_DIR, "_version")
    with open(marker) as f:
        assert int(f.read()) == 0
    uris_v0 = _manifest_uris(tp)
    # a newer writer already published: the stalled writer's late hook
    # (same head, marker bumped ahead) must not clobber it
    with open(marker, "w") as f:
        f.write("99")
    assert t.generate_manifest() == []
    assert _manifest_uris(tp) == uris_v0
    with open(marker) as f:
        assert int(f.read()) == 99  # marker never moves backwards
    # an EXPLICIT historical regeneration bypasses the skip AND moves the
    # marker to the snapshot it published: the manifests now describe v0,
    # and a marker stuck at head would make every later head-of-table
    # regeneration (autoUpdate hooks, manual repair) a no-op while
    # external readers sit on the historical list (round-7 advisory)
    assert t.generate_manifest(as_of=0)
    with open(marker) as f:
        assert int(f.read()) == 0
    # ...so the next head-of-table call REPUBLISHES instead of no-opping
    t.append(spark.range(5, 8).select("id"))          # v1
    assert t.generate_manifest()
    with open(marker) as f:
        assert int(f.read()) == 1
    assert _manifest_uris(tp) != uris_v0


def test_regeneration_lock_steals_stale_and_times_out_on_live(spark, tmp_path):
    tp = str(tmp_path / "t")
    t = TxTable(spark, tp)
    t.append(spark.range(0, 3).select("id"))
    root = os.path.join(tp, TxTable.MANIFEST_DIR)
    os.makedirs(root, exist_ok=True)
    lock = os.path.join(root, ".lock")
    # crashed holder (stale mtime): stolen, regeneration proceeds
    with open(lock, "w") as f:
        f.write("0")
    old = __import__("time").time() - TxTable.MANIFEST_LOCK_STALE - 5
    os.utime(lock, (old, old))
    assert t.generate_manifest()
    assert not os.path.exists(lock)
    # live holder (fresh mtime): waits, then times out
    with open(lock, "w") as f:
        f.write("0")
    orig = TxTable.MANIFEST_LOCK_TIMEOUT
    TxTable.MANIFEST_LOCK_TIMEOUT = 0.3
    try:
        with pytest.raises(TimeoutError, match="regeneration lock"):
            t.generate_manifest()
    finally:
        TxTable.MANIFEST_LOCK_TIMEOUT = orig
        os.remove(lock)
