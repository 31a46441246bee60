"""Protocol reader/writer feature flags (txlog READER_FEATURES /
WRITER_FEATURES — the published Delta table-features design): commits
stamp the capabilities they USE; snapshots accumulate the union; readers
refuse tables carrying reader features they don't understand instead of
silently mis-reading; writers refuse unknown writer features. Old
snapshots resolve under the features their history had used by then, so
time travel across a feature boundary still works for an old reader."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from mb_crdb_cdc_dlgen2_synapse_spark.txlog import TxTable


def _df(spark, rows, schema="k int, v string"):
    return spark.createDataFrame(rows, schema)


def test_features_accumulate_with_use(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [(1, "a")]))
    assert t.protocol() == {"reader": [], "writer": []}  # plain appends: none
    t.rename_column("v", "payload")
    assert t.protocol()["reader"] == ["column-mapping"]
    t.rename_column("payload", "v")  # identity mapping again, but the
    # feature stays: files written meanwhile may rely on it, and Delta's
    # feature sets are monotone
    assert "column-mapping" in t.protocol()["reader"]
    t.add_check("k_pos", "k > 0")
    assert "check-constraints" in t.protocol()["writer"]
    assert "check-constraints" not in t.protocol()["reader"]
    t.delete_where([("k", "==", 999)], mode="dv")  # no rows, still a DV op?
    t.append(_df(spark, [(2, "b")]))
    t.delete_where([("k", "==", 2)], mode="dv")
    assert "deletion-vectors" in t.protocol()["reader"]
    d = t.describe()
    assert d["protocol"]["reader"] == t.protocol()["reader"]
    assert d["version"] == t.version()


def test_nested_rename_and_generated_and_bloom_stamp(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(
        spark.createDataFrame(
            [(1, ("a", 10))], "k int, props struct<name: string, qty: int>"
        )
    )
    t.rename_column("props.name", "label")
    assert set(t.protocol()["reader"]) == {
        "column-mapping", "nested-column-mapping",
    }
    t.set_bloom_index(["k"])
    assert "bloom-index" in t.protocol()["writer"]
    t.set_generated_column("k2", "k * 2")
    assert "generated-columns" in t.protocol()["writer"]


def test_old_reader_refuses_future_reader_feature(spark, tmp_path):
    """A table written by a future engine version (a commit stamped with a
    reader feature this engine doesn't know) must refuse to read — at
    head, and at any snapshot at-or-after the stamp — with an error
    naming the feature."""
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [(1, "a")]))  # v0
    t.append(_df(spark, [(2, "b")]))  # v1
    # forge the future writer's commit
    entry = {
        "version": 2, "op": "future_op", "added": [], "removed": [],
        "schema": t.snapshot()[2], "txn": None, "stats": {},
        "protocol": {"reader": ["v9-row-tracking"], "writer": ["v9-row-tracking"]},
        "utc": "2099-01-01T00:00:00Z",
    }
    assert t.log_store.write_if_absent(t._log_path(2), json.dumps(entry))
    fresh = TxTable(spark, str(tmp_path / "t"))
    with pytest.raises(ValueError, match="v9-row-tracking"):
        fresh.read().collect()
    assert fresh.version() == 2  # the version NUMBER is harmless metadata
    with pytest.raises(ValueError, match="reader feature"):
        fresh.protocol()
    # time travel BEFORE the feature boundary still works
    assert {r.k for r in fresh.read(as_of=1).collect()} == {1, 2}
    # and an old writer refuses to append (the write path resolves head
    # state, whose reader gate fires first — refusal either way)
    with pytest.raises(ValueError, match="v9-row-tracking|writer feature"):
        fresh.append(_df(spark, [(3, "c")]))


def test_old_writer_refuses_future_writer_feature(spark, tmp_path):
    """Writer-only future feature: reads stay fine (reader set is known),
    writes refuse."""
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [(1, "a")]))
    entry = {
        "version": 1, "op": "future_op", "added": [], "removed": [],
        "schema": t.snapshot()[2], "txn": None, "stats": {},
        "protocol": {"reader": [], "writer": ["v9-auto-stats"]},
        "utc": "2099-01-01T00:00:00Z",
    }
    assert t.log_store.write_if_absent(t._log_path(1), json.dumps(entry))
    fresh = TxTable(spark, str(tmp_path / "t"))
    assert {r.k for r in fresh.read().collect()} == {1}  # reads fine
    with pytest.raises(ValueError, match="writer feature"):
        fresh.append(_df(spark, [(2, "b")]))


def test_features_survive_checkpoint_prune_clone_restore(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.CHECKPOINT_INTERVAL = 3
    t.append(_df(spark, [(1, "a")]))
    t.rename_column("v", "payload")
    v_mapped = t.version()
    for i in range(2, 7):
        t.append(_df(spark, [(i, f"v{i}")], "k int, payload string"))
    t.vacuum(retain_versions=2, prune_log=True)
    fresh = TxTable(spark, str(tmp_path / "t"))
    assert "column-mapping" in fresh.protocol()["reader"]  # via checkpoint
    clone = t.clone_to(str(tmp_path / "c"))
    assert "column-mapping" in clone.protocol()["reader"]
    t.restore(t.version() - 1)
    assert "column-mapping" in t.protocol()["reader"]  # monotone past restore
    assert v_mapped >= 0
