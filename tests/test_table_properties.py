"""Table properties (txlog.set_properties — TBLPROPERTIES): persisted
per-table policy read by every writer, surviving checkpoints, log pruning,
and clones. Recognized keys drive real behavior (checkpoint cadence,
manifest part size, auto-compaction); unrecognized keys are annotations."""

from __future__ import annotations

import glob
import os

from mb_crdb_cdc_dlgen2_synapse_spark.txlog import TxTable, maybe_autocompact


def _df(spark, rows):
    return spark.createDataFrame(rows, "k int, v string")


def test_set_unset_roundtrip_and_persistence(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [(1, "a")]))
    t.set_properties({"owner": "pipelines", "pii": "false"})
    t.set_properties({"pii": None, "tier": "gold"})  # unset + add
    assert t.properties() == {"owner": "pipelines", "tier": "gold"}
    # values stringify; a fresh handle resolves from the log
    t.set_properties({"autoCompact.maxFiles": 12})
    fresh = TxTable(spark, str(tmp_path / "t"))
    assert fresh.properties()["autoCompact.maxFiles"] == "12"


def test_checkpoint_interval_property_drives_cadence(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [(0, "seed")]))
    t.set_properties({"checkpoint.interval": "3"})
    for i in range(1, 8):
        t.append(_df(spark, [(i, f"v{i}")]))
    ckpts = glob.glob(os.path.join(t.path, "_txlog", "*.checkpoint.json"))
    versions = sorted(int(os.path.basename(p).split(".")[0]) for p in ckpts)
    assert versions and all(v % 3 == 0 for v in versions)


def test_autocompact_policy_from_properties(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [(0, "seed")]).coalesce(1))
    # no policy anywhere: no-op
    assert maybe_autocompact(t) is False
    t.set_properties({"autoCompact.maxFiles": "5", "autoCompact.targetFiles": "2"})
    for i in range(1, 8):
        t.append(_df(spark, [(i, f"v{i}")]).coalesce(1))
    assert len(t.snapshot()[1]) == 8
    assert maybe_autocompact(t) is True  # policy read from the table
    assert len(t.snapshot()[1]) == 2
    assert t.read().count() == 8


def test_properties_survive_prune_and_clone(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.CHECKPOINT_INTERVAL = 2
    t.append(_df(spark, [(1, "a")]))
    t.set_properties({"tier": "gold"})
    for i in range(2, 6):
        t.append(_df(spark, [(i, f"v{i}")]))
    t.vacuum(retain_versions=1, prune_log=True)
    assert TxTable(spark, str(tmp_path / "t")).properties() == {"tier": "gold"}
    c = t.clone_to(str(tmp_path / "c"))
    assert c.properties() == {"tier": "gold"}


def test_metadata_race_between_read_and_commit_aborts(spark, tmp_path):
    """ADVICE r4: a metadata commit landing BETWEEN set_properties' state
    read and _commit's own first snapshot must abort, not be silently
    overwritten by the stale merged map (lost update). The caller's read
    version is now passed as _commit(base=...), anchoring the
    intervening-commit scan at the read the payload was derived from."""
    import pytest

    from mb_crdb_cdc_dlgen2_synapse_spark.txlog import TxConflictError

    path = str(tmp_path / "t")
    writer = TxTable(spark, path)
    writer.append(_df(spark, [(1, "a")]))
    racer = TxTable(spark, path)

    orig_state = writer._state
    fired = {"n": 0}

    def racing_state(*a, **kw):
        st = orig_state(*a, **kw)
        if fired["n"] == 0:
            fired["n"] = 1
            racer.set_properties({"owner": "racer"})
        return st

    writer._state = racing_state
    try:
        with pytest.raises(TxConflictError, match="metadata conflict"):
            writer.set_properties({"pipeline": "etl"})
    finally:
        writer._state = orig_state
    # the racer's write SURVIVED (that is the whole point)
    fresh = TxTable(spark, path)
    assert fresh.properties() == {"owner": "racer"}
    # and a clean retry applies on top of it
    writer.set_properties({"pipeline": "etl"})
    assert TxTable(spark, path).properties() == {
        "owner": "racer", "pipeline": "etl",
    }


def test_restore_rolls_properties_back(spark, tmp_path):
    """Properties live in table metadata and roll back with RESTORE —
    consistent with clone_to carrying them (and with Delta, where they
    ride the Metadata action)."""
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [(1, "a")]))
    t.set_properties({"tier": "bronze"})
    v_bronze = t.version()
    t.append(_df(spark, [(2, "b")]))
    t.set_properties({"tier": "gold", "owner": "x"})
    assert t.properties()["tier"] == "gold"
    t.restore(v_bronze)
    assert t.properties() == {"tier": "bronze"}
    # restored properties keep driving policy and survive a reopen
    assert TxTable(spark, str(tmp_path / "t")).properties() == {"tier": "bronze"}


def test_vacuum_retain_hours_property_drives_maintain(spark, tmp_path):
    """The wall-clock retention policy lives with the TABLE
    (vacuum.retainHours TBLPROPERTY): Engine.maintain picks it up without
    the caller stating it, so every version inside the window survives
    maintenance."""
    from mb_crdb_cdc_dlgen2_synapse_spark.engine import Engine

    path = str(tmp_path / "t")
    t = TxTable(spark, path)
    for i in range(5):
        t.overwrite(_df(spark, [(i, f"v{i}")]))
    t.set_properties({"vacuum.retainHours": "168"})
    Engine(spark).maintain(path, retain_versions=1)
    # a week of wall-clock retention: every version still readable
    for v in range(5):
        assert TxTable(spark, path).read(as_of=v).count() == 1
    # drop the policy: version-count retention alone reclaims history
    t.set_properties({"vacuum.retainHours": None})
    Engine(spark).maintain(path, retain_versions=1)
    fresh = TxTable(spark, path)
    assert fresh.read().count() == 1
    import pytest as _pytest

    with _pytest.raises(Exception):
        fresh.read(as_of=0).collect()
