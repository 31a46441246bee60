"""FSCK REPAIR TABLE + COPY INTO (two published Delta operational
statements on txlog): log-vs-storage repair and idempotent bulk file
loading with a log-persisted loaded-file set."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from mb_crdb_cdc_dlgen2_synapse_spark.txlog import TxTable


def _df(spark, rows, schema="k int, v string"):
    return spark.createDataFrame(rows, schema)


# -- FSCK --------------------------------------------------------------------


def test_fsck_repairs_manually_deleted_file(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [(1, "a")]).coalesce(1))
    t.append(_df(spark, [(2, "b")]).coalesce(1))
    t.append(_df(spark, [(3, "c")]).coalesce(1))
    victim = sorted(t.snapshot()[1])[1]
    os.remove(os.path.join(t.path, victim))
    with pytest.raises(Exception):
        t.read().collect()  # log references a gone file: unreadable
    rep = t.fsck(dry_run=True)
    assert rep["missing_files"] == [victim]
    with pytest.raises(Exception):
        t.read().collect()  # dry run changed nothing
    rep = t.fsck()
    assert rep["missing_files"] == [victim]
    ks = sorted(r.k for r in t.read().collect())
    assert len(ks) == 2 and t.history()[-1]["op"] == "fsck"
    assert t.fsck() == {
        "missing_files": [], "missing_dv_files": [],
        "dropped_for_missing_dv": [], "version": t.version(),
    }


def test_fsck_missing_dv_drops_covered_data_file(spark, tmp_path):
    """Delta's FSCK semantics for a lost deletion vector: the data file
    the DV covered is dropped WITH it — keeping the file would silently
    resurrect its DV-deleted rows (a GDPR delete coming back because one
    small DV object was lost). An uncovered file is untouched."""
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [(i, f"v{i}") for i in range(10)]).coalesce(1))
    t.append(_df(spark, [(100, "x")]).coalesce(1))  # never DV'd
    t.delete_where([("k", "==", 3)], mode="dv")
    dvs = t._active_dvs()
    covered = sorted(t._state()["dv_counts"])
    os.remove(os.path.join(t.path, dvs[0]))
    rep = t.fsck(dry_run=True)
    assert rep["missing_dv_files"] == dvs
    assert rep["dropped_for_missing_dv"] == covered
    assert len(t.snapshot()[1]) == 2  # dry run changed nothing
    rep = t.fsck()
    assert rep["dropped_for_missing_dv"] == covered
    # deleted row 3 did NOT resurface; the covered file's survivors are
    # lost (the recoverable failure); the uncovered file is intact
    assert sorted(r.k for r in t.read().collect()) == [100]


def test_fsck_two_dvs_one_lost_scoped_drop_and_metadata_counts(spark, tmp_path):
    """Two independently-DV'd files, ONE vector lost: fsck drops only the
    file THAT vector covered (per-DV dv_covers map, not the commit-level
    union), the surviving DV still applies on read, and — the round-7
    advisory — the surviving DV's logged per-file count survives the
    repair, so metadata-only COUNT(*) (count_rows fast path, dv_rows in
    detail()) agrees with an actual read afterwards."""
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [(i, f"a{i}") for i in range(10)]).coalesce(1))
    t.append(_df(spark, [(i, f"b{i}") for i in range(100, 110)]).coalesce(1))
    t.delete_where([("k", "==", 3)], mode="dv")    # DV #1 over file A
    t.delete_where([("k", "==", 105)], mode="dv")  # DV #2 over file B
    dv1, dv2 = t._active_dvs()
    covers = t._state()["dv_covers"]
    assert set(covers) == {dv1, dv2}
    assert covers[dv1] != covers[dv2]  # per-vector scoping, not union
    os.remove(os.path.join(t.path, dv2))
    rep = t.fsck()
    # only DV#2's covered file dropped; DV#1's file + vector intact
    assert rep["missing_dv_files"] == [dv2]
    assert rep["dropped_for_missing_dv"] == covers[dv2]
    got = sorted(r.k for r in t.read().collect())
    assert got == [0, 1, 2, 4, 5, 6, 7, 8, 9]  # 3 still deleted, B gone
    # metadata count == physical count (the dv_reset_counts fix): the
    # surviving vector's per-file count was NOT wiped by the repair
    assert t.count_rows() == 9
    assert t._state()["dv_counts"] == {covers[dv1][0]: 1}


def test_fsck_clone_lost_dv_drops_only_covered_file(spark, tmp_path):
    """A clone's v0 commit carries every source DV at once; without the
    propagated per-DV map, losing ONE vector in the clone would drop
    EVERY DV-covered file (the commit-union fallback). With dv_covers
    propagated through clone_to, the drop stays scoped to the lost
    vector's own file."""
    src = TxTable(spark, str(tmp_path / "src"))
    src.append(_df(spark, [(i, f"a{i}") for i in range(5)]).coalesce(1))
    src.append(_df(spark, [(i, f"b{i}") for i in range(100, 105)]).coalesce(1))
    src.delete_where([("k", "==", 1)], mode="dv")
    src.delete_where([("k", "==", 101)], mode="dv")
    clone = src.clone_to(str(tmp_path / "clone"))
    dv1, dv2 = clone._active_dvs()
    covers = clone._state()["dv_covers"]
    assert set(covers) == {dv1, dv2} and covers[dv1] != covers[dv2]
    os.remove(os.path.join(clone.path, dv1))
    rep = clone.fsck()
    assert rep["dropped_for_missing_dv"] == covers[dv1]
    # the OTHER vector's file survives with its delete still applied
    assert sorted(r.k for r in clone.read().collect()) == [100, 102, 103, 104]
    assert clone.count_rows() == 4
    # source untouched
    assert sorted(r.k for r in src.read().collect()) == [0, 2, 3, 4, 100, 102, 103, 104]


def test_dv_covers_survives_checkpoint(spark, tmp_path):
    """The per-DV covered-file map rides the parquet checkpoint manifest
    (kind='dv_cover'), so a state resolved from a checkpoint — not the
    full commit tail — still scopes fsck's missing-DV drop correctly."""
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [(i, f"a{i}") for i in range(5)]).coalesce(1))
    t.append(_df(spark, [(i, f"b{i}") for i in range(100, 105)]).coalesce(1))
    t.delete_where([("k", "==", 2)], mode="dv")
    t.delete_where([("k", "==", 103)], mode="dv")
    covers_before = t._state()["dv_covers"]
    t.write_checkpoint()
    t2 = TxTable(spark, t.path)  # fresh instance: no memoized state
    assert t2._state()["dv_covers"] == covers_before
    dv1, _dv2 = t2._active_dvs()
    os.remove(os.path.join(t2.path, dv1))
    rep = t2.fsck()
    assert rep["dropped_for_missing_dv"] == covers_before[dv1]
    assert t2.count_rows() == 4
    assert sorted(r.k for r in t2.read().collect()) == [100, 101, 102, 104]


# -- COPY INTO ---------------------------------------------------------------


def _write_src(spark, path, ks):
    _df(spark, [(k, f"v{k}") for k in ks]).coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)
    return [
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".parquet")
    ]


def test_copy_into_idempotent_across_reruns(spark, tmp_path):
    src1 = _write_src(spark, str(tmp_path / "src1"), [1, 2])
    src2 = _write_src(spark, str(tmp_path / "src2"), [3])
    t = TxTable(spark, str(tmp_path / "t"))
    r = t.copy_into(src1)
    assert r["loaded_files"] == len(src1)
    assert t.copy_into(src1)["loaded_files"] == 0  # re-run: no-op
    r = t.copy_into(src1 + src2)  # only the NEW file loads
    assert r["loaded_files"] == len(src2)
    assert sorted(x.k for x in t.read().collect()) == [1, 2, 3]
    # the loaded set survives a fresh handle + checkpoint
    t.write_checkpoint()
    t2 = TxTable(spark, t.path)
    assert t2.copy_into(src1 + src2)["loaded_files"] == 0


def test_copy_into_applies_write_contracts(spark, tmp_path):
    src = _write_src(spark, str(tmp_path / "src"), [5])
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [(1, "a")]))
    t.add_column("tag", "string")
    t.set_column_default("tag", "'copied'")
    t.copy_into(src)
    got = {r.k: r.tag for r in t.read().collect()}
    assert got == {1: None, 5: "copied"}
    with pytest.raises(ValueError, match="parquet\\|ndjson"):
        t.copy_into(src, fmt="csv")


def test_copy_into_sql_and_fsck_sql(spark, tmp_path):
    from mb_crdb_cdc_dlgen2_synapse_spark.engine import Engine

    nd = str(tmp_path / "nd")
    os.makedirs(nd)
    with open(os.path.join(nd, "a.json"), "w") as f:
        f.write('{"k": 1, "v": "a"}\n{"k": 2, "v": "b"}\n')
    t = TxTable(spark, str(tmp_path / "t"))
    eng = Engine(spark)
    tabs = {"t": str(tmp_path / "t")}
    r = eng.ddl(
        f"COPY INTO t FROM '{nd}/*.json' FILEFORMAT = NDJSON", tabs
    )
    assert r["loaded_files"] == 1
    r = eng.ddl(
        f"COPY INTO t FROM '{nd}/*.json' FILEFORMAT = NDJSON", tabs
    )
    assert r["loaded_files"] == 0
    assert t.count_rows() == 2
    victim = t.snapshot()[1][0]
    os.remove(os.path.join(t.path, victim))
    rep = eng.ddl("FSCK REPAIR TABLE t DRY RUN", tabs)
    assert rep["missing_files"] == [victim]
    rep = eng.ddl("FSCK REPAIR TABLE t", tabs)
    assert rep["missing_files"] == [victim]
    assert t.count_rows() == 0


# -- orphan sweep (the storage-side dual) ------------------------------------


def test_orphan_sweep_removes_crash_residue_only(spark, tmp_path):
    import shutil
    import time

    t = TxTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [(1, "a")]).coalesce(1))
    v0_files = set(t.snapshot()[1])
    t.append(_df(spark, [(2, "b")]).coalesce(1))
    # simulate a crashed writer: a staged-then-abandoned file under the
    # table root (old mtime) and a FRESH one (in-flight, must be kept)
    old_orphan = os.path.join(t.path, "part-dead-beef.c000.parquet")
    shutil.copy(
        os.path.join(t.path, sorted(t.snapshot()[1])[0]), old_orphan
    )
    os.utime(old_orphan, (time.time() - 7200, time.time() - 7200))
    fresh_orphan = os.path.join(t.path, "part-fresh-0000.c000.parquet")
    shutil.copy(
        os.path.join(t.path, sorted(t.snapshot()[1])[0]), fresh_orphan
    )
    rep = t.orphan_sweep(dry_run=True)
    assert rep["would_remove"] == ["part-dead-beef.c000.parquet"]
    assert rep["kept_in_grace"] == ["part-fresh-0000.c000.parquet"]
    assert os.path.exists(old_orphan)  # dry run deleted nothing
    rep = t.orphan_sweep()
    assert rep["removed"] == ["part-dead-beef.c000.parquet"]
    assert not os.path.exists(old_orphan)
    assert os.path.exists(fresh_orphan)  # grace window protected it
    # every referenced file of every version survived: time travel intact
    assert sorted(r.k for r in t.read().collect()) == [1, 2]
    assert sorted(r.k for r in t.read(as_of=0).collect()) == [1]
    assert v0_files <= set(t.snapshot()[1]) | v0_files


def test_orphan_sweep_respects_historical_snapshots(spark, tmp_path):
    import time

    t = TxTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [(1, "a")]).coalesce(1))
    t.overwrite(_df(spark, [(2, "b")]).coalesce(1))
    # the overwritten v0 file is UNREFERENCED by head but referenced by
    # v0 — the sweep must keep it (vacuum, not the sweep, reclaims it)
    for dirpath, _d, files in os.walk(t.path):
        for f in files:
            p = os.path.join(dirpath, f)
            os.utime(p, (time.time() - 7200, time.time() - 7200))
    rep = t.orphan_sweep()
    assert rep["removed"] == []
    assert sorted(r.k for r in t.read(as_of=0).collect()) == [1]


def _backdate_copy(t: TxTable, versions, hours_ago: float) -> None:
    """Rewrite logged commit timestamps in place (test-only: emulates
    loads made in the past for the load-metadata-expiry contract)."""
    import json
    import time as _time

    old = _time.strftime(
        "%Y-%m-%dT%H:%M:%SZ", _time.gmtime(_time.time() - hours_ago * 3600)
    )
    for v in versions:
        p = t._log_path(v)
        with open(p) as fh:
            c = json.load(fh)
        c["utc"] = old
        with open(p, "w") as fh:
            json.dump(c, fh)


def test_copy_into_load_metadata_expiry(spark, tmp_path):
    """Snowflake-style load-metadata expiry: with copyInto.retainHours
    set, a load older than the window stops counting as loaded (the file
    re-loads) and checkpoints drop the expired entries, so the set stops
    growing with total files ever loaded."""
    src1 = _write_src(spark, str(tmp_path / "src1"), [1, 2])
    src2 = _write_src(spark, str(tmp_path / "src2"), [3])
    t = TxTable(spark, str(tmp_path / "t"))
    t.copy_into(src1)
    v_load1 = t.version()
    t.set_properties({"copyInto.retainHours": "24"})
    # within the window: still idempotent
    assert t.copy_into(src1)["loaded_files"] == 0
    _backdate_copy(t, [v_load1], hours_ago=48)
    fresh = TxTable(spark, t.path)  # caches must not hide the backdate
    # expired entries no longer block a re-load (Snowflake's contract:
    # after expiry COPY INTO may load the file again)
    r = fresh.copy_into(src1 + src2)
    assert r["loaded_files"] == len(src1) + len(src2)
    # and checkpoints shed the expired identities: backdate everything,
    # checkpoint, and check the persisted set is empty
    fresh2 = TxTable(spark, t.path)
    _backdate_copy(fresh2, range(fresh2.version() + 1), hours_ago=48)
    fresh3 = TxTable(spark, t.path)
    fresh3.write_checkpoint()
    import json as _json

    ck = sorted(
        f for f in os.listdir(os.path.join(t.path, "_txlog"))
        if f.endswith(".checkpoint.json")
    )[-1]
    with open(os.path.join(t.path, "_txlog", ck)) as fh:
        persisted = _json.load(fh)["copied"]
    assert persisted == {}
    # without the property nothing ever expires
    t2 = TxTable(spark, str(tmp_path / "t2"))
    t2.copy_into(src1)
    _backdate_copy(t2, [t2.version()], hours_ago=9999)
    assert TxTable(spark, t2.path).copy_into(src1)["loaded_files"] == 0


@pytest.mark.parametrize("seed", [3, 19])
def test_fsck_fuzz_multi_dv_loss_vs_model(spark, tmp_path, seed):
    """Randomized storage-loss scenarios vs a Python model: k files each
    DV'd independently, then a random subset of data files AND DV files
    deleted from storage. After FSCK: surviving set == model (missing
    data files gone; every file covered by a missing DV gone; nothing
    resurrected), and metadata COUNT(*) == physical count (surviving
    DVs keep their logged counts — the round-7 advisory)."""
    import random

    rng = random.Random(seed)
    t = TxTable(spark, str(tmp_path / "t"))
    k = 4
    per = 20
    for i in range(k):
        t.append(
            _df(spark, [(i * 100 + j, f"v{i}_{j}") for j in range(per)]).coalesce(1)
        )
    # one DV per file: delete key i*100 + i (mode=dv -> vector, no rewrite)
    for i in range(k):
        t.delete_where([("k", "==", i * 100 + i)], mode="dv")
    state = t._state()
    covers = state["dv_covers"]
    stats = t.file_stats()
    # map each data file to its key block via logged min(k) — relpath
    # sort order is uuid-random, never append order
    block_of = {f: stats[f]["min"]["k"] // 100 for f in state["active"]}
    data_files = sorted(state["active"], key=lambda f: block_of[f])
    dv_files = sorted(state["dvs"])
    assert len(dv_files) == k and len(covers) == k
    lose_data = [f for f in data_files if rng.random() < 0.3]
    lose_dv = [d for d in dv_files if rng.random() < 0.4]
    if not lose_data and not lose_dv:
        lose_dv = [dv_files[0]]
    for f in lose_data + lose_dv:
        os.remove(os.path.join(t.path, f))
    rep = t.fsck()
    # model: gone = missing data ∪ files covered by missing DVs
    covered_by_lost = set()
    for d in lose_dv:
        covered_by_lost |= set(covers[d])
    gone = set(lose_data) | {f for f in data_files if f in covered_by_lost}
    surviving_files = [f for f in data_files if f not in gone]
    assert sorted(rep["missing_files"]) == sorted(lose_data)
    assert sorted(rep["missing_dv_files"]) == sorted(lose_dv)
    # expected rows: per file, 20 rows minus its (surviving) DV'd row
    surviving_dvs = [d for d in dv_files if d not in lose_dv]
    dv_hidden = set()
    for d in surviving_dvs:
        (covered,) = covers[d]  # one data file per vector in this fixture
        if covered not in gone:
            i = block_of[covered]
            dv_hidden.add(i * 100 + i)
    expect = sorted(
        block_of[f] * 100 + j
        for f in surviving_files
        for j in range(per)
        if (block_of[f] * 100 + j) not in dv_hidden
    )
    got = sorted(r.k for r in t.read().collect())
    assert got == expect
    assert t.count_rows() == len(expect)  # metadata == physical
