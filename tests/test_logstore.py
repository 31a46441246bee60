"""LogStore seam (txlog.LogStore): the table format's correctness reduces
to ONE storage primitive — atomic put-if-absent — so every property that
matters (exactly-one-winner races, snapshot isolation, checkpoint+tail
resolution, log pruning, clones) must hold identically under BOTH
implementations: PosixLogStore (os.link exclusivity) and
InMemoryCASLogStore (conditional-PUT / ETag CAS, the ADLS/GCS/S3 shape).
A behavior difference between the two would mean the format leaked a
POSIX assumption past the seam."""

from __future__ import annotations

import json
import os
import threading

import pytest
from pyspark.sql import functions as F

from mb_crdb_cdc_dlgen2_synapse_spark.txlog import (
    InMemoryCASLogStore,
    PosixLogStore,
    TxTable,
)

STORES = {
    "posix": PosixLogStore,
    "cas": InMemoryCASLogStore,
}


@pytest.fixture(params=sorted(STORES))
def store(request):
    # one instance per test: racing writers must share it, like the real
    # object store they emulate
    return STORES[request.param]()


def _df(spark, rows):
    return spark.createDataFrame(rows, "k int, v string")


def test_contract_exactly_one_winner_under_thread_race(tmp_path, store):
    """N threads race one target path: exactly one True, the file holds the
    winner's payload, and no partial/temp residue parses as a commit."""
    os.makedirs(tmp_path / "log", exist_ok=True)
    target = str(tmp_path / "log" / "00000000000000000001.json")
    wins = []

    def attempt(i):
        if store.write_if_absent(target, json.dumps({"writer": i})):
            wins.append(i)

    threads = [threading.Thread(target=attempt, args=(i,)) for i in range(16)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(wins) == 1
    with open(target) as f:
        assert json.load(f) == {"writer": wins[0]}
    leftovers = [
        n for n in os.listdir(tmp_path / "log") if n != os.path.basename(target)
    ]
    assert all(not n.endswith(".json") for n in leftovers)


def test_contract_existing_file_from_other_backend_loses(tmp_path, store):
    """An object already on storage (written by ANOTHER implementation)
    must make write_if_absent return False — opening a table with either
    backend is safe."""
    target = str(tmp_path / "00000000000000000000.json")
    assert PosixLogStore().write_if_absent(target, '{"origin": "posix"}')
    assert store.write_if_absent(target, '{"origin": "late"}') is False
    with open(target) as f:
        assert json.load(f)["origin"] == "posix"


def test_concurrent_writers_all_commits_land(spark, tmp_path, store):
    """The racing-writer suite from test_txlog, against both stores: N
    threads x M appends, every append lands exactly once at a contiguous
    version."""
    t_path = str(tmp_path / "mw")
    TxTable(spark, t_path, store)  # init log dir
    errors = []

    def writer(wid: int):
        try:
            t = TxTable(spark, t_path, store)
            for i in range(3):
                t.append(
                    spark.createDataFrame([(wid, i)], "w int, i int").coalesce(1)
                )
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=writer, args=(w,)) for w in range(4)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors
    t = TxTable(spark, t_path, store)
    assert t.version() == 11  # 12 commits, contiguous 0..11
    rows = {(r.w, r.i) for r in t.read().collect()}
    assert rows == {(w, i) for w in range(4) for i in range(3)}


def test_checkpoint_vacuum_and_time_travel(spark, tmp_path, store):
    """Checkpoint + tail resolution, log pruning, and pre-prune reads
    raising — the round-3 scale machinery — behave identically."""
    t = TxTable(spark, str(tmp_path / "t"), store)
    t.CHECKPOINT_INTERVAL = 3
    for i in range(8):
        t.append(_df(spark, [(i, f"v{i}")]))
    # checkpoints landed through the store at the interval
    log = os.listdir(os.path.join(t.path, "_txlog"))
    assert any(n.endswith(".checkpoint.json") for n in log)
    assert sorted(r.k for r in t.read().collect()) == list(range(8))
    # time travel within the retained window
    assert sorted(r.k for r in t.read(as_of=3).collect()) == [0, 1, 2, 3]
    t.vacuum(retain_versions=2, prune_log=True)
    fresh = TxTable(spark, str(tmp_path / "t"), store)
    assert sorted(r.k for r in fresh.read().collect()) == list(range(8))
    with pytest.raises(Exception):
        fresh.read(as_of=0).collect()


def test_dml_and_clone_roundtrip(spark, tmp_path, store):
    """DML (CoW delete + DV update) and zero-copy clone commit through the
    seam identically."""
    t = TxTable(spark, str(tmp_path / "t"), store)
    t.append(_df(spark, [(i, "x") for i in range(10)]))
    t.delete_where([("k", "==", 7)])
    t.update_where([("k", "==", 3)], {"v": F.lit("upd")}, mode="dv")
    got = {r.k: r.v for r in t.read().collect()}
    assert 7 not in got and got[3] == "upd" and len(got) == 9
    c = t.clone_to(str(tmp_path / "c"))
    assert {r.k: r.v for r in c.read().collect()} == got
    c.append(_df(spark, [(99, "z")]))
    assert t.read().count() == 9  # clone writes never leak back
