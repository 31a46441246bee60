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
    LocalObjectStore,
    PosixLogStore,
    TxTable,
)

STORES = {
    "posix": PosixLogStore,
    "cas": InMemoryCASLogStore,
    "objstore": lambda: LocalObjectStore(page_size=3),
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


def test_list_and_read_route_through_store_contract(tmp_path, store):
    """The store's List/GET hooks exist and agree with what was PUT —
    the minimal contract an object-store backend implements with a
    paginated prefix-List and a GET."""
    log = tmp_path / "t" / "_txlog"
    os.makedirs(log, exist_ok=True)
    p1 = str(log / "00000000000000000000.json")
    p2 = str(log / "00000000000000000001.json")
    assert store.write_if_absent(p1, '{"version": 0}')
    assert store.write_if_absent(p2, '{"version": 1}')
    assert store.list_dir(str(log)) == [
        "00000000000000000000.json", "00000000000000000001.json",
    ]
    assert json.loads(store.read_text(p2)) == {"version": 1}
    store.delete(p1)
    assert store.list_dir(str(log)) == ["00000000000000000001.json"]


def test_log_resolution_uses_store_listing_not_directory_scan(spark, tmp_path):
    """Hiding a committed object from the store's List (eventual
    consistency, older-S3 shape) must change the resolver's view even
    though the file IS on disk — proof that _list_log asks the store, not
    the filesystem. The stale view is a consistent old snapshot (safe),
    never an error."""
    store = InMemoryCASLogStore()
    path = str(tmp_path / "t")
    t = TxTable(spark, path, store)
    t.append(_df(spark, [(1, "a")]))
    t.append(_df(spark, [(2, "b")]))
    v1_path = t._log_path(1)
    assert os.path.exists(v1_path)  # the object is fully durable...
    store.lag_listing(v1_path)      # ...but List hasn't caught up
    lagged = TxTable(spark, path, store)
    assert lagged.version() == 0           # consistent stale head
    assert lagged.read().count() == 1      # v0 snapshot, not an error


def test_lagging_listing_commit_retry_heals_and_lands(spark, tmp_path):
    """A writer on a lagged listing computes a stale head, loses the
    conditional PUT for the occupied version, and the FAILED CAS heals the
    listing (the coordinator is strongly consistent) — the retry then sees
    the true head and lands on top of it. No commit is lost, no version
    skipped."""
    store = InMemoryCASLogStore()
    path = str(tmp_path / "t")
    t = TxTable(spark, path, store)
    t.append(_df(spark, [(1, "a")]))   # v0
    t.append(_df(spark, [(2, "b")]))   # v1
    store.lag_listing(t._log_path(1))
    lagged = TxTable(spark, path, store)
    assert lagged.version() == 0
    v = lagged.append(_df(spark, [(3, "c")]))
    assert v == 2                       # landed after the healed head
    fresh = TxTable(spark, path, store)
    assert fresh.version() == 2
    assert sorted(r["k"] for r in fresh.read().collect()) == [1, 2, 3]


def test_log_reads_route_through_store(spark, tmp_path):
    """A store whose GET refuses one commit path must make resolution of
    that version fail — proof _read_json asks the store, not open()."""

    class RefusingStore(PosixLogStore):
        def __init__(self):
            self.refuse: set[str] = set()

        def read_text(self, path: str) -> str:
            if path in self.refuse:
                raise OSError(f"simulated GET failure for {path}")
            return super().read_text(path)

    store = RefusingStore()
    path = str(tmp_path / "t")
    t = TxTable(spark, path, store)
    t.append(_df(spark, [(1, "a")]))
    t.append(_df(spark, [(2, "b")]))
    store.refuse.add(t._log_path(1))
    fresh = TxTable(spark, path, store)
    with pytest.raises(OSError, match="simulated GET"):
        fresh.read().collect()


def test_vacuum_log_pruning_keeps_store_index_consistent(spark, tmp_path):
    """vacuum(prune_log=True) deletes log objects THROUGH the store: the
    CAS index must forget them, or the store's listing would advertise
    objects whose reads fail forever after."""
    store = InMemoryCASLogStore()
    path = str(tmp_path / "t")
    t = TxTable(spark, path, store)
    for i in range(6):
        t.append(_df(spark, [(i, "x")]))
    t.vacuum(retain_versions=2, prune_log=True)
    fresh = TxTable(spark, path, store)
    assert fresh.read().count() == 6
    listed = store.list_dir(os.path.join(path, "_txlog"))
    # every listed commit/checkpoint-head object must be readable
    for name in listed:
        if name.endswith(".json"):
            store.read_text(os.path.join(path, "_txlog", name))
    # and the pruned commits are gone from the listing
    assert "00000000000000000000.json" not in listed


def _backdate(t: TxTable, versions, hours_ago: float) -> None:
    """Test setup: rewrite logged commit timestamps in place (the log is
    immutable in production; this emulates commits made in the past)."""
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


@pytest.mark.parametrize("prune_log", [False, True])
def test_vacuum_retain_hours_keeps_recent_versions(
    spark, tmp_path, store, prune_log
):
    """Delta's VACUUM RETAIN n HOURS contract: every version committed
    inside the wall-clock window survives (however many versions that is),
    and a reader pinned at as_of within the window never loses files —
    even when retain_versions alone would have reclaimed them."""
    path = str(tmp_path / "t")
    t = TxTable(spark, path, store)
    for i in range(6):  # overwrites: each version has its OWN files
        t.overwrite(_df(spark, [(i, f"v{i}")]))
    _backdate(t, range(0, 3), hours_ago=48)
    fresh = TxTable(spark, path, store)  # caches must not hide the backdate
    fresh.vacuum(retain_versions=1, retain_hours=24, prune_log=prune_log)
    reader = TxTable(spark, path, store)
    # versions committed within 24h (v3..v5) all still read
    for v in (3, 4, 5):
        assert {r.v for r in reader.read(as_of=v).collect()} == {f"v{v}"}
    # the 48h-old versions' exclusive files were reclaimed
    live = {
        os.path.relpath(os.path.join(dp, f), path)
        for dp, dn, fn in os.walk(path)
        if "_txlog" not in dp and "_staging" not in dp
        for f in fn
        if f.endswith(".parquet")
    }
    for v in (0, 1, 2):
        assert not (set(reader_files(t, v)) & live)


def reader_files(t: TxTable, v: int) -> list[str]:
    try:
        return t.snapshot(v)[1]
    except FileNotFoundError:
        return []


def test_vacuum_retain_hours_zero_equals_version_window(spark, tmp_path, store):
    """retain_hours=0 adds nothing: only the version window is kept —
    and untimestamped (legacy) commits are conservatively retained."""
    path = str(tmp_path / "t")
    t = TxTable(spark, path, store)
    for i in range(4):
        t.overwrite(_df(spark, [(i, f"v{i}")]))
    _backdate(t, range(0, 4), hours_ago=1)  # all recent, but...
    fresh = TxTable(spark, path, store)
    fresh.vacuum(retain_versions=1, retain_hours=0, prune_log=False)
    reader = TxTable(spark, path, store)
    assert {r.v for r in reader.read().collect()} == {"v3"}
    with pytest.raises(Exception):
        reader.read(as_of=0).collect()
    # legacy commit without utc: never reclaimed by the time window
    t2 = TxTable(spark, str(tmp_path / "t2"), store)
    t2.overwrite(_df(spark, [(1, "a")]))
    t2.overwrite(_df(spark, [(2, "b")]))
    p = t2._log_path(0)
    with open(p) as fh:
        c = json.load(fh)
    del c["utc"]
    with open(p, "w") as fh:
        json.dump(c, fh)
    fresh2 = TxTable(spark, str(tmp_path / "t2"), store)
    fresh2.vacuum(retain_versions=1, retain_hours=0.001, prune_log=False)
    assert {r.v for r in TxTable(spark, str(tmp_path / "t2"), store).read(as_of=0).collect()} == {"a"}


# ---------------------------------------------------------------------------
# LocalObjectStore specifics: pagination, lag+heal, streaming ingest


def test_objstore_list_is_paginated(tmp_path):
    """With page_size=3 and 10 objects, list_dir must issue multiple List
    requests (continuation-token protocol) and still return everything in
    lexicographic order."""
    store = LocalObjectStore(page_size=3)
    log = tmp_path / "log"
    os.makedirs(log)
    names = [f"{i:020d}.json" for i in range(10)]
    for n in names:
        assert store.write_if_absent(str(log / n), "{}")
    before = store.pages_served
    assert store.list_dir(str(log)) == names
    assert store.pages_served - before >= 4  # ceil(10/3) pages
    # blobs (the store's internal storage) are never listed as objects
    assert not any(n.startswith(".blob-") for n in store.list_dir(str(log)))


def test_objstore_lag_stale_snapshot_and_cas_heal(spark, tmp_path):
    """Same eventual-consistency model the CAS store proves, through the
    object-store emulation: a lagged List yields a consistent stale
    snapshot, and a failed conditional PUT heals the lag so the writer's
    retry lands at the true head."""
    store = LocalObjectStore(page_size=2)
    path = str(tmp_path / "t")
    t = TxTable(spark, path, store)
    t.append(_df(spark, [(1, "a")]))   # v0
    t.append(_df(spark, [(2, "b")]))   # v1
    store.lag_listing(t._log_path(1))
    lagged = TxTable(spark, path, store)
    assert lagged.version() == 0       # consistent stale head, no error
    assert lagged.read().count() == 1
    v = lagged.append(_df(spark, [(3, "c")]))
    assert v == 2                      # failed CAS healed, retry landed
    fresh = TxTable(spark, path, store)
    assert sorted(r.k for r in fresh.read().collect()) == [1, 2, 3]


def test_objstore_lag_heals_after_k_listings(spark, tmp_path):
    """The older-S3 time-heal shape: a lagged object reappears in List
    after k further List calls even with no CAS activity."""
    store = LocalObjectStore(page_size=2)
    path = str(tmp_path / "t")
    t = TxTable(spark, path, store)
    t.append(_df(spark, [(1, "a")]))
    t.append(_df(spark, [(2, "b")]))
    log_dir = os.path.join(path, "_txlog")
    store.lag_listing(t._log_path(1), listings=2)
    first = store.list_dir(log_dir)
    assert "00000000000000000001.json" not in first
    store.list_dir(log_dir)  # second lagged listing
    healed = store.list_dir(log_dir)
    assert "00000000000000000001.json" in healed
    assert TxTable(spark, path, store).version() == 1


def test_objstore_end_to_end_streaming_ingest(spark, tmp_path):
    """One real Structured Streaming pipeline committing exactly-once
    through the object-store seam: the dedup-on-ingest sink, duplicates
    across micro-batches, txn markers — all through conditional PUT +
    paginated List."""
    import json as _json

    from mb_crdb_cdc_dlgen2_synapse_spark.txlog import stream_dedup_to_tx_table

    store = LocalObjectStore(page_size=3)
    landing = tmp_path / "landing"
    os.makedirs(landing)
    with open(landing / "b1.ndjson", "w") as f:
        for i in range(20):
            f.write(_json.dumps({"doc_id": i, "text": f"doc number {i}"}) + "\n")
    with open(landing / "b2.ndjson", "w") as f:
        for i in range(0, 20, 5):  # re-delivered content, new ids
            f.write(_json.dumps({"doc_id": i + 1000, "text": f"doc number {i}"}) + "\n")
    stream = spark.readStream.schema("doc_id long, text string").option(
        "maxFilesPerTrigger", 1
    ).json(str(landing))
    q = stream_dedup_to_tx_table(
        stream, str(tmp_path / "table"), str(tmp_path / "ckpt"),
        log_store=store,
    )
    q.awaitTermination()
    t = TxTable(spark, str(tmp_path / "table"), store)
    got = sorted(r.doc_id for r in t.read().collect())
    assert got == list(range(20))  # every duplicate dropped, originals kept
    assert t.version() >= 1        # multiple micro-batch commits landed
    assert store.pages_served > 0  # resolution went through the List API


def test_objstore_orphan_blob_sweep(tmp_path):
    """A hard-killed writer can leave a blob with no committed object
    (crash between body write and create-exclusive); the sweep removes
    exactly those, never a committed object's body."""
    store = LocalObjectStore(page_size=3)
    log = tmp_path / "log"
    os.makedirs(log)
    assert store.write_if_absent(str(log / "a.json"), '{"v": 1}')
    assert store.write_if_absent(str(log / "b.json"), '{"v": 2}')
    # simulate the crash leak: a blob nobody links to
    with open(log / ".blob-deadbeef", "w") as f:
        f.write("orphan")
    assert store.sweep_orphan_blobs(str(log)) == 1
    # committed objects still read their bodies
    assert json.loads(store.read_text(str(log / "a.json"))) == {"v": 1}
    assert json.loads(store.read_text(str(log / "b.json"))) == {"v": 2}
    assert store.sweep_orphan_blobs(str(log)) == 0


def test_round6_features_through_every_store(spark, tmp_path, store):
    """Session-2 metadata features route through the LogStore seam like
    everything else: defaults + identity + widening + COPY INTO + FSCK
    over each backend, with a checkpoint crossing in the middle."""
    import os

    from mb_crdb_cdc_dlgen2_synapse_spark.txlog import TxTable

    t = TxTable(spark, str(tmp_path / "t"), log_store=store)
    t.append(_df(spark, [(1, "a")]))
    t.set_column_default("v", "'dflt'")
    t.set_identity_column("uid", start=10, step=2)
    t.widen_column_type("k", "bigint")
    src = str(tmp_path / "src")
    _df(spark, [(2, "b")]).coalesce(1).write.mode("overwrite").parquet(src)
    parts = [
        os.path.join(src, f) for f in os.listdir(src) if f.endswith(".parquet")
    ]
    assert t.copy_into(parts)["loaded_files"] == 1
    t.write_checkpoint()
    t2 = TxTable(spark, t.path, log_store=store)
    assert t2.copy_into(parts)["loaded_files"] == 0  # loaded set survived
    assert t2.column_defaults() == {"v": "'dflt'"}
    t2.append(spark.createDataFrame([(3,)], "k long"))
    got = {r.k: (r.v, r.uid) for r in t2.read().collect()}
    assert got[3][0] == "dflt"
    uids = [u for _v, u in got.values()]
    assert None not in uids and len(set(uids)) == 3
    assert t2.fsck(dry_run=True)["missing_files"] == []
