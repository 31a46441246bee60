"""Metadata checkpoints: O(1)-ish snapshot resolution (one checkpoint + the
commit tail), log pruning in vacuum(), and the per-app txn watermark — the
machinery that keeps a streaming sink's driver-side log replay bounded after
tens of thousands of micro-batch commits."""

from __future__ import annotations

import glob
import os
import random

import pytest
from pyspark.sql import functions as F

from mb_crdb_cdc_dlgen2_synapse_spark.txlog import TxTable


def _df(spark, rows):
    return spark.createDataFrame(rows, "k int, v string")


def _count_log_reads(t):
    """Wrap t._read_json with a counter (cache cleared first)."""
    t._json_cache.clear()
    reads = []
    orig = t._read_json

    def counting(path):
        reads.append(path)
        return orig(path)

    t._read_json = counting
    return reads


def test_snapshot_reads_checkpoint_plus_tail_only(spark, tmp_path):
    """After checkpoints exist on a many-commit table, snapshot resolution
    opens one checkpoint + at most CHECKPOINT_INTERVAL commit files — never
    the whole log."""
    t = TxTable(spark, str(tmp_path / "t"))
    t.CHECKPOINT_INTERVAL = 10
    df = _df(spark, [(1, "x")]).coalesce(1).localCheckpoint(eager=True)
    for _ in range(25):
        t.append(df)
    ckpts = glob.glob(os.path.join(t.path, "_txlog", "*.checkpoint.json"))
    assert {
        int(os.path.basename(p).split(".")[0]) for p in ckpts
    } == {10, 20}

    reader = TxTable(spark, t.path)  # fresh handle, cold cache
    reads = _count_log_reads(reader)
    v, active, schema = reader.snapshot()
    assert v == 24 and len(active) == 25 and schema is not None
    # 1 checkpoint (v20) + tail commits 21..24 = 5 log files, NOT 25
    parsed = [p for p in reads if p.endswith(".json")]
    assert len(parsed) <= reader.CHECKPOINT_INTERVAL + 1, parsed
    assert any(p.endswith(".checkpoint.json") for p in parsed)
    assert reader.read().count() == 25


def test_checkpoint_state_equals_full_replay(spark, tmp_path):
    """The checkpoint+tail resolution and a full log replay agree on every
    state component (active files, stats, schema, checks, clustering, DVs,
    txn watermarks) after a mixed workload."""
    t = TxTable(spark, str(tmp_path / "t"))
    t.CHECKPOINT_INTERVAL = 4
    t.append(_df(spark, [(i, f"v{i}") for i in range(20)]))
    t.add_check("k_nonneg", "k >= 0")
    t.set_clustering(["k"])
    t.delete_where([("k", "==", 3)], mode="dv")
    t.append(_df(spark, [(100, "z")]), txn={"app": "w1", "batch": 7})
    t.update_where([("k", "==", 5)], {"v": F.lit("U")})
    t.compact(target_files=2)
    t.append(_df(spark, [(101, "y")]), txn={"app": "w1", "batch": 8})
    assert t.version() >= t.CHECKPOINT_INTERVAL  # crossed a boundary

    resolved = t._state()
    # full replay WITHOUT checkpoints: replay every commit from scratch
    full = t._empty_state()
    for c in t._commits():
        t._apply_commit(full, c)
    assert resolved == full
    assert t.checks() == {"k_nonneg": "k >= 0"}
    assert t.clustering() == ["k"]
    assert t._state()["txn"] == {"w1": 8}


def test_vacuum_prunes_log_to_retained_window(spark, tmp_path):
    """vacuum(prune_log=True) bounds the log: a checkpoint replaces the
    pruned commits, retained versions stay resolvable, older ones fail
    loudly — and content is unchanged."""
    t = TxTable(spark, str(tmp_path / "t"))
    t.CHECKPOINT_INTERVAL = 5
    df = _df(spark, [(1, "x")]).coalesce(1).localCheckpoint(eager=True)
    for _ in range(12):
        t.append(df)                         # v0..v11
    before = t.read().count()
    t.vacuum(retain_versions=3)              # keep v9..v11
    commits, ckpts = t._list_log()
    assert sorted(commits) == [10, 11]       # tail after the v9 checkpoint
    assert 9 in ckpts and all(v >= 9 for v in ckpts)
    # retained window resolvable
    for v in (9, 10, 11):
        assert t.snapshot(as_of=v)[0] == v
    assert t.read().count() == before
    # beyond the horizon: loud failure, not silent wrong answers
    with pytest.raises(FileNotFoundError, match="pruned"):
        t.snapshot(as_of=8)
    with pytest.raises(FileNotFoundError, match="restore"):
        t.restore(2)
    # change feed across the pruned horizon refuses; inside the window works
    with pytest.raises(FileNotFoundError, match="vacuum"):
        t.read_changes(5)
    assert t.read_changes(9).count() == 2    # v10, v11 appends
    # the table keeps working and re-checkpointing afterwards
    for _ in range(5):
        t.append(df)
    assert t.read().count() == before + 5


def test_txn_watermark_survives_log_prune(spark, tmp_path):
    """Exactly-once replay detection must survive pruning: the checkpoint
    carries the per-app max-batch watermark."""
    t = TxTable(spark, str(tmp_path / "t"))
    t.CHECKPOINT_INTERVAL = 2
    for b in range(4):
        t.append(_df(spark, [(b, "x")]), txn={"app": "stream-a", "batch": b})
    t.vacuum(retain_versions=1)              # prune everything but head
    v = t.version()
    # re-delivered batches are still recognized as seen
    for b in range(4):
        t.append(_df(spark, [(99, "dup")]), txn={"app": "stream-a", "batch": b})
    assert t.version() == v
    assert t.read().count() == 4
    # a genuinely new batch lands
    t.append(_df(spark, [(4, "x")]), txn={"app": "stream-a", "batch": 4})
    assert t.read().count() == 5


def test_randomized_ops_across_checkpoint_and_prune(spark, tmp_path):
    """Random DML/compact/vacuum mix with a tiny checkpoint interval: the
    table must always equal a dict model, across checkpoint boundaries and
    log prunes."""
    rng = random.Random(17)
    t = TxTable(spark, str(tmp_path / "t"))
    t.CHECKPOINT_INTERVAL = 3
    model: dict[int, str] = {}

    def sync_check():
        got = {r.k: r.v for r in t.read().collect()}
        assert got == model

    for step in range(18):
        op = rng.choice(["append", "delete", "update", "dv_delete", "compact", "vacuum"])
        if op == "append" or not model:
            rows = [(rng.randrange(40), f"s{step}") for _ in range(rng.randint(1, 4))]
            dedup = {k: v for k, v in rows}
            dedup = {k: v for k, v in dedup.items() if k not in model}
            if dedup:
                t.append(_df(spark, list(dedup.items())))
                model.update(dedup)
        elif op in ("delete", "dv_delete"):
            pivot = rng.randrange(40)
            t.delete_where(
                [("k", ">=", pivot), ("k", "<", pivot + 5)],
                mode="dv" if op == "dv_delete" else "cow",
            )
            model = {k: v for k, v in model.items() if not (pivot <= k < pivot + 5)}
        elif op == "update":
            pivot = rng.randrange(40)
            t.update_where([("k", "==", pivot)], {"v": F.lit(f"u{step}")})
            if pivot in model:
                model[pivot] = f"u{step}"
        elif op == "compact":
            t.compact(target_files=2)
        elif op == "vacuum":
            t.vacuum(retain_versions=rng.choice([1, 3]))
        if step % 6 == 5:
            sync_check()
    sync_check()


# -- LogStore seam ------------------------------------------------------------


def test_posix_log_store_put_if_absent_atomicity(tmp_path):
    """Exactly one writer wins a path; the loser's data never lands."""
    from mb_crdb_cdc_dlgen2_synapse_spark.txlog import PosixLogStore

    store = PosixLogStore()
    target = str(tmp_path / "00000000000000000000.json")
    assert store.write_if_absent(target, '{"w": 1}') is True
    assert store.write_if_absent(target, '{"w": 2}') is False
    with open(target) as f:
        assert f.read() == '{"w": 1}'
    # no temp residue
    assert os.listdir(tmp_path) == ["00000000000000000000.json"]


def test_all_commits_route_through_log_store(spark, tmp_path):
    """Every commit AND checkpoint becomes visible via the LogStore seam —
    the single primitive an object-store backend replaces."""
    from mb_crdb_cdc_dlgen2_synapse_spark.txlog import PosixLogStore

    calls = []

    class CountingStore(PosixLogStore):
        def write_if_absent(self, target, data):
            calls.append(os.path.basename(target))
            return super().write_if_absent(target, data)

    t = TxTable(spark, str(tmp_path / "t"), log_store=CountingStore())
    t.CHECKPOINT_INTERVAL = 2
    t.append(_df(spark, [(1, "a")]))
    t.append(_df(spark, [(2, "b")]))
    t.delete_where([("k", "==", 1)])
    commits, ckpts = t._list_log()
    assert len(calls) == len(commits) + len(ckpts)


def test_log_store_race_retries_to_next_version(spark, tmp_path):
    """A foreign writer winning the version race through the SAME interface
    makes the loser retry at the next version — no lost or doubled rows."""
    from mb_crdb_cdc_dlgen2_synapse_spark.txlog import PosixLogStore

    tdir = str(tmp_path / "t")

    class ContendedStore(PosixLogStore):
        fired = False

        def write_if_absent(self, target, data):
            if target.endswith("00000000000000000001.json") and not self.fired:
                ContendedStore.fired = True
                # foreign writer (default store) claims v1 first
                TxTable(spark, tdir).append(_df(spark, [(99, "foreign")]))
            return super().write_if_absent(target, data)

    t = TxTable(spark, tdir, log_store=ContendedStore())
    t.append(_df(spark, [(1, "a")]))        # v0
    t.append(_df(spark, [(2, "b")]))        # loses v1, lands at v2
    assert t.version() == 2
    assert sorted(r.k for r in t.read().collect()) == [1, 2, 99]


def test_timestamp_time_travel(spark, tmp_path, monkeypatch):
    """TIMESTAMP AS OF: read(as_of_ts=...) resolves the latest version
    committed at or before the given UTC time — including when the
    resolving metadata is a checkpoint (version time carried through the
    log prune for the oldest retained version)."""
    import time as _time

    from mb_crdb_cdc_dlgen2_synapse_spark import txlog as _tx

    # deterministic commit clock: one tick per commit
    clock = iter(range(100))

    def fake_strftime(fmt, t=None):
        return f"2026-01-01T00:00:{next(clock):02d}Z"

    monkeypatch.setattr(_tx.time, "strftime", fake_strftime)
    t = TxTable(spark, str(tmp_path / "t"))
    t.CHECKPOINT_INTERVAL = 2
    for i in range(5):                             # v0..v4 at :00..:04
        t.append(_df(spark, [(i, "x")]))
    assert t.version_at("2026-01-01T00:00:02Z") == 2
    assert t.read(as_of_ts="2026-01-01T00:00:03Z").count() == 4
    assert t.version_at("2026-01-01T00:59:59Z") == 4
    with pytest.raises(ValueError, match="no commit at or before"):
        t.version_at("2025-12-31T23:59:59Z")
    with pytest.raises(ValueError, match="not both"):
        t.read(as_of=1, as_of_ts="2026-01-01T00:00:01Z")
    # after a log prune the checkpoint carries the retained version's time
    t.vacuum(retain_versions=2)                    # keep v3, v4
    assert t.version_at("2026-01-01T00:00:03Z") in (3,)
    assert t.read(as_of_ts="2026-01-01T00:00:04Z").count() == 5
    with pytest.raises(ValueError, match="no commit"):
        t.version_at("2026-01-01T00:00:01Z")       # pruned horizon


def test_compact_by_target_size_uses_logged_bytes(spark, tmp_path):
    """compact(target_mb=...) derives the output file count from LOGGED
    per-file sizes (metadata only): tiny table -> 1 file; a sub-file-size
    target splits proportionally."""
    t = TxTable(spark, str(tmp_path / "t"))
    df = spark.range(0, 50_000).select(
        F.col("id").alias("k"), F.md5(F.col("id").cast("string")).alias("v")
    )
    for i in range(4):
        t.append(df.filter(F.col("k") % 4 == i))
    stats = t.file_stats()
    total = sum(s.get("bytes") or 0 for s in stats.values())
    assert total > 0 and all("bytes" in s for s in stats.values())
    # target far above total -> exactly one output file
    t.compact(target_mb=1024)
    assert len(t.snapshot()[1]) == 1
    assert t.count_rows() == 50_000
    # re-split: target smaller than total/2 -> >= 2 files
    per_file_mb = max(1, total // (1024 * 1024))
    t2 = TxTable(spark, str(tmp_path / "t2"))
    for i in range(4):
        t2.append(df.filter(F.col("k") % 4 == i))
    tiny_target = max(
        1, sum(s.get("bytes") or 0 for s in t2.file_stats().values())
        // (2 * 1024 * 1024),
    )
    if tiny_target >= 1:
        t2.compact(target_mb=tiny_target)
        assert len(t2.snapshot()[1]) >= 2 or tiny_target * 2 * 1024 * 1024 > total
    assert t2.count_rows() == 50_000


def test_concurrent_writers_race_checkpoint_writes(spark, tmp_path):
    """Checkpoint-every-commit under multi-threaded writers: every commit
    lands exactly once, checkpoint races resolve idempotently (same
    content, first writer keeps the file), and the final state is exact."""
    import threading

    tdir = str(tmp_path / "t")
    base = spark.createDataFrame([(0, "seed")], "k int, v string")
    TxTable(spark, tdir).append(base)
    errors = []

    def writer(wid: int):
        try:
            t = TxTable(spark, tdir)
            t.CHECKPOINT_INTERVAL = 1  # checkpoint after EVERY commit
            for j in range(3):
                t.append(
                    spark.createDataFrame(
                        [(100 * wid + j, f"w{wid}")], "k int, v string"
                    )
                )
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=writer, args=(w,)) for w in range(1, 4)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors, errors
    t = TxTable(spark, tdir)
    assert t.version() == 9  # 1 seed + 9 racing commits, all landed
    got = sorted(r.k for r in t.read().collect())
    assert got == sorted([0] + [100 * w + j for w in range(1, 4) for j in range(3)])
    _commits, ckpts = t._list_log()
    assert ckpts  # at least the raced checkpoints that won their link
    # resolution through any checkpoint equals full replay
    full = t._empty_state()
    for c in t._commits():
        t._apply_commit(full, c)
    assert t._state() == full


def test_parquet_manifest_checkpoint_roundtrip_and_prune(spark, tmp_path):
    """Checkpoints store the file manifest columnar (parquet sidecar) with
    a JSON scalar head: state resolves identically through it, legacy
    inline-JSON checkpoints stay readable, and vacuum prunes sidecars with
    their heads."""
    import glob
    import json as _json

    t = TxTable(spark, str(tmp_path / "t"))
    t.CHECKPOINT_INTERVAL = 3
    for i in range(7):
        t.append(_df(spark, [(i, f"v{i}")]))
    t.delete_where([("k", "==", 1)], mode="dv")
    t.append(_df(spark, [(100, "x")]))
    t.write_checkpoint()
    # resolved state via checkpoint+tail == ground truth
    assert sorted(r.k for r in t.read().collect()) == [0, 2, 3, 4, 5, 6, 100]
    sidecars = glob.glob(os.path.join(t.path, "_txlog", "*.checkpoint.parquet"))
    heads = glob.glob(os.path.join(t.path, "_txlog", "*.checkpoint.json"))
    assert sidecars and heads
    head = _json.load(open(sorted(heads)[-1]))
    assert head.get("manifest") and "active" not in head  # manifest externalized

    # a LEGACY inline checkpoint (no manifest pointer) still resolves
    t2 = TxTable(spark, str(tmp_path / "t2"))
    t2.append(_df(spark, [(1, "a"), (2, "b")]))
    s = t2._state()
    legacy = {
        "version": s["version"], "active": s["active"], "schema": s["schema"],
        "checks": {}, "clustering": [], "stats": s["stats"], "dvs": [],
        "dv_counts": {}, "txn": {}, "utc": s["utc"],
    }
    lp = os.path.join(t2.path, "_txlog", f"{s['version']:020d}.checkpoint.json")
    with open(lp, "w") as f:
        _json.dump(legacy, f)
    t2b = TxTable(spark, t2.path)  # fresh instance, cold caches
    assert sorted(r.k for r in t2b.read().collect()) == [1, 2]

    # vacuum prunes old sidecars together with their heads
    for i in range(200, 206):
        t.append(_df(spark, [(i, "y")]))
    t.vacuum(retain_versions=1, prune_log=True)
    left = glob.glob(os.path.join(t.path, "_txlog", "*.checkpoint.parquet"))
    assert len(left) <= 2  # v_keep's (+ possibly a newer interval one)
    assert sorted(r.k for r in t.read().collect()) == [
        0, 2, 3, 4, 5, 6, 100, 200, 201, 202, 203, 204, 205,
    ]


def test_multipart_manifest_roundtrip_and_prune(spark, tmp_path):
    """Above MANIFEST_PART_ROWS the checkpoint manifest splits into
    numbered parquet parts; resolution concatenates them, legacy
    single-part checkpoints stay readable, and vacuum prunes every part."""
    t = TxTable(spark, str(tmp_path / "t"))
    t.MANIFEST_PART_ROWS = 4  # force splitting at tiny counts
    for i in range(6):
        t.append(_df(spark, [(i, f"v{i}")]))
    t.write_checkpoint()
    parts = glob.glob(os.path.join(t.path, "_txlog", "*.checkpoint.*-of-*.parquet"))
    assert len(parts) >= 2  # 6 data rows / 4 per part
    # a FRESH handle resolves purely from head-checkpoint + parts
    fresh = TxTable(spark, str(tmp_path / "t"))
    fresh.MANIFEST_PART_ROWS = 4
    assert sorted(r.k for r in fresh.read().collect()) == list(range(6))
    # more commits + prune: old parts vanish, state stays correct
    for i in range(6, 9):
        fresh.append(_df(spark, [(i, f"v{i}")]))
    fresh.vacuum(retain_versions=1, prune_log=True)
    assert sorted(r.k for r in fresh.read().collect()) == list(range(9))
    leftover = glob.glob(os.path.join(t.path, "_txlog", "*.checkpoint.*"))
    versions = {os.path.basename(p).split(".")[0] for p in leftover}
    assert len(versions) == 1  # only the fresh prune checkpoint's files remain


def test_100k_file_manifest_resolves_in_parts(spark, tmp_path):
    """The pinned large-table contract: a checkpoint over >=100k logged
    files (synthetic stats — no physical files needed for metadata
    resolution) writes MULTIPLE manifest parts and resolves back
    losslessly via arrow columns, bounded by part size, not table size."""
    import time as _time

    t = TxTable(spark, str(tmp_path / "t"))
    t.CHECKPOINT_INTERVAL = 0  # manual checkpointing only
    t.MANIFEST_PART_ROWS = 40_000
    t.append(_df(spark, [(0, "seed")]))
    n_seed = len(t.snapshot()[1])
    synthetic = [f"part=0/synth-{i:06d}.parquet" for i in range(100_000)]
    stats = {
        f: {"rows": 10, "bytes": 1000, "min": {"k": i}, "max": {"k": i + 9}}
        for i, f in enumerate(synthetic)
    }
    t._commit(synthetic, lambda active: [], t.snapshot()[2], None, "append", stats)
    t.write_checkpoint()
    parts = glob.glob(os.path.join(t.path, "_txlog", "*.checkpoint.*-of-*.parquet"))
    assert len(parts) == 3  # ceil((100_000 + n_seed) / 40_000)
    t0 = _time.time()
    fresh = TxTable(spark, str(tmp_path / "t"))
    v, active, _schema = fresh.snapshot()
    elapsed = _time.time() - t0
    assert len(active) == 100_000 + n_seed
    # logical stats survive the split (spot-check pruning metadata)
    fs = fresh.file_stats()
    assert fs["part=0/synth-050000.parquet"]["min"] == {"k": 50000}
    assert elapsed < 30, f"manifest resolution took {elapsed:.1f}s"
