"""Shallow CLONE (txlog.TxTable.clone_to): zero-copy creation, carried
metadata (schema / stats / checks / clustering / deletion vectors), and
full independence of the two tables afterward — including surviving a
source-side vacuum, which a path-referencing shallow clone cannot."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from mb_crdb_cdc_dlgen2_synapse_spark.txlog import TxTable


def _df(spark, rows):
    return spark.createDataFrame(rows, "k int, v string")


def _inodes(root):
    out = {}
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames[:] = [d for d in dirnames if d != "_txlog"]
        for n in filenames:
            full = os.path.join(dirpath, n)
            if n.endswith(".parquet"):
                out[os.path.relpath(full, root)] = os.stat(full).st_ino
    return out


def test_clone_is_zero_copy_and_reads_identically(spark, tmp_path):
    src = TxTable(spark, str(tmp_path / "src"))
    src.append(_df(spark, [(i, f"v{i}") for i in range(20)]))
    src.append(_df(spark, [(i, f"w{i}") for i in range(20, 30)]))

    dst = src.clone_to(str(tmp_path / "dst"))
    # every cloned parquet shares the source file's inode: zero bytes copied
    s_ino, d_ino = _inodes(src.path), _inodes(dst.path)
    assert d_ino and d_ino == {rel: s_ino[rel] for rel in d_ino}
    assert sorted((r.k, r.v) for r in dst.read().collect()) == sorted(
        (r.k, r.v) for r in src.read().collect()
    )
    # clone history starts fresh at v0 with the provenance recorded
    assert dst.version() == 0
    c0 = dst.history()[0]
    assert c0["op"] == "clone"
    assert c0["clone_source_version"] == src.version()


def test_clone_carries_dvs_checks_and_stats(spark, tmp_path):
    src = TxTable(spark, str(tmp_path / "src"))
    src.append(
        _df(spark, [(i, f"v{i}") for i in range(100)]),
        partition_by=None,
    )
    src.add_check("k_nonneg", "k >= 0")
    src.delete_where([("k", ">=", 90)], mode="dv")  # merge-on-read delete

    dst = src.clone_to(str(tmp_path / "dst"))
    # DV carried: deleted rows stay invisible in the clone
    assert sorted(r.k for r in dst.read().collect()) == list(range(90))
    # metadata row count subtracts carried DV counts without file I/O
    assert dst.count_rows() == 90
    # stats carried: a pruning read plans from the clone's own log
    assert sorted(r.k for r in dst.read(predicates=[("k", "<", 5)]).collect()) == [
        0,
        1,
        2,
        3,
        4,
    ]
    # checks carried: a violating append is refused by the CLONE
    with pytest.raises(ValueError, match="k_nonneg"):
        dst.append(_df(spark, [(-1, "bad")]))


def test_clone_dml_leaves_source_untouched_and_vice_versa(spark, tmp_path):
    src = TxTable(spark, str(tmp_path / "src"))
    src.append(_df(spark, [(i, f"v{i}") for i in range(50)]))
    dst = src.clone_to(str(tmp_path / "dst"))

    before = {
        rel: os.stat(os.path.join(src.path, rel)).st_mtime_ns
        for rel in src.snapshot()[1]
    }
    dst.update_where([("k", "<", 10)], {"v": F.lit("patched")})
    dst.delete_where([("k", ">=", 40)])
    # source files byte-identical (CoW wrote into the clone's dir only)
    after = {
        rel: os.stat(os.path.join(src.path, rel)).st_mtime_ns
        for rel in src.snapshot()[1]
    }
    assert after == before
    assert sorted(r.k for r in src.read().collect()) == list(range(50))
    got = {r.k: r.v for r in dst.read().collect()}
    assert sorted(got) == list(range(40))
    assert got[0] == "patched" and got[39] == "v39"

    # and writes to the SOURCE never show up in the clone
    src.append(_df(spark, [(999, "late")]))
    assert 999 not in {r.k for r in dst.read().collect()}


def test_source_vacuum_cannot_break_the_clone(spark, tmp_path):
    src = TxTable(spark, str(tmp_path / "src"))
    src.append(_df(spark, [(i, f"v{i}") for i in range(30)]))
    dst = src.clone_to(str(tmp_path / "dst"))

    # rewrite + vacuum the source: its old files are unlinked, but the
    # shared inodes survive through the clone's links
    src.overwrite(_df(spark, [(0, "gone")]))
    src.vacuum(retain_versions=1)
    assert sorted(r.k for r in dst.read().collect()) == list(range(30))


def test_clone_as_of_is_the_historical_snapshot(spark, tmp_path):
    src = TxTable(spark, str(tmp_path / "src"))
    src.append(_df(spark, [(1, "a"), (2, "b")]))  # v0
    src.overwrite(_df(spark, [(3, "c")]))  # v1
    dst = src.clone_to(str(tmp_path / "dst"), as_of=0)
    assert sorted(r.k for r in dst.read().collect()) == [1, 2]


def test_clone_across_checkpoint_and_pruned_log(spark, tmp_path):
    """Clone resolves its source state from checkpoint + tail: after many
    commits, a mid-history checkpoint, and a log prune, the clone still
    carries the exact current snapshot."""
    src = TxTable(spark, str(tmp_path / "src"))
    src.CHECKPOINT_INTERVAL = 5
    for i in range(7):
        src.append(_df(spark, [(i, f"v{i}")]))
    src.vacuum(retain_versions=2, prune_log=True)
    dst = src.clone_to(str(tmp_path / "dst"))
    assert sorted(r.k for r in dst.read().collect()) == list(range(7))
    # the clone's own log is independent: prune the source completely
    src.overwrite(_df(spark, [(99, "z")]))
    src.vacuum(retain_versions=1, prune_log=True)
    assert sorted(r.k for r in dst.read().collect()) == list(range(7))


def test_randomized_dml_with_clones_stays_independent(spark, tmp_path):
    """Random DML/compact/vacuum on the source with clones taken at random
    points: every clone must stay frozen at its creation-time model no
    matter what the source does afterward (including DV deletes, CoW
    rewrites, compaction, and retention vacuum), and the source must match
    its own model throughout."""
    import random

    from pyspark.sql import functions as F

    rng = random.Random(23)
    t = TxTable(spark, str(tmp_path / "t"))
    t.CHECKPOINT_INTERVAL = 3
    model: dict[int, str] = {}
    clones: list[tuple[TxTable, dict[int, str]]] = []

    for step in range(16):
        op = rng.choice(
            ["append", "delete", "dv_delete", "update", "compact", "vacuum", "clone"]
        )
        if op == "append" or not model:
            rows = {
                k: f"s{step}"
                for k in [rng.randrange(40) for _ in range(rng.randint(1, 4))]
                if k not in model
            }
            if rows:
                t.append(_df(spark, list(rows.items())))
                model.update(rows)
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
            t.vacuum(retain_versions=1)
        elif op == "clone" and t.version() >= 0 and len(clones) < 3:
            c = t.clone_to(str(tmp_path / f"clone{step}"))
            clones.append((c, dict(model)))
        if step % 5 == 4:
            assert {r.k: r.v for r in t.read().collect()} == model
            for c, frozen in clones:
                assert {r.k: r.v for r in c.read().collect()} == frozen

    assert {r.k: r.v for r in t.read().collect()} == model
    for c, frozen in clones:
        assert {r.k: r.v for r in c.read().collect()} == frozen


def test_clone_refuses_bad_endpoints(spark, tmp_path):
    empty = TxTable(spark, str(tmp_path / "empty"))
    with pytest.raises(ValueError, match="not a table"):
        empty.clone_to(str(tmp_path / "x"))
    src = TxTable(spark, str(tmp_path / "src"))
    src.append(_df(spark, [(1, "a")]))
    src.clone_to(str(tmp_path / "dst"))
    with pytest.raises(ValueError, match="already a table"):
        src.clone_to(str(tmp_path / "dst"))
