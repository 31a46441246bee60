"""Row tracking (txlog.enable_row_tracking — the published Delta
row-tracking design): every row gets a stable lifetime identity.
Fresh rows: id = logged per-file base + position (pure metadata, no
bytes written). Rewrites (compact, Z-order, CoW DELETE/UPDATE,
merge-on-read update copies): the id rides along as a materialized
column. read(row_ids=True) exposes _row_id = coalesce(materialized,
base + position). Ids are unique forever — the high-water mark never
rewinds."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mb_crdb_cdc_dlgen2_synapse_spark.txlog import TxTable


def _df(spark, rows, schema="k int, v string"):
    return spark.createDataFrame(rows, schema)


def _ids(t: TxTable) -> dict[int, int]:
    return {r.k: r._row_id for r in t.read(row_ids=True).collect()}


def test_enable_backfills_and_fresh_appends_allocate(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [(1, "a"), (2, "b")]))
    with pytest.raises(ValueError, match="enable_row_tracking"):
        t.read(row_ids=True)
    t.enable_row_tracking()
    ids0 = _ids(t)
    assert sorted(ids0.values()) == [0, 1]  # dense backfill
    t.append(_df(spark, [(3, "c"), (4, "d")]))
    ids1 = _ids(t)
    assert {k: ids1[k] for k in (1, 2)} == ids0  # existing ids unchanged
    assert len(set(ids1.values())) == 4          # all unique
    assert min(ids1[3], ids1[4]) >= 2            # fresh ids above the mark
    assert "row-tracking" in t.protocol()["writer"]
    assert "row-tracking" not in t.protocol()["reader"]


def test_ids_survive_compact_zorder_and_cow_dml(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [(i, f"v{i}") for i in range(20)]))
    t.enable_row_tracking()
    t.append(_df(spark, [(i, f"v{i}") for i in range(20, 40)]))
    before = _ids(t)
    t.compact(target_files=2)
    assert _ids(t) == before                      # compaction: same identities
    t.compact(target_files=3, z_order=["k"])
    assert _ids(t) == before                      # relayout: same identities
    t.delete_where([("k", ">=", 35)])
    after_del = _ids(t)
    assert after_del == {k: v for k, v in before.items() if k < 35}
    t.update_where([("k", "==", 3)], {"v": F.lit("patched")})
    after_upd = _ids(t)
    assert after_upd == after_del                 # update keeps identity
    got = {r.k: r.v for r in t.read().collect()}
    assert got[3] == "patched"


def test_ids_survive_dv_delete_and_dv_update(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [(i, f"v{i}") for i in range(10)]))
    t.enable_row_tracking()
    before = _ids(t)
    t.delete_where([("k", "==", 4)], mode="dv")
    assert _ids(t) == {k: v for k, v in before.items() if k != 4}
    t.update_where([("k", "==", 7)], {"v": F.lit("u")}, mode="dv")
    after = _ids(t)
    assert after == {k: v for k, v in before.items() if k != 4}
    assert {r.v for r in t.read().filter(F.col("k") == 7).collect()} == {"u"}
    # and a compact after the DV churn still preserves everything
    t.compact(target_files=1)
    assert _ids(t) == after


def test_ids_survive_checkpoint_prune_restore_and_clone(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.CHECKPOINT_INTERVAL = 3
    t.append(_df(spark, [(1, "a"), (2, "b")]))
    t.enable_row_tracking()
    ids0 = _ids(t)
    v_base = t.version()
    t.append(_df(spark, [(3, "c")]))
    t.update_where([("k", "==", 1)], {"v": F.lit("u")})
    ids1 = _ids(t)
    assert {k: ids1[k] for k in ids0} == ids0
    # restore: identities roll back WITH the snapshot (stats carried)
    t.restore(v_base)
    assert _ids(t) == ids0
    # re-append after restore: no id reuse (the mark never rewinds)
    t.append(_df(spark, [(9, "z")]))
    ids2 = _ids(t)
    assert set(ids2.values()) >= set(ids0.values())
    assert len(set(ids2.values())) == len(ids2)
    for i in range(4):
        t.append(_df(spark, [(10 + i, "w")]))
    t.write_checkpoint()
    fresh = TxTable(spark, str(tmp_path / "t"))
    pre = _ids(t)
    assert _ids(fresh) == pre                     # through the checkpoint
    clone = t.clone_to(str(tmp_path / "c"))
    assert _ids(clone) == pre                     # zero-copy clone keeps ids
    clone.append(_df(spark, [(99, "q")]))
    idsc = _ids(clone)
    assert len(set(idsc.values())) == len(idsc)


def test_overwrite_mints_new_identities(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [(1, "a")]))
    t.enable_row_tracking()
    ids0 = set(_ids(t).values())
    t.overwrite(_df(spark, [(1, "a2")]))
    ids1 = set(_ids(t).values())
    assert not (ids0 & ids1)  # an overwrite is NEW rows, not the old ones


def test_replace_where_carries_kept_rows(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [(i, f"v{i}") for i in range(10)]).coalesce(1))
    t.enable_row_tracking()
    before = _ids(t)
    t.replace_where(
        _df(spark, [(3, "new3"), (4, "new4")]),
        [("k", ">=", 3), ("k", "<", 5)],
    )
    after = _ids(t)
    # carried (non-matching) rows of the rewritten file keep their ids
    assert {k: after[k] for k in after if k not in (3, 4)} == {
        k: v for k, v in before.items() if k not in (3, 4)
    }
    # the replacement region is NEW rows
    assert {after[3], after[4]}.isdisjoint(set(before.values()))


@pytest.mark.parametrize("mode", ["cow", "dv"])
def test_merge_preserves_updated_and_carried_ids(spark, tmp_path, mode):
    """MERGE: updated rows keep the target row's identity (the row was
    changed, not replaced); carried rows keep theirs; inserts mint fresh
    ids — in both the CoW and merge-on-read physical strategies."""
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [(i, f"v{i}") for i in range(8)]).coalesce(1))
    t.enable_row_tracking()
    before = _ids(t)
    src = _df(spark, [(2, "updated"), (100, "inserted")])
    t.merge_into(src, on=["k"], mode=mode)
    after = _ids(t)
    assert after[2] == before[2]                       # update: same identity
    carried = {k: v for k, v in before.items() if k != 2}
    assert {k: after[k] for k in carried} == carried   # carried rows stable
    assert after[100] not in set(before.values())      # insert: fresh id
    assert len(set(after.values())) == len(after)
    got = {r.k: r.v for r in t.read().collect()}
    assert got[2] == "updated" and got[100] == "inserted"


def test_change_feed_row_ids_pair_updates(spark, tmp_path):
    """CDF + row tracking: a delete and an insert at one version sharing
    a _row_id ARE that row's update (pre/post image) — the keyless
    correlation row ids exist for."""
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [(1, "a"), (2, "b"), (3, "c")]).coalesce(1))
    t.enable_row_tracking()
    ids = _ids(t)
    v0 = t.version()
    t.update_where([("k", "==", 2)], {"v": F.lit("b2")})
    feed = t.read_changes(v0, row_ids=True).collect()
    by_type = {}
    for r in feed:
        by_type.setdefault(r._change_type, []).append(r)
    # the rewrite emits the whole file as delete+insert; pair by _row_id
    pre = {r._row_id: r.v for r in by_type["delete"]}
    post = {r._row_id: r.v for r in by_type["insert"]}
    assert set(pre) == set(post) == set(ids.values())
    changed = {rid for rid in pre if pre[rid] != post[rid]}
    assert changed == {ids[2]}
    assert post[ids[2]] == "b2" and pre[ids[2]] == "b"
    # dv delete: the deleted image carries the row's id
    t.delete_where([("k", "==", 3)], mode="dv")
    dv_feed = [
        r for r in t.read_changes(t.version() - 1, row_ids=True).collect()
        if r._change_type == "delete"
    ]
    assert {r._row_id for r in dv_feed} == {ids[3]}
    # without tracking enabled the flag refuses
    t2 = TxTable(spark, str(tmp_path / "t2"))
    t2.append(_df(spark, [(1, "a")]))
    import pytest as _pytest

    with _pytest.raises(ValueError, match="enable_row_tracking"):
        t2.read_changes(-1, row_ids=True)


def test_randomized_dml_mix_preserves_identity_invariants(spark, tmp_path):
    """Fuzz the identity contract: across a random interleaving of
    appends, CoW/DV deletes and updates, merges, compactions, and
    checkpoints — (a) a surviving row NEVER changes its id, (b) a new
    row NEVER reuses any id ever seen, (c) ids stay unique."""
    import random

    rng = random.Random(53)
    t = TxTable(spark, str(tmp_path / "t"))
    t.CHECKPOINT_INTERVAL = 4
    t.append(_df(spark, [(k, f"s0-{k}") for k in range(6)]))
    t.enable_row_tracking()
    prev = _ids(t)
    ever_seen = set(prev.values())
    for step in range(16):
        op = rng.choice(
            ["append", "delete", "dv_delete", "update", "dv_update",
             "merge", "compact"]
        )
        before = _ids(t)
        if op == "append":
            rows = {
                k: f"s{step}"
                for k in [rng.randrange(40) for _ in range(rng.randint(1, 3))]
                if k not in before
            }
            if rows:
                t.append(_df(spark, list(rows.items())))
        elif op in ("delete", "dv_delete"):
            pivot = rng.randrange(40)
            t.delete_where(
                [("k", ">=", pivot), ("k", "<", pivot + 5)],
                mode="dv" if op == "dv_delete" else "cow",
            )
        elif op in ("update", "dv_update"):
            pivot = rng.randrange(40)
            t.update_where(
                [("k", "==", pivot)], {"v": F.lit(f"u{step}")},
                mode="dv" if op == "dv_update" else "cow",
            )
        elif op == "merge":
            ks = [rng.randrange(40) for _ in range(2)]
            t.merge_into(
                _df(spark, [(k, f"m{step}") for k in set(ks)]),
                on=["k"], mode=rng.choice(["cow", "dv"]),
            )
        elif op == "compact":
            t.compact(target_files=rng.choice([1, 2]))
        cur = _ids(t)
        surviving = set(before) & set(cur)
        assert {k: cur[k] for k in surviving} == {
            k: before[k] for k in surviving
        }, f"step {step} op {op}: surviving row changed identity"
        fresh = {cur[k] for k in set(cur) - set(before)}
        assert not (fresh & ever_seen), f"step {step} op {op}: id reuse"
        assert len(set(cur.values())) == len(cur), f"step {step}: collision"
        ever_seen |= set(cur.values())


def test_read_update_pairs_four_way_vocabulary(spark, tmp_path):
    """Delta CDF's insert/delete/update_preimage/update_postimage split,
    derived keylessly from row identity."""
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [(1, "a"), (2, "b"), (3, "c")]).coalesce(1))
    t.enable_row_tracking()
    ids = _ids(t)
    v0 = t.version()
    t.update_where([("k", "==", 2)], {"v": F.lit("b2")})   # rewrite: 1,2,3 move
    t.delete_where([("k", "==", 3)], mode="dv")            # pure delete
    t.append(_df(spark, [(9, "z")]))                       # pure insert
    feed = t.read_update_pairs(v0).collect()
    by = {}
    for r in feed:
        by.setdefault(r._change_type, []).append(r)
    # the rewrite moved all three rows: all are update pairs (carried rows
    # included, values unchanged), split into pre/post by identity
    assert {r._row_id for r in by["update_preimage"]} == set(ids.values())
    assert {r._row_id for r in by["update_postimage"]} == set(ids.values())
    post = {r._row_id: r.v for r in by["update_postimage"]}
    pre = {r._row_id: r.v for r in by["update_preimage"]}
    changed = {rid for rid in post if post[rid] != pre[rid]}
    assert changed == {ids[2]} and post[ids[2]] == "b2"
    # the dv delete and the append stay pure
    assert [(r.k, r._row_id) for r in by["delete"]] == [(3, ids[3])]
    assert [r.k for r in by["insert"]] == [9]


def test_racing_writers_never_collide_ids(spark, tmp_path):
    """Two writers racing appends on one table: the loser re-allocates
    its base row ids from the winner's advanced high-water mark on retry,
    so ids stay globally unique with no coordinator."""
    import threading

    path = str(tmp_path / "t")
    t0 = TxTable(spark, path)
    t0.append(_df(spark, [(0, "seed")]))
    t0.enable_row_tracking()
    errs = []

    def writer(tag: int):
        try:
            t = TxTable(spark, path)
            for j in range(3):
                t.append(_df(spark, [(100 * tag + j, f"w{tag}-{j}")]))
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    threads = [threading.Thread(target=writer, args=(i,)) for i in (1, 2)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs
    ids = _ids(TxTable(spark, path))
    assert len(ids) == 7
    assert len(set(ids.values())) == 7  # no collisions across racers
    # and the logged high-water mark is past every allocated id
    st = TxTable(spark, path)._state()
    assert st["rowtrack"]["hwm"] > max(ids.values())
