"""Three published Delta features on txlog, all metadata-only declarations:

- column DEFAULTs (``allowColumnDefaults``): write-time fill for omitted
  columns, existing rows untouched;
- identity columns (``GENERATED {ALWAYS|BY DEFAULT} AS IDENTITY``): values
  are an affine map of the row-tracking id — race-safe commit-time
  allocation, no write-path shuffle, stable across rewrites;
- type widening (``typeWidening``): ALTER COLUMN TYPE to a wider type with
  zero data I/O; the parquet reader upcasts old files natively.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mb_crdb_cdc_dlgen2_synapse_spark.txlog import TxTable, TxConflictError


def _df(spark, rows, schema="k int, v string"):
    return spark.createDataFrame(rows, schema)


# -- column defaults ---------------------------------------------------------


def test_default_fills_omitted_column_only_future_writes(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [(1, "a")]))
    t.add_column("src", "string")
    t.append(spark.createDataFrame([(2, "b", "explicit")], "k int, v string, src string"))
    t.set_column_default("src", "'crawl'")
    # pre-declaration rows untouched (NULL), supplied values win, omitted fills
    t.append(_df(spark, [(3, "c")]))
    t.append(spark.createDataFrame([(4, "d", None)], "k int, v string, src string"))
    got = {r.k: r.src for r in t.read().collect()}
    assert got == {1: None, 2: "explicit", 3: "crawl", 4: None}
    assert "default-columns" in t.protocol()["writer"]
    assert t.column_defaults() == {"src": "'crawl'"}


def test_default_casts_to_column_type_and_survives_checkpoint(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(spark.createDataFrame([(1, 1.5)], "k int, w double"))
    t.set_column_default("w", "2")  # int literal -> cast double
    for i in range(2, 25):  # cross a checkpoint boundary
        t.append(spark.createDataFrame([(i,)], "k int"))
    assert t.read().filter("k = 24").collect()[0].w == 2.0
    t2 = TxTable(spark, t.path)  # fresh handle resolves via checkpoint
    assert t2.column_defaults() == {"w": "2"}


def test_default_refuses_column_refs_and_missing_and_generated(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [(1, "a")]))
    with pytest.raises(ValueError, match="constant-foldable"):
        t.set_column_default("v", "k + 1")
    with pytest.raises(ValueError, match="does not exist"):
        t.set_column_default("nope", "'x'")
    t.set_generated_column("klabel", "concat('k', k)")
    with pytest.raises(ValueError, match="GENERATED"):
        t.set_column_default("klabel", "'x'")


def test_drop_default_ends_fill(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [(1, "a")]))
    t.set_column_default("v", "'dflt'")
    t.drop_column_default("v")
    t.append(spark.createDataFrame([(2,)], "k int"))
    assert t.read().filter("k = 2").collect()[0].v is None


def test_overwrite_dropping_column_prunes_default(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [(1, "a")]))
    t.set_column_default("v", "'dflt'")
    t.overwrite(spark.createDataFrame([(1, 9)], "k int, n int"))
    assert t.column_defaults() == {}
    t.add_column("v", "string")  # re-added column must NOT inherit the rule
    t.append(spark.createDataFrame([(2, 1)], "k int, n int"))
    assert t.read().filter("k = 2").collect()[0].v is None


def test_racing_default_declaration_aborts_not_clobbers(spark, tmp_path):
    """A default declared by ANOTHER writer between this writer's state
    read and its commit must abort (the merged defaults map was computed
    from a stale snapshot — retrying would silently drop the racer's
    rule), mirroring the _commit(base=) lost-update contract."""
    path = str(tmp_path / "t")
    t = TxTable(spark, path)
    t.append(spark.createDataFrame([(1, "a", "b")], "k int, v string, w string"))
    racer = TxTable(spark, path)

    orig_state = t._state
    fired = {"n": 0}

    def racing_state(*a, **kw):
        st = orig_state(*a, **kw)
        if fired["n"] == 0:
            fired["n"] = 1
            racer.set_column_default("w", "'theirs'")
        return st

    t._state = racing_state
    try:
        with pytest.raises(TxConflictError):
            t.set_column_default("v", "'mine'")
    finally:
        t._state = orig_state
    # the racer's rule survived
    assert TxTable(spark, path).column_defaults() == {"w": "'theirs'"}


# -- identity columns --------------------------------------------------------


def test_identity_always_assigns_insertion_order(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [(10, "a"), (11, "b")]).coalesce(1).sortWithinPartitions("k"))
    t.set_identity_column("uid", start=100, step=5)
    got = {r.k: r.uid for r in t.read().collect()}
    # backfill: ids are start + step * row_id (row ids 0,1 in file order)
    assert sorted(got.values()) == [100, 105]
    t.append(_df(spark, [(12, "c")]))
    got = {r.k: r.uid for r in t.read().collect()}
    assert got[12] == 110  # next hwm slot
    assert len(set(got.values())) == 3
    assert "identity-columns" in t.protocol()["writer"]


def test_identity_always_refuses_supplied_values(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [(1, "a")]))
    t.set_identity_column("uid")
    with pytest.raises(ValueError, match="ALWAYS"):
        t.append(spark.createDataFrame([(2, "b", 7)], "k int, v string, uid long"))
    with pytest.raises(ValueError, match="ALWAYS"):
        t.update_where([("k", "==", 1)], {"uid": "99"})
    with pytest.raises(ValueError, match="ALWAYS"):
        t.merge_into(_df(spark, [(1, "z")]), on=["k"])


def test_identity_stable_across_update_and_compact(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [(i, f"v{i}") for i in range(10)]))
    t.set_identity_column("uid")
    before = {r.k: r.uid for r in t.read().collect()}
    t.update_where([("k", "==", 3)], {"v": "'patched'"})
    t.compact(target_files=1)
    after = {r.k: r.uid for r in t.read().collect()}
    assert after == before
    assert t.read().filter("k = 3").collect()[0].v == "patched"
    # deletes leave gaps, never reuse
    t.delete_where([("k", "==", 0)])
    t.append(_df(spark, [(20, "new")]))
    final = {r.k: r.uid for r in t.read().collect()}
    assert before[0] not in final.values()
    assert final[20] not in before.values()


def test_identity_by_default_allows_explicit(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [(1, "a")]))
    t.set_identity_column("uid", always=False)
    t.append(spark.createDataFrame([(2, "b", 777)], "k int, v string, uid long"))
    t.append(_df(spark, [(3, "c")]))
    got = {r.k: r.uid for r in t.read().collect()}
    assert got[2] == 777           # explicit value stored
    assert got[3] is not None      # omitted value assigned
    assert got[3] != 777


def test_identity_time_travel_and_row_ids_compose(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [(1, "a")]))
    v0 = t.version()
    t.set_identity_column("uid", start=0, step=1)
    # pre-declaration snapshot has no uid column
    assert "uid" not in t.read(as_of=v0).columns
    df = t.read(row_ids=True)
    assert {"uid", "_row_id"} <= set(df.columns)
    r = df.collect()[0]
    assert r.uid == r._row_id  # start=0 step=1 is the identity map


def test_identity_resolves_in_change_feed(spark, tmp_path):
    """A CDC consumer sees the same identity values read() shows — the
    feed resolves coalesce(stored, affine(_row_id)) itself instead of
    rendering NULL for virtually-assigned rows (and drops the internal
    _row_id again unless row_ids=True was asked for)."""
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [(1, "a"), (2, "b")]))
    t.set_identity_column("uid", start=100, step=5)
    v_decl = t.version()
    t.append(_df(spark, [(3, "c")]))
    t.update_where([("k", "==", 2)], {"v": "'patched'"})
    head = {r.k: r.uid for r in t.read().collect()}
    feed_df = t.read_changes(v_decl)
    assert "_row_id" not in feed_df.columns
    feed = feed_df.collect()
    ins = {r.k: r.uid for r in feed if r._change_type == "insert"}
    dels = {r.k: r.uid for r in feed if r._change_type == "delete"}
    assert ins[3] == head[3]
    assert ins[2] == head[2] and dels[2] == head[2]  # rewrite pair agrees
    # a DV (merge-on-read) delete image resolves too
    t.delete_where([("k", "==", 1)], mode="dv")
    dv_del = [
        r for r in t.read_changes(t.version() - 1).collect()
        if r._change_type == "delete"
    ]
    assert [r.uid for r in dv_del] == [head[1]]
    # pre-declaration commits render under the end vocabulary: rows in
    # files the enablement backfill reached resolve to head's values
    full = t.read_changes(-1).collect()
    first_ins = {
        r.k: r.uid for r in full
        if r._change_type == "insert" and r._commit_version == 0
    }
    assert first_ins == {1: head[1], 2: head[2]}
    # update-pair classification sees resolved values on both images
    pairs = t.read_update_pairs(v_decl).collect()
    pre = [r for r in pairs if r._change_type == "update_preimage"]
    assert pre and all(r.uid == head[r.k] for r in pre)


def test_identity_fully_stored_skips_resolution_scan(spark, tmp_path):
    """When every active file records zero nulls for every identity column
    (explicit BY DEFAULT values everywhere), read() skips the position-
    carrying resolution scan — a metadata-only decision from logged footer
    stats. A single file with a virtually-assigned row brings it back."""
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [(1, "a")]))
    t.set_identity_column("uid", always=False)
    # the declaration-era file stores NO uid: resolution required
    t.append(spark.createDataFrame([(2, "b", 500)], "k int, v string, uid long"))

    def boom(*a, **kw):  # trip if the resolving path is taken
        raise AssertionError("resolution scan should have been skipped")

    got = {r.k: r.uid for r in t.read().collect()}  # mixed: resolves fine
    assert got[2] == 500 and got[1] is not None
    # rewrite everything with stored values: overwrite with explicit uids
    t.overwrite(
        spark.createDataFrame(
            [(1, "a", 1000), (2, "b", 1001)], "k int, v string, uid long"
        )
    )
    t._attach_row_ids = boom
    assert {r.k: r.uid for r in t.read().collect()} == {1: 1000, 2: 1001}
    # row_ids=True still resolves (and therefore scans)
    with pytest.raises(AssertionError, match="skipped"):
        t.read(row_ids=True).collect()
    del t._attach_row_ids
    # one omitted-value append re-engages the resolving path
    t.append(_df(spark, [(3, "c")]))
    got = {r.k: r.uid for r in t.read().collect()}
    assert got[3] is not None and got[3] not in (1000, 1001)


def test_identity_refuses_existing_column_and_zero_step(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [(1, "a")]))
    with pytest.raises(ValueError, match="already exists"):
        t.set_identity_column("v")
    with pytest.raises(ValueError, match="non-zero"):
        t.set_identity_column("uid", step=0)


# -- type widening -----------------------------------------------------------


def test_widen_int_to_long_zero_io(spark, tmp_path):
    import os

    t = TxTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [(1, "a"), (2, "b")]))
    files_before = {
        f: os.path.getmtime(os.path.join(t.path, f))
        for f in t.snapshot()[1]
    }
    t.widen_column_type("k", "bigint")
    # metadata-only: no file touched
    assert {
        f: os.path.getmtime(os.path.join(t.path, f)) for f in t.snapshot()[1]
    } == files_before
    df = t.read()
    assert dict(df.dtypes)["k"] == "bigint"
    assert sorted(r.k for r in df.collect()) == [1, 2]
    assert "type-widening" in t.protocol()["reader"]
    # narrow producer keeps working, upcast at the boundary
    t.append(_df(spark, [(3, "c")]))
    assert sorted(r.k for r in t.read().collect()) == [1, 2, 3]
    # wide values now fit
    t.append(spark.createDataFrame([(2**40, "big")], "k long, v string"))
    assert t.read().filter(F.col("k") > 2**39).count() == 1


def test_widen_matrix_refusals(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(spark.createDataFrame([(1, 1.5, "x")], "k long, f float, v string"))
    with pytest.raises(ValueError, match="not in the lossless widening"):
        t.widen_column_type("k", "int")     # narrowing
    with pytest.raises(ValueError, match="not in the lossless widening"):
        t.widen_column_type("v", "binary")  # not in matrix
    t.widen_column_type("f", "double")      # allowed
    assert dict(t.read().dtypes)["f"] == "double"


def test_widen_decimal_and_predicates_still_prune(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(
        spark.range(10).select(
            F.col("id").cast("int").alias("k"),
            F.col("id").cast("decimal(5,2)").alias("d"),
        )
    )
    t.widen_column_type("d", "decimal(12,4)")
    assert dict(t.read().dtypes)["d"] == "decimal(12,4)"
    # footer stats recorded under the narrow type still skip correctly
    assert t.read(predicates=[("k", "==", 3)]).count() == 1
    assert t.count_rows([("k", "<", 5)]) == 5


def test_widen_survives_time_travel_and_dml(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [(1, "a"), (2, "b")]))
    v_narrow = t.version()
    t.widen_column_type("k", "bigint")
    assert dict(t.read(as_of=v_narrow).dtypes)["k"] == "int"
    t.update_where([("k", "==", 1)], {"v": "'upd'"})
    t.compact(target_files=1)
    got = {r.k: r.v for r in t.read().collect()}
    assert got == {1: "upd", 2: "b"}
    assert dict(t.read().dtypes)["k"] == "bigint"


def test_widen_partition_column_refused(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [(1, "a"), (2, "b")]), partition_by=["k"])
    with pytest.raises(ValueError, match="partition column"):
        t.widen_column_type("k", "bigint")


def test_commit_utc_never_decreases(spark, tmp_path, monkeypatch):
    import time as time_mod

    from mb_crdb_cdc_dlgen2_synapse_spark import txlog as txlog_mod

    t = TxTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [(1, "a")]))
    real = t._read_json(t._log_path(0))["utc"]
    # wall clock steps BACKWARDS (NTP correction): the next commit clamps
    epoch0 = time_mod.gmtime(0)
    monkeypatch.setattr(txlog_mod.time, "gmtime", lambda *a: epoch0)
    t.append(_df(spark, [(2, "b")]))
    assert t._read_json(t._log_path(1))["utc"] == real  # clamped, not 1970
    assert t.version_at(real) == 1


def test_restore_rolls_back_defaults_and_identity(spark, tmp_path):
    """RESTORE past the declarations: the maps roll back WITH the schema —
    a later add_column of the same name must NOT inherit the stale rule."""
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [(1, "a")]))
    v_clean = t.version()
    t.set_column_default("v", "'dflt'")
    t.set_identity_column("uid")
    t.restore(v_clean)
    assert t.column_defaults() == {}
    assert t.identity_columns() == {}
    t.add_column("uid", "long")
    t.append(spark.createDataFrame([(2, "b", 7)], "k int, v string, uid long"))
    got = {r.k: r.uid for r in t.read().collect()}
    assert got == {1: None, 2: 7}  # plain column, no identity resolution
    # restore FORWARD re-activates them
    # (the rolled-back history stays in the log)


def test_clone_carries_defaults_and_identity(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [(1, "a")]))
    t.set_column_default("v", "'dflt'")
    t.set_identity_column("uid", start=50, step=1)
    src_ids = {r.k: r.uid for r in t.read().collect()}
    c = t.clone_to(str(tmp_path / "c"))
    assert c.column_defaults() == {"v": "'dflt'"}
    assert c.identity_columns() == {
        "uid": {"start": 50, "step": 1, "always": True}
    }
    # cloned rows keep their identities; clone-side appends keep assigning
    assert {r.k: r.uid for r in c.read().collect()} == src_ids
    c.append(spark.createDataFrame([(2,)], "k int"))
    got = {r.k: (r.v, r.uid) for r in c.read().collect()}
    assert got[2][0] == "dflt"
    assert got[2][1] not in src_ids.values()


# -- appendOnly table property ------------------------------------------------


def test_append_only_property_blocks_mutation(spark, tmp_path):
    """Delta's ``appendOnly``: DELETE/UPDATE/overwrite/replaceWhere/MERGE-
    with-changes refuse; append, insert-only merge, and row-preserving
    maintenance (compact) stay legal; unsetting re-enables DML."""
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [(1, "a"), (2, "b")]))
    t.set_properties({"appendOnly": "true"})
    with pytest.raises(ValueError, match="appendOnly"):
        t.delete_where([("k", "==", 1)])
    with pytest.raises(ValueError, match="appendOnly"):
        t.delete_where([("k", "==", 1)], mode="dv")
    with pytest.raises(ValueError, match="appendOnly"):
        t.update_where([("k", "==", 1)], {"v": "'x'"})
    with pytest.raises(ValueError, match="appendOnly"):
        t.overwrite(_df(spark, [(9, "z")]))
    with pytest.raises(ValueError, match="appendOnly"):
        t.replace_where(_df(spark, [(1, "z")]), [("k", "==", 1)])
    with pytest.raises(ValueError, match="appendOnly"):
        t.merge_into(_df(spark, [(1, "z")]), on=["k"])
    # legal: plain append, insert-only merge, compaction
    t.append(_df(spark, [(3, "c")]))
    t.merge_into(
        _df(spark, [(3, "c"), (4, "d")]), on=["k"], update=False
    )
    t.compact(target_files=1)
    got = {r.k: r.v for r in t.read().collect()}
    assert got == {1: "a", 2: "b", 3: "c", 4: "d"}
    t.set_properties({"appendOnly": None})
    t.delete_where([("k", "==", 1)])
    assert sorted(r.k for r in t.read().collect()) == [2, 3, 4]


def test_identity_concurrent_appenders_unique(spark, tmp_path):
    """Two threads append to an ALWAYS-identity table concurrently: the
    commit-retry base allocation must hand every row a unique identity
    value whatever the interleaving (no coordinator, no locks)."""
    import threading

    path = str(tmp_path / "t")
    t0 = TxTable(spark, path)
    t0.append(_df(spark, [(0, "seed")]))
    t0.set_identity_column("uid", start=10, step=3)
    errors = []

    def appender(base):
        try:
            t = TxTable(spark, path)
            for i in range(4):
                t.append(
                    _df(spark, [(base + i, f"v{base + i}")]).coalesce(1)
                )
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [
        threading.Thread(target=appender, args=(100,)),
        threading.Thread(target=appender, args=(200,)),
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors
    rows = TxTable(spark, path).read().select("k", "uid").collect()
    uids = [r.uid for r in rows]
    assert None not in uids
    assert len(set(uids)) == len(uids) == 9
    assert all((u - 10) % 3 == 0 and u >= 10 for u in uids)


def test_identity_invariants_random_dml_fuzz(spark, tmp_path):
    """Randomized DML mix (append / BY DEFAULT explicit append / CoW
    update / DV delete / compact / restore boundary): assigned identities
    are unique forever, never reassigned to a different business key, and
    explicit BY DEFAULT values pass through untouched."""
    import random

    rng = random.Random(61)
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [(0, "seed")]))
    t.set_identity_column("uid", start=0, step=1, always=False)
    next_k = 1
    explicit = {}
    seen: dict[int, int] = {}  # k -> uid at first sight

    def snapshot():
        return {r.k: r.uid for r in t.read().collect()}

    for step in range(18):
        op = rng.choice(["append", "explicit", "update", "delete", "compact"])
        if op == "append":
            ks = [next_k + i for i in range(rng.randint(1, 3))]
            next_k += len(ks)
            t.append(_df(spark, [(k, f"v{k}") for k in ks]).coalesce(1))
        elif op == "explicit":
            k = next_k
            next_k += 1
            uid = 10_000 + k  # disjoint from assigned space
            explicit[k] = uid
            t.append(
                spark.createDataFrame(
                    [(k, f"e{k}", uid)], "k int, v string, uid long"
                )
            )
        elif op == "update":
            k = rng.randrange(next_k)
            t.update_where([("k", "==", k)], {"v": f"'u{step}'"})
        elif op == "delete":
            k = rng.randrange(next_k)
            t.delete_where([("k", "==", k)], mode=rng.choice(["cow", "dv"]))
        else:
            t.compact(target_files=2)
        snap = snapshot()
        uids = list(snap.values())
        assert None not in uids
        assert len(set(uids)) == len(uids), f"duplicate uid at step {step}"
        for k, uid in snap.items():
            if k in seen:
                assert seen[k] == uid, f"identity changed for k={k}"
            else:
                seen[k] = uid
        for k, uid in explicit.items():
            if k in snap:
                assert snap[k] == uid


def test_widening_chain_with_interleaved_writes(spark, tmp_path):
    """A full widening chain — smallint -> int -> long -> decimal(22,2) ->
    decimal(25,4) — with an append at every narrowness level: the final
    read must equal every batch upcast to the final type (files keep
    their era's physical type; the reader and the write boundary upcast),
    and time travel replays each era under its own type."""
    from decimal import Decimal

    t = TxTable(spark, str(tmp_path / "t"))
    t.append(spark.createDataFrame([(1, 10)], "k int, v smallint"))
    types_seen = {}
    chain = [
        ("int", [(2, 1000)]),
        ("bigint", [(3, 2**40)]),
        ("decimal(22,2)", [(4, Decimal(2**40 + 1))]),
        ("decimal(25,4)", [(5, Decimal(7))]),
    ]
    for dtype, rows in chain:
        types_seen[t.version()] = dict(t.read().dtypes)["v"]
        t.widen_column_type("v", dtype)
        # a producer speaking the new era's type (the narrow-producer
        # upcast is covered by test_widen_int_to_long_zero_io)
        t.append(
            spark.createDataFrame(rows, f"k int, v {dtype}")
        )
    assert dict(t.read().dtypes)["v"] == "decimal(25,4)"
    got = {r.k: r.v for r in t.read().collect()}
    assert got == {
        1: Decimal("10.0000"),
        2: Decimal("1000.0000"),
        3: Decimal(2**40).quantize(Decimal("0.0001")),
        4: Decimal(2**40 + 1).quantize(Decimal("0.0001")),
        5: Decimal("7.0000"),
    }
    # every era time-travels under its own logged type
    for v, dt in types_seen.items():
        assert dict(t.read(as_of=v).dtypes)["v"] == dt
    # DML + compact across the fully-mixed physical layouts
    t.update_where([("k", "==", 1)], {"v": "CAST(11 AS DECIMAL(25,4))"})
    t.compact(target_files=1)
    got = {r.k: r.v for r in t.read().collect()}
    assert got[1] == Decimal("11.0000") and len(got) == 5


def test_rename_migrates_default_and_identity_rules(spark, tmp_path):
    """The cross-feature interaction the interleave fuzz hunts, pinned
    directly: renaming a defaulted column moves the fill contract, and
    renaming an identity column keeps its virtual resolution working —
    stale map keys would silently drop both."""
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [(1, "a")]))
    t.set_column_default("v", "'dflt'")
    t.set_identity_column("uid", start=5, step=1)
    before = {r.k: r.uid for r in t.read().collect()}
    t.rename_column("v", "payload")
    t.rename_column("uid", "row_uid")
    assert t.column_defaults() == {"payload": "'dflt'"}
    assert "row_uid" in t.identity_columns()
    t.append(spark.createDataFrame([(2,)], "k int"))
    got = {r.k: (r.payload, r.row_uid) for r in t.read().collect()}
    assert got[2][0] == "dflt"          # fill survived the rename
    assert got[1][1] == before[1]       # existing identity stable
    assert got[2][1] not in before.values() and got[2][1] is not None
    with pytest.raises(ValueError, match="ALWAYS"):
        t.append(
            spark.createDataFrame([(3, "x", 9)], "k int, payload string, row_uid long")
        )
