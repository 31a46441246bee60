"""RENAME COLUMN via column mapping (txlog.rename_column): metadata-only
renames with physical names frozen at first write — reads, writes, pruning,
DML, partition columns, checks, time travel, clones, and the add-after-drop
resurrection guard."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from mb_crdb_cdc_dlgen2_synapse_spark.txlog import TxTable


def _df(spark, rows, schema="k int, v string"):
    return spark.createDataFrame(rows, schema)


def test_rename_is_metadata_only_and_roundtrips(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [(1, "a"), (2, "b")]))
    files = {
        f: os.stat(os.path.join(t.path, f)).st_mtime_ns for f in t.snapshot()[1]
    }
    t.rename_column("v", "payload")
    # zero data I/O
    assert {
        f: os.stat(os.path.join(t.path, f)).st_mtime_ns for f in t.snapshot()[1]
    } == files
    assert t.read().columns == ["k", "payload"]
    assert {(r.k, r.payload) for r in t.read().collect()} == {(1, "a"), (2, "b")}
    # writers now speak the NEW name; old and new files read together
    t.append(_df(spark, [(3, "c")], "k int, payload string"))
    assert {(r.k, r.payload) for r in t.read().collect()} == {
        (1, "a"),
        (2, "b"),
        (3, "c"),
    }
    # the old name is gone from the write surface
    with pytest.raises(ValueError, match="schema mismatch"):
        t.append(_df(spark, [(4, "d")]))


def test_pruning_and_dml_speak_the_new_name(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(
        _df(spark, [(i, f"v{i}", i % 4) for i in range(40)], "k int, v string, b int"),
        partition_by=["b"],
    )
    t.rename_column("b", "bucket")
    t.rename_column("k", "key")
    # stats/partition pruning on the NEW names
    got = sorted(r.key for r in t.read(predicates=[("bucket", "==", 2)]).collect())
    assert got == [i for i in range(40) if i % 4 == 2]
    assert t.count_rows([("bucket", "==", 2)]) == 10
    # CoW DML on the new names; untouched partitions keep byte identity
    before = {
        f: os.stat(os.path.join(t.path, f)).st_mtime_ns
        for f in t.snapshot()[1]
        if "b=3" in f
    }
    t.delete_where([("bucket", "==", 2)])
    t.update_where([("key", "==", 1)], {"v": F.lit("patched")})
    after = {
        f: os.stat(os.path.join(t.path, f)).st_mtime_ns
        for f in t.snapshot()[1]
        if "b=3" in f
    }
    assert before == after  # physical partition dir name unchanged, untouched
    rows = {r.key: r.v for r in t.read().collect()}
    assert len(rows) == 30 and rows[1] == "patched"
    # merge-on-read delete too
    t.delete_where([("key", ">=", 35)], mode="dv")
    assert t.count_rows() == len([k for k in rows if k < 35])


def test_rename_respects_time_travel_and_checks(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [(1, "a")]))
    t.add_check("k_pos", "k > 0")
    v_before = t.version()
    t.rename_column("v", "payload")
    # pre-rename snapshot shows the OLD logical name
    assert t.read(as_of=v_before).columns == ["k", "v"]
    # checks survive (they reference unrenamed columns here)
    with pytest.raises(ValueError, match="k_pos"):
        t.append(_df(spark, [(-1, "x")], "k int, payload string"))
    # rename the CHECKED column: expression updates are the caller's job,
    # but enforcement on the renamed frame must not crash for valid rows
    t.append(_df(spark, [(5, "y")], "k int, payload string"))
    assert t.count_rows() == 2


def test_rename_survives_checkpoint_prune_and_clone(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.CHECKPOINT_INTERVAL = 3
    t.append(_df(spark, [(1, "a")]))
    t.rename_column("v", "payload")
    for i in range(2, 6):
        t.append(_df(spark, [(i, f"v{i}")], "k int, payload string"))
    t.vacuum(retain_versions=2, prune_log=True)
    assert t.column_mapping() == {"payload": "v"}
    assert t.read().columns == ["k", "payload"]
    c = t.clone_to(str(tmp_path / "c"))
    assert c.column_mapping() == {"payload": "v"}
    assert {r.k for r in c.read().collect()} == {1, 2, 3, 4, 5}


def test_change_feed_crosses_renames_in_end_schema(spark, tmp_path):
    """Column-mapping-mode CDF: a feed range spanning a rename renders
    EVERY era's row images under the range-end logical names (frozen
    physicals make old files readable under the current mapping) — one
    consistent vocabulary for the consumer, no restart at the boundary."""
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [(1, "a")]))  # v0
    t.rename_column("v", "payload")  # v1
    t.append(_df(spark, [(2, "b")], "k int, payload string"))  # v2
    feed = t.read_changes(-1)
    assert {(r.k, r.payload, r._change_type) for r in feed.collect()} == {
        (1, "a", "insert"),
        (2, "b", "insert"),
    }
    # nested renames too: the envelope era mixes, the images do not
    t2 = TxTable(spark, str(tmp_path / "t2"))
    t2.append(
        spark.createDataFrame(
            [(1, ("x", 5))], "k int, props struct<name: string, qty: int>"
        )
    )
    t2.rename_column("props.name", "label")
    t2.append(
        spark.createDataFrame(
            [(2, ("y", 6))], "k int, props struct<label: string, qty: int>"
        )
    )
    feed2 = t2.read_changes(-1)
    assert {
        (r.k, r.props.label, r.props.qty, r._change_type)
        for r in feed2.collect()
    } == {(1, "x", 5, "insert"), (2, "y", 6, "insert")}
    # pinning to_version renders under THAT era's names: up to v0 the
    # column is still called v
    assert {
        (r.k, r.v) for r in t.read_changes(-1, to_version=0).collect()
    } == {(1, "a")}
    # a rewrite after the rename emits delete+insert pairs in end names
    t.update_where([("k", "==", 1)], {"payload": F.lit("patched")})
    tail = t.read_changes(2)
    assert {(r.k, r.payload, r._change_type) for r in tail.collect()} == {
        (1, "a", "delete"),
        (1, "patched", "insert"),
    }


def test_add_after_drop_never_resurrects_old_bytes(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [(1, "secret"), (2, "also-secret")]))
    t.drop_column("v")
    t.add_column("v", "string")  # same name, NEW physical
    vals = [(r.k, r.v) for r in t.read().collect()]
    assert sorted(vals) == [(1, None), (2, None)]  # dropped bytes stay dropped
    t.append(_df(spark, [(3, "fresh")]))
    got = {r.k: r.v for r in t.read().collect()}
    assert got == {1: None, 2: None, 3: "fresh"}


def test_rename_collision_guards(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [(1, "a")]))
    with pytest.raises(ValueError, match="does not exist"):
        t.rename_column("nope", "x")
    with pytest.raises(ValueError, match="already exists"):
        t.rename_column("v", "k")
    # rename back to the original physical drops the mapping entry
    t.rename_column("v", "w")
    t.rename_column("w", "v")
    assert t.column_mapping() == {}
    assert {(r.k, r.v) for r in t.read().collect()} == {(1, "a")}


def test_restore_restores_the_mapping_with_the_schema(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [(1, "a")]))  # v0
    t.rename_column("v", "payload")  # v1
    t.append(_df(spark, [(2, "b")], "k int, payload string"))  # v2
    t.restore(0)
    # pre-rename schema AND pre-rename mapping are current again
    assert t.read().columns == ["k", "v"]
    assert {(r.k, r.v) for r in t.read().collect()} == {(1, "a")}
    assert t.column_mapping() == {}


def test_merge_schema_append_of_dropped_name_gets_fresh_physical(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [(1, "secret")]))
    t.drop_column("v")
    # schema evolution via append re-introduces the dropped name
    t.append(_df(spark, [(2, "fresh")]), merge_schema=True)
    got = {r.k: r.v for r in t.read().collect()}
    assert got == {1: None, 2: "fresh"}  # old bytes never resurface


def test_overwrite_reusing_a_mapped_physical_stays_distinct(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [(1, "a")]))
    t.rename_column("v", "payload")  # payload's physical is 'v'
    # new schema keeps payload AND introduces a new logical column 'v'
    t.overwrite(
        spark.createDataFrame(
            [(10, "kept", "new")], "k int, payload string, v string"
        )
    )
    r = t.read().collect()[0]
    assert (r.k, r.payload, r.v) == (10, "kept", "new")
    # two logical columns, two distinct physicals
    cm = t.column_mapping()
    assert cm["payload"] == "v" and cm["v"].startswith("v__p")
    # and a plain same-schema overwrite on an unmapped table stays identity
    t2 = TxTable(spark, str(tmp_path / "t2"))
    t2.append(_df(spark, [(1, "x")]))
    t2.overwrite(_df(spark, [(2, "y")]))
    assert t2.column_mapping() == {}
    assert {(r.k, r.v) for r in t2.read().collect()} == {(2, "y")}


def test_randomized_rename_dml_mix_matches_model(spark, tmp_path):
    """Random interleaving of renames with append/CoW/DV DML, compaction,
    vacuum, and checkpoints: the table must always equal a dict model read
    under the CURRENT logical column name."""
    import random

    rng = random.Random(31)
    t = TxTable(spark, str(tmp_path / "t"))
    t.CHECKPOINT_INTERVAL = 4
    vcol = "v"
    model: dict[int, str] = {}

    def check():
        rows = t.read().collect()
        assert t.read().columns == ["k", vcol]
        assert {r.k: getattr(r, vcol) for r in rows} == model

    for step in range(22):
        op = rng.choice(
            ["append", "delete", "update", "rename", "dv_delete", "compact", "vacuum"]
        )
        if op == "append" or not model:
            rows = {
                k: f"s{step}"
                for k in [rng.randrange(30) for _ in range(rng.randint(1, 4))]
                if k not in model
            }
            if rows:
                t.append(
                    spark.createDataFrame(
                        list(rows.items()), f"k int, {vcol} string"
                    )
                )
                model.update(rows)
        elif op in ("delete", "dv_delete"):
            pivot = rng.randrange(30)
            t.delete_where(
                [("k", ">=", pivot), ("k", "<", pivot + 4)],
                mode="dv" if op == "dv_delete" else "cow",
            )
            model = {k: v for k, v in model.items() if not (pivot <= k < pivot + 4)}
        elif op == "update":
            pivot = rng.randrange(30)
            t.update_where([("k", "==", pivot)], {vcol: F.lit(f"u{step}")})
            if pivot in model:
                model[pivot] = f"u{step}"
        elif op == "rename" and t.version() >= 0:
            new = f"v{step}"
            t.rename_column(vcol, new)
            vcol = new
        elif op == "compact":
            t.compact(target_files=2)
        elif op == "vacuum":
            t.vacuum(retain_versions=rng.choice([1, 3]))
        if step % 5 == 4:
            check()
    check()


def test_merge_replace_and_generated_on_renamed_tables(spark, tmp_path):
    """The other write paths speak logical names after a rename too:
    MERGE INTO key-span pruning, replace_where regions, and generated
    columns all translate through the mapping."""
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [(i, f"v{i}") for i in range(10)]))
    t.rename_column("k", "key")
    t.rename_column("v", "val")
    # MERGE on the renamed key
    src = spark.createDataFrame(
        [(1, "upd"), (99, "new")], "key int, val string"
    )
    t.merge_into(src, on=["key"])
    got = {r.key: r.val for r in t.read().collect()}
    assert got[1] == "upd" and got[99] == "new" and len(got) == 11
    # replace_where on the renamed column
    t.replace_where(
        spark.createDataFrame([(100, "r")], "key int, val string"),
        [("key", ">=", 50)],
    )
    got = {r.key: r.val for r in t.read().collect()}
    assert 99 not in got and got[100] == "r"
    # generated column declared AFTER renames fills against logical names
    t.set_generated_column("key_mod", "key % 3")
    t.append(spark.createDataFrame([(200, "g")], "key int, val string"))
    row = [r for r in t.read().collect() if r.key == 200][0]
    assert row.key_mod == 200 % 3
    # and the generated column itself can be renamed
    t.rename_column("key_mod", "bucket3")
    assert "bucket3" in t.read().columns


def test_rename_migrates_rules_and_refuses_dependents(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [(1, "a")]))
    t.set_generated_column("k2", "k * 2")
    t.add_check("v_nonempty", "length(v) > 0")
    # renaming a column a CHECK references is refused
    with pytest.raises(ValueError, match="v_nonempty"):
        t.rename_column("v", "text")
    # renaming a column a generated expr references is refused
    with pytest.raises(ValueError, match="generated column 'k2'"):
        t.rename_column("k", "key")
    # renaming the GENERATED column itself moves its rule
    t.rename_column("k2", "double_k")
    t.append(_df(spark, [(5, "e")]))  # rule fills under the new name
    got = {r.k: r.double_k for r in t.read().collect()}
    assert got == {1: None, 5: 10}
    assert t.generated_columns() == {"double_k": "k * 2"}


def test_dv_update_keeps_hive_layout_after_partition_rename(spark, tmp_path):
    """_update_dv stages the updated-row copies under the PHYSICAL hive
    dirs even when the partition column was renamed (logical keys via
    self._parts — the raw physical path keys would intersect to nothing
    and silently stage unpartitioned)."""
    t = TxTable(spark, str(tmp_path / "t"))
    df = spark.createDataFrame(
        [(i, i % 2, f"v{i}") for i in range(10)], "k int, part int, v string"
    )
    t.append(df, partition_by=["part"])
    t.rename_column("part", "segment")
    t.update_where([("k", "==", 3)], {"v": "'upd'"}, mode="dv")
    last = t.history()[-1]
    assert last["op"] == "update_dv"
    assert last["added"], "the updated copy must be appended"
    # physical partition dir preserved on every staged copy
    assert all(f.startswith("part=") for f in last["added"])
    got = {r.k: (r.segment, r.v) for r in t.read().collect()}
    assert got[3] == (1, "upd") and len(got) == 10


def test_merge_dv_keeps_hive_layout_after_partition_rename(spark, tmp_path):
    """merge_into's insert/update staging translates partition keys the
    same way (logical keys, physical dirs)."""
    t = TxTable(spark, str(tmp_path / "t"))
    df = spark.createDataFrame(
        [(i, i % 2, f"v{i}") for i in range(10)], "k int, part int, v string"
    )
    t.append(df, partition_by=["part"])
    t.rename_column("part", "segment")
    src = spark.createDataFrame(
        [(3, 1, "merged"), (42, 0, "new")], "k int, segment int, v string"
    )
    t.merge_into(src, on=["k"], mode="dv")
    merge_commits = [c for c in t.history() if c["op"] == "merge_dv"]
    added = [f for c in merge_commits for f in c["added"]]
    assert added and all(f.startswith("part=") for f in added)
    got = {r.k: r.v for r in t.read().collect()}
    assert got[3] == "merged" and got[42] == "new" and len(got) == 11


def test_nested_field_rename_metadata_only_roundtrip(spark, tmp_path):
    """Dotted-path nested rename (the CDC envelope is itself a struct —
    reference README.md:174-178): metadata-only, zero files rewritten;
    post-rename reads speak the new field name, pre-rename files still
    resolve, new writers speak the new name, and NULL structs stay NULL
    (the write/read translation is a null-preserving positional cast)."""
    t = TxTable(spark, str(tmp_path / "t"))
    df = spark.createDataFrame(
        [(1, ("a", 10)), (2, ("b", 20)), (3, None)],
        "k int, props struct<name: string, qty: int>",
    )
    t.append(df)
    files_before = set(t.snapshot()[1])
    t.rename_column("props.name", "label")
    assert set(t.snapshot()[1]) == files_before  # metadata-only
    got = {r.k: r.props for r in t.read().collect()}
    assert got[1].label == "a" and got[1].qty == 10
    assert got[3] is None  # null struct survives the cast
    # writers speak the new name; old + new files read uniformly
    t.append(
        spark.createDataFrame(
            [(4, ("d", 40))], "k int, props struct<label: string, qty: int>"
        )
    )
    got = {r.k: r.props for r in t.read().collect()}
    assert got[4].label == "d" and got[2].label == "b" and len(got) == 4
    # time travel shows the pre-rename name
    assert "name" in t.read(as_of=0).schema["props"].dataType.fieldNames()
    # dotted new form and rename-back both work
    t.rename_column("props.label", "props.name")
    assert {f for f in t.read().schema["props"].dataType.fieldNames()} == {
        "name", "qty",
    }
    assert t.column_mapping() == {}  # rename-back collapses to identity


def test_nested_rename_guards_and_struct_column_rename(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(
        spark.createDataFrame(
            [(1, ("a", 10), [("x", 1)])],
            "k int, props struct<name: string, qty: int>, "
            "tags array<struct<tag: string, w: int>>",
        )
    )
    with pytest.raises(ValueError, match="already exists"):
        t.rename_column("props.name", "qty")
    with pytest.raises(ValueError, match="does not exist"):
        t.rename_column("props.nope", "x")
    with pytest.raises(ValueError, match="arrays/maps"):
        t.rename_column("tags.tag", "t")
    with pytest.raises(ValueError, match="different parent"):
        t.rename_column("props.name", "other.name")
    with pytest.raises(ValueError, match="dotted path"):
        t.rename_column("props", "props.meta")
    t.add_check("qty_pos", "props.qty > 0")
    with pytest.raises(ValueError, match="CHECK constraint"):
        t.rename_column("props.qty", "amount")
    t.drop_check("qty_pos")
    # renaming the nested field, then the parent column: both mappings
    # compose (logical keys migrate, physical stays frozen)
    t.rename_column("props.name", "label")
    t.rename_column("props", "attrs")
    got = t.read().collect()[0]
    assert got.attrs.label == "a" and got.attrs.qty == 10
    # writers under the composed mapping
    t.append(
        spark.createDataFrame(
            [(2, ("b", 20), None)],
            "k int, attrs struct<label: string, qty: int>, "
            "tags array<struct<tag: string, w: int>>",
        )
    )
    assert {r.attrs.label for r in t.read().collect()} == {"a", "b"}


def test_nested_rename_survives_checkpoint_prune_clone_restore(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(
        spark.createDataFrame(
            [(1, ("a", 10))], "k int, props struct<name: string, qty: int>"
        )
    )
    t.rename_column("props.name", "label")
    v_renamed = t.version()
    for i in range(2, 6):
        t.append(
            spark.createDataFrame(
                [(i, (f"v{i}", i))], "k int, props struct<label: string, qty: int>"
            )
        )
    # restore BEFORE the log is pruned: mapping rolls back with the schema
    t.restore(v_renamed)
    assert {r.props.label for r in t.read().collect()} == {"a"}
    t.append(
        spark.createDataFrame(
            [(9, ("z", 90))], "k int, props struct<label: string, qty: int>"
        )
    )
    t.write_checkpoint()
    t.vacuum(retain_versions=2, prune_log=True)
    fresh = TxTable(spark, str(tmp_path / "t"))
    assert {r.props.label for r in fresh.read().collect()} == {"a", "z"}
    clone = t.clone_to(str(tmp_path / "c"))
    assert {r.props.label for r in clone.read().collect()} == {"a", "z"}
    clone.append(
        spark.createDataFrame(
            [(7, ("q", 70))], "k int, props struct<label: string, qty: int>"
        )
    )
    assert {r.props.label for r in clone.read().collect()} == {"a", "z", "q"}


def test_randomized_nested_rename_dml_mix_matches_model(spark, tmp_path):
    """The flat-rename fuzz, at depth: random interleaving of nested-field
    renames, parent-column renames, append/CoW/DV DML, compaction, vacuum,
    and checkpoints — the table must always equal a dict model read under
    the CURRENT logical names at both levels."""
    import random

    rng = random.Random(47)
    t = TxTable(spark, str(tmp_path / "t"))
    t.CHECKPOINT_INTERVAL = 4
    parent, leaf = "props", "a"
    model: dict[int, tuple[str, int]] = {}

    def schema():
        return f"k int, {parent} struct<{leaf}: string, b: int>"

    def check():
        rows = t.read().collect()
        assert t.read().columns == ["k", parent]
        got = {
            r.k: (getattr(getattr(r, parent), leaf), getattr(r, parent).b)
            for r in rows
        }
        assert got == model

    for step in range(22):
        op = rng.choice(
            [
                "append", "delete", "dv_delete", "rename_leaf",
                "rename_parent", "compact", "vacuum",
            ]
        )
        if op == "append" or not model:
            rows = {
                k: (f"s{step}", k * 10)
                for k in [rng.randrange(30) for _ in range(rng.randint(1, 4))]
                if k not in model
            }
            if rows:
                t.append(
                    spark.createDataFrame(
                        [(k, v) for k, v in rows.items()], schema()
                    )
                )
                model.update(rows)
        elif op in ("delete", "dv_delete"):
            pivot = rng.randrange(30)
            t.delete_where(
                [("k", ">=", pivot), ("k", "<", pivot + 4)],
                mode="dv" if op == "dv_delete" else "cow",
            )
            model = {k: v for k, v in model.items() if not (pivot <= k < pivot + 4)}
        elif op == "rename_leaf" and t.version() >= 0:
            new = f"a{step}"
            t.rename_column(f"{parent}.{leaf}", new)
            leaf = new
        elif op == "rename_parent" and t.version() >= 0:
            new = f"p{step}"
            t.rename_column(parent, new)
            parent = new
        elif op == "compact":
            t.compact(target_files=2)
        elif op == "vacuum":
            t.vacuum(retain_versions=rng.choice([1, 3]))
        if step % 5 == 4:
            check()
    check()


def test_nested_rename_read_still_prunes_nested_columns(spark, tmp_path):
    """The logical projection over a renamed struct must stay PRUNABLE: a
    query touching one nested field reads only that field's bytes
    (ReadSchema), not the whole struct — the field-wise rebuild, where a
    struct cast would force a full-struct scan. At 100 TB with a wide CDC
    envelope this is the difference between scanning one column chunk and
    scanning them all."""
    import re

    t = TxTable(spark, str(tmp_path / "t"))
    t.append(
        spark.createDataFrame(
            [(1, ("a", 10, "padpad"))],
            "k int, props struct<name: string, qty: int, extra: string>",
        )
    )
    t.rename_column("props.name", "label")
    df = t.read().select("k", F.col("props.qty"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"ReadSchema: (\S+)", plan)
    assert m, plan
    read_schema = m.group(1)
    assert "qty" in read_schema
    assert "name" not in read_schema and "extra" not in read_schema, read_schema
    assert df.collect()[0]["qty"] == 10


def test_nested_rename_refuses_bracket_form_references(spark, tmp_path):
    """A CHECK (or generated rule) reaching the nested field through the
    SQL bracket form (after['city']) must refuse the rename exactly like
    the dotted spelling — previously only `after.city` was detected."""
    import pytest

    from mb_crdb_cdc_dlgen2_synapse_spark.txlog import TxTable

    t = TxTable(spark, str(tmp_path / "t"))
    t.append(
        spark.createDataFrame(
            [(1, ("amsterdam", 5.0))],
            "k int, after struct<city: string, revenue: double>",
        )
    )
    t.add_check("city_set", "after['city'] IS NOT NULL")
    with pytest.raises(ValueError, match="city_set"):
        t.rename_column("after.city", "town")
    # unrelated field renames fine despite the bracket check existing
    t.rename_column("after.revenue", "amount")
    t.drop_check("city_set")
    t.rename_column("after.city", "town")
    row = t.read().collect()[0]
    assert row.after.town == "amsterdam" and row.after.amount == 5.0
