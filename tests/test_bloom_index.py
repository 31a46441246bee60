"""Bloom-filter file skipping (txlog.set_bloom_index — Delta's bloom
filter index): per-file bitsets built executor-side at write time, logged
with the file's stats, and consulted by point predicates where min/max
ranges cannot prune (high-cardinality ids interleaved across files).
False POSITIVES only — a skipped file is PROVEN absent; every present
value must always be found."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mb_crdb_cdc_dlgen2_synapse_spark.txlog import TxTable, _file_may_match


def _cands(t: TxTable, preds) -> list[str]:
    """The candidate file set read(predicates=...) would scan."""
    stats = t.file_stats()
    cm = t._state()["colmap"]
    return [
        f
        for f in t.snapshot()[1]
        if _file_may_match(stats.get(f), t._parts(f, cm), preds)
    ]


def _ids(spark, ks):
    # uid interleaves across batches: every file's min/max range overlaps
    return spark.createDataFrame(
        [(k, f"uid-{k:05d}") for k in ks], "k int, uid string"
    ).coalesce(1)


def test_point_lookup_skips_overlapping_range_files(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(_ids(spark, [0]))
    t.set_bloom_index(["uid"])
    t.append(_ids(spark, range(1, 100, 2)))  # odd uids
    t.append(_ids(spark, range(2, 100, 2)))  # even uids — ranges overlap
    evens = set(t.history()[-1]["added"])
    # min/max cannot separate the two files; the bloom does
    c = _cands(t, [("uid", "==", "uid-00003")])
    assert not (set(c) & evens), "even-uid file must be bloom-skipped"
    assert len(c) >= 1
    got = t.read(predicates=[("uid", "==", "uid-00003")]).collect()
    assert [(r.k, r.uid) for r in got if r.uid == "uid-00003"] == [(3, "uid-00003")]


def test_no_false_negatives_every_value_found(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(_ids(spark, [0]))
    t.set_bloom_index(["uid", "k"])
    t.append(_ids(spark, range(1, 60, 2)))
    t.append(_ids(spark, range(2, 60, 2)))
    for k in range(60):
        got = t.read(predicates=[("uid", "==", f"uid-{k:05d}")]).collect()
        assert {r.k for r in got if r.uid == f"uid-{k:05d}"} == {k}
        got = t.read(predicates=[("k", "==", k)]).collect()
        assert {r.k for r in got} >= {k}


def test_in_predicate_and_integer_column(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(_ids(spark, [0]))
    t.set_bloom_index(["k"])
    t.append(_ids(spark, range(1, 100, 2)))
    t.append(_ids(spark, range(2, 100, 2)))
    evens = set(t.history()[-1]["added"])
    c = _cands(t, [("k", "in", [3, 7, 11])])  # all odd
    assert not (set(c) & evens)
    got = {r.k for r in t.read(predicates=[("k", "in", [3, 7, 11])]).collect()}
    assert got >= {3, 7, 11}


def test_pre_index_files_are_never_skipped(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(_ids(spark, range(0, 50)))  # BEFORE the index declaration
    t.set_bloom_index(["uid"])
    pre = set(t.history()[0]["added"])
    # value absent from the table entirely — unindexed files still scan
    c = _cands(t, [("uid", "==", "uid-00007")])
    assert pre <= set(c)


def test_type_and_schema_validation(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    df = spark.createDataFrame([(1, 1.5, "a")], "k int, score double, v string")
    t.append(df)
    with pytest.raises(ValueError, match="not in schema"):
        t.set_bloom_index(["nope"])
    with pytest.raises(ValueError, match="only string/integral"):
        t.set_bloom_index(["score"])
    t.set_bloom_index(["k", "v"])
    assert t.bloom_index() == {
        "k": {"m": 4096, "k": 3, "mode": "value"},
        "v": {"m": 4096, "k": 3, "mode": "value"},
    }
    t.set_bloom_index([])
    assert t.bloom_index() == {}


def test_survives_checkpoint_prune_clone_and_rename(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.CHECKPOINT_INTERVAL = 2
    t.append(_ids(spark, [0]))
    t.set_bloom_index(["uid"])
    t.append(_ids(spark, range(1, 40, 2)))
    t.append(_ids(spark, range(2, 40, 2)))
    t.vacuum(retain_versions=1, prune_log=True)
    fresh = TxTable(spark, str(tmp_path / "t"))
    assert fresh.bloom_index() == {"uid": {"m": 4096, "k": 3, "mode": "value"}}
    c = _cands(fresh, [("uid", "==", "uid-00003")])
    assert len(c) < len(fresh.snapshot()[1])  # something was skipped
    # clone carries config + logged bitsets
    cl = fresh.clone_to(str(tmp_path / "c"))
    assert cl.bloom_index() == {"uid": {"m": 4096, "k": 3, "mode": "value"}}
    assert len(_cands(cl, [("uid", "==", "uid-00003")])) == len(c)
    # rename migrates the config; predicates on the NEW name still prune
    fresh.rename_column("uid", "user_id")
    assert fresh.bloom_index() == {"user_id": {"m": 4096, "k": 3, "mode": "value"}}
    c2 = _cands(fresh, [("user_id", "==", "uid-00003")])
    assert len(c2) == len(c)
    # and post-rename writes keep building filters (physical name 'uid')
    fresh.append(
        spark.createDataFrame([(999, "uid-00999")], "k int, user_id string").coalesce(1)
    )
    newest = fresh.history()[-1]["added"]
    assert all(
        "uid" in fresh._state()["stats"][f].get("bloom", {}) for f in newest
    )


def test_dml_rewrites_rebuild_filters(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(_ids(spark, [0]))
    t.set_bloom_index(["uid"])
    t.append(_ids(spark, range(1, 30)))
    t.compact(target_files=2)  # rewrite: fresh files get fresh filters
    for f in t.history()[-1]["added"]:
        assert "uid" in (t._state()["stats"][f].get("bloom") or {})
    t.delete_where([("uid", "==", "uid-00005")])
    got = {r.uid for r in t.read().collect()}
    assert "uid-00005" not in got and "uid-00006" in got


def test_percent_encoded_table_path_still_builds_filters(spark, tmp_path):
    """A table path needing URL-encoding (space) must still match staged
    files back to input_file_name() URIs — the filter is BUILT (and prunes)
    rather than silently absent or, worse, all-zero (which would prove
    absence and drop matching rows)."""
    t = TxTable(spark, str(tmp_path / "dir with space" / "t"))
    t.append(_ids(spark, [0]))
    t.set_bloom_index(["uid"])
    t.append(_ids(spark, range(1, 100, 2)))
    t.append(_ids(spark, range(2, 100, 2)))
    # filters exist for the post-index files (URI normalization worked)
    stats = t.file_stats()
    indexed = [f for f, st in stats.items() if "bloom" in (st or {})]
    assert len(indexed) >= 2
    # correctness: every value found, and an absent value prunes to 0 rows
    for k in (3, 42):
        assert t.read(predicates=[("uid", "==", f"uid-{k:05d}")]).count() == 1
    assert t.read(predicates=[("uid", "==", "uid-99999")]).count() == 0
    # and pruning actually bites (overlapping ranges, bloom decides)
    assert len(_cands(t, [("uid", "==", "uid-00003")])) < len(t.snapshot()[1])


def test_all_null_file_gets_provable_all_zero_filter(spark, tmp_path):
    """A staged file whose indexed column is entirely NULL gets a real
    all-zero filter (provably no non-null values) — distinguished from the
    fail-open unmatched-URI case, which attaches no filter at all."""
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(_ids(spark, [0]))
    t.set_bloom_index(["uid"])
    t.append(
        spark.createDataFrame([(1, None)], "k int, uid string").coalesce(1)
    )
    rel = t.history()[-1]["added"][0]
    bl = t.file_stats()[rel]["bloom"]["uid"]
    import base64

    assert set(base64.b64decode(bl["b64"])) == {0}
    # and that file is pruned for any point lookup
    assert rel not in _cands(t, [("uid", "==", "uid-00000")])


def test_set_bloom_index_validates_sizing(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(_ids(spark, [0]))
    with pytest.raises(ValueError, match="multiple of 8"):
        t.set_bloom_index(["uid"], bits=12)
    with pytest.raises(ValueError, match="multiple of 8"):
        t.set_bloom_index(["uid"], bits=0)
    with pytest.raises(ValueError, match="hashes"):
        t.set_bloom_index(["uid"], hashes=0)
    # a valid config still goes through after the refusals
    t.set_bloom_index(["uid"], bits=1024, hashes=2)
    t.append(_ids(spark, [1]))
    assert t.read(predicates=[("uid", "==", "uid-00001")]).count() == 1


# -- trigram (substring) mode: the ngrambf_v1 / pg_trgm design ---------------


def _texts(spark, rows):
    return spark.createDataFrame(rows, "k int, body string").coalesce(1)


def test_trigram_contains_skips_files_without_needle(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(_texts(spark, [(0, "seed row before index")]))
    t.set_bloom_index(["body"], bits=8192, hashes=3, mode="trigram")
    t.append(_texts(spark, [(1, "the quick brown fox"), (2, "jumps over")]))
    t.append(_texts(spark, [(3, "pack my box with"), (4, "five dozen jugs")]))
    t.append(_texts(spark, [(5, "sphinx of black quartz")]))
    # needle present only in batch 3's file
    preds = [("body", "contains", "quartz")]
    cands = _cands(t, preds)
    files = t.snapshot()[1]
    assert len(cands) < len(files)
    # the pre-index file is never skipped (no filter), the match is found
    got = t.read(predicates=preds).collect()
    assert [r.k for r in got] == [5]
    # row filtering matches a plain read().filter(contains)
    assert (
        t.read().filter(F.col("body").contains("quartz")).count() == 1
    )


def test_trigram_never_false_negative(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(_texts(spark, [(0, "seed")]))
    t.set_bloom_index(["body"], bits=4096, hashes=3, mode="trigram")
    bodies = [
        (i, f"document number {i:04d} talks about topic-{i % 7}")
        for i in range(1, 40)
    ]
    for lo in range(1, 40, 8):
        t.append(_texts(spark, [b for b in bodies if lo <= b[0] < lo + 8]))
    for k, body in bodies:
        for needle in (f"{k:04d}", f"topic-{k % 7}", body[8:20]):
            got = t.read(predicates=[("body", "contains", needle)]).collect()
            assert any(r.k == k for r in got), (k, needle)


def test_trigram_short_needle_and_value_mode_isolation(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(_texts(spark, [(0, "seed")]))
    t.set_bloom_index(["body"], bits=4096, hashes=3, mode="trigram")
    t.append(_texts(spark, [(1, "alpha beta"), (2, "gamma delta")]))
    # needles under 3 chars have no trigram: no skipping, correct results
    assert {r.k for r in t.read(predicates=[("body", "contains", "ga")]).collect()} == {2}
    assert len(_cands(t, [("body", "contains", "xy")])) == len(t.snapshot()[1])
    # an == predicate must NOT consult the trigram filter's key space
    assert {r.k for r in t.read(predicates=[("body", "==", "alpha beta")]).collect()} == {1}
    # and a contains predicate must not consult a VALUE-mode filter
    t2 = TxTable(spark, str(tmp_path / "t2"))
    t2.append(_texts(spark, [(0, "seed")]))
    t2.set_bloom_index(["body"], bits=4096, hashes=3)
    t2.append(_texts(spark, [(1, "alpha beta")]))
    assert {r.k for r in t2.read(predicates=[("body", "contains", "pha be")]).collect()} == {1}
    assert len(_cands(t2, [("body", "contains", "zzz")])) == len(t2.snapshot()[1])


def test_trigram_mode_validates_and_sql_like_routes(spark, tmp_path):
    from mb_crdb_cdc_dlgen2_synapse_spark.engine import Engine

    t = TxTable(spark, str(tmp_path / "t"))
    t.append(
        spark.createDataFrame([(1, "hello world")], "k int, body string")
    )
    with pytest.raises(ValueError, match="only string"):
        t.set_bloom_index(["k"], mode="trigram")
    with pytest.raises(ValueError, match="value|trigram"):
        t.set_bloom_index(["body"], mode="fuzzy")
    t.set_bloom_index(["body"], mode="trigram")
    t.append(
        spark.createDataFrame([(2, "goodbye moon")], "k int, body string")
    )
    eng = Engine(spark)
    tabs = {"t": str(tmp_path / "t")}
    res = eng.ddl("DELETE FROM t WHERE body LIKE '%moon%'", tabs)
    assert res["version"] >= 0
    assert [r.k for r in t.read().collect()] == [1]


def test_trigram_all_short_file_is_provably_skippable(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(_texts(spark, [(0, "seed text long enough")]))
    t.set_bloom_index(["body"], bits=4096, hashes=3, mode="trigram")
    t.append(_texts(spark, [(1, "ab"), (2, "x")]))  # no trigrams at all
    t.append(_texts(spark, [(3, "a long enough body")]))
    cands = _cands(t, [("body", "contains", "enough")])
    # the all-short file has a valid all-zero filter -> provably skipped
    assert len(cands) == len(t.snapshot()[1]) - 1


def test_driver_build_bit_equals_distributed_build(spark, tmp_path, monkeypatch):
    """VERDICT r12 item 9: the driver-side bloom build (engaged below
    BLOOM_BUILD_DRIVER_ROWS_CAP) must produce byte-identical (m, k, b64)
    entries to the distributed Spark pass — same files, same declared
    geometry, cap patched to 0 to force the distributed path."""
    import mb_crdb_cdc_dlgen2_synapse_spark.txlog as txlog_mod

    def build(path, cap):
        monkeypatch.setattr(
            txlog_mod.TxTable, "BLOOM_BUILD_DRIVER_ROWS_CAP", cap
        )
        t = TxTable(spark, str(path))
        t.append(_ids(spark, range(200)))
        t.set_bloom_index(["uid", "k"], bits=1024, hashes=3)
        # post-declaration writes build filters: one append (int+string
        # columns), one all-null file, one multi-file batch
        t.append(_ids(spark, range(200, 400)))
        t.append(
            spark.createDataFrame(
                [(None, None)], "k int, uid string"
            ).coalesce(1)
        )
        t.append(
            spark.createDataFrame(
                [(k, f"uid-{k:05d}") for k in range(400, 500)],
                "k int, uid string",
            ).repartition(3)
        )
        return t.file_stats()

    drv = build(tmp_path / "driver_path", 65_536)
    dist = build(tmp_path / "distributed_path", 0)
    # same logical write sequence -> same per-file row counts; compare
    # bloom entries file-by-file after pairing files by (commit order,
    # row count). File NAMES are uuids, so pair by sorted commit order.
    def entries(stats):
        rows = []
        for rel in sorted(stats):
            st = stats[rel]
            bl = st.get("bloom") or {}
            rows.append(
                (st.get("rows"), {c: (b["m"], b["k"], b["b64"]) for c, b in bl.items()})
            )
        return rows

    d_rows = entries(drv)
    s_rows = entries(dist)
    # pair multisets: identical row-count multiset and, for each row
    # count, identical bloom entry multisets
    assert sorted(r for r, _ in d_rows) == sorted(r for r, _ in s_rows)
    from collections import Counter

    d_ct = Counter((r, tuple(sorted(b.items()))) for r, b in d_rows)
    s_ct = Counter((r, tuple(sorted(b.items()))) for r, b in s_rows)
    assert d_ct == s_ct
