"""Regression tests for the round-5 ADVICE findings.

1. set_generated_column over an EXISTING column validates existing rows
   (else _derived_predicates would prune on a rule the data violates).
2. materialize_binary_codes publishes ann.prefixDims atomically with the
   overwrite and clears stale dims on a default-layout rebuild.
3. Bare SQL VACUUM is conservative (tests/test_sql_ddl.py).
4. Escaped hive partition-path values (space -> %20) compare correctly in
   partition pruning — equality and range.
5. enable_row_tracking aborts+retries when a plain append races its
   backfill snapshot (the appended file must get a base_row_id).
"""

import pytest
from pyspark.sql import functions as F

from mb_crdb_cdc_dlgen2_synapse_spark.txlog import TxConflictError, TxTable


def _df(spark, rows, schema="k int, v string"):
    return spark.createDataFrame(rows, schema)


# ---------------------------------------------------------------------------
# 1. generated column over an existing column


def test_generated_on_existing_column_validates_backfill(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(
        spark.createDataFrame(
            [(1, "2024-03-05", "2024-03-06")], "k int, ts string, d string"
        )
    )
    # d != to_date-ish derivation of ts: declaring the rule must REFUSE —
    # derived partition/file pruning would silently drop matching rows
    with pytest.raises(ValueError, match="existing"):
        t.set_generated_column("d", "substring(ts, 1, 10)")
    # conforming data accepts the declaration
    t2 = TxTable(spark, str(tmp_path / "t2"))
    t2.append(
        spark.createDataFrame(
            [(1, "2024-03-05T10:00", "2024-03-05")], "k int, ts string, d string"
        )
    )
    v = t2.set_generated_column("d", "substring(ts, 1, 10)")
    assert v > 0
    assert t2.generated_columns() == {"d": "substring(ts, 1, 10)"}


def test_generated_on_existing_column_null_mismatch_refused(spark, tmp_path):
    # eqNullSafe catches NULL-stored vs non-NULL-derived too
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(
        spark.createDataFrame(
            [(1, "2024-03-05", None)], "k int, ts string, d string"
        )
    )
    with pytest.raises(ValueError, match="existing"):
        t.set_generated_column("d", "substring(ts, 1, 10)")


# ---------------------------------------------------------------------------
# 2. ann.prefixDims published atomically; rebuild clears stale dims


def test_ann_prefix_dims_rebuild_never_stale(spark, tmp_path):
    from mb_crdb_cdc_dlgen2_synapse_spark.operators.similarity import (
        materialize_binary_codes,
        probed_hamming_topk,
        synthetic_embeddings,
    )

    emb = synthetic_embeddings(spark, n=200)
    path = str(tmp_path / "codes")
    t1 = materialize_binary_codes(emb, path, prefix_bits=4, auto_bits=True)
    dims1 = t1.properties().get("ann.prefixDims")
    assert dims1 is not None  # always published now
    # rebuild with the DEFAULT layout: the property must describe the new
    # layout (dims 0..3), not the stale auto choice
    t2 = materialize_binary_codes(emb, path, prefix_bits=4, auto_bits=False)
    assert t2.properties().get("ann.prefixDims") == "0,1,2,3"
    # and the probe (which derives query buckets from the property) agrees
    # with a brute-force hamming top-k on the same data
    from mb_crdb_cdc_dlgen2_synapse_spark.operators.similarity import (
        knn_hamming_topk,
    )

    q = synthetic_embeddings(spark, n=3).withColumnRenamed("vec_id", "query_id")
    probe = probed_hamming_topk(t2, q, k=3, radius=4)  # full radius = exact
    brute = knn_hamming_topk(emb, q, k=3)
    assert sorted(map(tuple, probe.collect())) == sorted(
        map(tuple, brute.collect())
    )
    # the data overwrite and the property land in ONE commit (no window
    # where a probe sees the new layout under the old policy)
    ops = [c["op"] for c in t2.history()]
    assert ops.count("set_properties") == 0


# ---------------------------------------------------------------------------
# 4. escaped partition-path values


def test_escaped_partition_values_prune_correctly(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    df = spark.createDataFrame(
        [(1, "a b"), (2, "a!"), (3, "z:q")], "k int, city string"
    )
    t.append(df, partition_by=["city"])
    # equality on a value whose path rendering is escaped ('a b' -> a%20b):
    # the raw-path comparison str('a b') != 'a%20b' pruned the file and the
    # matching row went MISSING (read applies predicates as row filters too,
    # so wrong exclusion is the observable failure)
    assert {r.k for r in t.read(predicates=[("city", "==", "a b")]).collect()} == {1}
    assert {r.k for r in t.read(predicates=[("city", "in", ["a b", "z:q"])]).collect()} == {1, 3}
    # range wrong-exclusion direction: raw 'a b' <= 'a!' is TRUE (space
    # 0x20 < '!' 0x21) but escaped 'a%20b' <= 'a!' is FALSE ('%' 0x25) —
    # the escaped comparison pruned the file holding a matching row
    got_le = {r.k for r in t.read(predicates=[("city", "<=", "a!")]).collect()}
    assert got_le == {1, 2}
    got_gt = {r.k for r in t.read(predicates=[("city", ">", "a!")]).collect()}
    assert got_gt == {3}


def test_escaped_partition_count_rows(spark, tmp_path):
    # metadata-only count path goes through the same pruning
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(
        spark.createDataFrame([(1, "a b"), (2, "c")], "k int, p string"),
        partition_by=["p"],
    )
    assert t.count_rows(predicates=[("p", "==", "a b")]) == 1


# ---------------------------------------------------------------------------
# 5. enable_row_tracking vs racing append


def test_enable_row_tracking_races_plain_append(spark, tmp_path):
    """A plain append landing between enable_row_tracking's snapshot and
    its commit carries no metadata and no base_row_id — the enable commit
    must abort on the file-set change and recompute, else the appended
    file's rows read _row_id NULL forever."""
    path = str(tmp_path / "t")
    writer = TxTable(spark, path)
    writer.append(_df(spark, [(1, "a"), (2, "b")]))
    racer = TxTable(spark, path)

    orig_state = writer._state
    fired = {"n": 0}

    def racing_state(*a, **kw):
        st = orig_state(*a, **kw)
        if fired["n"] == 0:
            fired["n"] = 1
            racer.append(_df(spark, [(3, "c")]))
        return st

    writer._state = racing_state
    try:
        writer.enable_row_tracking()
    finally:
        writer._state = orig_state

    got = TxTable(spark, path).read(row_ids=True)
    rows = got.select("k", "_row_id").collect()
    ids = [r._row_id for r in rows]
    assert None not in ids, "racing append's file lost its base_row_id"
    assert len(set(ids)) == len(ids) == 3


def test_enable_row_tracking_true_thread_race(spark, tmp_path):
    """Unscripted race: appends keep landing WHILE another thread enables
    row tracking. Whatever interleaving happens, the invariants must
    hold: every row has a non-NULL _row_id and ids are globally unique."""
    import threading

    path = str(tmp_path / "t")
    t0 = TxTable(spark, path)
    t0.append(_df(spark, [(0, "seed")]))
    stop = threading.Event()
    errors = []

    def appender():
        try:
            t = TxTable(spark, path)
            i = 1
            while not stop.is_set() and i <= 6:
                t.append(_df(spark, [(i, f"v{i}")]).coalesce(1))
                i += 1
        except Exception as e:  # pragma: no cover
            errors.append(e)

    th = threading.Thread(target=appender)
    th.start()
    try:
        TxTable(spark, path).enable_row_tracking()
    finally:
        stop.set()
        th.join()
    assert not errors
    rows = TxTable(spark, path).read(row_ids=True).select("k", "_row_id").collect()
    ids = [r._row_id for r in rows]
    # rows appended BEFORE/DURING the enable snapshot got backfilled bases;
    # rows after it got allocator bases — nobody is NULL, nobody collides
    assert None not in ids
    assert len(set(ids)) == len(ids)
