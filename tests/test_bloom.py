"""Bloom filter as a relation (operators/bloom.py): no false negatives,
mergeability (word-wise OR == bloom of union), bounded false positives, and
the bloom-assisted streaming dedup sink's exact parity with the plain one."""

from __future__ import annotations

import json as _json

from pyspark.sql import functions as F

from mb_crdb_cdc_dlgen2_synapse_spark.operators import bloom as B
from mb_crdb_cdc_dlgen2_synapse_spark.txlog import (
    TxTable,
    stream_dedup_to_tx_table,
    stream_dedup_to_tx_table_bloom,
)


def _keys(spark, lo, hi, tag="k"):
    return spark.range(lo, hi).select(
        F.concat(F.lit(tag), F.col("id").cast("string")).alias("key")
    )


def test_no_false_negatives(spark):
    """Every inserted key probes positive — the bloom contract dedup
    correctness rests on."""
    keys = _keys(spark, 0, 2000)
    bl = B.build_bloom(keys, "key")
    got = B.with_membership(keys, "key", bl)
    assert got.filter(~F.col("maybe_seen")).count() == 0
    assert got.count() == 2000


def test_merged_equals_rebuilt(spark):
    """Word-wise OR of two blooms == bloom built over the union — exact
    (word, bits) equality, the mergeable-sketch property."""
    a, b = _keys(spark, 0, 800), _keys(spark, 500, 1500)
    merged = B.merge_blooms(B.build_bloom(a, "key"), B.build_bloom(b, "key"))
    rebuilt = B.build_bloom(a.unionByName(b), "key")
    assert merged.exceptAll(rebuilt).count() == 0
    assert rebuilt.exceptAll(merged).count() == 0


def test_false_positive_rate_bounded(spark):
    """Disjoint probe keys: fp rate stays near the analytic bound
    ((1-e^{-kn/m})^k ~ 0.02% at n=2k, m=2^18, k=4; assert a loose 2%)."""
    bl = B.build_bloom(_keys(spark, 0, 2000), "key")
    probe = _keys(spark, 0, 4000, tag="other")
    fp = B.with_membership(probe, "key", bl).filter(F.col("maybe_seen")).count()
    assert fp / 4000 < 0.02, fp


def test_bloom_dedup_sink_matches_plain_sink(spark, tmp_path):
    """The bloom-assisted dedup sink must produce EXACTLY the plain sink's
    state across batches, restarts, and cross-batch duplicates — the bloom
    is an access-path optimization, never a semantics change."""
    land = tmp_path / "land"
    land.mkdir()
    docs_schema = "doc_id long, text string"

    def write_batch(name, rows):
        with open(land / name, "w") as f:
            for doc_id, text in rows:
                f.write(_json.dumps({"doc_id": doc_id, "text": text}) + "\n")

    b1 = [(1, "alpha beta"), (2, "Alpha  Beta"), (3, "gamma")]
    b2 = [(4, "alpha beta"), (5, "delta"), (6, "GAMMA"), (7, "epsilon")]

    dirs = {
        "plain": (str(tmp_path / "tp"), str(tmp_path / "cp")),
        "bloom": (str(tmp_path / "tb"), str(tmp_path / "cb")),
    }

    def run_plain():
        stream = spark.readStream.schema(docs_schema).json(str(land))
        stream_dedup_to_tx_table(stream, *dirs["plain"]).awaitTermination()

    def run_bloom():
        stream = spark.readStream.schema(docs_schema).json(str(land))
        stream_dedup_to_tx_table_bloom(
            stream, dirs["bloom"][0], str(tmp_path / "bloomtab"), dirs["bloom"][1]
        ).awaitTermination()

    write_batch("b1.ndjson", b1)
    run_plain()
    run_bloom()
    write_batch("b2.ndjson", b2)
    run_plain()
    run_bloom()
    run_bloom()  # restart, no new data: txn no-op on state AND bloom tables

    plain = {
        (r.doc_id, r.content_hash)
        for r in TxTable(spark, dirs["plain"][0]).read().collect()
    }
    bloomed = {
        (r.doc_id, r.content_hash)
        for r in TxTable(spark, dirs["bloom"][0]).read().collect()
    }
    assert plain == bloomed and {d for d, _ in plain} == {1, 3, 5, 7}
    # the persisted bloom covers exactly the committed hashes (superset
    # invariant + no stale extras after clean runs)
    bl = TxTable(spark, str(tmp_path / "bloomtab")).read()
    state = TxTable(spark, dirs["bloom"][0]).read().select("content_hash")
    flagged = B.with_membership(state, "content_hash", bl)
    assert flagged.filter(~F.col("maybe_seen")).count() == 0
