"""Multiplexed document-index maintenance
(operators/doc_indexes.stream_document_indexes_to_tx_tables): one read
of the documents CDF folds into BOTH the BM25 postings and the LSH
bands — equality with the single-index twins' results, shared watermark
after every fold, per-index exactly-once under staggered starts and
checkpoint replays."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from mb_crdb_cdc_dlgen2_synapse_spark.operators.bm25_index import (
    assert_bm25_index_matches_scratch,
    catchup_bm25_index,
)
from mb_crdb_cdc_dlgen2_synapse_spark.operators.doc_indexes import (
    stream_document_indexes_to_tx_tables,
)
from mb_crdb_cdc_dlgen2_synapse_spark.operators.lsh_index import (
    assert_lsh_index_matches_scratch,
)
from mb_crdb_cdc_dlgen2_synapse_spark.txlog import TxTable


def _docs(spark, lo: int, hi: int):
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("the quick document "),
            F.col("id").cast("string"),
            F.lit(" talks about spark vectors and lakes number "),
            (F.col("id") % 7).cast("string"),
        ).alias("text"),
    )


def _watermarks(spark, bm25_dir, lsh_dir):
    return (
        TxTable(spark, bm25_dir).properties().get("bm25.srcVersion"),
        TxTable(spark, lsh_dir).properties().get("lsh.srcVersion"),
    )


def test_multiplexed_fold_bootstraps_and_tracks_both_indexes(spark, tmp_path):
    """Virgin indexes bootstrap stream-first through the ONE fold; after
    every restart-and-drain both indexes equal their from-scratch builds
    AND sit at the same source watermark (aligned by construction)."""
    src = TxTable(spark, str(tmp_path / "docs"))
    bm25_dir, lsh_dir = str(tmp_path / "bm25"), str(tmp_path / "lsh")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        stream_document_indexes_to_tx_tables(
            spark, src.path, bm25_dir, lsh_dir, ckpt
        ).awaitTermination()

    src.append(_docs(spark, 0, 120))
    drain()
    for step in range(3):
        if step == 0:  # updates
            upd = src.read().filter(F.col("doc_id") % 5 == 0).select(
                "doc_id", F.concat("text", F.lit(" extra banded words")).alias("text")
            )
            src.merge_into(upd, on=["doc_id"], mode="dv")
        elif step == 1:  # deletes
            gone = src.read().filter(F.col("doc_id") % 9 == 2).withColumn(
                "_g", F.lit(True)
            )
            src.merge_into(gone, on=["doc_id"], delete_when="_g", mode="dv")
        else:  # fresh inserts
            src.append(_docs(spark, 200, 260))
        drain()
        wb, wl = _watermarks(spark, bm25_dir, lsh_dir)
        assert wb == wl == str(src.version()), f"watermarks diverged at {step}"
        assert_bm25_index_matches_scratch(TxTable(spark, bm25_dir), src)
        assert_lsh_index_matches_scratch(TxTable(spark, lsh_dir), src)
    # checkpoint replay with no new commits: neither index moves
    vb = TxTable(spark, bm25_dir).version()
    vl = TxTable(spark, lsh_dir).version()
    drain()
    assert TxTable(spark, bm25_dir).version() == vb
    assert TxTable(spark, lsh_dir).version() == vl


def test_multiplexed_fold_staggered_start_is_exactly_once_per_index(
    spark, tmp_path
):
    """One index pre-built ahead (batch catch-up), the other virgin: the
    stream tails from the OLDEST watermark; the ahead index skips the
    prefix it already folded (its scalars would otherwise double-count),
    the lagging one catches up, and both converge to scratch equality at
    one shared watermark. A fresh checkpoint over the converged pair is
    a content no-op for both."""
    src = TxTable(spark, str(tmp_path / "docs"))
    bm25_dir, lsh_dir = str(tmp_path / "bm25"), str(tmp_path / "lsh")

    src.append(_docs(spark, 0, 80))
    # BM25 runs ahead via the batch path; LSH stays virgin
    catchup_bm25_index(src, TxTable(spark, bm25_dir))
    upd = src.read().filter(F.col("doc_id") % 4 == 1).select(
        "doc_id", F.concat("text", F.lit(" drifted")).alias("text")
    )
    src.merge_into(upd, on=["doc_id"], mode="dv")

    ckpt = str(tmp_path / "ckpt")
    stream_document_indexes_to_tx_tables(
        spark, src.path, bm25_dir, lsh_dir, ckpt
    ).awaitTermination()
    wb, wl = _watermarks(spark, bm25_dir, lsh_dir)
    assert wb == wl == str(src.version())
    assert_bm25_index_matches_scratch(TxTable(spark, bm25_dir), src)
    assert_lsh_index_matches_scratch(TxTable(spark, lsh_dir), src)

    # fresh checkpoint => full replay: per-index watermark filters make
    # every batch a no-op (BM25's exact scalars prove nothing re-applied)
    n_docs = TxTable(spark, bm25_dir).properties()["bm25.nDocs"]
    shutil.rmtree(ckpt)
    stream_document_indexes_to_tx_tables(
        spark, src.path, bm25_dir, lsh_dir, str(tmp_path / "ckpt2")
    ).awaitTermination()
    assert TxTable(spark, bm25_dir).properties()["bm25.nDocs"] == n_docs
    assert_bm25_index_matches_scratch(TxTable(spark, bm25_dir), src)
    assert_lsh_index_matches_scratch(TxTable(spark, lsh_dir), src)


def test_multiplexed_fold_reads_feed_once(spark, tmp_path):
    """The whole point: the multiplexed fold's stream ingests each
    changed row ONCE where the two single-index twins ingest it twice —
    measured from the streams' own progress counters over an identical
    mutation history."""
    from mb_crdb_cdc_dlgen2_synapse_spark.operators.bm25_index import (
        stream_bm25_index_to_tx_table,
    )
    from mb_crdb_cdc_dlgen2_synapse_spark.operators.lsh_index import (
        stream_lsh_index_to_tx_table,
    )

    def rows_ingested(q) -> int:
        q.awaitTermination()
        return sum(p["numInputRows"] for p in q.recentProgress)

    # identical corpora, two maintenance topologies
    src_a = TxTable(spark, str(tmp_path / "docs_a"))
    src_b = TxTable(spark, str(tmp_path / "docs_b"))
    for s in (src_a, src_b):
        s.append(_docs(spark, 0, 100))

    multiplexed = rows_ingested(
        stream_document_indexes_to_tx_tables(
            spark, src_a.path, str(tmp_path / "bm_a"), str(tmp_path / "lsh_a"),
            str(tmp_path / "ck_a"),
        )
    )
    separate = rows_ingested(
        stream_bm25_index_to_tx_table(
            spark, src_b.path, str(tmp_path / "bm_b"), str(tmp_path / "ck_b1")
        )
    ) + rows_ingested(
        stream_lsh_index_to_tx_table(
            spark, src_b.path, str(tmp_path / "lsh_b"), str(tmp_path / "ck_b2")
        )
    )
    assert multiplexed > 0
    assert separate == 2 * multiplexed  # the halved-read receipt
    # and the shared result is identical content
    assert_bm25_index_matches_scratch(TxTable(spark, str(tmp_path / "bm_a")), src_a)
    assert_lsh_index_matches_scratch(TxTable(spark, str(tmp_path / "lsh_a")), src_a)
