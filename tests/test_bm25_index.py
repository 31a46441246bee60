"""Incrementally-maintained BM25 inverted index (operators/bm25_index.py):
postings + exact corpus scalars equal a from-scratch tokenization after
arbitrary insert/update/delete histories; the pruned index read scores
identically to the corpus-scan BM25; streaming maintenance resumes and
replays exactly-once (scalar deltas are NOT blindly re-addable — the
watermark guard is what makes them safe)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mb_crdb_cdc_dlgen2_synapse_spark.operators import retrieval
from mb_crdb_cdc_dlgen2_synapse_spark.operators.bm25_index import (
    assert_bm25_index_matches_scratch,
    bm25_index_topk,
    catchup_bm25_index,
    stream_bm25_index_to_tx_table,
)
from mb_crdb_cdc_dlgen2_synapse_spark.sources.tables import load_table
from mb_crdb_cdc_dlgen2_synapse_spark.txlog import TxTable


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").select("doc_id", "text")


QUERIES = [(1, "vector"), (1, "hash"), (2, "spark"), (2, "window")]


def _queries(spark):
    return spark.createDataFrame(QUERIES, "query_id int, term string")


def _mutate(src):
    upd = src.read().filter(F.col("doc_id") % 7 == 0).select(
        "doc_id", F.concat(F.col("text"), F.lit(" vector vector spark")).alias("text")
    )
    src.merge_into(upd, on=["doc_id"], mode="dv")
    gone = src.read().filter(F.col("doc_id") % 11 == 3).withColumn("_g", F.lit(True))
    src.merge_into(gone, on=["doc_id"], delete_when="_g", mode="dv")
    fresh = src.read().filter(F.col("doc_id") % 13 == 1).select(
        (F.col("doc_id") + 2000000).alias("doc_id"), "text"
    )
    src.append(fresh)


def test_incremental_equals_scratch_and_matches_corpus_scan(
    spark, docs, tmp_path
):
    src = TxTable(spark, str(tmp_path / "src"))
    src.append(docs)
    index = TxTable(spark, str(tmp_path / "idx"))
    catchup_bm25_index(src, index)
    assert_bm25_index_matches_scratch(index, src)
    _mutate(src)
    catchup_bm25_index(src, index)  # one catch-up over three commits
    assert_bm25_index_matches_scratch(index, src)
    # the pruned-index read scores EXACTLY like the corpus scan
    q = _queries(spark)
    via_index = retrieval_rows(bm25_index_topk(index, q, k=10))
    via_scan = retrieval_rows(
        retrieval.bm25_topk(src.read().select("doc_id", "text"), q, k=10)
    )
    assert via_index == via_scan
    # idempotent: no new commits -> no-op
    v = index.version()
    assert catchup_bm25_index(src, index) == src.version()
    assert index.version() == v


def retrieval_rows(df):
    return sorted((r.query_id, r.rk, r.doc_id, r.score) for r in df.collect())


def test_stepwise_catchup_matches_single_range(spark, docs, tmp_path):
    def history(path):
        t = TxTable(spark, path)
        t.append(docs.filter(F.col("doc_id") < 120))
        _mutate(t)
        return t

    a = history(str(tmp_path / "a"))
    ia = TxTable(spark, str(tmp_path / "ia"))
    catchup_bm25_index(a, ia, step=1)
    b = history(str(tmp_path / "b"))
    ib = TxTable(spark, str(tmp_path / "ib"))
    catchup_bm25_index(b, ib)
    assert_bm25_index_matches_scratch(ia, a)
    rows = lambda t: sorted(
        map(tuple, t.read().select("doc_id", "token", "tf", "dl").collect())
    )
    assert rows(ia) == rows(ib)
    assert ia.properties()["bm25.nDocs"] == ib.properties()["bm25.nDocs"]
    assert ia.properties()["bm25.totalDl"] == ib.properties()["bm25.totalDl"]


def test_streaming_maintenance_and_exactly_once_scalars(spark, docs, tmp_path):
    src_dir, idx_dir = str(tmp_path / "src"), str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")
    src = TxTable(spark, src_dir)
    src.append(docs.filter(F.col("doc_id") < 150))
    # stream bootstrap (tokenization needs no training)
    q = stream_bm25_index_to_tx_table(spark, src_dir, idx_dir, ckpt)
    q.awaitTermination(120)
    index = TxTable(spark, idx_dir)
    assert_bm25_index_matches_scratch(index, src)
    # interim mutations while the stream is down, then resume from ckpt
    _mutate(src)
    q2 = stream_bm25_index_to_tx_table(spark, src_dir, idx_dir, ckpt)
    q2.awaitTermination(120)
    index = TxTable(spark, idx_dir)
    assert_bm25_index_matches_scratch(index, src)
    # replay with no new commits: content AND scalars untouched
    props = index.properties()
    q3 = stream_bm25_index_to_tx_table(spark, src_dir, idx_dir, ckpt)
    q3.awaitTermination(120)
    p2 = TxTable(spark, idx_dir).properties()
    assert (p2["bm25.nDocs"], p2["bm25.totalDl"]) == (
        props["bm25.nDocs"], props["bm25.totalDl"],
    )
    # FRESH checkpoint over the maintained index: interim deletes between
    # batch watermark and stream start must still land (watermark tail)
    gone = src.read().filter(F.col("doc_id") % 5 == 2).withColumn("_g", F.lit(True))
    src.merge_into(gone, on=["doc_id"], delete_when="_g", mode="dv")
    q4 = stream_bm25_index_to_tx_table(
        spark, src_dir, idx_dir, str(tmp_path / "ckpt2")
    )
    q4.awaitTermination(120)
    assert_bm25_index_matches_scratch(TxTable(spark, idx_dir), src)


def test_empty_bootstrap_defers(spark, tmp_path):
    src = TxTable(spark, str(tmp_path / "src"))
    src.append(
        spark.createDataFrame([], "doc_id long, text string")
    )
    index = TxTable(spark, str(tmp_path / "idx"))
    assert catchup_bm25_index(src, index) == -1  # deferred
    src.append(spark.createDataFrame([(1, "alpha beta")], "doc_id long, text string"))
    catchup_bm25_index(src, index)
    assert_bm25_index_matches_scratch(index, src)
    assert index.properties()["bm25.nDocs"] == "1"
    assert index.properties()["bm25.totalDl"] == "2"


def test_hybrid_retrieval_through_both_incremental_indexes(spark, docs, tmp_path):
    """Composition capstone: lexical ranking through the BM25 inverted
    index and vector ranking through the CDF-maintained Hamming ANN
    index, fused with RRF — the full production retrieval path, every
    stage an incremental index read, no corpus scan anywhere."""
    from mb_crdb_cdc_dlgen2_synapse_spark.operators.ann_index import (
        catchup_ann_index,
    )
    from mb_crdb_cdc_dlgen2_synapse_spark.operators.similarity import (
        probed_hamming_topk,
    )

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    src_d = TxTable(spark, str(tmp_path / "docs"))
    src_d.append(docs)
    bm25 = TxTable(spark, str(tmp_path / "bm25"))
    catchup_bm25_index(src_d, bm25)
    src_e = TxTable(spark, str(tmp_path / "emb"))
    src_e.append(emb.select("vec_id", "embedding"))
    ann = TxTable(spark, str(tmp_path / "ann"))
    catchup_ann_index(src_e, ann, prefix_bits=4)

    q = spark.createDataFrame(
        [(0, "vector"), (0, "hash"), (1, "spark")], "query_id int, term string"
    )
    lex = bm25_index_topk(bm25, q, k=20).select(
        "query_id", "doc_id", F.col("rk").alias("lex_rk")
    )
    qv = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    vec = probed_hamming_topk(ann, qv, k=20, radius=1).select(
        "query_id", F.col("vec_id").alias("doc_id"), F.col("rk").alias("vec_rk")
    )
    fused = retrieval.rrf_fuse(lex, vec, "lex_rk", "vec_rk", k=10).collect()
    by_q = {}
    for r in fused:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {0, 1}
    for rows in by_q.values():
        assert [r.rk for r in sorted(rows, key=lambda r: r.rk)] == list(
            range(1, len(rows) + 1)
        )
    # a doc ranked by BOTH systems outranks same-rank single-system docs
    both = [r for r in fused if r.rrf > 1.0 / 61]
    assert all(r.rk <= 3 for r in both) or both == []


def test_compaction_interplay_and_randomized_history(spark, docs, tmp_path):
    """(a) OPTIMIZE on source or index must not disturb maintenance: a
    source compact emits nothing on the feed (catch-up no-op), an index
    compact restores (token, doc_id) clustering without changing content
    or query answers. (b) Seeded random mutation history: stepwise
    catch-ups equal scratch at every step."""
    import random

    src = TxTable(spark, str(tmp_path / "src"))
    base = docs.filter(F.col("doc_id") < 100).localCheckpoint(eager=True)
    src.append(base)
    index = TxTable(spark, str(tmp_path / "idx"))
    catchup_bm25_index(src, index)
    q = _queries(spark)
    before = retrieval_rows(bm25_index_topk(index, q, k=10))

    # (a) source compact: pure relayout, feed emits nothing
    src.compact()
    v = index.version()
    catchup_bm25_index(src, index)
    assert_bm25_index_matches_scratch(index, src)
    # index compact: content + answers preserved, maintenance continues
    index.compact()
    assert retrieval_rows(bm25_index_topk(index, q, k=10)) == before
    assert_bm25_index_matches_scratch(index, src)

    # (b) randomized history, stepwise catch-up, equality at every step
    rng = random.Random(43)
    next_id = 3000000
    for step in range(4):
        for _ in range(rng.randint(1, 2)):
            op = rng.choice(["update", "delete", "insert"])
            ids = rng.sample(range(100), rng.randint(1, 8))
            if op == "update":
                upd = src.read().filter(F.col("doc_id").isin(ids)).select(
                    "doc_id",
                    F.concat(F.col("text"), F.lit(f" step{step}")).alias("text"),
                )
                if upd.take(1):
                    src.merge_into(upd, on=["doc_id"], mode="dv")
            elif op == "delete":
                gone = src.read().filter(F.col("doc_id").isin(ids)).withColumn(
                    "_g", F.lit(True)
                )
                if gone.take(1):
                    src.merge_into(gone, on=["doc_id"], delete_when="_g", mode="dv")
            else:
                src.append(
                    base.filter(F.col("doc_id").isin(ids)).select(
                        (F.col("doc_id") + next_id).alias("doc_id"), "text"
                    )
                )
                next_id += 1000000
        catchup_bm25_index(src, index)
        assert_bm25_index_matches_scratch(index, src)
