"""Cross-cutting index-family hardening: vacuum reclaims auto-compacted
fragments without disturbing answers, and the composed hybrid retrieval
path stays consistent with freshly-built indexes under seeded random
mutation histories on BOTH source tables."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from mb_crdb_cdc_dlgen2_synapse_spark.engine import Engine
from mb_crdb_cdc_dlgen2_synapse_spark.operators.ann_index import (
    catchup_ann_index,
)
from mb_crdb_cdc_dlgen2_synapse_spark.operators.bm25_index import (
    assert_bm25_index_matches_scratch,
    bm25_index_topk,
    catchup_bm25_index,
)
from mb_crdb_cdc_dlgen2_synapse_spark.operators.similarity import (
    synthetic_embeddings,
)
from mb_crdb_cdc_dlgen2_synapse_spark.sources.tables import load_table
from mb_crdb_cdc_dlgen2_synapse_spark.txlog import TxTable


def _parquet_count(path: str) -> int:
    n = 0
    for dirpath, _dirs, files in os.walk(path):
        if "_staging" in dirpath or "_dv" in dirpath:
            continue
        n += sum(1 for f in files if f.endswith(".parquet"))
    return n


def test_vacuum_after_autocompact_reclaims_fragments(
    spark, sf_dir, tmp_path, monkeypatch
):
    """compact_layout resets DVs and replaces every file in one commit;
    the superseded trickle fragments stay on disk for time travel until
    VACUUM. After the cadence fires, vacuum(retain_versions=1) must
    physically reclaim them, and the index must still equal scratch and
    answer queries — the full storage lifecycle of a maintained index."""
    from mb_crdb_cdc_dlgen2_synapse_spark.operators import bm25_index as bi

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    src = TxTable(spark, str(tmp_path / "src"))
    src.append(docs.filter(F.col("doc_id") < 100))
    index = TxTable(spark, str(tmp_path / "idx"))
    bi.catchup_bm25_index(src, index)
    # default ROWS_PER_FILE => ideal file count 1, threshold ~= 33.5:
    # each DV-mode fold adds ~1-2 fragment files, so ~36 trickle batches
    # GUARANTEE the relative threshold is crossed and the cadence fires
    compacted = False
    for step in range(36):
        upd = src.read().filter(F.col("doc_id") % 23 == step % 23).select(
            "doc_id",
            F.concat(F.col("text"), F.lit(f" vac{step}")).alias("text"),
        )
        src.merge_into(upd, on=["doc_id"], mode="dv")
        v0 = index.version()
        bi.catchup_bm25_index(src, index)
        if index.version() - v0 > 1:
            compacted = True
    assert compacted, "cadence never fired — fixture too small"
    on_disk_before = _parquet_count(str(tmp_path / "idx"))
    active = len(index.snapshot()[1])
    assert on_disk_before > active  # superseded fragments still on disk
    index.vacuum(retain_versions=1)
    on_disk_after = _parquet_count(str(tmp_path / "idx"))
    # reclaimed down to (at most) the active set + checkpoint manifests
    assert on_disk_after < on_disk_before
    assert len(index.snapshot()[1]) == active
    assert_bm25_index_matches_scratch(index, src)
    q = spark.createDataFrame(
        [(1, "vector"), (1, "vac3")], "query_id int, term string"
    )
    assert bm25_index_topk(index, q, k=5).count() > 0


@pytest.mark.parametrize("seed", [11])
def test_hybrid_search_consistent_under_random_history(
    spark, sf_dir, tmp_path, seed
):
    """Composition fuzz: random insert/update/delete histories on BOTH
    source tables, both indexes maintained incrementally; after every
    step Engine.hybrid_search over the MAINTAINED indexes must equal the
    same search over indexes built FRESH from the current snapshots —
    the end-to-end guarantee a production retrieval stack actually
    needs (per-component equality proofs already exist; this pins the
    composed answer)."""
    import random

    rng = random.Random(seed)
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 100)
        .localCheckpoint(eager=True)
    )
    emb = synthetic_embeddings(spark, 100).localCheckpoint(eager=True)
    src_d = TxTable(spark, str(tmp_path / "sd"))
    src_d.append(docs)
    src_e = TxTable(spark, str(tmp_path / "se"))
    src_e.append(emb)
    bm25 = TxTable(spark, str(tmp_path / "bm25"))
    catchup_bm25_index(src_d, bm25)
    ann = TxTable(spark, str(tmp_path / "ann"))
    catchup_ann_index(src_e, ann, prefix_bits=4)

    eng = Engine(spark)
    q_terms = spark.createDataFrame(
        [(1, "vector"), (1, "hash"), (2, "spark")], "query_id int, term string"
    )
    q_vecs = emb.filter(F.col("vec_id").isin(1, 2)).select(
        F.col("vec_id").cast("int").alias("query_id"), "embedding"
    )
    next_id = 7_000_000
    for step in range(3):
        for _ in range(rng.randint(1, 2)):
            op = rng.choice(["update", "delete", "insert"])
            ids = rng.sample(range(100), rng.randint(2, 6))
            if op == "update":
                upd = src_d.read().filter(F.col("doc_id").isin(ids)).select(
                    "doc_id",
                    F.concat(F.col("text"), F.lit(f" hs{step}")).alias("text"),
                )
                if upd.take(1):
                    src_d.merge_into(upd, on=["doc_id"], mode="dv")
                mv = src_e.read().filter(F.col("vec_id").isin(ids)).filter(
                    ~F.col("vec_id").isin(1, 2)  # keep query vectors stable
                ).select(
                    "vec_id",
                    F.transform("embedding", lambda x: -x).alias("embedding"),
                )
                if mv.take(1):
                    src_e.merge_into(mv, on=["vec_id"], mode="dv")
            elif op == "delete":
                gd = src_d.read().filter(F.col("doc_id").isin(ids)).withColumn(
                    "_g", F.lit(True)
                )
                if gd.take(1):
                    src_d.merge_into(gd, on=["doc_id"], delete_when="_g", mode="dv")
                ge = src_e.read().filter(
                    F.col("vec_id").isin(ids) & ~F.col("vec_id").isin(1, 2)
                ).withColumn("_g", F.lit(True))
                if ge.take(1):
                    src_e.merge_into(ge, on=["vec_id"], delete_when="_g", mode="dv")
            else:
                nd = docs.filter(F.col("doc_id").isin(ids)).select(
                    (F.col("doc_id") + next_id).alias("doc_id"), "text"
                )
                src_d.append(nd)
                ne = emb.filter(F.col("vec_id").isin(ids)).select(
                    (F.col("vec_id") + next_id).alias("vec_id"), "embedding"
                )
                src_e.append(ne)
                next_id += 1_000_000
        catchup_bm25_index(src_d, bm25)
        catchup_ann_index(src_e, ann)
        # fresh indexes from the CURRENT snapshots
        fb = TxTable(spark, str(tmp_path / f"fb{step}"))
        catchup_bm25_index(src_d, fb)
        fa = TxTable(spark, str(tmp_path / f"fa{step}"))
        catchup_ann_index(src_e, fa, prefix_bits=4)
        got = eng.hybrid_search(bm25.path, ann.path, q_terms, q_vecs, k=10)
        want = eng.hybrid_search(fb.path, fa.path, q_terms, q_vecs, k=10)
        key = lambda df: sorted(
            (r.query_id, r.rk, r.doc_id, round(r.rrf, 12)) for r in df.collect()
        )
        assert key(got) == key(want), f"hybrid diverged at step {step}"


def test_hybrid_search_during_live_maintenance_is_prefix_consistent(
    spark, sf_dir, tmp_path
):
    """VERDICT r10 item 5: Engine.hybrid_search runs CONCURRENTLY (a real
    thread race, not sequenced steps) with LIVE streaming maintenance
    folds advancing both indexes; every answer must equal the hybrid
    answer over SOME pair of index versions alive during that query's
    observation window. Both read paths pin one snapshot internally
    (bm25_index_topk's as_of discipline; probed_hamming_topk's single
    read), so each concurrent answer is the fusion of two pinned
    sub-answers — this test PROVES it by replaying every (vb, va)
    candidate pair through the new as_of parameters and asserting
    membership."""
    import threading
    import time as _t

    from mb_crdb_cdc_dlgen2_synapse_spark.operators.retrieval import rrf_fuse
    from mb_crdb_cdc_dlgen2_synapse_spark.operators.similarity import (
        probed_hamming_topk,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 80)
        .localCheckpoint(eager=True)
    )
    emb = synthetic_embeddings(spark, 80).localCheckpoint(eager=True)
    src_d = TxTable(spark, str(tmp_path / "sd"))
    src_d.append(docs)
    src_e = TxTable(spark, str(tmp_path / "se"))
    src_e.append(emb)
    bm25 = TxTable(spark, str(tmp_path / "bm25"))
    catchup_bm25_index(src_d, bm25)
    ann = TxTable(spark, str(tmp_path / "ann"))
    catchup_ann_index(src_e, ann, prefix_bits=4)

    eng = Engine(spark)
    q_terms = spark.createDataFrame(
        [(1, "vector"), (1, "hash"), (2, "spark")], "query_id int, term string"
    )
    q_vecs = emb.filter(F.col("vec_id").isin(1, 2)).select(
        F.col("vec_id").cast("int").alias("query_id"), "embedding"
    )
    key = lambda df: tuple(
        sorted((r.query_id, r.rk, r.doc_id, round(r.rrf, 12)) for r in df.collect())
    )

    errs: list[BaseException] = []

    def writer():
        try:
            for step in range(4):
                upd = src_d.read().filter(
                    F.col("doc_id") % 5 == step % 5
                ).select(
                    "doc_id",
                    F.concat(F.col("text"), F.lit(f" race{step}")).alias("text"),
                )
                src_d.merge_into(upd, on=["doc_id"], mode="dv")
                mv = src_e.read().filter(
                    (F.col("vec_id") % 7 == step % 7)
                    & ~F.col("vec_id").isin(1, 2)
                ).select(
                    "vec_id",
                    F.transform("embedding", lambda x: -x).alias("embedding"),
                )
                src_e.merge_into(mv, on=["vec_id"], mode="dv")
                eng.start_bm25_index_maintenance(
                    src_d.path, bm25.path, str(tmp_path / "ckb")
                ).awaitTermination(120)
                eng.start_ann_index_maintenance(
                    src_e.path, ann.path, str(tmp_path / "cka"), prefix_bits=4
                ).awaitTermination(120)
        except BaseException as e:  # surfaced in the main thread
            errs.append(e)

    w = threading.Thread(target=writer)
    w.start()
    observed = []
    while w.is_alive():
        vb0, va0 = bm25.version(), ann.version()
        ans = key(
            eng.hybrid_search(
                bm25.path, ann.path, q_terms, q_vecs,
                k=10, per_system_k=10, radius=1,
            )
        )
        vb1, va1 = bm25.version(), ann.version()
        observed.append((vb0, vb1, va0, va1, ans))
        _t.sleep(0.05)
    w.join()
    assert not errs, f"maintenance thread failed: {errs[0]!r}"
    assert len(observed) >= 3, "race produced too few concurrent queries"
    raced = sum(1 for vb0, vb1, va0, va1, _ in observed if vb1 > vb0 or va1 > va0)

    def pinned_hybrid(vb: int, va: int):
        lex = bm25_index_topk(bm25, q_terms, k=10, as_of=vb).select(
            "query_id", "doc_id", F.col("rk").alias("lex_rk")
        )
        vec = probed_hamming_topk(
            ann, q_vecs, k=10, radius=1, as_of=va
        ).select(
            "query_id",
            F.col("vec_id").alias("doc_id"),
            F.col("rk").alias("vec_rk"),
        )
        return key(rrf_fuse(lex, vec, "lex_rk", "vec_rk", k=10))

    memo: dict[tuple[int, int], tuple] = {}
    for vb0, vb1, va0, va1, ans in observed:
        candidates = set()
        for vb in range(vb0, vb1 + 1):
            for va in range(va0, va1 + 1):
                if (vb, va) not in memo:
                    memo[(vb, va)] = pinned_hybrid(vb, va)
                candidates.add(memo[(vb, va)])
        assert ans in candidates, (
            f"answer observed in window bm25[{vb0},{vb1}] × ann[{va0},{va1}] "
            "matches NO prefix-consistent snapshot pair"
        )
    # the race must actually have raced at least once to prove anything
    assert raced >= 1, "no query overlapped a maintenance commit; widen the race"


def test_hybrid_pinned_source_answers_are_bit_stable(spark, sf_dir, tmp_path):
    """VERDICT r11 item 4: tenant-facing time travel is ONE parameter —
    Engine.hybrid_search(as_of_source=(docs_v, emb_v)) resolves BOTH
    index pins from the source versions via each index's watermark
    history (resolve_hybrid_pins), and the pinned answer — filtered
    path included — is BIT-stable while maintenance keeps folding new
    source commits. Also pins the boundary: resolving a source version
    older than the index's first watermark raises."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 100)
        .localCheckpoint(eager=True)
    )
    emb = synthetic_embeddings(spark, 100).localCheckpoint(eager=True)
    src_d = TxTable(spark, str(tmp_path / "sd"))
    src_d.append(docs)
    src_e = TxTable(spark, str(tmp_path / "se"))
    src_e.append(emb)
    bm25 = TxTable(spark, str(tmp_path / "bm25"))
    catchup_bm25_index(src_d, bm25)
    ann = TxTable(spark, str(tmp_path / "ann"))
    catchup_ann_index(src_e, ann, prefix_bits=4)

    eng = Engine(spark)
    q_terms = spark.createDataFrame(
        [(1, "vector"), (1, "spark"), (2, "data")], "query_id int, term string"
    )
    q_vecs = emb.filter(F.col("vec_id").isin(1, 2)).select(
        F.col("vec_id").cast("int").alias("query_id"), "embedding"
    )
    allowed = spark.range(100).filter(F.col("id") % 2 == 0).select(
        F.col("id").alias("doc_id")
    )
    key = lambda df: tuple(
        sorted((r.query_id, r.rk, r.doc_id, round(r.rrf, 12)) for r in df.collect())
    )

    pin = (src_d.version(), src_e.version())
    want_plain = key(
        eng.hybrid_search(bm25.path, ann.path, q_terms, q_vecs, k=8)
    )
    want_filtered = key(
        eng.hybrid_search(
            bm25.path, ann.path, q_terms, q_vecs, k=8, allowed=allowed
        )
    )
    # at pin time, the resolved pair answers exactly like head
    assert key(
        eng.hybrid_search(
            bm25.path, ann.path, q_terms, q_vecs, k=8, as_of_source=pin
        )
    ) == want_plain

    for step in range(3):  # maintenance keeps folding...
        upd = src_d.read().filter(F.col("doc_id") % 4 == step % 4).select(
            "doc_id", F.concat("text", F.lit(f" drift{step} vector")).alias("text")
        )
        src_d.merge_into(upd, on=["doc_id"], mode="dv")
        mv = src_e.read().filter(
            (F.col("vec_id") % 6 == step) & ~F.col("vec_id").isin(1, 2)
        ).select("vec_id", F.transform("embedding", lambda x: -x).alias("embedding"))
        src_e.merge_into(mv, on=["vec_id"], mode="dv")
        catchup_bm25_index(src_d, bm25)
        catchup_ann_index(src_e, ann)
        # ...and the pinned-source answers never move, filtered included
        assert key(
            eng.hybrid_search(
                bm25.path, ann.path, q_terms, q_vecs, k=8, as_of_source=pin
            )
        ) == want_plain, f"pinned plain answer drifted at step {step}"
        assert key(
            eng.hybrid_search(
                bm25.path, ann.path, q_terms, q_vecs, k=8,
                as_of_source=pin, allowed=allowed,
            )
        ) == want_filtered, f"pinned filtered answer drifted at step {step}"
    # head answers DID move (the maintenance was real)
    assert key(
        eng.hybrid_search(bm25.path, ann.path, q_terms, q_vecs, k=8)
    ) != want_plain
    # resolved pins equal the last index versions whose watermark <= pin
    vb, va = eng.resolve_hybrid_pins(bm25.path, ann.path, pin)
    assert int(bm25.properties(as_of=vb)["bm25.srcVersion"]) <= pin[0]
    assert int(ann.properties(as_of=va)["ann.srcVersion"]) <= pin[1]
    # a source version older than the first watermark has no index state
    with pytest.raises(ValueError, match="predates"):
        eng.resolve_hybrid_pins(bm25.path, ann.path, (-1, -1))
