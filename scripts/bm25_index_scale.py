#!/usr/bin/env python
"""BM25 inverted-index scale receipt: what the postings table buys over
re-tokenizing the corpus per query, and what maintenance costs vs a
rebuild.

Corpus: N synthetic docs, ~60 tokens each from a Zipf-shaped vocabulary
(md5-derived, deterministic), in a txlog table. Measures:
- query path: bm25_index_topk (token-IN pruned read of postings) vs
  bm25_topk (full corpus re-tokenization) — same scores by construction
  (shared scoring tail), asserted on the first run;
- maintenance: a SINGLE-doc trickle update and a 1k-doc bulk batch,
  folded incrementally (CDF pre-images) vs rebuilding the postings from
  scratch — wall-clock, bytes written, and CANDIDATE FILES touched (the
  axis that binds at 100 TB: the (token, doc_id) composite clustering
  prunes a changed doc's merge to ~1 file per distinct token — flat in
  corpus size — while a rebuild scales with the corpus).

Usage: python scripts/bm25_index_scale.py [n_docs]
Prints one JSON line per measurement for SCALING.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mb_crdb_cdc_dlgen2_synapse_spark.operators import retrieval  # noqa: E402
from mb_crdb_cdc_dlgen2_synapse_spark.operators.bm25_index import (  # noqa: E402
    bm25_index_topk,
    catchup_bm25_index,
)
from mb_crdb_cdc_dlgen2_synapse_spark.session import get_spark  # noqa: E402
from mb_crdb_cdc_dlgen2_synapse_spark.txlog import TxTable  # noqa: E402

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
ROOT = "/tmp/bm25_index_scale"

QUERIES = [(1, "t00003"), (1, "t00071"), (2, "t00007"), (2, "t01933")]


def du(path: str) -> int:
    total = 0
    for dirpath, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(dirpath, f))
    return total


def corpus(spark, n_docs: int):
    """~60 tokens/doc; token rank Zipf-shaped via md5-mod buckets —
    t00000..t09999, low ranks vastly more common (like real text)."""
    def tok(i):
        # u in [0,1) from an md5 prefix; u^3 skews token ids toward 0 —
        # a Zipf-shaped head like real text
        u = (
            F.conv(
                F.substring(F.md5(F.concat_ws("-", F.col("id"), i)), 1, 8), 16, 10
            ).cast("double")
            / F.lit(4294967296.0)
        )
        return F.concat(
            F.lit("t"),
            F.lpad((F.pow(u, 3.0) * 9999).cast("int").cast("string"), 5, "0"),
        )

    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ", F.transform(F.sequence(F.lit(0), F.lit(59)), tok)
        ).alias("text"),
    )


def main():
    shutil.rmtree(ROOT, ignore_errors=True)
    spark = get_spark(
        app_name="bm25_index_scale", master="local[32]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = corpus(spark, N_DOCS).localCheckpoint(eager=True)
    src = TxTable(spark, f"{ROOT}/src")
    src.append(docs)
    q = spark.createDataFrame(QUERIES, "query_id int, term string")

    index = TxTable(spark, f"{ROOT}/idx")
    t0 = time.time()
    catchup_bm25_index(src, index)
    boot = time.time() - t0
    idx_bytes = du(f"{ROOT}/idx")
    print(json.dumps({
        "step": "bootstrap", "n_docs": N_DOCS,
        "sec": round(boot, 2), "index_mb": round(idx_bytes / 1e6, 1),
        "src_mb": round(du(f"{ROOT}/src") / 1e6, 1),
    }))

    # query path: pruned index read vs corpus re-tokenization (warm x2)
    key = lambda df: sorted(
        (r.query_id, r.rk, r.doc_id, r.score) for r in df.collect()
    )
    assert key(bm25_index_topk(index, q, k=10)) == key(
        retrieval.bm25_topk(src.read().select("doc_id", "text"), q, k=10)
    ), "index and corpus-scan rankings diverged"
    for path, fn in [
        ("index", lambda: bm25_index_topk(index, q, k=10)),
        ("corpus_scan", lambda: retrieval.bm25_topk(
            src.read().select("doc_id", "text"), q, k=10)),
    ]:
        fn().collect()
        t0 = time.time()
        fn().collect()
        print(json.dumps({"step": f"query_{path}", "sec": round(time.time() - t0, 2)}))

    # maintenance: instrument merge candidate counts (the scale axis)
    from mb_crdb_cdc_dlgen2_synapse_spark import txlog as _T

    merges: list[tuple[int, float]] = []
    _orig = _T.TxTable._merge_dv

    def _spy(self, srcdf, on, cands, *a, **k):
        t0 = time.time()
        r = _orig(self, srcdf, on, cands, *a, **k)
        merges.append((len(cands), round(time.time() - t0, 2)))
        return r

    _T.TxTable._merge_dv = _spy
    n_files = len(index.snapshot()[1])

    def maintenance(tag, pred):
        upd = src.read().filter(pred).select(
            "doc_id",
            F.concat(F.col("text"), F.lit(" extra tokens here")).alias("text"),
        )
        src.merge_into(upd, on=["doc_id"], mode="dv")
        merges.clear()
        before = du(f"{ROOT}/idx")
        t0 = time.time()
        catchup_bm25_index(src, index)
        incr = time.time() - t0
        incr_bytes = du(f"{ROOT}/idx") - before
        shutil.rmtree(f"{ROOT}/rebuild_{tag}", ignore_errors=True)
        rebuild = TxTable(spark, f"{ROOT}/rebuild_{tag}")
        t0 = time.time()
        catchup_bm25_index(src, rebuild)
        full = time.time() - t0
        print(json.dumps({
            "step": f"maintenance_{tag}",
            "incremental_sec": round(incr, 2),
            "incremental_mb": round(incr_bytes / 1e6, 2),
            "index_merge_candidates": [m for m in merges if m[0] > 1],
            "index_files_total": n_files,
            "rebuild_sec": round(full, 2),
            "rebuild_mb": round(du(f"{ROOT}/rebuild_{tag}") / 1e6, 2),
            "write_volume_win": round(
                du(f"{ROOT}/rebuild_{tag}") / max(incr_bytes, 1), 1
            ),
        }))

    maintenance("single_doc", F.col("doc_id") == 55555)
    maintenance("1k_doc_bulk", F.col("doc_id") % (N_DOCS // 1000) == 7)

    # CDC steady state: many trickle batches fragment the clustered
    # layout; the catch-up-time auto-compaction (maybe_compact_index,
    # relative threshold = 1.5 x ideal + 32) must bound the file count
    # AND keep the candidate-pruning receipt from decaying. Run on its
    # own smaller corpus so the threshold is crossed within a cheap
    # batch budget (the policy is size-relative, so the mechanics are
    # identical at any N). Reported: bootstrap/worst/final file counts,
    # compactions fired, and the post-compaction single-doc merge
    # candidates + query wall.
    n2 = min(N_DOCS, 20_000)
    src2 = TxTable(spark, f"{ROOT}/src2")
    src2.append(corpus(spark, n2).localCheckpoint(eager=True))
    idx2 = TxTable(spark, f"{ROOT}/idx2")
    catchup_bm25_index(src2, idx2)
    files0 = len(idx2.snapshot()[1])
    compactions = 0
    worst_files = files0
    for i in range(40):
        upd = src2.read().filter(F.col("doc_id") % 997 == i).select(
            "doc_id",
            F.concat(F.col("text"), F.lit(f" steady{i}")).alias("text"),
        )
        src2.merge_into(upd, on=["doc_id"], mode="dv")
        v_before = idx2.version()
        catchup_bm25_index(src2, idx2)
        n_now = len(idx2.snapshot()[1])
        worst_files = max(worst_files, n_now)
        if idx2.version() - v_before > 1:  # fold commit + compact commit
            compactions += 1
    merges.clear()
    upd = src2.read().filter(F.col("doc_id") == 777).select(
        "doc_id", F.concat(F.col("text"), F.lit(" post compact")).alias("text")
    )
    src2.merge_into(upd, on=["doc_id"], mode="dv")
    t0 = time.time()
    catchup_bm25_index(src2, idx2)
    post_sec = time.time() - t0
    t0 = time.time()
    bm25_index_topk(idx2, q, k=10).collect()
    q_sec = time.time() - t0
    print(json.dumps({
        "step": "steady_state_autocompact",
        "n_docs": n2,
        "trickle_batches": 40,
        "files_bootstrap": files0,
        "files_worst": worst_files,
        "files_final": len(idx2.snapshot()[1]),
        "compactions_fired": compactions,
        "post_compact_single_doc_candidates": [m for m in merges if m[0] > 1],
        "post_compact_single_doc_sec": round(post_sec, 2),
        "post_compact_query_sec": round(q_sec, 2),
    }))


if __name__ == "__main__":
    main()
