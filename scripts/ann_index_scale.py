#!/usr/bin/env python
"""Scale receipt for the CDF-maintained ANN index (operators/ann_index.py):
at N synthetic vectors, measure bootstrap, incremental catch-up, and the
from-scratch rebuild it replaces — in BOTH churn regimes:

- ``spread``: mutations hit a uniform residue class (every data file —
  span pruning defeated, the worst case). Here the increment's win is
  WRITE volume (DVs + changed rows vs the whole index), not scan count.
- ``local``: mutations are new appends + an update confined to the tail
  key range (CDC locality). File pruning bounds both the feed render
  and the merge candidates, so the increment wins wall-clock too.
- ``trickle``: a realistic steady-state CDC micro-batch — a few dozen
  scattered keys. Round 9's merge-key clustering (vec_id-range files
  within bucket partitions) + key-set candidate pruning bound the
  merge to the files actually holding a changed key; the receipt
  prints candidate files vs total.

Also reports bytes written per maintenance step (the quantity that
bounds cost on object storage at 100 TB) alongside wall-clock.

Usage: python scripts/ann_index_scale.py [n_vectors] [mutation_pct]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from mb_crdb_cdc_dlgen2_synapse_spark.operators.ann_index import (  # noqa: E402
    assert_index_matches_scratch,
    catchup_ann_index,
)
from mb_crdb_cdc_dlgen2_synapse_spark.operators.similarity import (  # noqa: E402
    materialize_binary_codes,
    synthetic_embeddings,
)
from mb_crdb_cdc_dlgen2_synapse_spark.session import get_spark  # noqa: E402
from mb_crdb_cdc_dlgen2_synapse_spark.txlog import TxTable  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
PCT = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0

spark = get_spark(app_name="ann_index_scale", master="local[32]", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")


def du(path: str) -> int:
    total = 0
    for dirpath, _d, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(dirpath, f))
            except OSError:
                pass
    return total


def regime(tag: str, mutate) -> None:
    root = tempfile.mkdtemp(prefix=f"ann_scale_{tag}_")
    try:
        src = TxTable(spark, f"{root}/src")
        src.append(synthetic_embeddings(spark, N).repartition(32))
        index = TxTable(spark, f"{root}/idx")
        t0 = time.time()
        # rows_per_file scaled so each bucket holds SEVERAL tight-span
        # files (the 100 TB shape, where per-bucket rows >> any file
        # size) — this is what key-set pruning prunes against
        catchup_ann_index(src, index, prefix_bits=4, rows_per_file=max(N // 128, 1024))
        boot = time.time() - t0
        # routine OPTIMIZE (the 100 TB maintenance step): linear-cluster
        # (bucket, vec_id) into bounded files and BACKFILL the per-file
        # vec_id blooms the bootstrap files don't carry (bloom index is
        # declared after the first write — Delta's contract)
        t0 = time.time()
        index.compact(
            target_files=128, z_order=["bucket", "vec_id"], curve="linear"
        )
        opt = time.time() - t0
        n_changed = mutate(src)
        sz_before = du(f"{root}/idx")
        n_files = len(index.snapshot()[1])
        # capture the index-side merge reports (candidate pruning receipt)
        reports: list[dict] = []
        orig_merge = index.merge_into

        def recording_merge(*a, **k):
            r = orig_merge(*a, **k)
            reports.append(r)
            return r

        index.merge_into = recording_merge
        t0 = time.time()
        catchup_ann_index(src, index, rows_per_file=max(N // 128, 1024))
        incr = time.time() - t0
        index.merge_into = orig_merge
        incr_bytes = du(f"{root}/idx") - sz_before
        cand_note = ""
        if reports:
            cands = max(r.get("candidates", 0) for r in reports)
            cand_note = f"  merge candidates {cands}/{n_files} files"
        t0 = time.time()
        materialize_binary_codes(
            src.read().select("vec_id", "embedding"),
            f"{root}/rebuild",
            prefix_bits=4,
        )
        full = time.time() - t0
        full_bytes = du(f"{root}/rebuild")
        t0 = time.time()
        assert_index_matches_scratch(index, src)
        proof = time.time() - t0
        print(
            f"[{tag}] N={N} churn={n_changed} ({100 * n_changed / N:.2f}%)\n"
            f"  bootstrap        {boot:7.2f}s  (+ optimize {opt:.2f}s)\n"
            f"  incremental      {incr:7.2f}s  wrote {incr_bytes / 1e6:8.2f} MB"
            f"{cand_note}\n"
            f"  full rebuild     {full:7.2f}s  wrote {full_bytes / 1e6:8.2f} MB\n"
            f"  write-volume win {full_bytes / max(incr_bytes, 1):6.1f}x   "
            f"wall-clock {full / incr:4.2f}x   equality proof {proof:.2f}s"
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


mod = max(2, int(100 / PCT))


def mutate_spread(src: TxTable) -> int:
    upd = (
        src.read()
        .filter(F.col("vec_id") % mod == 0)
        .select("vec_id", F.transform("embedding", lambda x: -x).alias("embedding"))
    )
    src.merge_into(upd, on=["vec_id"], mode="dv")
    gone = (
        src.read()
        .filter(F.col("vec_id") % (mod * 7) == 3)
        .withColumn("_g", F.lit(True))
    )
    src.merge_into(gone, on=["vec_id"], delete_when="_g", mode="dv")
    return N // mod + N // (mod * 7)


def mutate_local(src: TxTable) -> int:
    # CDC locality: fresh appends + an update confined to the newest keys
    n_new = N // mod
    src.append(
        synthetic_embeddings(spark, N + n_new).filter(F.col("vec_id") >= N)
    )
    upd = (
        src.read()
        .filter(F.col("vec_id") >= N + n_new // 2)
        .select("vec_id", F.transform("embedding", lambda x: -x).alias("embedding"))
    )
    src.merge_into(upd, on=["vec_id"], mode="dv")
    return n_new + n_new // 2


def mutate_trickle(src: TxTable) -> int:
    # steady-state CDC micro-batch: a few dozen scattered keys — the
    # regime where merge-key clustering + key-set pruning bound the
    # index merge to O(changed keys) candidate files
    stride = max(1, N // 40)
    upd = (
        src.read()
        .filter(F.col("vec_id") % stride == 17)
        .select("vec_id", F.transform("embedding", lambda x: -x).alias("embedding"))
    )
    src.merge_into(upd, on=["vec_id"], mode="dv")
    return N // stride


def ivfpq_receipt() -> None:
    """The compressed-index receipt: same maintenance story, 8-byte
    payload per vector. Reports the compression ratio (list-table bytes
    vs the raw float corpus it indexes) and the increment-vs-rebuild
    split for a trickle batch — at 100 TB of embeddings the IVF-PQ
    lists are the only index shape that fits in warm storage."""
    from mb_crdb_cdc_dlgen2_synapse_spark.operators.ann_index import (
        assert_ivfpq_index_matches_scratch,
        catchup_ivfpq_index,
        ivfpq_index_topk,
    )

    root = tempfile.mkdtemp(prefix="ann_scale_ivfpq_")
    try:
        src = TxTable(spark, f"{root}/src")
        src.append(synthetic_embeddings(spark, N).repartition(32))
        raw_bytes = du(f"{root}/src")
        index = TxTable(spark, f"{root}/idx")
        cents = TxTable(spark, f"{root}/cents")
        books = TxTable(spark, f"{root}/books")
        t0 = time.time()
        catchup_ivfpq_index(src, index, cents, books, n_lists=16, m=16)
        boot = time.time() - t0
        idx_bytes = du(f"{root}/idx")
        stride = max(1, N // 40)
        upd = (
            src.read()
            .filter(F.col("vec_id") % stride == 17)
            .select(
                "vec_id",
                F.transform("embedding", lambda x: -x).alias("embedding"),
            )
        )
        src.merge_into(upd, on=["vec_id"], mode="dv")
        sz = du(f"{root}/idx")
        t0 = time.time()
        catchup_ivfpq_index(src, index, cents, books)
        incr = time.time() - t0
        incr_bytes = du(f"{root}/idx") - sz
        t0 = time.time()
        assert_ivfpq_index_matches_scratch(index, cents, books, src)
        proof = time.time() - t0
        queries = (
            src.read()
            .filter(F.col("vec_id") < 3)
            .select(F.col("vec_id").alias("query_id"), "embedding")
        )
        t0 = time.time()
        ivfpq_index_topk(
            index, cents, books, src, queries, k=5, nprobe=4, shortlist=200
        ).collect()
        probe = time.time() - t0
        # drift-probe sampling receipt (ADVICE r9): the o(corpus) policy
        # check must agree with the exact one — ratio within a few %, and
        # the SAME fire/no-fire decision at the policy threshold
        from mb_crdb_cdc_dlgen2_synapse_spark.operators.ann_index import (
            ivfpq_index_drift,
        )

        t0 = time.time()
        exact = ivfpq_index_drift(src, index, cents)
        t_exact = time.time() - t0
        t0 = time.time()
        sampled = ivfpq_index_drift(src, index, cents, sample_mod=32)
        t_samp = time.time() - t0
        re_, rs = exact["drift_ratio"], sampled["drift_ratio"]
        # either ratio can be None (missing bootstrap baseline) or ~0
        # (degenerate bootMeanD2); the receipt must print raw values then,
        # not crash with TypeError/ZeroDivisionError
        if re_ and rs is not None:
            drift_line = (
                f"  drift probe      exact {re_:.4f} in {t_exact:.2f}s  "
                f"sampled(1/32) {rs:.4f} in {t_samp:.2f}s  "
                f"rel err {abs(rs - re_) / re_ * 100:.2f}%  "
                f"fire@1.5 agree: {(re_ > 1.5) == (rs > 1.5)}"
            )
        else:
            drift_line = (
                f"  drift probe      exact ratio={re_!r} in {t_exact:.2f}s  "
                f"sampled(1/32) ratio={rs!r} in {t_samp:.2f}s  "
                "(degenerate baseline: raw values printed, no rel-err)"
            )
        print(
            f"[ivfpq] N={N}\n"
            f"  raw corpus       {raw_bytes / 1e6:8.2f} MB  "
            f"list table {idx_bytes / 1e6:8.2f} MB  "
            f"(payload compression {raw_bytes / max(idx_bytes, 1):.1f}x)\n"
            f"  bootstrap        {boot:7.2f}s  "
            f"trickle increment {incr:.2f}s / {incr_bytes / 1e6:.2f} MB\n"
            f"  IVFADC+R probe   {probe:7.2f}s (3 queries, nprobe 4/16, "
            f"shortlist 200, source-key rerank)  equality proof {proof:.2f}s\n"
            + drift_line
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


regime("spread", mutate_spread)
regime("local", mutate_local)
regime("trickle", mutate_trickle)
ivfpq_receipt()
