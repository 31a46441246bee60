#!/usr/bin/env python
"""MinHash-LSH bands index scale receipt: what precomputed band entries
buy over re-shingling + re-signing the corpus per dedup run, and what
maintenance costs vs a rebuild.

Corpus: N synthetic Zipf-token docs (the bm25_index_scale generator)
with every %100th doc duplicated under a shifted id (so near-dup pairs
exist), in a txlog table. Measures:
- query path: lsh_index_pairs (self-join over precomputed entries) vs
  dedup.lsh_candidates (shingle+minhash+band the whole corpus, then the
  same join) — identical output asserted on the first run;
- probe path: a 1k-doc incoming batch answered via the band_key
  IN-pruned index read (files opened vs total);
- maintenance: a single-doc trickle update folded incrementally (CDF
  pre-images) vs rebuilding the bands from scratch — wall-clock, bytes
  written, merge candidate files.

Usage: python scripts/lsh_index_scale.py [n_docs]
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

from mb_crdb_cdc_dlgen2_synapse_spark.operators import dedup  # noqa: E402
from mb_crdb_cdc_dlgen2_synapse_spark.operators.lsh_index import (  # noqa: E402
    catchup_lsh_index,
    lsh_index_pairs,
    lsh_index_probe,
)
from mb_crdb_cdc_dlgen2_synapse_spark.session import get_spark  # noqa: E402
from mb_crdb_cdc_dlgen2_synapse_spark.txlog import TxTable  # noqa: E402

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
ROOT = "/tmp/lsh_index_scale"


def du(path: str) -> int:
    total = 0
    for dirpath, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(dirpath, f))
    return total


def corpus(spark, n_docs: int):
    def tok(i):
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

    base = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ", F.transform(F.sequence(F.lit(0), F.lit(59)), tok)
        ).alias("text"),
    )
    dups = base.filter(F.col("doc_id") % 100 == 0).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"), "text"
    )
    return base.unionByName(dups)


def main():
    shutil.rmtree(ROOT, ignore_errors=True)
    spark = get_spark(
        app_name="lsh_index_scale", master="local[32]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = corpus(spark, N_DOCS).localCheckpoint(eager=True)
    src = TxTable(spark, f"{ROOT}/src")
    src.append(docs)

    index = TxTable(spark, f"{ROOT}/idx")
    t0 = time.time()
    catchup_lsh_index(src, index)
    boot = time.time() - t0
    print(json.dumps({
        "step": "bootstrap", "n_docs": N_DOCS,
        "sec": round(boot, 2),
        "index_mb": round(du(f"{ROOT}/idx") / 1e6, 1),
        "src_mb": round(du(f"{ROOT}/src") / 1e6, 1),
    }))

    # query path: pairs from entries vs full recompute (identical output)
    key = lambda df: sorted(
        (r.doc_a, r.doc_b, r.n_shared_bands) for r in df.collect()
    )
    assert key(lsh_index_pairs(index)) == key(
        dedup.lsh_candidates(src.read().select("doc_id", "text"))
    ), "index pairs diverged from recompute"
    for tag, fn in [
        ("index_pairs", lambda: lsh_index_pairs(index)),
        ("recompute_pairs", lambda: dedup.lsh_candidates(
            src.read().select("doc_id", "text"))),
    ]:
        fn().collect()
        t0 = time.time()
        n = fn().count()
        print(json.dumps({
            "step": f"query_{tag}", "sec": round(time.time() - t0, 2),
            "pairs": n,
        }))

    # probe path: 1k incoming docs vs the indexed corpus (pruned read)
    batch = docs.filter(F.col("doc_id") % (N_DOCS // 1000) == 3).limit(1000).select(
        (F.col("doc_id") + 20_000_000).alias("doc_id"), "text"
    ).localCheckpoint(eager=True)
    lsh_index_probe(index, batch).collect()
    t0 = time.time()
    hits = lsh_index_probe(index, batch).count()
    print(json.dumps({
        "step": "probe_1k_batch", "sec": round(time.time() - t0, 2),
        "hits": hits, "index_files_total": len(index.snapshot()[1]),
    }))

    # maintenance: single-doc trickle vs rebuild, with candidate spy
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
    upd = src.read().filter(F.col("doc_id") == 55555).select(
        "doc_id", F.concat(F.col("text"), F.lit(" fresh suffix")).alias("text")
    )
    src.merge_into(upd, on=["doc_id"], mode="dv")
    merges.clear()
    before = du(f"{ROOT}/idx")
    t0 = time.time()
    catchup_lsh_index(src, index)
    incr = time.time() - t0
    incr_bytes = du(f"{ROOT}/idx") - before
    rebuild = TxTable(spark, f"{ROOT}/rebuild")
    t0 = time.time()
    catchup_lsh_index(src, rebuild)
    full = time.time() - t0
    print(json.dumps({
        "step": "maintenance_single_doc",
        "incremental_sec": round(incr, 2),
        "incremental_mb": round(incr_bytes / 1e6, 3),
        "index_merge_candidates": [m for m in merges if m[0] > 1],
        "index_files_total": n_files,
        "rebuild_sec": round(full, 2),
        "rebuild_mb": round(du(f"{ROOT}/rebuild") / 1e6, 2),
        "write_volume_win": round(
            du(f"{ROOT}/rebuild") / max(incr_bytes, 1), 1
        ),
    }))


if __name__ == "__main__":
    main()
