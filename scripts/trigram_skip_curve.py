#!/usr/bin/env python
"""Trigram-bloom substring index measurement: build overhead and file-skip
effectiveness at corpus sizes beyond the test SFs, recorded in SCALING.md.

Corpus: n docs x ~60 md5-word tokens across n/5000 files (txlog appends of
5000 docs). One doc in 5000 additionally carries a rare marker phrase
drawn from 8 rotating markers; the probe measures, for each marker, how
many files the `(text, contains, marker)` predicate opens vs the total —
the pruning a `LIKE '%needle%'` query gets on a lake where min/max and
value blooms prune nothing. Also times the same appends WITHOUT the index
to isolate build overhead. Prints one JSON line per n.

Usage: python scripts/trigram_skip_curve.py [n ...]  (default 50000)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mb_crdb_cdc_dlgen2_synapse_spark.session import get_spark  # noqa: E402
from mb_crdb_cdc_dlgen2_synapse_spark.txlog import (  # noqa: E402
    TxTable,
    _file_may_match,
)

NS = [int(a) for a in sys.argv[1:]] or [50_000]

BATCH = 5_000
MARKERS = [f"rare marker phrase {i} xyzq{i}" for i in range(8)]


def corpus(spark, n: int):
    words = [
        F.md5(F.concat(F.col("id").cast("string"), F.lit(f"|w{i}")))
        for i in range(60)
    ]
    text = F.concat_ws(" ", *words)
    marker = F.concat(
        F.lit("rare marker phrase "),
        ((F.col("id") / BATCH).cast("bigint") % 8).cast("string"),
        F.lit(" xyzq"),
        ((F.col("id") / BATCH).cast("bigint") % 8).cast("string"),
    )
    text = F.when(F.col("id") % BATCH == 0, F.concat(text, F.lit(" "), marker)).otherwise(text)
    return spark.range(n).select(F.col("id").alias("doc_id"), text.alias("text"))


def build(spark, root: str, n: int, indexed: bool) -> float:
    t = TxTable(spark, root)
    df = corpus(spark, n)
    t.append(df.filter(F.col("doc_id") < 0).union(df.limit(1)))
    if indexed:
        t.set_bloom_index(["text"], bits=262144, hashes=3, mode="trigram")
    t0 = time.time()
    for lo in range(0, n, BATCH):
        t.append(
            df.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < lo + BATCH))
            .coalesce(1)
        )
    return time.time() - t0


def main():
    spark = get_spark(app_name="trigram_skip_curve")
    tmp = tempfile.mkdtemp(prefix="trigram_curve_")
    try:
        for n in NS:
            plain_sec = build(spark, os.path.join(tmp, f"plain{n}"), n, False)
            idx_sec = build(spark, os.path.join(tmp, f"idx{n}"), n, True)
            t = TxTable(spark, os.path.join(tmp, f"idx{n}"))
            stats = t.file_stats()
            cm = t._state()["colmap"]
            files = t.snapshot()[1]
            scanned = []
            hit_rows = 0
            t0 = time.time()
            for m in MARKERS:
                preds = [("text", "contains", m)]
                cands = [
                    f
                    for f in files
                    if _file_may_match(stats.get(f), t._parts(f, cm), preds)
                ]
                scanned.append(len(cands))
                hit_rows += t.read(predicates=preds).count()
            probe_sec = time.time() - t0
            log_bytes = sum(
                os.path.getsize(os.path.join(t.path, "_txlog", f))
                for f in os.listdir(os.path.join(t.path, "_txlog"))
            )
            print(
                json.dumps(
                    {
                        "n_docs": n,
                        "n_files": len(files),
                        "append_sec_plain": round(plain_sec, 2),
                        "append_sec_indexed": round(idx_sec, 2),
                        "scanned_files_per_probe": scanned,
                        "scanned_frac_mean": round(
                            sum(scanned) / (len(scanned) * len(files)), 4
                        ),
                        "probe_rows_found": hit_rows,
                        "probe_sec_8_needles": round(probe_sec, 2),
                        "log_bytes": log_bytes,
                    }
                ),
                flush=True,
            )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
