#!/usr/bin/env python
"""BPE distributed-encode throughput measurement, recorded in SCALING.md.

Two regimes over n docs x 60 words:
- zipf: words drawn from a 10k-word vocabulary with heavy repetition —
  the real-corpus case the per-batch word memo exists for;
- adversarial: every word unique (md5 hex) — the memo never hits and
  every word pays the full greedy-merge loop, the honest worst case.

Merges are trained once per regime (n_merges=200 on the Zipf head).
Prints one JSON line per (regime, n).

Usage: python scripts/bpe_encode_curve.py [n ...]  (default 100000)
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

from mb_crdb_cdc_dlgen2_synapse_spark.operators import bpe  # noqa: E402
from mb_crdb_cdc_dlgen2_synapse_spark.session import get_spark  # noqa: E402

NS = [int(a) for a in sys.argv[1:]] or [100_000]


def corpus(spark, n: int, regime: str):
    if regime == "zipf":
        # word = md5 of a skewed id: rank r chosen so P(r) ~ 1/(r+1)
        words = [
            F.md5(
                (
                    F.conv(
                        F.substring(
                            F.md5(
                                F.concat(
                                    F.col("id").cast("string"), F.lit(f"|{i}")
                                )
                            ),
                            1,
                            8,
                        ),
                        16,
                        10,
                    ).cast("long")
                    % F.lit(10_000)
                ).cast("string")
            )
            for i in range(60)
        ]
    else:
        words = [
            F.md5(F.concat(F.col("id").cast("string"), F.lit(f"|u{i}")))
            for i in range(60)
        ]
    return spark.range(n).select(
        F.col("id").alias("doc_id"), F.concat_ws(" ", *words).alias("text")
    )


def main():
    spark = get_spark(app_name="bpe_encode_curve")
    root = tempfile.mkdtemp(prefix="bpe_curve_")
    try:
        for n in NS:
            for regime in ("zipf", "adversarial"):
                path = os.path.join(root, f"{regime}{n}")
                corpus(spark, n, regime).write.mode("overwrite").parquet(path)
                docs = spark.read.parquet(path)
                t0 = time.time()
                merges = bpe.bpe_train(docs, n_merges=200, top_words=20_000)
                train_sec = time.time() - t0
                t0 = time.time()
                total = (
                    bpe.bpe_encode(docs, merges)
                    .agg(F.sum("n_tokens"))
                    .collect()[0][0]
                )
                enc_sec = time.time() - t0
                print(
                    json.dumps(
                        {
                            "regime": regime,
                            "n_docs": n,
                            "n_words": n * 60,
                            "n_merges": len(merges),
                            "total_tokens": int(total),
                            "train_sec": round(train_sec, 2),
                            "encode_sec": round(enc_sec, 2),
                            "words_per_sec": int(n * 60 / enc_sec),
                        }
                    ),
                    flush=True,
                )
                shutil.rmtree(path, ignore_errors=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
