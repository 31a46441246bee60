#!/usr/bin/env python
"""Substring-level (ExactSubstr-style) dedup scale measurement: wall-clock
for the gram -> duplicated-gram -> span -> trim pipeline at synthetic corpus
sizes far beyond the test SFs, recorded in SCALING.md alongside the MinHash
and ANN curves.

Corpus: n docs x 60 tokens. Every 10th doc embeds a shared 20-token block
(one of 32 rotating "boilerplate" blocks — the regime substring dedup is
built for: identical license headers / navigation chrome across otherwise
unique pages); all other tokens are unique md5 words. Deterministic, no
RNG, generated as one codegen projection and STAGED THROUGH PARQUET (the
corpus arrives from storage in any real pipeline; keeping multi-GB token
relations pinned in the local-mode heap is what a cluster never does).

Each measured stage is a CUMULATIVE pipeline run from the parquet corpus
(span includes gram+dupagg work, trim is the full end-to-end dedup) — the
honest cost a user pays to run that stage standalone. Prints one JSON line
per n; "trim_sec" is the end-to-end number.

Usage: python scripts/substring_scale_curve.py [n ...]  (default 100000 400000)
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

from mb_crdb_cdc_dlgen2_synapse_spark.operators import dedup  # noqa: E402
from mb_crdb_cdc_dlgen2_synapse_spark.session import get_spark  # noqa: E402

NS = [int(a) for a in sys.argv[1:]] or [100_000, 400_000]

DOC_TOKENS = 60
BLOCK_TOKENS = 20
DUP_EVERY = 10
N_BLOCKS = 32


def synthetic_corpus(spark, n: int):
    """n docs x DOC_TOKENS unique md5 words; every DUP_EVERY-th doc replaces
    tokens [20, 40) with shared boilerplate block (id/DUP_EVERY) % N_BLOCKS."""
    is_dup = F.col("id") % DUP_EVERY == 0
    block_id = (F.col("id") / DUP_EVERY).cast("bigint") % N_BLOCKS
    words = []
    for i in range(DOC_TOKENS):
        unique = F.md5(F.concat(F.col("id").cast("string"), F.lit(f"|t{i}")))
        if 20 <= i < 20 + BLOCK_TOKENS:
            shared = F.md5(F.concat(block_id.cast("string"), F.lit(f"|b{i}")))
            words.append(F.when(is_dup, shared).otherwise(unique))
        else:
            words.append(unique)
    return spark.range(n).select(
        F.col("id").alias("doc_id"), F.concat_ws(" ", *words).alias("text")
    )


def main():
    spark = get_spark(app_name="substring_scale_curve")
    root = tempfile.mkdtemp(prefix="substr_curve_")
    try:
        for n in NS:
            path = os.path.join(root, f"docs_{n}")
            synthetic_corpus(spark, n).write.mode("overwrite").parquet(path)
            docs = spark.read.parquet(path)
            t0 = time.time()
            n_grams = dedup.gram_occurrences(docs, gram_words=8).count()
            t_gram = time.time() - t0
            t0 = time.time()
            n_dup = dedup._dup_starts(
                dedup.gram_occurrences(docs, gram_words=8)
            ).count()
            t_dup = time.time() - t0
            t0 = time.time()
            n_spans = dedup.duplicate_spans(docs, gram_words=8).count()
            t_span = time.time() - t0
            t0 = time.time()
            removed = (
                dedup.substring_dedup_trim(docs, gram_words=8)
                .agg(F.sum("n_removed"))
                .collect()[0][0]
                or 0
            )
            t_trim = time.time() - t0
            print(
                json.dumps(
                    {
                        "n_docs": n,
                        "gram_occurrences": n_grams,
                        "dup_gram_occurrences": n_dup,
                        "spans": n_spans,
                        "tokens_removed": int(removed),
                        "gram_sec": round(t_gram, 2),
                        "dupagg_sec": round(t_dup, 2),
                        "span_sec": round(t_span, 2),
                        "trim_sec": round(t_trim, 2),
                    }
                ),
                flush=True,
            )
            shutil.rmtree(path, ignore_errors=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
