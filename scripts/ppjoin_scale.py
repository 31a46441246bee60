#!/usr/bin/env python
"""PPJoin prefix-filter measurement: what hot boilerplate shingles do to
exact set-similarity-join candidate generation, naive vs prefix-filtered.

Regimes:
- ``benign``: the sf dup corpus (every 20th doc duplicated) — natural
  shingle df distribution. Here the prefix filter is pure overhead (df
  aggregation + per-doc window) and the naive any-shared-shingle join is
  fine; this row records the insurance premium honestly.
- ``boilerplate``: the same corpus with ONE identical 40-token boilerplate
  paragraph appended to EVERY doc (license headers / nav chrome — the
  shape real crawled corpora have). Every pair of docs now shares the
  boilerplate shingles, so the naive candidate set is ~n²/2 while the
  prefix filter never selects universal shingles (df = n sorts them last,
  behind each doc's p = n_sh - ceil(t·n_sh) + 1 rarest shingles) — the
  candidate set stays near the benign corpus's. BOTH variants return the
  same exact pairs; a final equality assert pins it.

Usage: python scripts/ppjoin_scale.py [sf_dir]
Prints one JSON line per regime for SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mb_crdb_cdc_dlgen2_synapse_spark.operators import dedup  # noqa: E402
from mb_crdb_cdc_dlgen2_synapse_spark.session import get_spark  # noqa: E402
from mb_crdb_cdc_dlgen2_synapse_spark.sources.tables import load_table  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
)

#: one identical 40-token paragraph appended to every doc — its shingles
#: have df == n_docs and would pair every doc with every other doc under
#: the naive any-shared-shingle join.
BOILERPLATE = " ".join(f"bp{i}" for i in range(40))


def dup_corpus(docs):
    return docs.select("doc_id", "text").unionByName(
        docs.filter(F.col("doc_id") % 20 == 0).select(
            (F.col("doc_id") + 1000000).alias("doc_id"), "text"
        )
    )


def measure(spark, corpus, regime):
    corpus = corpus.localCheckpoint(eager=True)
    n_docs = corpus.count()
    pref_cand, full_cand = dedup.ppjoin_candidate_count(corpus)
    # warm once, then time
    naive_rows = dedup.jaccard_pairs(corpus).count()
    t0 = time.time()
    naive_rows = dedup.jaccard_pairs(corpus).count()
    t_naive = time.time() - t0
    t0 = time.time()
    pp_rows = dedup.ppjoin_pairs(corpus).count()
    t_pp = time.time() - t0
    assert pp_rows == naive_rows, (pp_rows, naive_rows)
    rec = {
        "regime": regime,
        "n_docs": n_docs,
        "naive_candidates": full_cand,
        "ppjoin_candidates": pref_cand,
        "candidate_ratio": round(full_cand / max(pref_cand, 1), 1),
        "result_pairs": naive_rows,
        "naive_sec": round(t_naive, 2),
        "ppjoin_sec": round(t_pp, 2),
    }
    print(json.dumps(rec))
    return rec


def unique_plus_boilerplate(spark, n_docs=5000, toks_per_doc=100):
    """The pure hot-key regime: every doc's own tokens are globally unique
    (seeded md5 stream), every doc carries the same boilerplate tail, and
    every 100th doc is exactly duplicated. True pairs = the duplicates
    only; every one of the naive join's ~n²/2 candidates EXCEPT those is
    boilerplate-induced waste."""
    base = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(0), F.lit(toks_per_doc - 1)),
                lambda i: F.md5(F.concat_ws("-", F.col("id"), i)),
            ),
        ).alias("body"),
    )
    return base.select(
        "doc_id", F.concat_ws(" ", "body", F.lit(BOILERPLATE)).alias("text")
    ).unionByName(
        base.filter(F.col("doc_id") % 100 == 0).select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.concat_ws(" ", "body", F.lit(BOILERPLATE)).alias("text"),
        )
    )


def main():
    spark = get_spark(
        app_name="ppjoin_scale", master="local[32]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, SF_DIR, "documents")
    corpus = dup_corpus(docs)
    measure(spark, corpus, "benign")
    hot = corpus.select(
        "doc_id", F.concat_ws(" ", F.col("text"), F.lit(BOILERPLATE)).alias("text")
    )
    measure(spark, hot, "boilerplate")
    measure(spark, unique_plus_boilerplate(spark), "unique_plus_boilerplate")


if __name__ == "__main__":
    main()
