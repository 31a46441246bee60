#!/usr/bin/env python
"""Band-join skew measurement (VERDICT r5 item 6): what one near-universal
band key does to banded-LSH candidate generation, with and without the
``max_bucket`` df-cap now default in ``lsh_candidates``.

Regimes:
- ``natural``: the documents table at $SPARK_GRAFT_SF_DIR — records the
  MAX band-bucket size, proving the default cap (4096) never touches a
  natural corpus.
- ``adversarial``: N synthetic docs of which H share IDENTICAL text (one
  hot band key of size H in every band — massed boilerplate), the rest
  unique. Without the cap the self-join emits ~4·H²/2 pairs from the hot
  buckets; with the cap those buckets drop and cost tracks the cool
  buckets only.

Usage: python scripts/lsh_skew_curve.py [sf_dir]
Appends nothing; prints one JSON line per regime for SCALING.md.
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


def band_bucket_sizes(spark, docs):
    sigs = dedup.minhash_signatures(docs).localCheckpoint(eager=True)
    rows = 16 // 4
    entries = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.concat_ws(
                            "-",
                            *[
                                F.element_at("sig", b * rows + r + 1).cast("string")
                                for r in range(rows)
                            ],
                        ).alias("band_key"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "band.band_id", "band.band_key")
    return entries.groupBy("band_id", "band_key").count()


def adversarial_docs(spark, n: int, hot: int):
    """hot docs share one text verbatim; the rest are unique md5-word docs."""
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") < hot,
            F.lit("click here to accept cookies and continue to the site"),
        )
        .otherwise(
            F.concat_ws(
                " ",
                *[
                    F.md5(F.concat(F.col("id").cast("string"), F.lit(f"|{i}")))
                    for i in range(8)
                ],
            )
        )
        .alias("text"),
    )


def main():
    spark = get_spark(app_name="lsh_skew_curve")
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    mx = band_bucket_sizes(spark, docs).agg(F.max("count")).first()[0]
    print(json.dumps({"regime": "natural", "sf_dir": SF_DIR, "max_band_bucket": mx}))

    n, hot = 20_000, 8_192  # hot > default cap 4096
    adv = adversarial_docs(spark, n, hot).localCheckpoint(eager=True)
    out = {}
    for label, cap in (("uncapped", None), ("capped_4096", 4096)):
        t0 = time.time()
        pairs = dedup.lsh_candidates(adv, max_bucket=cap).count()
        out[label] = {"pairs": pairs, "sec": round(time.time() - t0, 2)}
    print(
        json.dumps(
            {
                "regime": "adversarial",
                "n_docs": n,
                "hot_bucket": hot,
                **out,
                "quadratic_pairs_avoided": out["uncapped"]["pairs"]
                - out["capped_4096"]["pairs"],
            }
        )
    )


if __name__ == "__main__":
    main()
