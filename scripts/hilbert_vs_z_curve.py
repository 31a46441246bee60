#!/usr/bin/env python
"""Hilbert vs Z-order clustering measurement: per-file range tightness and
file-skip effectiveness on the same data, recorded in SCALING.md.

Table: n rows, two independent uniform columns x, y in [0, 2^16). Each
curve compacts into the same file count; the probe set is 32 point-range
predicates per column (width = domain/64). Reported: mean scanned-file
fraction per probe and the mean per-file span on each column (tight spans
are WHY files skip). Prints one JSON line per (curve, n).

Usage: python scripts/hilbert_vs_z_curve.py [n ...]  (default 1000000)
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

NS = [int(a) for a in sys.argv[1:]] or [1_000_000]
DOMAIN = 1 << 16
FILES = 64
WIDTH = DOMAIN // 64


def main():
    spark = get_spark(app_name="hilbert_vs_z")
    tmp = tempfile.mkdtemp(prefix="hvz_")
    try:
        for n in NS:
            df = spark.range(n).select(
                (F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 4), 16, 10)
                 .cast("long") % DOMAIN).alias("x"),
                (F.conv(F.substring(F.md5(F.col("id").cast("string")), 5, 4), 16, 10)
                 .cast("long") % DOMAIN).alias("y"),
                F.col("id").alias("payload"),
            )
            for curve in ("z", "hilbert"):
                root = os.path.join(tmp, f"{curve}{n}")
                t = TxTable(spark, root)
                t.append(df)
                t0 = time.time()
                t.compact(target_files=FILES, z_order=["x", "y"], curve=curve)
                compact_sec = time.time() - t0
                stats = t.file_stats()
                cm = t._state()["colmap"]
                files = t.snapshot()[1]
                spans = {
                    c: [
                        stats[f]["max"][c] - stats[f]["min"][c] for f in files
                    ]
                    for c in ("x", "y")
                }
                scanned = []
                for c in ("x", "y"):
                    for i in range(32):
                        lo = (i * 2) * WIDTH
                        preds = [(c, ">=", lo), (c, "<", lo + WIDTH)]
                        cands = [
                            f
                            for f in files
                            if _file_may_match(
                                stats.get(f), t._parts(f, cm), preds
                            )
                        ]
                        scanned.append(len(cands))
                print(
                    json.dumps(
                        {
                            "curve": curve,
                            "n_rows": n,
                            "n_files": len(files),
                            "compact_sec": round(compact_sec, 2),
                            "mean_span_frac_x": round(
                                sum(spans["x"]) / len(files) / DOMAIN, 4
                            ),
                            "mean_span_frac_y": round(
                                sum(spans["y"]) / len(files) / DOMAIN, 4
                            ),
                            "scanned_frac_mean": round(
                                sum(scanned) / (len(scanned) * len(files)), 4
                            ),
                        }
                    ),
                    flush=True,
                )
                shutil.rmtree(root, ignore_errors=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
