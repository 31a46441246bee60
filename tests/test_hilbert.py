"""Hilbert-curve clustering (txlog._hilbert_index_np / compact(curve=
"hilbert") — Skilling 2004, the curve Delta's liquid clustering uses).
The defining property is testable exactly: the index is a bijection over
the bucket grid and CONSECUTIVE indexes are Manhattan-adjacent cells
(step distance exactly 1) — Morton interleaving fails that with its
diagonal jumps."""

from __future__ import annotations

import itertools

import numpy as np
import pytest
from pyspark.sql import functions as F

from mb_crdb_cdc_dlgen2_synapse_spark.txlog import TxTable, _hilbert_index_np


@pytest.mark.parametrize("n,bits", [(2, 3), (2, 5), (3, 2), (4, 2)])
def test_hilbert_bijection_and_adjacency(n, bits):
    side = 1 << bits
    grid = np.array(list(itertools.product(range(side), repeat=n)), np.int64)
    h = _hilbert_index_np(grid, bits)
    assert sorted(h) == list(range(side**n))  # bijection
    order = grid[np.argsort(h)]
    steps = np.abs(np.diff(order, axis=0)).sum(axis=1)
    assert (steps == 1).all()  # every curve step moves one cell


def test_hilbert_beats_morton_on_step_locality():
    """Quantified why-it-exists: Morton's max consecutive-step distance
    diverges (diagonal jumps across quadrant seams); Hilbert's is 1."""
    bits, side = 4, 16
    grid = np.array(list(itertools.product(range(side), repeat=2)), np.int64)
    morton = np.zeros(len(grid), np.int64)
    for b in range(bits):
        morton |= ((grid[:, 0] >> b) & 1) << (2 * b)
        morton |= ((grid[:, 1] >> b) & 1) << (2 * b + 1)
    m_steps = np.abs(np.diff(grid[np.argsort(morton)], axis=0)).sum(axis=1)
    h_steps = np.abs(
        np.diff(grid[np.argsort(_hilbert_index_np(grid, bits))], axis=0)
    ).sum(axis=1)
    assert h_steps.max() == 1
    assert m_steps.max() > 1


def test_compact_hilbert_preserves_content_and_prunes(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    df = spark.range(4000).select(
        (F.col("id") % 64).alias("x"),
        (F.col("id") * 7 % 64).alias("y"),
        F.col("id").alias("payload"),
    )
    t.append(df)
    before = sorted(r.payload for r in t.read().collect())
    t.compact(target_files=8, z_order=["x", "y"], curve="hilbert")
    after = sorted(r.payload for r in t.read().collect())
    assert after == before  # layout-only rewrite
    # tight per-file ranges on BOTH clustered columns: point predicates
    # on either column prune files
    _v, files, _s = t.snapshot()
    stats = t.file_stats()
    for col in ("x", "y"):
        lo_hi = [
            (stats[f]["min"][col], stats[f]["max"][col]) for f in files
        ]
        spans = [hi - lo for lo, hi in lo_hi]
        assert max(spans) < 63  # no file covers the whole domain
    assert t.count_rows([("x", "==", 3)]) == df.filter("x = 3").count()


def test_compact_curve_property_and_validation(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(
        spark.range(100).select(
            (F.col("id") % 10).alias("x"), F.col("id").alias("p")
        )
    )
    with pytest.raises(ValueError, match="z\\|hilbert"):
        t.compact(z_order=["x"], curve="peano")
    # the table property drives routine maintenance
    t.set_clustering(["x"])
    t.set_properties({"clustering.curve": "hilbert"})
    t.compact(target_files=2)  # no explicit curve: property applies
    assert t.count_rows() == 100


def test_hilbert_compact_preserves_row_identities(spark, tmp_path):
    """Row tracking (and therefore identity columns) must survive a
    Hilbert relayout exactly like a Z-order one — the materialized
    __row_id rides through the curve's repartitionByRange."""
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(
        spark.range(500).select(
            (F.col("id") % 32).alias("x"),
            (F.col("id") * 13 % 32).alias("y"),
            F.col("id").alias("k"),
        )
    )
    t.set_identity_column("uid", start=0, step=1)
    before = {r.k: r.uid for r in t.read().collect()}
    t.compact(target_files=4, z_order=["x", "y"], curve="hilbert")
    after = {r.k: r.uid for r in t.read().collect()}
    assert after == before
