"""Round-7 advisory findings, each pinned by a direct test:

1. fsck on a missing deletion-vector file drops the COVERED DATA FILE
   (Delta semantics) instead of resurrecting its deleted rows
   (tests/test_fsck_copy_into.py::test_fsck_missing_dv_drops_covered_data_file).
2. The native sink escapes partition-value segments BEFORE joining
   multi-column keys (tests/test_tx_stream_sink.py hostile-values tests).
3. SQL ``LIKE '%needle%'`` with an ``_`` in the needle is refused — SQL's
   single-char wildcard has no literal 'contains' rendering (here).
4. RESTORE is refused on appendOnly tables (here).
5. Manifest regeneration is serialized + monotone
   (tests/test_symlink_manifest.py monotone/lock tests).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mb_crdb_cdc_dlgen2_synapse_spark.engine import Engine
from mb_crdb_cdc_dlgen2_synapse_spark.txlog import TxTable


def _df(spark, rows, schema="k int, v string"):
    return spark.createDataFrame(rows, schema)


def test_like_needle_with_underscore_refuses(spark, tmp_path):
    """LIKE '%a_b%' means "a, any char, b" in SQL; the literal-contains
    mapping would silently mutate only rows containing the literal 'a_b'.
    Refused instead of mis-matching."""
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [(1, "a_b"), (2, "axb"), (3, "zzz")]))
    eng = Engine(spark)
    tabs = {"t": t.path}
    with pytest.raises(ValueError, match="single-character wildcard"):
        eng.ddl("DELETE FROM t WHERE v LIKE '%a_b%'", tabs)
    # literal needles still work end to end
    eng.ddl("DELETE FROM t WHERE v LIKE '%zz%'", tabs)
    assert sorted(r.k for r in t.read().collect()) == [1, 2]


def test_restore_refused_on_append_only_table(spark, tmp_path):
    """RESTORE rewinds history (drops rows added after the target) — a
    file-removing commit, blocked on appendOnly like DELETE/overwrite."""
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [(1, "a")]))
    t.append(_df(spark, [(2, "b")]))
    t.set_properties({"appendOnly": "true"})
    with pytest.raises(ValueError, match="appendOnly"):
        t.restore(0)
    eng = Engine(spark)
    with pytest.raises(ValueError, match="appendOnly"):
        eng.ddl("RESTORE TABLE t TO VERSION AS OF 0", {"t": t.path})
    # history intact, property removable, then restore works
    assert sorted(r.k for r in t.read().collect()) == [1, 2]
    t.set_properties({"appendOnly": None})
    t.restore(0)
    assert sorted(r.k for r in t.read().collect()) == [1]
