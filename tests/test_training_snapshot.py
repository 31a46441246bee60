"""Consistent multi-table training-snapshot export (snapshot.py /
Engine.export_training_snapshot): pinned file-list manifests for data
tables, watermark-resolved pins for indexes, bit-stable external reads
while ingestion and maintenance keep running underneath."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mb_crdb_cdc_dlgen2_synapse_spark.engine import Engine
from mb_crdb_cdc_dlgen2_synapse_spark.operators.ann_index import (
    catchup_ann_index,
)
from mb_crdb_cdc_dlgen2_synapse_spark.operators.bm25_index import (
    catchup_bm25_index,
)
from mb_crdb_cdc_dlgen2_synapse_spark.operators.similarity import (
    synthetic_embeddings,
)
from mb_crdb_cdc_dlgen2_synapse_spark.snapshot import (
    read_snapshot_descriptor,
)
from mb_crdb_cdc_dlgen2_synapse_spark.txlog import TxTable


def _docs(spark, n):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("snapshot body "), F.col("id").cast("string")).alias(
            "text"
        ),
        (F.col("id") % 3).cast("string").alias("grp"),
    )


def test_export_reads_are_bit_stable_under_later_writes(spark, tmp_path):
    """The export freezes the file list: cow updates, deletes and
    appends landing AFTER the export never change what the manifest
    read returns — it stays exactly the pinned time-travel read."""
    eng = Engine(spark)
    t = TxTable(spark, str(tmp_path / "docs"))
    t.append(_docs(spark, 120))
    t.delete_where([("doc_id", "<", 10)], mode="cow")
    out = str(tmp_path / "export")
    desc = eng.export_training_snapshot(out, {"documents": t.path})
    pin = desc["tables"]["documents"]["version"]
    assert pin == t.version()
    want = sorted(
        (r.doc_id, r.text, r.grp) for r in t.read(as_of=pin).collect()
    )
    # post-export churn: update, delete, append, compact
    t.update_where(
        [("doc_id", ">=", 100)], {"text": "'rewritten'"}, mode="cow"
    )
    t.delete_where([("doc_id", "in", [11, 12, 13])], mode="cow")
    t.append(_docs(spark, 120).withColumn("doc_id", F.col("doc_id") + 500))
    t.compact()
    got = sorted(
        (r.doc_id, r.text, r.grp)
        for r in eng.read_training_snapshot(out, "documents").collect()
    )
    assert got == want and len(got) == 110
    # explicit pins export historical versions
    desc0 = eng.export_training_snapshot(
        str(tmp_path / "export0"), {"documents": t.path}, pins={"documents": 0}
    )
    assert desc0["tables"]["documents"]["version"] == 0
    assert (
        eng.read_training_snapshot(str(tmp_path / "export0"), "documents")
        .count()
        == 120
    )


def test_export_partitioned_table_keeps_partition_columns(spark, tmp_path):
    """Hive partition inference against the table root: partition
    columns come back typed in the external read."""
    eng = Engine(spark)
    t = TxTable(spark, str(tmp_path / "docs"))
    t.append(_docs(spark, 60), partition_by=["grp"])
    out = str(tmp_path / "export")
    eng.export_training_snapshot(out, {"documents": t.path})
    back = eng.read_training_snapshot(out, "documents")
    assert set(back.columns) == {"doc_id", "text", "grp"}
    assert back.groupBy("grp").count().count() == 3


def test_export_refuses_dv_snapshots_until_compacted(spark, tmp_path):
    """A pinned snapshot carrying deletion vectors is refused (a raw
    parquet reader would resurrect the deleted rows); compact() makes
    the same table exportable."""
    eng = Engine(spark)
    t = TxTable(spark, str(tmp_path / "docs"))
    t.append(_docs(spark, 50))
    t.delete_where([("doc_id", "<", 5)], mode="dv")
    with pytest.raises(ValueError, match="deletion vectors"):
        eng.export_training_snapshot(
            str(tmp_path / "e1"), {"documents": t.path}
        )
    t.compact()
    eng.export_training_snapshot(str(tmp_path / "e2"), {"documents": t.path})
    assert (
        eng.read_training_snapshot(str(tmp_path / "e2"), "documents").count()
        == 45
    )


def test_index_pins_resolve_from_table_pins(spark, tmp_path):
    """Indexes are recorded at the version whose watermark covers their
    SOURCE table's pin — the whole snapshot (tables + retrieval
    indexes) describes one logical point, and the recorded pins equal
    what resolve_hybrid_pins derives, even after maintenance advances
    the index heads."""
    eng = Engine(spark)
    docs = TxTable(spark, str(tmp_path / "docs"))
    docs.append(_docs(spark, 100))
    emb = TxTable(spark, str(tmp_path / "emb"))
    emb.append(synthetic_embeddings(spark, 100))
    bm25 = TxTable(spark, str(tmp_path / "bm25"))
    catchup_bm25_index(docs, bm25)
    ann = TxTable(spark, str(tmp_path / "ann"))
    catchup_ann_index(emb, ann, prefix_bits=4)

    out = str(tmp_path / "export")
    desc = eng.export_training_snapshot(
        out,
        {"documents": docs.path, "embeddings": emb.path},
        indexes={
            "bm25": (bm25.path, "bm25.srcVersion", "documents"),
            "ann": (ann.path, "ann.srcVersion", "embeddings"),
        },
    )
    pins = (
        desc["tables"]["documents"]["version"],
        desc["tables"]["embeddings"]["version"],
    )
    assert desc["indexes"]["bm25"]["src_version_folded"] == pins[0]
    assert desc["indexes"]["ann"]["src_version_folded"] == pins[1]
    # maintenance keeps folding: recorded pins still resolve identically
    docs.update_where(
        [("doc_id", "<", 40)], {"text": "'churn churn'"}, mode="cow"
    )
    catchup_bm25_index(docs, bm25)
    emb.delete_where([("vec_id", "<", 10)], mode="cow")
    catchup_ann_index(emb, ann)
    vb, va = eng.resolve_hybrid_pins(bm25.path, ann.path, pins)
    assert (vb, va) == (
        desc["indexes"]["bm25"]["version"],
        desc["indexes"]["ann"]["version"],
    )
    desc2 = read_snapshot_descriptor(out)
    assert desc2 == desc  # the descriptor IS the durable record


def test_export_input_validation(spark, tmp_path):
    eng = Engine(spark)
    t = TxTable(spark, str(tmp_path / "docs"))
    t.append(_docs(spark, 10))
    out = str(tmp_path / "export")
    eng.export_training_snapshot(out, {"documents": t.path})
    with pytest.raises(KeyError, match="not in this snapshot"):
        eng.read_training_snapshot(out, "embeddings")
    with pytest.raises(ValueError, match="not among the exported tables"):
        eng.export_training_snapshot(
            str(tmp_path / "e2"),
            {"documents": t.path},
            indexes={"bm25": (t.path, "bm25.srcVersion", "nope")},
        )
