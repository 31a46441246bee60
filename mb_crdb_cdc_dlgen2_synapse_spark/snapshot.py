"""Consistent multi-table TRAINING SNAPSHOT export: freeze a set of
txlog tables (and the index pins derived from them) at one logical
point, into a self-contained export directory an external trainer can
read as plain parquet — while ingestion and index maintenance keep
running underneath.

The reproducibility problem this solves: an LLM training run reads the
documents table, the embeddings table, and (for retrieval-augmented or
curriculum jobs) the retrieval indexes. Reading each at "head" while
the changefeed keeps landing gives every epoch — and every re-run — a
different corpus, and the indexes a different corpus than the tables.
A snapshot export records, once:

- per DATA table: the pinned log version and the exact active-file URI
  list at that version (the symlink-manifest contract of
  ``TxTable.generate_manifest`` — raw parquet + hive partition dirs, no
  transaction-log access), written into the EXPORT directory. The
  table's own ``_symlink_format_manifest`` marker is untouched: an
  export of last week's pin must not repoint the table's live external
  readers at history.
- per INDEX: the index version resolved from its SOURCE table's pin via
  the watermark history (``Engine.resolve_hybrid_pins`` machinery —
  torn-state-safe first-version-at-watermark), plus the source version
  it folded. Indexes are read through the engine with ``as_of`` pins,
  not as raw parquet, so they get provenance rows, not manifests.

Immutable data files + append-only log make the export durable until
``vacuum()`` passes the pinned versions — the same retention contract
as time travel, recorded in the descriptor so operators can see what
retention the export needs.

Reference analog: the reference serves its lake zone to external
engines via OPENROWSET over raw storage (/root/reference/README.md:
131-192); this is that read path made version-consistent across the
several tables one training job consumes.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

DESCRIPTOR = "snapshot.json"


def export_snapshot(
    out_dir: str,
    tables: dict[str, "object"],
    pins: dict[str, int] | None = None,
    indexes: dict[str, dict] | None = None,
) -> dict:
    """Write a consistent multi-table snapshot export under ``out_dir``.

    ``tables`` maps export names to ``TxTable``s; ``pins`` optionally
    maps names to log versions (default: each table's current head —
    resolved ONCE here, so the descriptor is the consistency point).
    ``indexes`` maps index names to ``{"index": TxTable, "prop": "bm25.
    srcVersion", "source": <tables key>}``; each is resolved to the
    first index version whose watermark covers the source pin.

    Refuses (per table, the ``generate_manifest`` rules): a pinned
    snapshot carrying deletion vectors (raw parquet readers would
    resurrect deleted rows — ``compact()`` first, or use cow DML) or
    column mapping. Layout: ``out_dir/<name>/manifest`` (one absolute
    ``file:`` URI per line) + ``out_dir/snapshot.json`` written LAST —
    a reader that sees the descriptor sees a complete export.
    """
    from .engine import Engine

    pins = dict(pins or {})
    desc: dict = {"tables": {}, "indexes": {}}
    for name, t in tables.items():
        v, files, schema = t.snapshot(as_of=pins.get(name))
        st = t._state(pins.get(name))
        if st["dv_counts"]:
            raise ValueError(
                f"snapshot export of {name!r} at v{v}: the snapshot "
                "carries deletion vectors, which a raw parquet reader "
                "would resurrect — compact() to materialize them first, "
                "or use mode='cow' DML on exported tables"
            )
        if st["colmap"]:
            raise ValueError(
                f"snapshot export of {name!r} at v{v}: column-mapped "
                "tables carry frozen physical column names an external "
                "reader's schema would not match"
            )
        pins[name] = v
        d = os.path.join(out_dir, name)
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "manifest"), "w") as f:
            for rel in sorted(files):
                f.write("file://" + os.path.join(t.path, rel) + "\n")
        desc["tables"][name] = {
            "path": os.path.abspath(t.path),
            "version": v,
            "n_files": len(files),
        }
    for name, spec in (indexes or {}).items():
        idx, prop, src_name = spec["index"], spec["prop"], spec["source"]
        if src_name not in pins:
            raise ValueError(
                f"index {name!r} declares source {src_name!r}, which is "
                "not among the exported tables"
            )
        iv = Engine._index_version_at_source(idx, prop, pins[src_name])
        desc["indexes"][name] = {
            "path": os.path.abspath(idx.path),
            "version": iv,
            "watermark_prop": prop,
            "src_table": src_name,
            "src_version_folded": int(idx.properties(as_of=iv)[prop]),
        }
    os.makedirs(out_dir, exist_ok=True)
    tmp = os.path.join(out_dir, DESCRIPTOR + ".tmp")
    with open(tmp, "w") as f:
        json.dump(desc, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(out_dir, DESCRIPTOR))
    return desc


def read_snapshot_descriptor(out_dir: str) -> dict:
    with open(os.path.join(out_dir, DESCRIPTOR)) as f:
        return json.load(f)


def read_snapshot_table(
    spark: SparkSession, out_dir: str, name: str
) -> DataFrame:
    """Read one exported table the way an external engine would: the
    manifest's URI list, raw parquet scan with hive partition inference
    against the table root — never the transaction log. Bit-stable for
    as long as the pinned files survive vacuum."""
    desc = read_snapshot_descriptor(out_dir)
    if name not in desc["tables"]:
        raise KeyError(
            f"{name!r} is not in this snapshot (has: "
            f"{sorted(desc['tables'])})"
        )
    with open(os.path.join(out_dir, name, "manifest")) as f:
        uris = [ln.strip() for ln in f if ln.strip()]
    return spark.read.option(
        "basePath", desc["tables"][name]["path"]
    ).parquet(*[u.removeprefix("file://") for u in uris])
