"""Incrementally-maintained MinHash-LSH bands index over a txlog
documents table, fed by the table's own change feed — the dedup-family
member of the CDF-maintained index quartet (Hamming ANN, IVF, IVF-PQ,
BM25): near-dup candidate generation becomes a join against PRECOMPUTED
band entries instead of re-shingling and re-signing the corpus per run,
and maintenance is O(changed docs' bands) via keyed merges. Follows the
same watermark / change-image / deferred-empty-bootstrap / atomic-props
conventions as operators/bm25_index.py (the md5-based MinHash family is
operators/dedup.py's — engine-portable, DuckDB-mirrorable bit-for-bit).

Index layout: ONE bands table, rows ``(band_key, doc_id, band_id)`` —
each doc contributes exactly ``bands`` rows. Files are GLOBALLY
CLUSTERED by (band_key, doc_id) with per-file band_key blooms: a probe
batch's candidate lookup opens only the files whose band_key span can
hold its keys, and a maintenance merge's candidate set is bounded by
the changed docs' band keys (merge key-set pruning against the same
tight spans — the BM25 token-major lesson applied to band keys; a
doc-major layout would leave every file a merge candidate). The merge
key is the FULL row (band_key, doc_id, band_id): an update's pre-image
bands tombstone, its post-image bands upsert — the index never reads
itself to find a changed doc's old bands, the CDF pre-image text
carries them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..txlog import maybe_compact_index
from .bm25_index import _doc_net_images
from .dedup import _band_entries

ROWS_PER_FILE = 65536


def _entries(docs: DataFrame, n_hashes: int, bands: int, shingle_k: int) -> DataFrame:
    return _band_entries(docs, n_hashes, bands, shingle_k).select(
        "band_key", "doc_id", "band_id"
    )


def lsh_apply_changes(
    index,
    changes: DataFrame,
    text_col: str,
    mode: str,
    watermark: int | None = None,
) -> None:
    """Fold one change-image batch: band the per-doc pre/post images,
    anti-join pre-only rows into tombstones, upsert post rows, one keyed
    merge carrying the advanced ``lsh.srcVersion`` watermark in the SAME
    commit (``props`` — the bm25_apply_changes atomicity contract; here
    the index has no scalar counters, but a watermark split from its
    merge would still replay a fold after a crash, a content no-op that
    wastes a full merge). A batch with no band change advances the
    watermark in a single metadata commit."""
    props = index.properties()
    n_hashes = int(props.get("lsh.nHashes", 16))
    bands = int(props.get("lsh.bands", 4))
    shingle_k = int(props.get("lsh.shingleK", 3))
    # a virgin index maintained stream-first has no geometry recorded
    # yet: persist the defaults WITH the first fold's commit, so every
    # later fold/probe/scratch-check derives the same layout (geometry
    # is a bootstrap-time contract, like ann.prefixDims)
    geom = (
        {}
        if "lsh.nHashes" in props
        else {
            "lsh.nHashes": str(n_hashes),
            "lsh.bands": str(bands),
            "lsh.shingleK": str(shingle_k),
        }
    )
    # ONE banding pass over both image sides: the doc key becomes a
    # (id, _new) struct — every stage of the MinHash pipeline treats
    # doc_id as an opaque grouping key, so per-side band entries are
    # identical to two separate passes, and one eager checkpoint
    # replaces the former three (net + old entries + new entries)
    net = _doc_net_images(changes, text_col)
    tagged = (
        net.select(
            "doc_id",
            F.explode(
                F.array(
                    F.struct(
                        F.lit(False).alias("_new"),
                        F.col("old_text").alias("text"),
                    ),
                    F.struct(
                        F.lit(True).alias("_new"),
                        F.col("new_text").alias("text"),
                    ),
                )
            ).alias("e"),
        )
        .filter(F.col("e.text").isNotNull())
        .select(
            F.struct(
                F.col("doc_id").alias("id"), F.col("e._new").alias("_new")
            ).alias("doc_id"),
            F.col("e.text").alias("text"),
        )
    )
    ent = (
        _entries(tagged, n_hashes, bands, shingle_k)
        .select(
            "band_key",
            F.col("doc_id._new").alias("_new"),
            F.col("doc_id.id").alias("doc_id"),
            "band_id",
        )
        .localCheckpoint(eager=True)
    )
    old_e = ent.filter(~F.col("_new")).drop("_new")
    new_e = ent.filter(F.col("_new")).drop("_new")
    keys = ["band_key", "doc_id", "band_id"]
    ups = new_e.withColumn("_tombstone", F.lit(False))
    dels = old_e.join(new_e, keys, "left_anti").withColumn(
        "_tombstone", F.lit(True)
    )
    source = ups.unionByName(dels).localCheckpoint(eager=True)
    wm = dict(geom)
    if watermark is not None:
        wm["lsh.srcVersion"] = str(watermark)
    if index.snapshot()[2] is None and new_e.take(1):
        # virgin index, stream-first: the FIRST data commit must lay the
        # same layout down as catchup's bootstrap — (band_key, doc_id)-
        # clustered files, then declared clustering + band_key blooms —
        # or every later probe's IN-predicate prunes nothing and
        # compact_layout has no clustering to restore (blooms only apply
        # to writes AFTER declaration, so the append must be clustered
        # itself and the declarations follow it). Tombstones target rows
        # the virgin table never held — provable no-ops, dropped.
        index.append(
            new_e,
            cluster_by=keys[:2],
            max_records_per_file=ROWS_PER_FILE,
            props=wm or None,
        )
        index.set_clustering(keys[:2])
        index.set_bloom_index(["band_key"], auto_size=True)
    elif source.take(1):
        index.merge_into(
            source, on=keys, delete_when="_tombstone", mode=mode,
            props=wm or None, source_materialized=True,
        )
    elif wm:
        index.set_properties(wm)


def catchup_lsh_index(
    src,
    index,
    text_col: str = "text",
    n_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    step: int | None = None,
    mode: str = "dv",
) -> int:
    """Advance the bands table from its ``lsh.srcVersion`` watermark to
    the source head. Bootstrap bands the snapshot straight into a
    (band_key, doc_id)-clustered, band_key-bloomed append; increments
    pay change-feed machinery only. The signature geometry (nHashes /
    bands / shingleK) freezes at bootstrap as table properties — it is
    layout, like ann.prefixDims: changing it means rebuilding."""
    head = src.version()
    done = int(index.properties().get("lsh.srcVersion", -1))
    if head <= done:
        return done
    if index.version() < 0:
        rows = _entries(
            src.read(as_of=head).select("doc_id", text_col).withColumnRenamed(
                text_col, "text"
            ),
            n_hashes, bands, shingle_k,
        ).localCheckpoint(eager=True)
        if not rows.take(1):
            return done  # defer: first non-empty catch-up bootstraps
        index.append(
            rows,
            cluster_by=["band_key", "doc_id"],
            max_records_per_file=ROWS_PER_FILE,
            props={
                "lsh.srcVersion": str(head),
                "lsh.nHashes": str(n_hashes),
                "lsh.bands": str(bands),
                "lsh.shingleK": str(shingle_k),
            },
        )
        index.set_clustering(["band_key", "doc_id"])
        index.set_bloom_index(["band_key"], auto_size=True)
        return head
    v = done
    while v < head:
        hi = head if step is None else min(v + step, head)
        try:
            changes = src.read_changes(v, hi)
        except FileNotFoundError as e:
            raise RuntimeError(
                f"LSH bands index at {index.path!r} is stale beyond the "
                f"source's CDF retention (watermark v{v}): rebuild — drop "
                "the bands table and catchup_lsh_index() from scratch."
            ) from e
        lsh_apply_changes(index, changes, text_col, mode, watermark=hi)
        v = hi
    maybe_compact_index(index, ROWS_PER_FILE)
    return head


def lsh_index_pairs(index, max_bucket: int | None = 4096) -> DataFrame:
    """Near-dup candidate pairs from the PRECOMPUTED band entries — the
    corpus is never re-shingled or re-signed. Equi-self-join on
    (band_id, band_key) with the same hot-bucket skew guard as
    ``dedup.lsh_candidates`` (one near-universal band key would emit
    B²/2 pairs; hot keys are found with one map-side-combined count and
    anti-joined out — mass-identical docs stay caught by exact dedup).
    Returns (doc_a, doc_b, n_shared_bands), doc_a < doc_b — identical
    to ``lsh_candidates`` over the same corpus by construction."""
    entries = index.read().select("doc_id", "band_id", "band_key")
    if max_bucket is not None:
        hot = (
            entries.groupBy("band_id", "band_key")
            .agg(F.count(F.lit(1)).alias("__bsz"))
            .filter(F.col("__bsz") > max_bucket)
            .select("band_id", "band_key")
        )
        entries = entries.join(
            F.broadcast(hot), ["band_id", "band_key"], "left_anti"
        )
    a = entries.alias("a")
    b = entries.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )


PROBE_KEY_CAP = 100_000


def lsh_index_probe(
    index,
    batch: DataFrame,
    text_col: str = "text",
    key_cap: int = PROBE_KEY_CAP,
    as_of: int | None = None,
) -> DataFrame:
    """Near-dups of an INCOMING batch against the indexed corpus: band
    the batch (tiny), read ONLY the index files whose band_key span /
    bloom can hold the batch's keys (driver-bounded IN-list — batch docs
    × bands keys), and equi-join. The cross_corpus_dedup shape with the
    corpus side answered from the index instead of recomputed. Returns
    (batch_doc, corpus_doc, n_shared_bands).

    ``key_cap`` bounds the driver-side key list: a batch with more
    distinct band keys than the cap skips the IN-predicate (a
    multi-megabyte predicate over every file's stats costs more than it
    saves) and joins against the full entries read instead — still one
    equi-join, still never re-signing the corpus; only the file-skipping
    stage degrades, exactly the regime where the batch touches most
    files anyway."""
    # as_of pins geometry AND entries to one historical version (the
    # time-travel / prefix-consistency replay discipline); default = head
    props = index.properties(as_of=as_of)
    qe = _entries(
        batch.select("doc_id", text_col).withColumnRenamed(text_col, "text"),
        int(props.get("lsh.nHashes", 16)),
        int(props.get("lsh.bands", 4)),
        int(props.get("lsh.shingleK", 3)),
    ).localCheckpoint(eager=True)
    keys = sorted(
        r.band_key
        for r in qe.select("band_key").distinct().limit(key_cap + 1).collect()
    )
    preds = [("band_key", "in", keys)] if len(keys) <= key_cap else None
    corp = index.read(predicates=preds, as_of=as_of).select(
        "doc_id", "band_id", "band_key"
    )
    return (
        qe.alias("q")
        .join(
            corp.alias("c"),
            (F.col("q.band_id") == F.col("c.band_id"))
            & (F.col("q.band_key") == F.col("c.band_key"))
            & (F.col("q.doc_id") != F.col("c.doc_id")),
        )
        .groupBy(
            F.col("q.doc_id").alias("batch_doc"),
            F.col("c.doc_id").alias("corpus_doc"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )


def assert_lsh_index_matches_scratch(index, src, text_col: str = "text") -> None:
    """Equality proof: incrementally-maintained band entries == a
    from-scratch banding of the source head."""
    props = index.properties()
    scratch = _entries(
        src.read().select("doc_id", text_col).withColumnRenamed(text_col, "text"),
        int(props.get("lsh.nHashes", 16)),
        int(props.get("lsh.bands", 4)),
        int(props.get("lsh.shingleK", 3)),
    )
    got = index.read().select("band_key", "doc_id", "band_id")
    extra = got.exceptAll(scratch).count()
    missing = scratch.exceptAll(got).count()
    if extra or missing:
        raise RuntimeError(
            f"incremental LSH bands index diverged from scratch banding: "
            f"{extra} extra row(s), {missing} missing row(s)"
        )


def stream_lsh_index_to_tx_table(
    spark: SparkSession,
    src_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    available_now: bool = True,
    mode: str = "dv",
):
    """Streaming maintenance twin: tail the documents table's CDF and
    fold micro-batches through ``lsh_apply_changes``. A fresh checkpoint
    over an already-maintained index tails from the ``lsh.srcVersion``
    watermark (a snapshot replay cannot express interim deletions); a
    virgin index bootstraps from the snapshot images (banding needs no
    training). Folds advance the watermark in the merge commit and skip
    batches at or below it — exactly-once under replays."""
    from ..streaming.source import register_tx_source
    from ..txlog import TxTable

    register_tx_source(spark)
    wm = TxTable(spark, index_dir).properties().get("lsh.srcVersion")
    reader = (
        spark.readStream.format("txtable").option("readChangeFeed", "true")
    )
    if wm is not None:
        reader = reader.option("startingVersion", str(int(wm) + 1))
    feed = reader.load(src_dir)

    def fold(batch: DataFrame, batch_id: int) -> None:
        index = TxTable(batch.sparkSession, index_dir)
        batch = batch.select(
            "doc_id", text_col, "_change_type", "_commit_version"
        ).localCheckpoint(eager=True)
        done = int(index.properties().get("lsh.srcVersion", -1))
        batch = batch.filter(F.col("_commit_version") > done)
        if not batch.take(1):
            return  # replayed at-or-below the watermark: exactly-once no-op
        hi = batch.agg(F.max("_commit_version")).collect()[0][0]
        lsh_apply_changes(index, batch, text_col, mode, watermark=hi)
        maybe_compact_index(index, ROWS_PER_FILE)

    writer = (
        feed.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
