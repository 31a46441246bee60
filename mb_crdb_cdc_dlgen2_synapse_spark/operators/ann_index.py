"""Incrementally-maintained bucketed ANN index fed by a table's own
change feed (X3/X2 × S2/T1 — the composition the stack was missing).

``materialize_binary_codes`` (operators/similarity.py) builds the
prefix-bucketed binary-code table FROM SCRATCH per build: fine for a
static corpus, wrong for the reference's pipeline shape where
embeddings arrive as CDC (/root/reference/README.md:135-138 — rows
flow changefeed → lake → serving continuously). At 100 TB the corpus
table takes a trickle of upserts and tombstones forever; rebuilding a
billion-row index per refresh is O(corpus), while the change feed is
O(changed rows). This module maintains the SAME index table
incrementally from the source table's CDF:

- a CDF batch reduces to ONE net operation per vec_id (last change
  wins; an update's delete+insert pair at one version nets to the
  post-image insert),
- upserts re-quantize only the changed vectors (sign-bit packing +
  prefix bucket — integer codegen expressions, no Python in the row
  path),
- tombstones delete by key GLOBALLY (an updated vector may cross
  buckets, so matching is on ``vec_id``, never bucket-local),
- the whole net batch lands as a Delta-style ``MERGE INTO`` on the
  index txlog table, partitioned by bucket so probes keep their
  file-level pruning.

Equality contract (asserted by the ``ann_index_incremental`` gate and
tests/test_ann_index_incremental.py): after ANY commit sequence, the
incrementally-maintained index content equals a from-scratch
``materialize_binary_codes`` of the source's head snapshot. Replay
safety: re-applying a delivered batch is a content no-op (the merge is
keyed and the net-change reduction is deterministic), the same
effectively-once contract the latest-state materializers use.

Scale shape: per batch cost tracks the CHANGED rows. The merge runs
``mode="dv"`` by DEFAULT — measured at 1M vectors / 1% spread-key
churn, a CoW merge rewrote every candidate file (uniformly-spread keys
defeat span pruning, O(corpus) write) while the DV merge writes only
the deletion vectors plus the changed rows' new code files. Bootstrap
is a straight partitioned append of the quantized snapshot (same plan
as ``materialize_binary_codes`` — no change-feed machinery until there
are changes). The index stays partitioned by the probe prefix, so
``probed_hamming_topk`` keeps opening only the probed buckets;
schedule OPTIMIZE out-of-band to fold accumulated DVs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..localrel import local_df
from ..txlog import maybe_compact_index
from .similarity import _prefix_bucket_expr, binary_quantize

_PREFIX_PROP = "ann.prefixDims"

#: rows per clustered index file: bounds each file to a tight vec_id
#: span inside its bucket/cid partition, so a keyed MERGE's key-set
#: pruning touches O(changed keys) files, not every file (at 24 B/row
#: this is ~1.5 MB files locally; cluster deployments raise it toward
#: the object-store sweet spot and keep the SAME pruning shape)
_CLUSTER_ROWS_PER_FILE = 65536

#: driver-side key-list cap for point-fetch IN-predicates (the
#: lsh_index.PROBE_KEY_CAP contract): past it, reads fall back to a
#: distributed semi-join so the driver never holds an unbounded key set
PROBE_KEY_CAP = 100_000


def _bloom_bits(rows_per_file: int) -> int:
    """Bloom sizing for the vec_id point-key index: ~16 bits/row with 7
    hashes gives ~0.1% false-positive per (key, file) probe, so a
    trickle merge's candidate set stays O(changed keys) instead of
    O(files). Cost: 2 B/row of log metadata per file — the same trade
    Delta's bloom index makes (theirs defaults looser at fpp 0.1).
    Power of two so txlog's per-file right-sizing can fold small files'
    filters down (md5 %% m' == (md5 %% m) %% m' for m' | m)."""
    m = 1024
    while m < 16 * max(rows_per_file, 1):
        m <<= 1
    return m


def _net_changes(changes: DataFrame) -> DataFrame:
    """Reduce a CDF slice to one net row per vec_id: the change at the
    highest ``_commit_version`` wins; within one version an insert beats
    the delete it replaced (Delta renders an update as delete+insert at
    the same version — the post-image is the surviving row)."""
    # one hash aggregate (map-side partial agg, no sort) instead of the
    # former row_number window: max_by on the lexicographic
    # (_commit_version, is-insert) key picks exactly the window's top
    # row — highest version, insert over delete within it (guide §2.3:
    # aggregate before the shuffle; the window shipped every change row)
    cols = changes.columns
    key = F.struct(
        F.col("_commit_version"),
        (F.col("_change_type") == "insert").cast("int"),
    )
    payload = [c for c in cols if c != "vec_id"]
    return (
        changes.groupBy("vec_id")
        .agg(F.max_by(F.struct(*payload), key).alias("__top"))
        .select("vec_id", *[F.col(f"__top.{c}").alias(c) for c in payload])
        .select(*cols)
    )


def ann_index_apply_changes(
    index,
    changes: DataFrame,
    prefix_dims: list[int],
    mode: str = "dv",
    rows_per_file: int = _CLUSTER_ROWS_PER_FILE,
) -> dict:
    """Apply one CDF batch (``_change_type``/``_commit_version`` +
    ``vec_id``/``embedding`` row images) to the bucketed binary-code
    index table. Returns the merge report (empty dict for an empty
    batch)."""
    net = _net_changes(changes)
    ups = (
        binary_quantize(net.filter(F.col("_change_type") == "insert"))
        .select("vec_id", "b_lo", "b_hi")
        .withColumn("bucket", _prefix_bucket_expr(prefix_dims))
        .withColumn("_tombstone", F.lit(False))
    )
    dels = net.filter(F.col("_change_type") == "delete").select(
        "vec_id",
        F.lit(None).cast("bigint").alias("b_lo"),
        F.lit(None).cast("bigint").alias("b_hi"),
        F.lit(None).cast("int").alias("bucket"),
        F.lit(True).alias("_tombstone"),
    )
    first_merge = index.version() < 0
    if first_merge:
        # bootstrap fast path: an empty index needs no matched/anti-join
        # machinery — the net inserts ARE the table (deletes of
        # never-indexed keys are no-ops by definition). One partitioned
        # append + the layout property, and the bulk load stays a plain
        # write at any corpus size.
        rows = ups.drop("_tombstone").localCheckpoint(eager=True)
        if not rows.take(1):
            return {}
        index.append(
            rows,
            partition_by=["bucket"],
            cluster_by=["vec_id"],
            max_records_per_file=rows_per_file,
        )
        index.set_clustering(["vec_id"])
        # point-key skipping for the keyed MERGE: every bucket partition
        # tiles the full vec_id domain, so min/max spans alone cannot
        # prune scattered-key increments — the per-file bloom proves
        # keys absent where ranges cannot. Declared AFTER the bootstrap
        # write (Delta's contract: later files carry filters; OPTIMIZE
        # backfills the bootstrap files)
        index.set_bloom_index(
            ["vec_id"], bits=_bloom_bits(rows_per_file), hashes=7,
            auto_size=True,
        )
        # publish the probe layout in the index's own properties — same
        # policy-store contract as materialize_binary_codes, so
        # probed_hamming_topk derives query buckets from the index's
        # actual layout with no side channel
        index.set_properties(
            {_PREFIX_PROP: ",".join(str(d) for d in prefix_dims)}
        )
        return {"bootstrapped": True}
    # materialize the net batch ONCE: the merge references its source
    # several times (matched update, no-match anti-join, delete clause),
    # and re-evaluating the 64-term quantize expression per reference
    # triples the batch cost
    source = ups.unionByName(dels).localCheckpoint(eager=True)
    if not source.take(1):
        return {}
    return index.merge_into(
        source,
        on=["vec_id"],
        delete_when="_tombstone",
        partition_by=["bucket"],
        mode=mode,
        source_materialized=True,
    )


def catchup_ann_index(
    src,
    index,
    prefix_bits: int = 4,
    step: int | None = None,
    mode: str = "dv",
    auto_bits: bool = False,
    rows_per_file: int = _CLUSTER_ROWS_PER_FILE,
) -> int:
    """Batch catch-up: advance the index from its recorded source
    watermark (``ann.srcVersion`` property) to the source table's head by
    applying the CDF in ``step``-sized version slices (default: one slice
    for the whole gap). Returns the new watermark version. Calling it
    with no new source commits is a no-op.

    ``auto_bits`` (bootstrap only): pick the ``prefix_bits`` most
    BALANCED sign-bit dimensions from the initial snapshot instead of
    dims 0..n-1 — the clustered-corpus fix measured in SCALING.md's
    adversarial recall section. The choice persists in the index's
    ``ann.prefixDims`` property, and every later increment and probe
    derives buckets from the SAME dims (layout is a bootstrap-time
    decision; changing it means rebuilding, exactly like re-keying a
    partition spec)."""
    head = src.version()
    done = int(index.properties().get("ann.srcVersion", -1))
    if head <= done:
        return done
    if auto_bits and index.version() < 0:
        from .similarity import choose_balanced_prefix_dims

        prefix_dims = choose_balanced_prefix_dims(
            src.read(as_of=head).select("vec_id", "embedding"), prefix_bits
        )
    else:
        prefix_dims = _index_dims(index, prefix_bits)
    v = done
    if v < 0 and index.version() < 0:
        # bootstrap (EMPTY index only — an index that has rows but no
        # watermark was maintained by the streaming path, and a snapshot
        # append would duplicate every row; the replay loop below handles
        # that case key-idempotently instead): quantize the snapshot
        # STRAIGHT into a partitioned append — no CDF rendering, no
        # net-change window (a snapshot is key-unique by table
        # contract), no driver-side materialization. Same plan shape as
        # materialize_binary_codes, so the initial build costs what a
        # from-scratch build costs; only INCREMENTS pay change-feed
        # machinery.
        snap = src.read(as_of=head).select("vec_id", "embedding")
        if snap.take(1):
            rows = (
                binary_quantize(snap)
                .select("vec_id", "b_lo", "b_hi")
                .withColumn("bucket", _prefix_bucket_expr(prefix_dims))
            )
            # merge-key clustering (SCALING.md round-9): files range-
            # clustered by vec_id WITHIN bucket partitions carry tight
            # key spans, so every later increment's keyed MERGE prunes
            # candidates to the files its keys actually land in —
            # declared as the table's clustering policy so compact()
            # restores the layout after increments accumulate
            index.append(
                rows,
                partition_by=["bucket"],
                cluster_by=["vec_id"],
                max_records_per_file=rows_per_file,
            )
            index.set_clustering(["vec_id"])
            index.set_bloom_index(
                ["vec_id"], bits=_bloom_bits(rows_per_file), hashes=7,
                auto_size=True,
            )  # see ann_index_apply_changes
        index.set_properties(
            {
                _PREFIX_PROP: ",".join(str(d) for d in prefix_dims),
                "ann.srcVersion": str(head),
            }
        )
        return head
    while v < head:
        hi = head if step is None else min(v + step, head)
        try:
            changes = src.read_changes(v, hi)
        except FileNotFoundError as e:
            raise RuntimeError(
                f"ANN index at {index.path!r} is stale beyond the source's "
                f"CDF retention (watermark v{v}, source vacuumed past it): "
                "the gap can no longer be replayed. Rebuild: drop the "
                "index table and catchup_ann_index() from scratch "
                "(bootstrap reads the current snapshot, no feed needed)."
            ) from e
        ann_index_apply_changes(
            index, changes, prefix_dims, mode=mode, rows_per_file=rows_per_file
        )
        index.set_properties({"ann.srcVersion": str(hi)})
        v = hi
    # catch-up-time auto-compaction (file-count-relative, metadata-only
    # check): trickle maintenance fragments the clustered layout; restore
    # the bootstrap shape once fragments exceed the slack threshold
    maybe_compact_index(index, rows_per_file)
    return head


def _index_dims(index, prefix_bits: int) -> list[int]:
    prop = index.properties().get(_PREFIX_PROP)
    if prop:
        return [int(x) for x in prop.split(",")]
    return list(range(prefix_bits))


def stream_ann_index_to_tx_table(
    spark: SparkSession,
    src_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    prefix_bits: int = 4,
    available_now: bool = True,
    mode: str = "dv",
):
    """Streaming maintenance: consume the source table's change feed as a
    native Structured Streaming source (``readStream.format("txtable")``
    with ``readChangeFeed``) and fold every micro-batch into the index
    via the same net-change merge as the batch path. Offsets checkpoint
    with the stream, so a restart resumes exactly after the last folded
    commit; a re-delivered batch re-merges the same net rows — a content
    no-op (the effectively-once contract of keyed merges).

    A FRESH checkpoint over an index that already carries an
    ``ann.srcVersion`` watermark (batch-bootstrapped or previously
    stream-maintained) tails the feed from that watermark
    (``startingVersion``) instead of taking an initial snapshot — a
    snapshot cannot express deletions that landed between the watermark
    and the stream start, so replaying one over a pre-populated index
    would leave ghost rows. A virgin index keeps the snapshot-bootstrap
    behavior (Hamming quantization needs no training). Each fold advances
    the watermark, so batch catch-ups after streaming skip the
    already-folded range instead of key-idempotently replaying history."""
    from ..streaming.source import register_tx_source
    from ..txlog import TxTable

    register_tx_source(spark)
    wm = TxTable(spark, index_dir).properties().get("ann.srcVersion")
    reader = (
        spark.readStream.format("txtable").option("readChangeFeed", "true")
    )
    if wm is not None:
        # only honored by a FRESH checkpoint; resumes ignore it
        reader = reader.option("startingVersion", str(int(wm) + 1))
    feed = reader.load(src_dir)

    def fold(batch: DataFrame, batch_id: int) -> None:
        index = TxTable(batch.sparkSession, index_dir)
        # derive the bucket layout from the INDEX's own persisted
        # property (metadata read, per batch): an index bootstrapped
        # batch-side with auto_bits carries custom dims, and quantizing
        # stream increments under the default layout would scatter them
        # into the wrong buckets
        dims = _index_dims(index, prefix_bits)
        batch = batch.select(
            "vec_id", "embedding", "_change_type", "_commit_version"
        ).localCheckpoint(eager=True)
        ann_index_apply_changes(index, batch, dims, mode=mode)
        hi = batch.agg(F.max("_commit_version")).collect()[0][0]
        if hi is not None and hi > int(index.properties().get("ann.srcVersion", -1)):
            index.set_properties({"ann.srcVersion": str(hi)})
        maybe_compact_index(index, _CLUSTER_ROWS_PER_FILE)

    writer = (
        feed.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def assert_index_matches_scratch(index, src) -> None:
    """The equality proof: incrementally-maintained index content ==
    from-scratch quantization of the source head. Raises on divergence
    (symmetric exceptAll — order- and partition-insensitive)."""
    dims = _index_dims(index, 4)
    scratch = (
        binary_quantize(src.read().select("vec_id", "embedding"))
        .select("vec_id", "b_lo", "b_hi")
        .withColumn("bucket", _prefix_bucket_expr(dims))
    )
    got = index.read().select("vec_id", "b_lo", "b_hi", "bucket")
    extra = got.exceptAll(scratch).count()
    missing = scratch.exceptAll(got).count()
    if extra or missing:
        raise RuntimeError(
            f"incremental ANN index diverged from scratch build: "
            f"{extra} extra row(s), {missing} missing row(s)"
        )


# -- IVF variant: frozen coarse quantizer + CDF-maintained lists -------------


def _pinned_cents(index, cents, as_of: int | None = None) -> DataFrame:
    """The quantizer GENERATION this index was built against: the index's
    ``ann.ivf.centsVersion`` property names a centroid-table snapshot,
    and every consumer (probes, increments, drift, equality proofs)
    time-travels to it. Because the property commits ATOMICALLY with
    index content (overwrite carries props in the same commit), a
    rebuild-and-swap can overwrite the centroid table first and flip
    lists + pin together — no reader ever pairs a new quantizer with
    old lists or vice versa. Falls back to head for pre-pinning
    indexes."""
    pin = index.properties(as_of=as_of).get("ann.ivf.centsVersion")
    if pin is not None:
        return cents.read(as_of=int(pin))
    return cents.read()


def rebuild_ivf_index(
    src,
    index,
    cents,
    n_lists: int = 8,
    n_iter: int = 2,
) -> int:
    """Atomic retrain-and-swap for a drifted quantizer: train fresh
    centroids on the CURRENT source snapshot, commit them to the
    centroid table (probes stay pinned to the old generation), then
    overwrite the list table with the re-assignment AND the new
    generation pin in ONE commit — probes see entirely-old or
    entirely-new, never a half-built index. The old centroid snapshot
    stays time-travel-readable until the centroid table's vacuum
    retention passes it (vacuum the cents table only after every index
    pinning that generation has moved on). Returns the new source
    watermark."""
    from .clustering import assign_clusters, kmeans

    head = src.version()
    snap = src.read(as_of=head).select("vec_id", "embedding")
    if not snap.take(1):
        raise RuntimeError(
            f"rebuild_ivf_index: source {src.path!r} is empty at v{head} — "
            "nothing to train a quantizer on; drop the index tables instead"
        )
    centroids, _ = kmeans(snap, k=n_lists, n_iter=n_iter)
    cents.overwrite(centroids.select("cid", "c_vec"))
    cv = cents.version()
    assigned = assign_clusters(snap, cents.read(as_of=cv)).localCheckpoint(
        eager=True
    )
    boot_d2 = assigned.agg(F.avg("d2")).collect()[0][0]
    index.overwrite(
        assigned.select("vec_id", "embedding", "cid"),
        partition_by=["cid"],
        cluster_by=["vec_id"],
        max_records_per_file=_CLUSTER_ROWS_PER_FILE,
        props={
            "ann.srcVersion": str(head),
            "ann.ivf.nLists": str(n_lists),
            "ann.ivf.bootMeanD2": repr(float(boot_d2)),
            "ann.ivf.centsVersion": str(cv),
        },
    )
    return head


def catchup_ivf_index(
    src,
    index,
    cents,
    n_lists: int = 8,
    n_iter: int = 2,
    step: int | None = None,
    mode: str = "dv",
) -> int:
    """Incrementally-maintained IVF index — the float-ANN twin of
    ``catchup_ann_index``. Bootstrap trains the coarse quantizer
    (Lloyd's k-means, operators/clustering.py) on the initial snapshot
    and FREEZES it: the centroid table (``cents``) becomes the index's
    layout contract, exactly like ``ann.prefixDims`` for the Hamming
    index. Increments assign only the CHANGED vectors to their nearest
    frozen centroid (broadcast join, no corpus shuffle) and fold them
    into the cid-partitioned list table with the same net-change keyed
    merge. Probes (``ivf_index_topk``) equi-join probed list ids and
    prune FILES via the partition predicate.

    Freezing is the honest contract: re-training per increment would
    re-assign the whole corpus (O(corpus) — a rebuild in disguise) and
    silently change every probe's geometry. When corpus drift degrades
    recall, the DRIFT POLICY takes over: set the ``ann.ivf.maxDrift``
    index property (e.g. "1.5") and every catch-up evaluates
    ``ivf_index_drift`` after folding changes — past the threshold it
    raises an actionable error (default) or, with
    ``ann.ivf.onDrift=rebuild``, runs ``rebuild_ivf_index``'s atomic
    retrain-and-swap (probes never see a half-built index; the
    generation pin flips with the lists in one commit)."""
    from .clustering import assign_clusters, kmeans

    head = src.version()
    done = int(index.properties().get("ann.srcVersion", -1))
    if head <= done:
        # no new commits — but a drifted-and-then-quiet corpus must
        # still trip the policy (the drift accrued on PAST catch-ups);
        # the check is free unless ann.ivf.maxDrift is set
        if index.properties().get("ann.ivf.maxDrift"):
            return _ivf_drift_policy(src, index, cents, n_iter)
        return done
    if index.version() < 0:
        snap = src.read(as_of=head).select("vec_id", "embedding")
        if not snap.take(1):
            # Empty bootstrap snapshot: k-means on zero rows would freeze
            # an EMPTY centroid table, and advancing the watermark past it
            # would make every later increment's assign_clusters inner-join
            # against zero centroids — inserts silently dropped forever
            # (ADVICE r8). Defer: leave the watermark unset so the first
            # NON-empty catch-up performs the real bootstrap.
            return done
        centroids, _ = kmeans(snap, k=n_lists, n_iter=n_iter)
        cents.overwrite(centroids.select("cid", "c_vec"))
        cents_version = cents.version()
        # assign under the FINAL (frozen) centroids — kmeans() returns
        # assignments made against the pre-update centroids of its last
        # round, but the frozen-quantizer contract is the final table:
        # every later increment and the scratch-equality check assign
        # against it, so the bootstrap must too
        assigned = assign_clusters(
            snap, cents.read(as_of=cents_version)
        ).localCheckpoint(eager=True)
        boot_d2 = None
        if assigned.take(1):
            index.append(
                assigned.select("vec_id", "embedding", "cid"),
                partition_by=["cid"],
                cluster_by=["vec_id"],
                max_records_per_file=_CLUSTER_ROWS_PER_FILE,
            )
            index.set_clustering(["vec_id"])
            index.set_bloom_index(
                ["vec_id"], bits=_bloom_bits(_CLUSTER_ROWS_PER_FILE), hashes=7,
                auto_size=True,
            )  # see ann_index_apply_changes
            boot_d2 = assigned.agg(F.avg("d2")).collect()[0][0]
        props = {
            "ann.srcVersion": str(head),
            "ann.ivf.nLists": str(n_lists),
            # generation pin: consumers time-travel the centroid table
            # to THIS snapshot (see _pinned_cents)
            "ann.ivf.centsVersion": str(cents_version),
        }
        if boot_d2 is not None:
            # drift baseline: mean squared assignment distance at
            # bootstrap — ivf_index_drift compares the current value
            # against it to signal when the frozen quantizer needs a
            # retrain/rebuild
            props["ann.ivf.bootMeanD2"] = repr(float(boot_d2))
        index.set_properties(props)
        return _ivf_drift_policy(src, index, cents, n_iter)
    centroids = _pinned_cents(index, cents).localCheckpoint(eager=True)
    v = done
    while v < head:
        hi = head if step is None else min(v + step, head)
        try:
            changes = src.read_changes(v, hi)
        except FileNotFoundError as e:
            raise RuntimeError(
                f"IVF index at {index.path!r} is stale beyond the source's "
                f"CDF retention (watermark v{v}): rebuild — drop the index "
                "and centroid tables and catchup_ivf_index() from scratch."
            ) from e
        net = _net_changes(changes)
        ups = (
            assign_clusters(
                net.filter(F.col("_change_type") == "insert").select(
                    "vec_id", "embedding"
                ),
                centroids,
            )
            .select("vec_id", "embedding", "cid")
            .withColumn("_tombstone", F.lit(False))
        )
        dels = net.filter(F.col("_change_type") == "delete").select(
            "vec_id",
            F.col("embedding"),
            F.lit(None).cast("int").alias("cid"),
            F.lit(True).alias("_tombstone"),
        )
        source = ups.unionByName(dels).localCheckpoint(eager=True)
        if source.take(1):
            index.merge_into(
                source,
                on=["vec_id"],
                delete_when="_tombstone",
                partition_by=["cid"],
                mode=mode,
                source_materialized=True,
            )
        index.set_properties({"ann.srcVersion": str(hi)})
        v = hi
    maybe_compact_index(index, _CLUSTER_ROWS_PER_FILE)
    return _ivf_drift_policy(src, index, cents, n_iter)


def _ivf_drift_policy(src, index, cents, n_iter: int) -> int:
    """Post-catch-up drift check (VERDICT r8 item 4): with
    ``ann.ivf.maxDrift`` set, a drift ratio past it either raises an
    actionable error (default policy) or triggers the atomic
    retrain-and-swap (``ann.ivf.onDrift=rebuild``). Returns the index's
    current source watermark either way."""
    props = index.properties()
    head = int(props.get("ann.srcVersion", -1))
    max_drift = props.get("ann.ivf.maxDrift")
    if not max_drift:
        return head
    mod = props.get("ann.ivf.driftSampleMod")
    d = ivf_index_drift(index, cents, sample_mod=int(mod) if mod else None)
    if mod and d["mean_d2"] is None:
        # sample_mod larger than the corpus can leave the key sample
        # empty (avg over zero rows = NULL); treating that as no-drift
        # would silently disable the retrain guard forever — fall back
        # to the exact probe (an empty-sample corpus is small enough
        # that the exact probe is cheap by definition)
        d = ivf_index_drift(index, cents)
    ratio = d["drift_ratio"]
    if ratio is None or ratio <= float(max_drift):
        return head
    if props.get("ann.ivf.onDrift", "error") == "rebuild":
        n_lists = int(props.get("ann.ivf.nLists", 8))
        return rebuild_ivf_index(
            src, index, cents, n_lists=n_lists, n_iter=n_iter
        )
    raise RuntimeError(
        f"IVF quantizer at {cents.path!r} has drifted {ratio:.2f}x past "
        f"its bootstrap geometry (ann.ivf.maxDrift={max_drift}): probe "
        "recall is degrading. Either rebuild_ivf_index(src, index, "
        "cents) for an atomic retrain-and-swap, or set the "
        "ann.ivf.onDrift=rebuild property to do it automatically at "
        "catch-up time."
    )


def ivf_index_topk(
    index,
    cents,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 3,
    as_of: int | None = None,
    allowed: DataFrame | None = None,
) -> DataFrame:
    """Probed cosine top-k against a ``catchup_ivf_index`` table: each
    query keeps its ``nprobe`` nearest frozen centroids, the UNION of
    probed list ids becomes a partition predicate (file pruning on the
    cid-partitioned table — bounded driver-side read, at most n_lists
    ids), and the exact rerank runs only over the probed lists.
    ``as_of`` pins the read (and its quantizer-generation pin) to one
    historical index version; ``allowed`` (vec_id keys) scopes the
    candidates via a distributed semi-join before ranking — the
    filtered-search convention shared with probed_hamming_topk."""
    from .similarity import _dot, _norm, _ivf_probe_lists

    cents_df = _pinned_cents(index, cents, as_of=as_of)
    q = queries.select("query_id", F.col("embedding").alias("q_vec"))
    scored = q.join(F.broadcast(cents_df)).select(
        "query_id",
        "cid",
        (
            _dot(F.col("q_vec"), F.col("c_vec"))
            / (_norm(F.col("q_vec")) * _norm(F.col("c_vec")))
        ).alias("c_cos"),
    )
    wp = W.partitionBy("query_id").orderBy(
        F.col("c_cos").desc(), F.col("cid").asc()
    )
    probe_ids = sorted(
        {
            r.cid
            for r in scored.withColumn("pr", F.row_number().over(wp))
            .filter(F.col("pr") <= nprobe)
            .select("cid")
            .distinct()
            .collect()  # bounded by n_lists: probe planning, not data
        }
    )
    corp = index.read(predicates=[("cid", "in", probe_ids)], as_of=as_of)
    if allowed is not None:
        corp = corp.join(allowed.select("vec_id").distinct(), "vec_id", "semi")
    return _ivf_probe_lists(
        embeddings=corp.select("vec_id", "cid", "embedding"),
        cents=cents_df.select("cid", "c_vec"),
        queries=queries.select("query_id", "embedding"),
        k=k,
        nprobe=nprobe,
        vec_col="embedding",
    )


def assert_ivf_index_matches_scratch(index, cents, src) -> None:
    """Equality proof for the IVF variant: the incrementally-maintained
    list table equals a from-scratch assignment of the source head under
    the SAME frozen centroids. Raises on divergence."""
    from .clustering import assign_clusters

    scratch = assign_clusters(
        src.read().select("vec_id", "embedding"), _pinned_cents(index, cents)
    ).select("vec_id", "embedding", "cid")
    got = index.read().select("vec_id", "embedding", "cid")
    extra = got.exceptAll(scratch).count()
    missing = scratch.exceptAll(got).count()
    if extra or missing:
        raise RuntimeError(
            f"incremental IVF index diverged from scratch assignment: "
            f"{extra} extra row(s), {missing} missing row(s)"
        )


def ivf_index_drift(index, cents, sample_mod: int | None = None) -> dict:
    """Retrain signal for the frozen quantizer: mean squared assignment
    distance of the CURRENT list table vs the value logged at bootstrap
    (``ann.ivf.bootMeanD2``). A drifting corpus pulls vectors away from
    the frozen centroids, inflating the ratio — probe recall degrades
    with it, and past a policy threshold (e.g. 1.5×) the answer is a
    rebuild (drop index + centroids, bootstrap on the current snapshot;
    the quantizer is layout, and layout changes are rebuilds, exactly
    like re-keying a partition spec). One broadcast join + one global
    aggregate over the index — no source-table access. ``sample_mod``
    = s restricts the probe to the deterministic ``xxhash64(vec_id) %
    s == 0`` key sample (the IVF-PQ twin's o(corpus) policy shape —
    the list table is corpus-sized too)."""
    lists = index.read()
    if sample_mod is not None and sample_mod > 1:
        lists = lists.filter(
            F.pmod(F.xxhash64(F.col("vec_id")), F.lit(int(sample_mod))) == 0
        )
    # the pinned centroids are model-sized: collect once so the drift
    # aggregate knows the dimension driver-side and the corpus-sized d2
    # runs through the codegen'd _sq_dist_expr twin (bit-identical fold;
    # the HOF form's interpreted lambdas cost ~1.5 s / 512k evals) over
    # a JVM local relation instead of a re-read of the cents table
    from ..localrel import local_df
    from .clustering import _sq_dist_expr

    cent_rows = [
        (int(r["cid"]), [float(x) for x in r["c_vec"]])
        for r in _pinned_cents(index, cents).collect()
    ]
    dims = len(cent_rows[0][1]) if cent_rows else 0
    cents_df = local_df(
        index.spark, cent_rows, "cid int, c_vec array<double>"
    )
    cur = (
        lists
        .join(F.broadcast(cents_df), "cid")
        .agg(
            F.avg(_sq_dist_expr("embedding", "c_vec", dims)).alias("m")
        )
        .collect()[0]["m"]
    )
    boot = index.properties().get("ann.ivf.bootMeanD2")
    boot_f = float(boot) if boot is not None else None
    return {
        "mean_d2": float(cur) if cur is not None else None,
        "bootstrap_mean_d2": boot_f,
        "drift_ratio": (
            float(cur) / boot_f if cur is not None and boot_f else None
        ),
    }


# -- IVF-PQ variant: compressed lists, CDF-maintained ------------------------
#
# The billion-scale production shape (Jégou et al. IVFADC, the FAISS
# default): inverted lists store 8-byte PQ codes instead of raw vectors
# (32× compression — at 100 TB of embeddings the lists fit in ~3 TB),
# probes ADC-score only the probed lists' codes, and the final top-k
# re-ranks a bounded shortlist against full-precision vectors fetched
# BY KEY from the source table. Both models freeze at bootstrap (the
# coarse quantizer AND the per-subspace codebooks are layout, like
# ann.prefixDims); generation pins (`ann.ivf.centsVersion`,
# `ann.ivfpq.booksVersion`) commit atomically with index content so a
# rebuild-and-swap never splits a reader across generations. The whole
# pipeline runs in the NORMALIZED space (cosine == L2 there, so ADC's
# squared-L2 ranks by the retrieval metric — the knn_pq_adc lesson).


def _unit_vecs(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    from .similarity import unit_vectors

    return unit_vectors(df, vec_col)


def _residual_vecs(vecs: DataFrame, cents_df: DataFrame) -> DataFrame:
    """(vec_id, cid, embedding=residual): assign each (unit) vector to
    its coarse centroid and subtract it — canonical IVFADC encodes the
    RESIDUAL (vector − assigned centroid), not the raw vector (Jégou
    et al. §IV-A): residuals concentrate around the origin regardless of
    which list the vector sits in, so the shared per-subspace codebooks
    spend their 4 bits on a far smaller dynamic range and the same
    8-byte code buys a finer ADC shortlist. Assignment ties break to the
    lowest cid (assign_clusters), identical to the list-placement
    assignment — code and cid always agree."""
    from .clustering import assign_clusters

    return _residuals_from_assigned(assign_clusters(vecs, cents_df), cents_df)


def _residuals_from_assigned(
    assigned: DataFrame, cents_df: DataFrame, keep_d2: bool = False
) -> DataFrame:
    """Residuals from an ALREADY-assigned frame (vec_id, embedding, cid)
    — callers that just paid the assignment pass (bootstrap, rebuild)
    reuse it instead of assigning twice. ``keep_d2`` carries the
    assignment distance through so the bootstrap can take its drift
    baseline off THIS relation's one materialization instead of
    checkpointing the assignment separately (one corpus-sized
    materialization instead of two)."""
    return assigned.join(
        F.broadcast(cents_df.select("cid", "c_vec")), "cid"
    ).select(
        "vec_id",
        "cid",
        F.zip_with("embedding", "c_vec", lambda x, c: x - c).alias(
            "embedding"
        ),
        *(["d2"] if keep_d2 else []),
    )


def _assign_encode_residual(
    ins: DataFrame, cents_df: DataFrame, model: list[list[list[float]]]
) -> DataFrame:
    """(vec_id, cid, pq_code): nearest-centroid assignment, residual
    subtraction and PQ encoding in ONE Arrow pass over the (unit)
    batch vectors — the incremental fold's former shape was three
    relations (assign kernel → broadcast-join+zip_with residuals →
    encode kernel) with two checkpoints and a join between them
    (guide §4: cross the Python boundary once). Bit-identical to
    assign_clusters + _residuals_from_assigned + pq_encode_arrow:
    all three already compute in float64 numpy / IEEE-double JVM ops
    with the same subtract/argmin semantics (first minimum == lowest
    cid / lowest code)."""
    import numpy as np
    import pandas as pd

    cents = sorted(
        (int(r["cid"]), [float(x) for x in r["c_vec"]])
        for r in cents_df.collect()  # k-bounded: model, not data
    )
    cids = np.asarray([c for c, _ in cents], dtype=np.int64)
    cmat = np.asarray([v for _, v in cents], dtype=np.float64)
    m = len(model)
    sub = len(model[0][0])
    cbook = np.asarray(model, dtype=np.float64)  # (m, kq, sub)

    def kern(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            vecs = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
            )
            d2 = ((vecs[:, None, :] - cmat[None]) ** 2).sum(-1)
            j = d2.argmin(1)  # first minimum == lowest cid (cents sorted)
            res = (vecs - cmat[j]).reshape(len(pdf), m, sub)
            dq = ((res[:, :, None, :] - cbook[None]) ** 2).sum(-1)
            codes = dq.argmin(-1).astype(np.int64)
            packed = np.zeros(len(pdf), dtype=np.int64)
            for t in range(m):
                packed |= codes[:, t] << np.int64(4 * t)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "cid": cids[j], "pq_code": packed}
            )

    return ins.select("vec_id", "embedding").mapInPandas(
        kern, "vec_id long, cid int, pq_code long"
    )


def _books_rows(spark, model: list[list[list[float]]]) -> DataFrame:
    rows = [
        (j, c, model[j][c])
        for j in range(len(model))
        for c in range(len(model[0]))
    ]
    return local_df(spark, rows, "j int, cid int, c_vec array<double>")


def _load_books(books, as_of: int | None = None) -> list[list[list[float]]]:
    """Driver-side codebook model from the books table (m·k·(d/m)
    floats — a few KB, the same boundedness class as the centroid
    table)."""
    rows = {
        (r.j, r.cid): list(r.c_vec)
        for r in books.read(as_of=as_of).collect()
    }
    m = 1 + max(j for j, _ in rows)
    kq = 1 + max(c for _, c in rows)
    return [[rows[(j, c)] for c in range(kq)] for j in range(m)]


def _pinned_books(index, books, as_of: int | None = None) -> list[list[list[float]]]:
    pin = index.properties(as_of=as_of).get("ann.ivfpq.booksVersion")
    return _load_books(books, as_of=int(pin) if pin is not None else None)


def catchup_ivfpq_index(
    src,
    index,
    cents,
    books,
    n_lists: int = 8,
    m: int = 16,
    kq: int = 16,
    n_iter: int = 2,
    sample: int = 4096,
    step: int | None = None,
    mode: str = "dv",
) -> int:
    """Incrementally-maintained IVF-PQ index: bootstrap trains and
    FREEZES both models (coarse centroids -> ``cents``, per-subspace
    codebooks -> ``books``), the list table stores (vec_id, cid,
    pq_code) — 8 bytes of payload per vector — and every increment
    assigns + encodes only the CHANGED vectors under the pinned
    generations before the same net-change keyed merge as the raw-IVF
    twin. Same deferred-empty-bootstrap and CDF-retention contracts."""
    from .clustering import assign_clusters, kmeans
    from .pq import pq_encode_arrow, train_pq_codebooks

    head = src.version()
    done = int(index.properties().get("ann.srcVersion", -1))
    if head <= done:
        # no new commits — but a drifted-and-then-quiet corpus must
        # still trip the policy (see the raw-IVF twin); the check is
        # free unless ann.ivfpq.maxDrift is set
        if index.properties().get("ann.ivfpq.maxDrift"):
            return _ivfpq_drift_policy(src, index, cents, books, n_iter, sample)
        return done
    if index.version() < 0:
        snap = _unit_vecs(
            src.read(as_of=head).select("vec_id", "embedding")
        ).localCheckpoint(eager=True)
        if not snap.take(1):
            return done  # defer: first non-empty catch-up bootstraps
        centroids, _ = kmeans(snap, k=n_lists, n_iter=n_iter)
        cents.overwrite(centroids.select("cid", "c_vec"))
        cv = cents.version()
        # RESIDUAL encoding (canonical IVFADC): codebooks train on and
        # codes quantize (vector − assigned centroid) — see
        # _residual_vecs. Both the training input and every later encode
        # derive from the SAME pinned cents generation, so codes never
        # mix encodings across a retrain (generation pins gate reads).
        # ONE corpus-sized materialization: the residual checkpoint
        # carries d2 so the drift baseline reads off it (the former
        # shape checkpointed the assignment AND the residuals).
        res = _residuals_from_assigned(
            assign_clusters(snap, cents.read(as_of=cv)),
            cents.read(as_of=cv),
            keep_d2=True,
        ).localCheckpoint(eager=True)
        boot_d2 = res.agg(F.avg("d2")).collect()[0][0]
        model = train_pq_codebooks(
            res, m=m, k=kq, n_iter=n_iter, sample=sample
        )
        books.overwrite(_books_rows(index.spark, model))
        bv = books.version()
        rows = (
            pq_encode_arrow(res.select("vec_id", "embedding"), model)
            .join(res.select("vec_id", "cid"), "vec_id")
            .select("vec_id", "cid", "pq_code")
            .localCheckpoint(eager=True)
        )
        index.append(
            rows,
            partition_by=["cid"],
            cluster_by=["vec_id"],
            max_records_per_file=_CLUSTER_ROWS_PER_FILE,
        )
        index.set_clustering(["vec_id"])
        index.set_bloom_index(
            ["vec_id"], bits=_bloom_bits(_CLUSTER_ROWS_PER_FILE), hashes=7,
            auto_size=True,
        )
        props = {
            "ann.srcVersion": str(head),
            "ann.ivf.nLists": str(n_lists),
            "ann.ivf.centsVersion": str(cv),
            "ann.ivfpq.booksVersion": str(bv),
            "ann.ivfpq.m": str(m),
            "ann.ivfpq.k": str(kq),
            # encoding is LAYOUT, frozen at bootstrap: every later
            # encode/read derives it from here ("raw" = pre-residual
            # indexes, which keep working unchanged)
            "ann.ivfpq.encoding": "residual",
        }
        if boot_d2 is not None:
            # drift baseline in the NORMALIZED space (the index's metric
            # space): ivfpq_index_drift compares the current source
            # snapshot's assignment distance against it
            props["ann.ivfpq.bootMeanD2"] = repr(float(boot_d2))
        index.set_properties(props)
        return _ivfpq_drift_policy(src, index, cents, books, n_iter, sample)
    centroids = _pinned_cents(index, cents).localCheckpoint(eager=True)
    model = _pinned_books(index, books)
    v = done
    while v < head:
        hi = head if step is None else min(v + step, head)
        try:
            changes = src.read_changes(v, hi)
        except FileNotFoundError as e:
            raise RuntimeError(
                f"IVF-PQ index at {index.path!r} is stale beyond the "
                f"source's CDF retention (watermark v{v}): rebuild — drop "
                "the index/centroid/codebook tables and "
                "catchup_ivfpq_index() from scratch."
            ) from e
        ivfpq_apply_changes(index, changes, centroids, model, mode=mode)
        index.set_properties({"ann.srcVersion": str(hi)})
        v = hi
    maybe_compact_index(index, _CLUSTER_ROWS_PER_FILE)
    return _ivfpq_drift_policy(src, index, cents, books, n_iter, sample)


def ivfpq_index_drift(src, index, cents, sample_mod: int | None = None) -> dict:
    """Retrain signal for the frozen IVF-PQ models: mean squared
    assignment distance of the CURRENT source snapshot (normalized — the
    index's metric space) to the pinned coarse centroids, vs the value
    logged at bootstrap (``ann.ivfpq.bootMeanD2``). The compressed lists
    store 8-byte codes, not embeddings, so unlike the raw-IVF twin the
    metric reads the SOURCE — one broadcast assign + one global
    aggregate. Scale-invariant by construction (unit vectors), so only
    DIRECTIONAL corpus drift registers — exactly the drift that degrades
    ADC recall.

    ``sample_mod`` = s makes the probe o(corpus): only vectors with
    ``xxhash64(vec_id) % s == 0`` (a deterministic ~1/s key sample —
    stable across catch-ups, no RNG state) are assigned. A mean over a
    hash-uniform sample estimates the full mean; the policy compares a
    RATIO of two means, so sampling noise enters once, and the
    fire/no-fire decision agrees with the exact probe away from the
    knife's edge (receipted at 1M vectors in scripts/ann_index_scale.py).
    The bootstrap baseline stays EXACT — it falls out of the bootstrap's
    own full assignment pass for free."""
    from .clustering import assign_clusters

    head = _unit_vecs(src.read().select("vec_id", "embedding"))
    if sample_mod is not None and sample_mod > 1:
        head = head.filter(
            F.pmod(F.xxhash64(F.col("vec_id")), F.lit(int(sample_mod))) == 0
        )
    cur = (
        assign_clusters(head, _pinned_cents(index, cents))
        .agg(F.avg("d2").alias("m"))
        .collect()[0]["m"]
    )
    boot = index.properties().get("ann.ivfpq.bootMeanD2")
    boot_f = float(boot) if boot is not None else None
    return {
        "mean_d2": float(cur) if cur is not None else None,
        "bootstrap_mean_d2": boot_f,
        "drift_ratio": (
            float(cur) / boot_f if cur is not None and boot_f else None
        ),
    }


def rebuild_ivfpq_index(
    src,
    index,
    cents,
    books,
    n_lists: int | None = None,
    m: int | None = None,
    kq: int | None = None,
    n_iter: int = 2,
    sample: int = 4096,
) -> int:
    """Atomic retrain-and-swap for drifted IVF-PQ models: train a fresh
    coarse quantizer AND fresh codebooks on the CURRENT source snapshot,
    commit them to their tables (probes stay pinned to the old
    generations), then overwrite the list table with the re-encode AND
    both new generation pins in ONE commit — probes see entirely-old or
    entirely-new, never a half-built index or a cross-generation
    quantizer/codebook pairing. Geometry parameters default to the
    index's own recorded values. Returns the new source watermark."""
    from .clustering import assign_clusters, kmeans
    from .pq import pq_encode_arrow, train_pq_codebooks

    props = index.properties()
    n_lists = n_lists or int(props.get("ann.ivf.nLists", 8))
    m = m or int(props.get("ann.ivfpq.m", 16))
    kq = kq or int(props.get("ann.ivfpq.k", 16))
    head = src.version()
    snap = _unit_vecs(
        src.read(as_of=head).select("vec_id", "embedding")
    ).localCheckpoint(eager=True)
    if not snap.take(1):
        raise RuntimeError(
            f"rebuild_ivfpq_index: source {src.path!r} is empty at "
            f"v{head} — nothing to train on; drop the index tables instead"
        )
    centroids, _ = kmeans(snap, k=n_lists, n_iter=n_iter)
    cents.overwrite(centroids.select("cid", "c_vec"))
    cv = cents.version()
    # retrain always lands the residual encoding (see the bootstrap);
    # the atomic pin swap below is what lets a raw-era index upgrade
    # in one commit — probes read old cents+books+codes+encoding or new,
    # never a mix. One corpus-sized materialization (d2 rides the
    # residual checkpoint), same as the bootstrap.
    res = _residuals_from_assigned(
        assign_clusters(snap, cents.read(as_of=cv)),
        cents.read(as_of=cv),
        keep_d2=True,
    ).localCheckpoint(eager=True)
    boot_d2 = res.agg(F.avg("d2")).collect()[0][0]
    model = train_pq_codebooks(res, m=m, k=kq, n_iter=n_iter, sample=sample)
    books.overwrite(_books_rows(index.spark, model))
    bv = books.version()
    rows = (
        pq_encode_arrow(res.select("vec_id", "embedding"), model)
        .join(res.select("vec_id", "cid"), "vec_id")
        .select("vec_id", "cid", "pq_code")
        .localCheckpoint(eager=True)
    )
    index.overwrite(
        rows,
        partition_by=["cid"],
        cluster_by=["vec_id"],
        max_records_per_file=_CLUSTER_ROWS_PER_FILE,
        props={
            "ann.srcVersion": str(head),
            "ann.ivf.nLists": str(n_lists),
            "ann.ivf.centsVersion": str(cv),
            "ann.ivfpq.booksVersion": str(bv),
            "ann.ivfpq.m": str(m),
            "ann.ivfpq.k": str(kq),
            "ann.ivfpq.encoding": "residual",
            "ann.ivfpq.bootMeanD2": repr(float(boot_d2)),
        },
    )
    return head


def _ivfpq_drift_policy(src, index, cents, books, n_iter: int, sample: int) -> int:
    """Post-catch-up drift check, IVF-PQ twin of ``_ivf_drift_policy``:
    with ``ann.ivfpq.maxDrift`` set, a drift ratio past it raises an
    actionable error (default) or triggers the atomic retrain-and-swap
    (``ann.ivfpq.onDrift=rebuild``). ``ann.ivfpq.driftSampleMod`` = s
    makes every policy probe a deterministic ~1/s key sample instead of
    a full-corpus assignment — a policy CHECK must be o(corpus) at
    billion scale (the ADVICE-r9 finding); unset keeps the exact probe
    (small tables, certification gates)."""
    props = index.properties()
    head = int(props.get("ann.srcVersion", -1))
    max_drift = props.get("ann.ivfpq.maxDrift")
    if not max_drift:
        return head
    mod = props.get("ann.ivfpq.driftSampleMod")
    d = ivfpq_index_drift(
        src, index, cents, sample_mod=int(mod) if mod else None
    )
    if mod and d["mean_d2"] is None:
        # empty hash sample (sample_mod > corpus): NULL mean must not
        # pass the policy as no-drift — fall back to the exact probe
        d = ivfpq_index_drift(src, index, cents)
    ratio = d["drift_ratio"]
    if ratio is None or ratio <= float(max_drift):
        return head
    if props.get("ann.ivfpq.onDrift", "error") == "rebuild":
        return rebuild_ivfpq_index(
            src, index, cents, books, n_iter=n_iter, sample=sample
        )
    raise RuntimeError(
        f"IVF-PQ models at {cents.path!r}/{books.path!r} have drifted "
        f"{ratio:.2f}x past their bootstrap geometry "
        f"(ann.ivfpq.maxDrift={max_drift}): ADC recall is degrading. "
        "Either rebuild_ivfpq_index(src, index, cents, books) for an "
        "atomic retrain-and-swap, or set the ann.ivfpq.onDrift=rebuild "
        "property to do it automatically at catch-up time."
    )


def ivfpq_apply_changes(
    index,
    changes: DataFrame,
    centroids: DataFrame,
    model: list[list[list[float]]],
    mode: str = "dv",
) -> None:
    """Fold one change-image batch into the IVF-PQ list table under the
    PINNED generations: net-change reduce, encode + assign only the
    changed vectors, one keyed merge. Shared by the batch catch-up loop
    and the streaming twin — a re-delivered batch re-merges the same net
    rows (content no-op; the effectively-once contract of keyed merges).
    """
    from .clustering import assign_clusters
    from .pq import pq_encode_arrow

    net = _net_changes(changes)
    ins = _unit_vecs(
        net.filter(F.col("_change_type") == "insert").select(
            "vec_id", "embedding"
        )
    )
    if index.properties().get("ann.ivfpq.encoding") == "residual":
        # encode (vector − assigned centroid) under the SAME pinned
        # generation the bootstrap trained on — the encoding property is
        # layout, read from the index so batch and streaming folds agree.
        # Assign+residual+encode is ONE Arrow pass (_assign_encode_residual)
        # landing directly in the ``source`` checkpoint below — the former
        # shape paid two extra checkpoints and a join for the same rows.
        enc = _assign_encode_residual(ins, centroids, model)
    else:
        ins = ins.localCheckpoint(eager=True)  # feeds encode AND assign
        enc = pq_encode_arrow(ins, model).join(
            assign_clusters(ins, centroids).select("vec_id", "cid"), "vec_id"
        )
    ups = enc.select("vec_id", "cid", "pq_code").withColumn(
        "_tombstone", F.lit(False)
    )
    dels = net.filter(F.col("_change_type") == "delete").select(
        "vec_id",
        F.lit(None).cast("int").alias("cid"),
        F.lit(None).cast("bigint").alias("pq_code"),
        F.lit(True).alias("_tombstone"),
    )
    source = ups.unionByName(dels).localCheckpoint(eager=True)
    if source.take(1):
        index.merge_into(
            source,
            on=["vec_id"],
            delete_when="_tombstone",
            partition_by=["cid"],
            mode=mode,
            source_materialized=True,
        )


def stream_ivfpq_index_to_tx_table(
    spark: SparkSession,
    src_dir: str,
    index_dir: str,
    cents_dir: str,
    books_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    mode: str = "dv",
):
    """Streaming maintenance for the IVF-PQ index: the source's change
    feed as a native Structured Streaming source, each micro-batch folded
    through :func:`ivfpq_apply_changes` under the index's pinned
    quantizer/codebook generations. Offsets checkpoint with the stream,
    so restarts resume after the last folded commit.

    Unlike the Hamming twin (quantization needs no training, so its
    stream can bootstrap from the snapshot images), the IVF-PQ models
    must be TRAINED on a corpus snapshot — bootstrap with
    :func:`catchup_ivfpq_index` first; an untrained index refuses the
    stream with an actionable error instead of silently encoding under a
    missing codebook. A FRESH checkpoint tails the feed from the index's
    own ``ann.srcVersion`` watermark (``startingVersion``) instead of an
    initial snapshot: a snapshot cannot express deletions that landed
    between the batch bootstrap and the stream start, so replaying one
    over a pre-populated index would leave ghost rows. Each fold advances
    the watermark, keeping batch catch-ups and checkpoint restarts
    mutually consistent."""
    from ..streaming.source import register_tx_source
    from ..txlog import TxTable

    register_tx_source(spark)
    props = TxTable(spark, index_dir).properties()
    if props.get("ann.ivfpq.booksVersion") is None:
        raise RuntimeError(
            f"IVF-PQ index at {index_dir!r} has no trained codebooks: "
            "bootstrap with catchup_ivfpq_index() before starting "
            "streaming maintenance (model training needs a corpus "
            "snapshot; a stream micro-batch is not one)."
        )
    feed = (
        spark.readStream.format("txtable")
        .option("readChangeFeed", "true")
        # only honored by a FRESH checkpoint; resumes ignore it
        .option("startingVersion", str(int(props["ann.srcVersion"]) + 1))
        .load(src_dir)
    )

    def fold(batch: DataFrame, batch_id: int) -> None:
        s = batch.sparkSession
        index = TxTable(s, index_dir)
        cents = TxTable(s, cents_dir)
        books = TxTable(s, books_dir)
        centroids = _pinned_cents(index, cents).localCheckpoint(eager=True)
        model = _pinned_books(index, books)
        batch = batch.select(
            "vec_id", "embedding", "_change_type", "_commit_version"
        ).localCheckpoint(eager=True)
        ivfpq_apply_changes(index, batch, centroids, model, mode=mode)
        hi = batch.agg(F.max("_commit_version")).collect()[0][0]
        if hi is not None and hi > int(index.properties().get("ann.srcVersion", -1)):
            index.set_properties({"ann.srcVersion": str(hi)})
        maybe_compact_index(index, _CLUSTER_ROWS_PER_FILE)

    writer = (
        feed.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def ivfpq_index_topk(
    index,
    cents,
    books,
    src,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 3,
    shortlist: int = 200,
    key_cap: int = PROBE_KEY_CAP,
    as_of: int | None = None,
    allowed: DataFrame | None = None,
) -> DataFrame:
    """Probed ADC top-k with exact re-rank — the full IVFADC+R read
    path over the incrementally-maintained tables: probe ``nprobe``
    lists (cid partition predicate -> file pruning), ADC-score ONLY
    those lists' 8-byte codes against the broadcast per-query LUT,
    keep a ``shortlist`` per query, then fetch the shortlist's
    full-precision vectors BY KEY from the source table (IN-predicate
    read: bloom/span file skipping, bounded by shortlist×|queries|)
    and re-rank by exact cosine. Generation pins make this consistent
    under concurrent rebuilds.

    ``key_cap`` bounds the driver-side shortlist key list (the
    lsh_index_probe contract): an offline batch of 10⁵–10⁶ queries
    would otherwise materialize shortlist×|queries| keys on the driver
    for a multi-megabyte IN-predicate that costs more to evaluate
    against every file's stats than it skips. Past the cap the fetch
    degrades to a distributed semi-join of the source read against the
    shortlist — no driver-side key list at all, still one equi-join,
    only the file-skipping stage is lost (the regime where the
    shortlist touches most source files anyway)."""
    from .pq import _adc_dist, _pq_lut
    from .similarity import _dot, _norm

    cents_df = _pinned_cents(index, cents, as_of=as_of)
    model = _pinned_books(index, books, as_of=as_of)
    qn = _unit_vecs(queries.select("query_id", "embedding"))
    from .clustering import _sq_dist

    scored = qn.join(F.broadcast(cents_df)).select(
        "query_id",
        "cid",
        _sq_dist(F.col("embedding"), F.col("c_vec")).alias("__d"),
    )
    wp = W.partitionBy("query_id").orderBy(F.col("__d").asc(), F.col("cid").asc())
    # per-query probe assignment: each query scores EXACTLY its own
    # nprobe lists (canonical IVF semantics). The relation is
    # |queries|·nprobe short rows — broadcast-sized at any batch, so it
    # collects ONCE and rebuilds as a JVM local relation: one job yields
    # both the per-query cut (broadcast below) and the cid union for
    # FILE pruning (the former shape paid a checkpoint job plus a
    # distinct-collect job for the same rows).
    from ..localrel import local_df

    qid_t = dict(
        (f.name, f.dataType.simpleString()) for f in qn.schema.fields
    )["query_id"]
    probe_rows = [
        (r["query_id"], int(r["cid"]))
        for r in scored.withColumn("pr", F.row_number().over(wp))
        .filter(F.col("pr") <= nprobe)
        .select("query_id", "cid")
        .collect()
    ]
    probes = local_df(
        index.spark, probe_rows, f"query_id {qid_t}, cid int"
    )
    probe_ids = sorted({c for _, c in probe_rows})  # bounded by n_lists
    if index.properties(as_of=as_of).get("ann.ivfpq.encoding") == "residual":
        # residual ADC (IVFADC proper): codes quantize (x − c_list), so
        # the LUT must be built from the SHIFTED query (q − c_list) — one
        # LUT per (query, probed cid), nprobe·m·k doubles per query, the
        # published IVFADC table cost. Σ_j LUT[j][code_j] then estimates
        # ||q − c − r̂||² = ||q − x̂||² exactly as the raw form did.
        # LUTs are keyed to each query's OWN probe assignment (join on
        # query_id), never the batch's probe union — per-query LUT count
        # stays nprobe however large the offline query batch gets.
        shifted = (
            qn.join(probes, "query_id")
            .join(F.broadcast(cents_df), "cid")
            .select(
                "query_id",
                "cid",
                F.zip_with(
                    "embedding", "c_vec", lambda x, c: x - c
                ).alias("embedding"),
            )
        )
        lut = _pq_lut(shifted, model, passthrough={"cid": "int"})
        lists = index.read(
            predicates=[("cid", "in", probe_ids)], as_of=as_of
        ).select("vec_id", "cid", "pq_code")
        if allowed is not None:
            # filtered search: scope candidates BEFORE the ADC ranking
            # (distributed semi-join — the probed_hamming_topk convention)
            lists = lists.join(
                allowed.select("vec_id").distinct(), "vec_id", "semi"
            )
        adc = lists.join(F.broadcast(lut.drop("embedding")), "cid").select(
            "query_id", "vec_id", _adc_dist(len(model)).alias("adc_dist")
        )
    else:
        lists = index.read(
            predicates=[("cid", "in", probe_ids)], as_of=as_of
        ).select("vec_id", "cid", "pq_code")
        if allowed is not None:
            lists = lists.join(
                allowed.select("vec_id").distinct(), "vec_id", "semi"
            )
        lut = _pq_lut(qn, model)
        # the probes join is the same per-query cut: a list row joins
        # only the queries that probed ITS cid (the file predicate above
        # is the probe UNION — pruning only, not the candidate set)
        adc = (
            lists.join(F.broadcast(probes), "cid")
            .join(F.broadcast(lut.drop("embedding")), "query_id")
            .select(
                "query_id", "vec_id", _adc_dist(len(model)).alias("adc_dist")
            )
        )
    ws = W.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("vec_id").asc()
    )
    short = (
        adc.withColumn("rk", F.row_number().over(ws))
        .filter(F.col("rk") <= shortlist)
        .select("query_id", "vec_id")
        .localCheckpoint(eager=True)
    )
    ids = [
        r.vec_id
        for r in short.select("vec_id").distinct().limit(key_cap + 1).collect()
    ]
    # the re-rank fetch reads the SOURCE at the index's own watermark —
    # index content and full-precision vectors always come from the same
    # corpus snapshot (and an as_of query time-travels BOTH coherently);
    # pre-watermark indexes (no prop) fall back to the source head
    wm = index.properties(as_of=as_of).get("ann.srcVersion")
    src_v = int(wm) if wm is not None else None
    preds = [("vec_id", "in", sorted(ids))] if len(ids) <= key_cap else None
    try:
        # bounded point fetch (span/bloom file skipping) under the cap;
        # over-cap keeps the key set distributed via semi-join below
        full = src.read(predicates=preds, as_of=src_v)
    except (FileNotFoundError, ValueError):
        # a STALE index pinned past the source's vacuum/restore horizon:
        # the watermark snapshot is unreconstructible. For a HEAD query
        # (as_of unset) degrade to the head read with a warning — the
        # pre-r11 behavior, trading snapshot coherence for availability.
        # An EXPLICIT as_of must stay loud: silently re-ranking against
        # a different corpus version would break time-travel symmetry.
        if as_of is not None:
            raise
        import warnings

        warnings.warn(
            f"IVF-PQ re-rank: source snapshot v{src_v} (the index's "
            "ann.srcVersion watermark) is unreconstructible — vacuum or "
            "restore pruned it. Falling back to the source HEAD; advance "
            "the index (catchup_ivfpq_index) or extend source retention "
            "to restore snapshot-coherent re-ranking.",
            RuntimeWarning,
            stacklevel=2,
        )
        full = src.read(predicates=preds)
    full = full.select("vec_id", "embedding")
    if preds is None:
        full = full.join(short.select("vec_id").distinct(), "vec_id", "semi")
    q = queries.select("query_id", F.col("embedding").alias("__q"))
    reranked = (
        short.join(full, "vec_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "vec_id",
            (
                _dot(F.col("__q"), F.col("embedding"))
                / (_norm(F.col("__q")) * _norm(F.col("embedding")))
            ).alias("cosine"),
        )
    )
    wr = W.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        reranked.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") <= k)
        .select("query_id", "rk", "vec_id", "cosine")
    )


def assert_ivfpq_index_matches_scratch(index, cents, books, src) -> None:
    """Equality proof: the incrementally-maintained (vec_id, cid,
    pq_code) table equals a from-scratch assign+encode of the source
    head under the SAME pinned generations."""
    from .clustering import assign_clusters
    from .pq import pq_encode_arrow

    snap = _unit_vecs(src.read().select("vec_id", "embedding"))
    model = _pinned_books(index, books)
    if index.properties().get("ann.ivfpq.encoding") == "residual":
        res = _residual_vecs(snap, _pinned_cents(index, cents)).localCheckpoint(
            eager=True
        )
        scratch = (
            pq_encode_arrow(res.select("vec_id", "embedding"), model)
            .join(res.select("vec_id", "cid"), "vec_id")
            .select("vec_id", "cid", "pq_code")
        )
    else:
        scratch = (
            pq_encode_arrow(snap, model)
            .join(
                assign_clusters(snap, _pinned_cents(index, cents)).select(
                    "vec_id", "cid"
                ),
                "vec_id",
            )
            .select("vec_id", "cid", "pq_code")
        )
    got = index.read().select("vec_id", "cid", "pq_code")
    extra = got.exceptAll(scratch).count()
    missing = scratch.exceptAll(got).count()
    if extra or missing:
        raise RuntimeError(
            f"incremental IVF-PQ index diverged from scratch build: "
            f"{extra} extra row(s), {missing} missing row(s)"
        )
