"""Incrementally-maintained BM25 inverted index over a txlog documents
table, fed by the table's own change feed — the production shape of the
retrieval suite (operators/retrieval.py): query cost is O(postings of
the query terms) via token-predicate file skipping instead of O(corpus)
re-tokenization, and maintenance is O(changed
docs' postings) via token-span-pruned keyed merges. Follows the same watermark / net-change / deferred-empty-
bootstrap conventions as operators/ann_index.py. BM25 per Robertson &
Zaragoza 2009; inverted-file maintenance shape per the published
Lucene/ES segment model re-expressed on the lakehouse table layout.

Index layout: ONE postings table, rows ``(doc_id, token, tf, dl)``
with the doc length denormalized onto every posting (an update rewrites
the doc's postings anyway, so dl rides along for free and scoring needs
no second table). Files are GLOBALLY CLUSTERED by (token, doc_id) (with
per-file token blooms): a term lookup opens only the files whose token span can
hold it, AND a maintenance merge's candidate set is bounded by the
changed docs' distinct tokens (the merge key-set pruning bisects source
tokens against the same tight spans). The first cut partitioned by a
doc-hash bucket and clustered by token WITHIN buckets — that left every
file's doc_id span wide and every file a merge candidate, and the
merge's narrow candidate scan went O(corpus): a single-doc update cost
33 s against a 200k-doc corpus (vs 12 s full rebuild). Token-major
layout prunes the same update to the handful of files its tokens land
in. Corpus scalars (``bm25.nDocs``, ``bm25.totalDl``) are exact
integers maintained in table properties by delta arithmetic — never
recomputed by scanning — and every maintenance step commits scalars,
postings, and the ``bm25.srcVersion`` watermark ATOMICALLY (``props``
on the merge/append commit): delta arithmetic is only exactly-once if
a crash cannot separate an applied delta from the watermark that marks
it applied.

Change-image semantics: an update renders as delete(pre-image) +
insert(post-image) on the feed, so the index never needs to READ itself
to find a changed doc's old postings — the pre-image text carries them
(``_doc_net_images``: earliest-delete image = state at range start,
latest-change image = state at range end).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..localrel import local_df
from ..txlog import maybe_compact_index
from .retrieval import BM25_B, BM25_K1, bm25_rank, bm25_score_from_stats
from .textops import tokens

ROWS_PER_FILE = 65536

#: driver-side key-list cap for the probe's token IN-predicate (the
#: lsh_index.PROBE_KEY_CAP contract; defined locally — lsh_index imports
#: from this module, so the dependency cannot point the other way)
PROBE_KEY_CAP = 100_000

def _tf_rows(docs: DataFrame) -> DataFrame:
    """(doc_id, token, tf, dl) for every doc with >=1 token."""
    toks = tokens(docs)
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    return tf.join(dl, "doc_id").select("doc_id", "token", "tf", "dl")


def _tf_rows_tagged(docs: DataFrame) -> DataFrame:
    """``_tf_rows`` keyed additionally by an old/new image tag ``_new`` —
    one tokenize+aggregate pass covers BOTH sides of a change batch
    (the per-side groupings are independent because ``_new`` is in every
    key, so per-side tf/dl values are identical to two ``_tf_rows``
    passes over the split inputs)."""
    toks = docs.select(
        "doc_id",
        "_new",
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("token"),
    ).filter(F.col("token") != "")
    tf = toks.groupBy("doc_id", "_new", "token").agg(
        F.count(F.lit(1)).alias("tf")
    )
    dl = toks.groupBy("doc_id", "_new").agg(F.count(F.lit(1)).alias("dl"))
    return tf.join(dl, ["doc_id", "_new"]).select(
        "doc_id", "_new", "token", "tf", "dl"
    )


def _doc_net_images(changes: DataFrame, text_col: str) -> DataFrame:
    """Per-doc (doc_id, old_text, new_text) across a CDF version range:
    ``old_text`` = the pre-range state (the EARLIEST image iff it is a
    delete — an update's pre-image or a true delete; an insert-first doc
    did not exist at range start), ``new_text`` = the post-range state
    (the LATEST image iff it is an insert; insert beats delete within a
    version — the same convention as ``_net_changes``).

    ONE hash aggregate: ``min_by``/``max_by`` on the lexicographic
    (_commit_version, _change_type) key pick the same rows the former
    two row_number windows picked ('delete' < 'insert' orders the
    pre-image first within a version), and the has-old/has-new flags
    reproduce the former full-outer join's row set exactly (a doc whose
    earliest image is an insert AND whose latest is a delete — lived and
    died inside the range — appears in neither side, so it is dropped).
    The former shape cost two window sorts plus a full-outer join (three
    exchanges of the full text payload); this is one exchange with
    map-side partial aggregation (guide §2.3/§2.4)."""
    rows = changes.select(
        "doc_id", F.col(text_col).alias("_text"), "_change_type", "_commit_version"
    )
    key = F.struct(F.col("_commit_version"), F.col("_change_type"))
    img = F.struct(F.col("_change_type"), F.col("_text"))
    return (
        rows.groupBy("doc_id")
        .agg(
            F.min_by(img, key).alias("__first"),
            F.max_by(img, key).alias("__last"),
        )
        .filter(
            (F.col("__first._change_type") == "delete")
            | (F.col("__last._change_type") == "insert")
        )
        .select(
            "doc_id",
            F.when(
                F.col("__first._change_type") == "delete",
                F.col("__first._text"),
            ).alias("old_text"),
            F.when(
                F.col("__last._change_type") == "insert",
                F.col("__last._text"),
            ).alias("new_text"),
        )
    )


def bm25_apply_changes(
    index, changes: DataFrame, text_col: str, mode: str,
    watermark: int | None = None,
) -> None:
    """Fold one change-image batch: tokenize the per-doc pre/post images,
    full-outer them on (doc_id, token) — post-image postings upsert,
    pre-image-only postings tombstone — and keyed-merge into the
    token-clustered files. Corpus scalars adjust by exact integer deltas
    computed from the same two relations, and land IN THE SAME commit as
    the postings merge together with the ``bm25.srcVersion`` watermark
    (``props`` on ``TxTable.merge_into``): the postings merge is
    replay-idempotent but the scalar delta is NOT blindly re-addable, so
    scalars and watermark must advance atomically with the rows — a crash
    can never leave applied deltas without the watermark (which a restart
    catch-up would re-apply, permanently skewing every idf/avgdl). A
    batch with no posting change still advances the watermark (single
    metadata commit; deltas are provably zero then — ``ups`` carries
    EVERY post-image posting, so an empty source means no doc changed)."""
    # ONE tokenize+aggregate pass over both image sides (side-tagged),
    # pinned once — the former three eager checkpoints (net images, old
    # postings, new postings) cost three full materialization jobs per
    # batch for relations that are cheap filters of this single one
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
        .select("doc_id", F.col("e._new").alias("_new"), F.col("e.text").alias("text"))
    )
    posts = _tf_rows_tagged(tagged).localCheckpoint(eager=True)
    old_post = posts.filter(~F.col("_new")).drop("_new")
    new_post = posts.filter(F.col("_new")).drop("_new")
    ups = new_post.withColumn("_tombstone", F.lit(False))
    dels = (
        old_post.select("doc_id", "token")
        .join(new_post.select("doc_id", "token"), ["doc_id", "token"], "left_anti")
        .select(
            "doc_id",
            "token",
            F.lit(None).cast("long").alias("tf"),
            F.lit(None).cast("long").alias("dl"),
            F.lit(True).alias("_tombstone"),
        )
    )
    # the source materialization and the scalar-delta aggregate are
    # independent jobs over the SAME pinned side-tagged postings — run
    # them concurrently (guide §2.6) so the pre-merge phase pays
    # max(ckpt, deltas) instead of their sum.
    # exact scalar deltas: docs-with-tokens and token mass, old vs new —
    # computed BEFORE the merge so the merge commit can carry them.
    # ONE job over the pinned side-tagged postings covers both sides
    # (a missing side simply has no group row -> 0/0, the same totals
    # the former per-side global aggregates returned)
    from concurrent.futures import ThreadPoolExecutor

    def _deltas():
        return (
            posts.groupBy("_new", "doc_id")
            .agg(F.first("dl").alias("dl"))
            .groupBy("_new")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.coalesce(F.sum("dl"), F.lit(0)).alias("t"),
            )
            .collect()
        )

    with ThreadPoolExecutor(max_workers=2) as _pool:
        _f_src = _pool.submit(
            lambda: ups.unionByName(dels).localCheckpoint(eager=True)
        )
        _f_deltas = _pool.submit(_deltas)
        source = _f_src.result()
        side_rows = {r["_new"]: r for r in _f_deltas.result()}
    _zero = {"n": 0, "t": 0}
    o = side_rows.get(False, _zero)
    n = side_rows.get(True, _zero)
    cur = index.properties()
    props = {
        "bm25.nDocs": str(int(cur.get("bm25.nDocs", 0)) + n["n"] - o["n"]),
        "bm25.totalDl": str(int(cur.get("bm25.totalDl", 0)) + n["t"] - o["t"]),
    }
    if watermark is not None:
        props["bm25.srcVersion"] = str(watermark)
    if index.snapshot()[2] is None and new_post.take(1):
        # virgin index, stream-first: lay the bootstrap layout down with
        # the FIRST data commit — (token, doc_id)-clustered files, then
        # declared clustering + token blooms — exactly like
        # catchup_bm25_index's bootstrap, or probe IN-predicates prune
        # nothing and compact_layout has no clustering to restore (blooms
        # only cover writes AFTER declaration, so the append itself must
        # be clustered). Tombstones target rows the virgin table never
        # held — provable no-ops, dropped.
        index.append(
            new_post,
            cluster_by=["token", "doc_id"],
            max_records_per_file=ROWS_PER_FILE,
            props=props,
        )
        index.set_clustering(["token", "doc_id"])
        index.set_bloom_index(["token"], auto_size=True)
    elif source.take(1):
        index.merge_into(
            source,
            on=["token", "doc_id"],
            delete_when="_tombstone",
            mode=mode,
            props=props,
            source_materialized=True,
        )
    else:
        index.set_properties(props)


def catchup_bm25_index(
    src,
    index,
    text_col: str = "text",
    step: int | None = None,
    mode: str = "dv",
) -> int:
    """Advance the postings table from its ``bm25.srcVersion`` watermark
    to the source head. Bootstrap tokenizes the snapshot straight into a
    token-clustered, token-bloomed append; increments
    pay change-feed machinery only."""
    head = src.version()
    done = int(index.properties().get("bm25.srcVersion", -1))
    if head <= done:
        return done
    if index.version() < 0:
        snap = src.read(as_of=head).select("doc_id", text_col)
        rows = _tf_rows(snap).localCheckpoint(eager=True)
        if not rows.take(1):
            return done  # defer: first non-empty catch-up bootstraps
        stats = (
            rows.groupBy("doc_id")
            .agg(F.first("dl").alias("dl"))
            .agg(F.count(F.lit(1)).alias("n"), F.sum("dl").alias("t"))
            .collect()[0]
        )
        # scalars + watermark ride the bootstrap append itself: a crash
        # can never leave committed postings without their exact corpus
        # scalars (the clustering/bloom declarations after are layout
        # policy only — losing them to a crash degrades pruning, not
        # correctness, and the next compact restores them)
        index.append(
            rows,
            cluster_by=["token", "doc_id"],
            max_records_per_file=ROWS_PER_FILE,
            props={
                "bm25.srcVersion": str(head),
                "bm25.nDocs": str(stats["n"]),
                "bm25.totalDl": str(stats["t"]),
            },
        )
        index.set_clustering(["token", "doc_id"])
        index.set_bloom_index(["token"], auto_size=True)
        return head
    v = done
    while v < head:
        hi = head if step is None else min(v + step, head)
        try:
            changes = src.read_changes(v, hi)
        except FileNotFoundError as e:
            raise RuntimeError(
                f"BM25 index at {index.path!r} is stale beyond the source's "
                f"CDF retention (watermark v{v}): rebuild — drop the "
                "postings table and catchup_bm25_index() from scratch."
            ) from e
        # scalars AND the advanced watermark land in the merge commit
        # itself (atomic — see bm25_apply_changes)
        bm25_apply_changes(index, changes, text_col, mode, watermark=hi)
        v = hi
    # catch-up-time auto-compaction: restore the (token, doc_id)
    # clustered layout once trickle fragments exceed the relative
    # threshold (metadata-only check; no-op at gate scale)
    maybe_compact_index(index, ROWS_PER_FILE)
    return head


def bm25_index_topk(
    index,
    queries: DataFrame,
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
    key_cap: int = PROBE_KEY_CAP,
    as_of: int | None = None,
    allowed: DataFrame | None = None,
) -> DataFrame:
    """Top-k BM25 through the inverted index: ONE pruned read of the
    postings restricted to the query terms (token IN-predicate — log
    stats + clustering spans + per-file blooms skip every file that
    cannot hold a term), df from the fetched postings, corpus scalars
    from the exact integer properties. Identical arithmetic shape (and
    therefore identical scores) to the corpus-scan ``bm25_topk``.

    Postings and corpus scalars come from ONE pinned snapshot version —
    two separate head reads would let a concurrent catch-up land between
    them and pair new postings with stale n_docs/total_dl (the
    ivfpq_index_topk pinned-generation discipline)."""
    spark = index.spark
    # as_of = time-travel query against a PINNED index version (the
    # prefix-consistency replay primitive); default = current head
    v = index.version() if as_of is None else as_of
    props = index.properties(as_of=v)
    terms = sorted(
        r.term
        for r in queries.select("term").distinct().limit(key_cap + 1).collect()
    )  # driver-bounded: a query's term list, capped at key_cap
    if len(terms) <= key_cap:
        post = index.read(as_of=v, predicates=[("token", "in", terms)])
    else:
        # an offline mega-batch of queries past the cap keeps its term
        # set distributed: semi-join the full postings read instead of
        # materializing a multi-megabyte IN-predicate on the driver —
        # only the file-skipping stage degrades (that regime touches
        # most token files anyway)
        post = index.read(as_of=v).join(
            queries.select(F.col("term").alias("token")).distinct(),
            "token",
            "semi",
        )
    post = post.select(
        "doc_id", "token", "tf", "dl"
    ).localCheckpoint(eager=False)
    tf = post.select("doc_id", "token", "tf")
    dl = post.select("doc_id", "dl").distinct()
    df_t = post.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    stats = local_df(
        spark,
        [(int(props["bm25.nDocs"]), int(props["bm25.totalDl"]))],
        "n_docs long, total_dl long",
    )
    scored = bm25_score_from_stats(tf, df_t, dl, stats, queries, k1=k1, b=b)
    if allowed is not None:
        # FILTERED retrieval (tenant/source/date scoping): restrict the
        # ranking to the allowed key set with a distributed semi-join on
        # the SCORED relation — per-doc scores (tf/df/idf) stay the
        # corpus-global values, the predicate only decides who may enter
        # the top-k (post-filtering, the probed_hamming_topk convention)
        scored = scored.join(
            allowed.select("doc_id").distinct(), "doc_id", "semi"
        )
    return bm25_rank(scored, k=k)


def assert_bm25_index_matches_scratch(index, src, text_col: str = "text") -> None:
    """Equality proof: incrementally-maintained postings == a from-scratch
    tokenization of the source head, INCLUDING the denormalized dl and
    the exact corpus scalars."""
    scratch = _tf_rows(src.read().select("doc_id", text_col))
    got = index.read().select("doc_id", "token", "tf", "dl")
    extra = got.exceptAll(scratch).count()
    missing = scratch.exceptAll(got).count()
    if extra or missing:
        raise RuntimeError(
            f"incremental BM25 index diverged from scratch tokenization: "
            f"{extra} extra posting(s), {missing} missing posting(s)"
        )
    stats = (
        scratch.groupBy("doc_id")
        .agg(F.first("dl").alias("dl"))
        .agg(F.count(F.lit(1)).alias("n"), F.coalesce(F.sum("dl"), F.lit(0)).alias("t"))
        .collect()[0]
    )
    props = index.properties()
    if int(props["bm25.nDocs"]) != stats["n"] or int(props["bm25.totalDl"]) != (
        stats["t"]
    ):
        raise RuntimeError(
            f"BM25 corpus scalars diverged: props nDocs/totalDl = "
            f"{props['bm25.nDocs']}/{props['bm25.totalDl']}, scratch = "
            f"{stats['n']}/{stats['t']}"
        )


def stream_bm25_index_to_tx_table(
    spark: SparkSession,
    src_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    available_now: bool = True,
    mode: str = "dv",
):
    """Streaming maintenance twin: tail the documents table's CDF and
    fold micro-batches through ``bm25_apply_changes``. A fresh checkpoint
    over an already-maintained index tails from the ``bm25.srcVersion``
    watermark (a snapshot replay cannot express interim deletions AND
    would double-count the scalar deltas); a virgin index bootstraps from
    the snapshot images (tokenization needs no training). Folds advance
    the watermark and skip batches at or below it, so scalar deltas are
    exactly-once under replays."""
    from ..streaming.source import register_tx_source
    from ..txlog import TxTable

    register_tx_source(spark)
    wm = TxTable(spark, index_dir).properties().get("bm25.srcVersion")
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
        done = int(index.properties().get("bm25.srcVersion", -1))
        batch = batch.filter(F.col("_commit_version") > done)
        if not batch.take(1):
            return  # replayed at-or-below the watermark: exactly-once no-op
        hi = batch.agg(F.max("_commit_version")).collect()[0][0]
        # scalar deltas + watermark commit WITH the postings merge — a
        # crash mid-fold leaves watermark un-advanced and deltas
        # un-applied together, so the replayed batch is exactly-once
        bm25_apply_changes(index, batch, text_col, mode, watermark=hi)
        maybe_compact_index(index, ROWS_PER_FILE)

    writer = (
        feed.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
