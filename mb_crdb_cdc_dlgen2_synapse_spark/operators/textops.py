"""Text-analysis operators (SURVEY.md §2.8 X4) over the ``documents`` table:
tokenization, token counting, language stats, quality scoring, language-ID
heuristic, and document fingerprinting.

All pure built-ins (split/explode/regexp/md5) — the hot path never leaves
the JVM, so these scale linearly with partitions at 100 TB: tokenize/explode
is map-side; only the final counts shuffle, pre-combined by partial
aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

#: tiny embedded stopword list for quality scoring (deterministic, public)
STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")


def tokens(documents: DataFrame) -> DataFrame:
    """Whitespace tokenization -> one row per token (lowercased)."""
    return documents.select(
        "doc_id",
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("token"),
    ).filter(F.col("token") != "")


def token_counts(documents: DataFrame, k: int = 20) -> DataFrame:
    """Top-k tokens across the corpus (word-count with deterministic order)."""
    return (
        tokens(documents)
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("token").asc())
        .limit(k)
    )


def token_count_per_doc(documents: DataFrame) -> DataFrame:
    """Per-document token count via regexp (BPE-ish word/number splitting) —
    no explode needed, stays one-row-per-doc."""
    return documents.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.lower("text"), F.lit(r"[a-z0-9]+"), 0)).alias(
            "n_tokens"
        ),
        F.size(F.split(F.col("text"), r"\s+")).alias("n_ws_tokens"),
    )


def lang_stats(documents: DataFrame) -> DataFrame:
    """Corpus stats per language tag."""
    return documents.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("n_chars").alias("avg_chars"),
        F.max("n_chars").alias("max_chars"),
    )


def quality_scores(documents: DataFrame) -> DataFrame:
    """Heuristic quality scoring: length, punctuation density, stopword ratio,
    mean word length — the standard cheap pre-LLM text filters."""
    lower = F.lower(F.col("text"))
    n_tokens = F.size(F.regexp_extract_all(lower, F.lit(r"[a-z0-9]+"), 0))
    n_stop = F.size(
        F.regexp_extract_all(lower, F.lit(r"\b(?:" + "|".join(STOPWORDS) + r")\b"), 0)
    )
    n_punct = F.length(F.regexp_replace(F.col("text"), r"[^.,;:!?]", ""))
    return documents.select(
        "doc_id",
        "lang",
        F.col("n_chars").alias("n_chars"),
        n_tokens.alias("n_tokens"),
        (n_stop / F.greatest(n_tokens, F.lit(1))).alias("stopword_ratio"),
        (n_punct / F.greatest(F.col("n_chars"), F.lit(1))).alias("punct_ratio"),
        (F.col("n_chars") / F.greatest(n_tokens, F.lit(1))).alias("chars_per_token"),
    )


def language_id(documents: DataFrame) -> DataFrame:
    """N-gram-heuristic language ID: score each doc against tiny per-language
    marker-token sets and pick the argmax (deterministic tiebreak by tag).

    A real deployment swaps the marker sets for trained n-gram profiles; the
    *shape* (N scores per doc -> greatest/argmax, all codegen'd) is the part
    that must scale.
    """
    markers = {
        "en": ("the", "and", "of"),
        "de": ("der", "und", "die"),
        "fr": ("le", "et", "la"),
        "es": ("el", "y", "de"),
        "zh": ("zh",),  # placeholder marker for the synthetic corpus
    }
    lower = F.lower(F.col("text"))
    scores = [
        F.size(
            F.regexp_extract_all(lower, F.lit(r"\b(?:" + "|".join(ms) + r")\b"), 0)
        ).alias(f"score_{tag}")
        for tag, ms in markers.items()
    ]
    scored = documents.select("doc_id", "lang", *scores)
    tags = list(markers)
    best = F.greatest(*[F.col(f"score_{t}") for t in tags])
    pred = F.coalesce(
        *[F.when(F.col(f"score_{t}") == best, F.lit(t)) for t in tags]
    )
    return scored.select(
        "doc_id",
        "lang",
        best.alias("best_score"),
        F.when(best > 0, pred).otherwise(F.lit("und")).alias("pred_lang"),
    )


def fingerprints(documents: DataFrame) -> DataFrame:
    """Deterministic document fingerprint: md5 over whitespace-normalized
    lowercase text (the exact-dedup key), plus a 64-bit prefix as a compact
    join/sort key."""
    norm = F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")
    fp = F.md5(norm)
    return documents.select(
        "doc_id",
        fp.alias("fingerprint"),
        F.conv(F.substring(fp, 1, 16), 16, 10).cast("decimal(38,0)").alias("fp64"),
    )


def shuffle_shards(
    documents: DataFrame,
    n_shards: int = 8,
    seed: str = "epoch0",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic training-data shuffle: assign every doc a (shard,
    position) under a seeded md5 permutation — the reproducible
    global-shuffle-before-training step. Changing ``seed`` re-shuffles
    (per-epoch reshuffling); the same seed reproduces the exact order on
    any cluster, engine, or retry.

    Scale shape: NO global sort — the md5 rank hash-partitions docs into
    shards (one shuffle), and position is a per-shard window. Each shard's
    order is independent, which is exactly what a data loader consuming
    shards in parallel needs; a global order would serialize on one sort.

    Returns (id_col, shard, pos) — write partitioned by ``shard`` and the
    loader streams each shard in ``pos`` order.
    """
    from .dedup import _hash64

    rank = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":" + seed)))
    shard = F.pmod(_hash64(rank), F.lit(n_shards)).cast("int")
    d = documents.select(id_col, rank.alias("__rank"), shard.alias("shard"))
    w = W.partitionBy("shard").orderBy(F.col("__rank"), F.col(id_col))
    return d.select(
        id_col, "shard", F.row_number().over(w).cast("bigint").alias("pos")
    )


def winnowing_fingerprints(
    documents: DataFrame, k: int = 3, window: int = 4, text_col: str = "text"
) -> DataFrame:
    """Winnowing document fingerprints — the published MOSS algorithm
    (Schleimer, Wilkerson, Aiken, SIGMOD'03): hash every k-token gram, slide
    a window over ``window`` consecutive gram hashes, select each window's
    MINIMUM hash. The selected set is the document's fingerprint, with the
    winnowing guarantee: any shared token run of length >= window + k - 1
    contributes at least one SHARED selected hash — so fingerprint overlap
    detects PARTIAL/contained duplication (a copied paragraph inside an
    otherwise-new doc) that whole-document similarity (MinHash) dilutes
    away and exact hashing misses entirely.

    Scale shape: positional grams via posexplode + ``lead`` (codegen — the
    shingle_rows lesson), gram hash once, the window minimum as a frame
    aggregate over the existing (doc_id, pos) shuffle, then DISTINCT
    selected hashes. Density is ~2/(window+1) of grams before dedup, so the
    fingerprint relation is a small fraction of the token relation. All
    md5-integer arithmetic: the DuckDB oracle replays it bit-for-bit.

    Docs shorter than window+k-1 tokens keep their first-window minimum so
    every non-empty doc yields >= 1 fingerprint. Returns (doc_id, fp)
    distinct rows.
    """
    from ..operators.dedup import _hash64, _spread

    d = _spread(documents)
    toks = d.select(
        "doc_id",
        F.posexplode(
            F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != "")
        ).alias("pos", "tok"),
    )
    wo = W.partitionBy("doc_id").orderBy("pos")
    leads = [F.lead("tok", i).over(wo) for i in range(1, k)]
    grams = (
        toks.select(
            "doc_id",
            "pos",
            F.concat_ws(" ", F.col("tok"), *leads).alias("g"),
            leads[-1].alias("_full"),
        )
        .filter(F.col("_full").isNotNull() | (F.col("pos") == 0))
        .select("doc_id", "pos", _hash64(F.col("g")).alias("h"))
    )
    frame = wo.rowsBetween(0, window - 1)
    n_grams = W.partitionBy("doc_id")
    sel = (
        grams.withColumn("fp", F.min("h").over(frame))
        .withColumn("n", F.count(F.lit(1)).over(n_grams))
        # complete windows only, except pos==0 for docs with < window grams
        .filter(
            (F.col("pos") <= F.col("n") - window) | (F.col("pos") == 0)
        )
        .select("doc_id", "fp")
        .distinct()
    )
    return sel


def winnowing_dup_candidates(
    documents: DataFrame,
    min_shared: int = 3,
    max_fp_docs: int = 20,
    k: int = 3,
    window: int = 4,
) -> DataFrame:
    """Partial-duplication candidates from winnowing fingerprints: pairs of
    docs sharing >= ``min_shared`` selected hashes. Fingerprints present in
    more than ``max_fp_docs`` docs are dropped first (boilerplate runs —
    the df-cap that bounds the hottest buckets, same rule as the
    stop-shingle cap in MinHash-LSH), so the candidate equi-join cost
    tracks real overlap, never the hottest common phrase. Returns
    (doc_a, doc_b, n_shared)."""
    fps = winnowing_fingerprints(documents, k=k, window=window).localCheckpoint(
        eager=True
    )
    rare = (
        fps.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") <= max_fp_docs)
        .select("fp")
    )
    pruned = fps.join(rare, "fp", "left_semi")
    a, b = pruned.alias("a"), pruned.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def tf_idf(documents: DataFrame, max_doc_id: int | None = None, top_k: int = 5) -> DataFrame:
    """X4: TF-IDF with smooth idf (ln((N+1)/(df+1)) + 1), top-k terms per doc.

    Classic two-aggregation shape: tf is a (doc, token) count, df a token
    count — both map-side combinable; the idf join broadcasts the (small)
    token dictionary. ``max_doc_id`` bounds the *output* docs while df/N stay
    corpus-wide.
    """
    toks = tokens(documents)
    # N as a 1-row aggregate cross-joined in (Catalyst broadcasts the single
    # row) — no driver-side count() job at plan-build time, and the plan
    # stays lazy end to end.
    n_docs = documents.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df = toks.select("doc_id", "token").distinct().groupBy("token").agg(
        F.count(F.lit(1)).alias("df")
    )
    # No broadcast hint on df: the document-frequency table is the *vocabulary*
    # — corpus-scale it is millions of rows, so let Catalyst/AQE pick shuffle
    # vs broadcast from its measured size.
    scored = (
        tf.join(df, "token")
        .crossJoin(n_docs)
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * (F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0),
                6,
            ),
        )
        .drop("n_docs")
    )
    if max_doc_id is not None:
        scored = scored.filter(F.col("doc_id") < max_doc_id)
    from pyspark.sql import Window as W

    w = W.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("token").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= top_k)
        .select("doc_id", "rk", "token", "tf", "df", "tfidf")
    )


def repetition_metrics(documents: DataFrame) -> DataFrame:
    """X4 quality signals against degenerate/repetitive text (the published
    Gopher/C4-style heuristics): type-token ratio, most-frequent-token
    fraction, most-frequent-bigram fraction.

    One explode + two hash aggregates per n-gram order — word-count shape,
    map-side combinable, no UDF. LLM corpus filtering drops docs whose
    repetition fractions exceed thresholds; thresholds stay caller-side so
    the metric is reusable.
    """
    toks = tokens(documents)  # (doc_id, token)
    tok_counts = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("c"))
    tok_stats = tok_counts.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("c").alias("top_c"),
    )
    from pyspark.sql import Window as W

    from .dedup import _spread

    # lead-window bigrams (codegen) instead of interpreted transform/slice
    btoks = _spread(documents).select(
        "doc_id",
        F.posexplode(
            F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "")
        ).alias("pos", "tok"),
    )
    nxt = F.lead("tok", 1).over(W.partitionBy("doc_id").orderBy("pos"))
    big = (
        btoks.select(
            "doc_id", F.concat_ws(" ", F.col("tok"), nxt).alias("bigram"), nxt.alias("_n")
        )
        .filter(F.col("_n").isNotNull())
        .select("doc_id", "bigram")
    )
    big_counts = big.groupBy("doc_id", "bigram").agg(F.count(F.lit(1)).alias("c"))
    big_stats = big_counts.groupBy("doc_id").agg(
        F.sum("c").alias("n_bigrams"), F.max("c").alias("top_big_c")
    )
    return (
        tok_stats.join(big_stats, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            (F.col("n_distinct") / F.col("n_tokens")).alias("type_token_ratio"),
            (F.col("top_c") / F.col("n_tokens")).alias("top_token_frac"),
            (F.col("top_big_c") / F.col("n_bigrams")).alias("top_bigram_frac"),
        )
    )


#: RE2-and-Java-compatible patterns (the oracle runs them in DuckDB/RE2)
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
LONG_NUM_RE = r"[0-9]{6,}"


def redact_pii(documents: DataFrame) -> DataFrame:
    """X4 scrub stage: replace emails and long digit runs with typed
    placeholders, reporting per-doc match counts (the audit trail a corpus
    pipeline keeps). Pure regexp built-ins — JVM-side, codegen'd; patterns
    deliberately restricted to a syntax shared by Java regex and RE2 so the
    oracle reproduces them exactly."""
    n_emails = F.size(F.regexp_extract_all(F.col("text"), F.lit(EMAIL_RE), F.lit(0)))
    n_nums = F.size(F.regexp_extract_all(F.col("text"), F.lit(LONG_NUM_RE), F.lit(0)))
    redacted = F.regexp_replace(
        F.regexp_replace(F.col("text"), EMAIL_RE, "<EMAIL>"), LONG_NUM_RE, "<NUM>"
    )
    return documents.select(
        "doc_id",
        n_emails.alias("n_emails"),
        n_nums.alias("n_long_numbers"),
        redacted.alias("redacted_text"),
    )


# ---------------------------------------------------------------------------
# CCNet-style paragraph-level dedup (X1/X4 at sub-document granularity)
# ---------------------------------------------------------------------------

def paragraph_segments(documents: DataFrame, seg_words: int = 10) -> DataFrame:
    """Split each document into consecutive ``seg_words``-token segments —
    the corpus's "paragraphs" (the synthetic docs are single-line, so a
    fixed-width token window stands in for newline-split paragraphs; real
    corpora swap the splitter, the rest of the pipeline is unchanged).

    -> (doc_id, seg_idx, seg). posexplode + lead windows (whole-stage
    codegen) rather than interpreted transform/slice lambdas; the doc_id
    shuffle is reused by the downstream per-segment aggregates.
    """
    from pyspark.sql import Window as W

    from .dedup import _spread

    d = _spread(documents)
    toks = d.select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos", "tok")
    )
    w = W.partitionBy("doc_id").orderBy("pos")
    leads = [F.lead("tok", i).over(w) for i in range(1, seg_words)]
    # codegen'd window form (same rewrite as dedup.shingle_rows): segment
    # starts are positions divisible by seg_words; concat_ws skips the null
    # leads of the trailing partial segment
    return (
        toks.select(
            "doc_id",
            "pos",
            F.concat_ws(" ", F.col("tok"), *leads).alias("seg"),
        )
        .filter(F.col("pos") % seg_words == 0)
        .select(
            "doc_id",
            (F.col("pos") / seg_words).cast("int").alias("seg_idx"),
            "seg",
        )
    )


def paragraph_dedup_stats(documents: DataFrame, seg_words: int = 10) -> DataFrame:
    """Per-document paragraph-dedup accounting (CCNet-style: a segment is a
    duplicate if it occurs in >1 document; the single KEPT occurrence is the
    globally first (doc_id, seg_idx)).

    -> (doc_id, n_segs, n_dup_segs, n_kept). Scale shape: segments shuffle
    once on md5(seg) (16-byte keys, not text) for the frequency aggregate,
    then join back on the same key — partitioning reused, no window over the
    whole corpus. First-occurrence is min(struct(doc_id, seg_idx)) — a
    map-side-combinable argmin, not a per-key sort.
    """
    segs = paragraph_segments(documents, seg_words).withColumn(
        "seg_hash", F.md5("seg")
    )
    seg_stats = segs.groupBy("seg_hash").agg(
        F.countDistinct("doc_id").alias("df_docs"),
        F.min(F.struct("doc_id", "seg_idx")).alias("first_occ"),
    )
    joined = segs.join(seg_stats, "seg_hash")
    kept = (F.col("doc_id") == F.col("first_occ.doc_id")) & (
        F.col("seg_idx") == F.col("first_occ.seg_idx")
    )
    return joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_segs"),
        F.sum(F.when(F.col("df_docs") > 1, 1).otherwise(0)).alias("n_dup_segs"),
        F.sum(F.when(kept, 1).otherwise(0)).alias("n_kept"),
    )


def paragraph_dedup(documents: DataFrame, seg_words: int = 10) -> DataFrame:
    """The reassembled corpus after paragraph dedup: every duplicated segment
    survives only at its globally first (doc_id, seg_idx); each surviving
    document's text is its kept segments re-joined in order.

    -> (doc_id, dedup_text, n_kept). Documents whose every segment already
    appeared earlier vanish entirely (the aggregate is over kept segments
    only) — exact-duplicate docs fall out as a special case.
    """
    segs = paragraph_segments(documents, seg_words).withColumn(
        "seg_hash", F.md5("seg")
    )
    first = segs.groupBy("seg_hash").agg(
        F.min(F.struct("doc_id", "seg_idx")).alias("first_occ")
    )
    kept = segs.join(first, "seg_hash").filter(
        (F.col("doc_id") == F.col("first_occ.doc_id"))
        & (F.col("seg_idx") == F.col("first_occ.seg_idx"))
    )
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("seg_idx", "seg"))),
        lambda x: x["seg"],
    )
    return kept.groupBy("doc_id").agg(
        F.array_join(ordered, " ").alias("dedup_text"),
        F.count(F.lit(1)).alias("n_kept"),
    )


def boilerplate_segments(
    documents: DataFrame, seg_words: int = 10, min_df: int = 2, k: int = 20
) -> DataFrame:
    """Corpus boilerplate: segments occurring in >= ``min_df`` distinct
    documents, most-frequent first — the removal list a cleaning pipeline
    feeds back as a filter. -> (seg, df_docs, occurrences)."""
    segs = paragraph_segments(documents, seg_words)
    return (
        segs.groupBy("seg")
        .agg(
            F.countDistinct("doc_id").alias("df_docs"),
            F.count(F.lit(1)).alias("occurrences"),
        )
        .filter(F.col("df_docs") >= min_df)
        .orderBy(F.col("df_docs").desc(), F.col("seg").asc())
        .limit(k)
    )


# ---------------------------------------------------------------------------
# Training-set assembly: sequence packing and benchmark decontamination
# ---------------------------------------------------------------------------

def sequence_packing(
    documents: DataFrame, budget: int = 256, shard_col: str = "source"
) -> DataFrame:
    """Concatenate-and-chop packing of documents into fixed-token training
    sequences (the GPT-style pretraining layout): within each shard,
    documents concatenate in doc_id order and are chopped into
    ``budget``-token sequences.

    -> (shard, doc_id, n_tokens, seq_id, seq_offset, seq_spans): the
    sequence each document starts in, its token offset there, and how many
    sequences it crosses.

    Scale shape: the running total is a window partitioned BY SHARD — the
    natural parallel unit (each shard packs independently; a whole corpus is
    many shards). A single global ordering would serialize into one
    partition; sharded packing is both what production pipelines do and what
    scales.
    """
    from pyspark.sql import Window

    n_tok = F.size(F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != ""))
    docs = documents.select(
        F.col(shard_col).alias("shard"), "doc_id", n_tok.alias("n_tokens")
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    seq_id = F.floor(cum / budget).cast("long")
    last_seq = F.floor((cum + F.col("n_tokens") - 1) / budget).cast("long")
    return docs.select(
        "shard",
        "doc_id",
        "n_tokens",
        seq_id.alias("seq_id"),
        (cum % budget).cast("long").alias("seq_offset"),
        F.greatest(last_seq - seq_id + 1, F.lit(1).cast("long")).alias("seq_spans"),
    )


def benchmark_contamination(
    documents: DataFrame, gram_k: int = 8, benchmark_mod: int = 10
) -> DataFrame:
    """Eval-set decontamination accounting: docs with ``doc_id %
    benchmark_mod == 0`` stand in for the benchmark; every other (training)
    document is scored by how many of its distinct ``gram_k``-token n-grams
    appear anywhere in the benchmark.

    -> (doc_id, n_grams, n_hits, contamination) for training docs with at
    least one hit — the removal/review list.

    Scale shape: distinct benchmark grams are a one-column relation joined
    equi on the gram; Catalyst/AQE picks broadcast vs shuffle by its size
    (eval sets are tiny next to the corpus — this is the broadcast side).
    No pair enumeration: cost tracks gram matches, never |train| x |bench|.
    """
    from .dedup import shingle_rows

    bench = documents.filter(F.col("doc_id") % benchmark_mod == 0)
    train = documents.filter(F.col("doc_id") % benchmark_mod != 0)
    # hash each gram to a 64-bit md5 prefix BEFORE the distinct + join: the
    # shuffle then moves 8-byte keys instead of ~50-char strings (measured
    # 5.1 s -> see bench) and the oracle computes the identical hash, so any
    # (cosmically unlikely) collision affects both engines the same way
    gram_hash = lambda c: F.conv(  # noqa: E731
        F.substring(F.md5(c), 1, 16), 16, 10
    ).cast("decimal(38,0)")
    bench_grams = (
        shingle_rows(bench, k=gram_k)
        .select(gram_hash(F.col("s")).alias("gram"))
        .distinct()
    )
    train_grams = shingle_rows(train, k=gram_k).select(
        "doc_id", gram_hash(F.col("s")).alias("gram")
    )
    # ONE pass over the train grams: a left join against the (distinct, so
    # fanout-free) benchmark grams marks hits, then a single aggregate gets
    # both the total and the hit count — vs the two-branch form that ran the
    # whole shingle generation twice (once for totals, once for hits) and
    # joined the results back together (measured 2.4 s -> 2.0 s at sf0.1)
    marked = train_grams.join(
        bench_grams.withColumn("hit", F.lit(1)), "gram", "left"
    )
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count("hit").alias("n_hits"),
        )
        .filter(F.col("n_hits") > 0)
        .select(
            "doc_id",
            "n_grams",
            "n_hits",
            (F.col("n_hits").cast("double") / F.col("n_grams").cast("double")).alias(
                "contamination"
            ),
        )
    )


def dsir_importance(documents: DataFrame, target_source: str = "src0") -> DataFrame:
    """Data-selection importance weights (the DSIR recipe — Xie et al. 2023,
    arXiv:2302.03169 — reduced to its unigram form): score every non-target
    document by the mean log-likelihood ratio of its tokens under the target
    source's unigram distribution vs the rest of the corpus, add-one
    smoothed over the shared vocabulary. High scores = "looks like the
    target domain", the ranking used to resample a raw corpus toward a
    target mix.

    Scale shape: two aggregates over the exploded token relation (per-word
    counts, per-(doc,word) counts), a vocabulary-sized join that AQE sizes
    (never a forced broadcast — the vocabulary is corpus-sized at 100 TB),
    and a scalar 1-row totals relation cross-joined, not collected. The
    per-word log ratio is pinned to the DECIMAL(18,6) grid once, so the
    per-doc sum is order-independent (catalog determinism rule 2)."""
    toks = documents.select(
        "doc_id",
        "source",
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("token"),
    ).filter(F.col("token") != "")
    is_t = F.col("source") == target_source
    wc = toks.groupBy("token").agg(
        F.sum(F.when(is_t, 1).otherwise(0)).alias("c_t"),
        F.sum(F.when(~is_t, 1).otherwise(0)).alias("c_r"),
    )
    totals = wc.agg(
        F.sum("c_t").alias("n_t"),
        F.sum("c_r").alias("n_r"),
        F.count(F.lit(1)).alias("v"),
    )
    llr = wc.crossJoin(totals).select(
        "token",
        F.log(
            ((F.col("c_t") + 1.0) / (F.col("n_t") + F.col("v")))
            / ((F.col("c_r") + 1.0) / (F.col("n_r") + F.col("v")))
        )
        .cast("decimal(18,6)")
        .alias("llr"),
    )
    doc_tok = (
        toks.filter(~is_t).groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        doc_tok.join(llr, "token")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_tokens"),
            F.sum((F.col("cnt") * F.col("llr")).cast("decimal(18,6)")).alias("_s"),
        )
        .select(
            "doc_id",
            "n_tokens",
            (F.col("_s").cast("double") / F.col("n_tokens").cast("double")).alias(
                "dsir_score"
            ),
        )
    )


def lm_bigram_scores(documents: DataFrame) -> DataFrame:
    """Bigram language-model quality scoring (the CCNet/Gopher-style
    perplexity filter, self-trained): add-one-smoothed bigram probabilities
    P(w2|w1) trained on the corpus itself, every document scored by the
    mean negative log-probability of its bigrams. High scores = improbable
    text — the LM-filter signal used to drop boilerplate/garbage when no
    external LM is available.

    Scale shape: tokens via posexplode + lead window (codegen — NOTES rule
    7), ONE bigram relation reused for model counts and scoring; context
    counts and vocabulary are aggregates of that relation (the
    vocabulary-sized joins are left to AQE, never a forced broadcast —
    rule learned from tf_idf); the per-bigram log-prob is pinned to the
    DECIMAL(18,6) grid once so the per-doc mean is accumulation-order
    independent (rule 2, same recipe as dsir_importance).
    """
    from pyspark.sql import Window as W

    toks = documents.select(
        "doc_id",
        F.posexplode(
            F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != "")
        ).alias("pos", "tok"),
    )
    w = W.partitionBy("doc_id").orderBy("pos")
    nxt = F.lead("tok", 1).over(w)
    bg = (
        toks.select(
            "doc_id",
            F.col("tok").alias("w1"),
            F.concat_ws(" ", F.col("tok"), nxt).alias("bigram"),
            nxt.alias("_n"),
        )
        .filter(F.col("_n").isNotNull())
        .drop("_n")
    )
    # NOTE: bg feeds four consumers; measured localCheckpoint here — no win
    # (exchange reuse already covers it), so the plan stays fully lazy.
    c2 = bg.groupBy("bigram").agg(F.count(F.lit(1)).alias("n2"))
    c1 = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("n1"))
    v = bg.agg(
        F.countDistinct(F.substring_index("bigram", " ", -1)).alias("vsz")
    )
    scored = (
        bg.join(c2, "bigram")
        .join(c1, "w1")
        .crossJoin(v)  # 1-row scalar totals, never collected
        .select(
            "doc_id",
            F.log((F.col("n2") + 1.0) / (F.col("n1") + F.col("vsz")))
            .cast("decimal(18,6)")
            .alias("logp"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        (-F.sum("logp").cast("double") / F.count(F.lit(1))).alias("avg_nll"),
    )


def text_profile(documents: DataFrame) -> DataFrame:
    """Multi-metric per-document text profile over ONE token relation —
    the reuse pattern for corpus profiling at scale: ``tfidf_top_terms``,
    ``repetition_metrics`` and ``doc_lm_quality`` each re-explode the same
    tokens; here the explode and the per-(doc, token) count happen once and
    every metric derives from that relation. In the physical plan the
    second consumer of the (doc_id, token) aggregate picks up its shuffle
    as a ReusedExchange, so the corpus is tokenized and shuffled a single
    time (plan-asserted in tests/test_plans.py) — at 100 TB the explode is
    the dominant cost, and this shape pays it once for N metrics.

    Metrics per doc: token count, distinct-token count, type/token ratio,
    top-token share (Gopher-style repetition), and mean inverse document
    frequency of its distinct tokens (rarity; per-term values pinned to
    the decimal grid before summing so engines agree on the sum).

    The plan is strictly LINEAR — explode -> (doc, token) count ->
    document-frequency as a count over a token-partitioned window -> one
    final per-doc aggregate — no self-joins, so the single explode is a
    property of the plan's shape, not of exchange-reuse heuristics."""
    from pyspark.sql import Window as W

    toks = tokens(documents)
    tc = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("c"))
    # df(token) = rows in tc sharing the token (each row is a distinct doc)
    tc = tc.withColumn(
        "df", F.count(F.lit(1)).over(W.partitionBy("token"))
    )
    return tc.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        (
            F.count(F.lit(1)).cast("double") / F.sum("c")
        ).alias("type_token_ratio"),
        (F.max("c").cast("double") / F.sum("c")).alias("top_token_share"),
        (
            F.sum((F.lit(1.0) / F.col("df")).cast("decimal(18,12)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mean_inv_df"),
    )


def quality_classifier_scores(
    documents: DataFrame, n_buckets: int = 1 << 18
) -> DataFrame:
    """FastText-style linear quality classifier — the INFERENCE shape used
    to model-filter training corpora, expressed as pure relational algebra:
    hashed unigram + bigram features (feature hashing into ``n_buckets``),
    per-bucket weight lookup, mean pooling, linear score and keep/drop
    label. At 100 TB linear-classifier inference IS a projection + one
    hash aggregate per doc: one posexplode + lead window builds both
    feature families (codegen), no UDF, no Python, no model server.

    Weights here are a deterministic function of the bucket id in integer
    milli-units (``bucket % 2001 - 1000``) — a stand-in for learned
    parameters that keeps the whole pipeline integer-exact and therefore
    oracle-checkable; swapping in real learned weights is a broadcast
    (bucket, weight) join replacing the inline expression, same plan
    shape. Score = sum(milli)/1000/n — one double division at the end,
    accumulation-order independent because the sum is integral."""
    from pyspark.sql import Window as W

    toks = documents.select(
        "doc_id",
        F.posexplode(
            F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != "")
        ).alias("pos", "tok"),
    )
    w = W.partitionBy("doc_id").orderBy("pos")
    nxt = F.lead("tok", 1).over(w)
    uni = toks.select("doc_id", F.col("tok").alias("feat"))
    bi = (
        toks.select(
            "doc_id",
            F.concat_ws(" ", F.col("tok"), nxt).alias("feat"),
            nxt.alias("__n"),
        )
        .filter(F.col("__n").isNotNull())
        .select("doc_id", "feat")
    )
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.col("feat")), 1, 8), 16, 10).cast("long"),
        F.lit(n_buckets),
    )
    wm = F.pmod(bucket, F.lit(2001)) - F.lit(1000)  # milli-weight, [-1000, 1000]
    return (
        uni.unionByName(bi)
        .select("doc_id", wm.alias("wm"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_features"),
            F.sum("wm").cast("long").alias("sum_milli"),
        )
        .select(
            "doc_id",
            "n_features",
            (
                F.col("sum_milli").cast("double")
                / (F.lit(1000.0) * F.col("n_features"))
            ).alias("score"),
            (F.col("sum_milli") > 0).alias("keep"),
        )
    )
