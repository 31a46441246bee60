"""Ranked retrieval over the document corpus: BM25 lexical scoring,
token-set Jaccard ranking, and reciprocal-rank fusion (hybrid
lexical + vector retrieval) — the retrieval/eval layer a training-data
pipeline needs for corpus curation, contamination triage, and RAG-style
quality probes (reference serving tier: /root/reference/README.md:131-192,
ad-hoc ranked queries over the curated lake).

Public designs only: BM25 per Robertson & Zaragoza 2009 (the Lucene
``k1``/``b`` parameterization with the +1 idf floor, so idf stays
positive even for terms in most documents); RRF per Cormack, Clarke &
Buettcher 2009 (SIGIR) with the standard k=60.

Spark-first: tokenize/tf/df/dl are hash aggregates with map-side combine;
the query-term relation is broadcast (tiny by construction); no Python
UDFs anywhere — everything stays in WholeStageCodegen. The only
higher-order function is the per-(query, doc) score fold, which runs over
at most |query terms| elements (bounded, not a corpus-length hot loop —
NOTES rule 7 does not apply).

Determinism contract (cross-engine hash parity): the BM25 score is a SUM
of per-term double contributions, and a plain ``SUM()`` accumulates in
partition order — unstable across engines AND across Spark runs. The
score here is instead a *sorted fold*: contributions are collected,
sorted by term, and folded left-to-right, so the accumulation order is a
pure function of the data. The DuckDB oracle mirrors it with
``list_sum(list(c ORDER BY token))``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from .textops import tokens

#: Lucene-default BM25 parameters (public; Robertson & Zaragoza 2009 §3.2).
BM25_K1 = 1.2
BM25_B = 0.75

#: Standard RRF dampening constant (Cormack et al. 2009).
RRF_K = 60


def bm25_scores(
    documents: DataFrame,
    queries: DataFrame,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """BM25 score for every (query, document) pair matching >=1 query term.

    ``queries``: one row per query term, columns ``(query_id, term)``.
    Returns ``(query_id, doc_id, score)``.

    N (``n_docs``) counts documents with at least one token — identical to
    the doc-length relation's cardinality, so corpus stats come from ONE
    aggregation pass. ``avgdl`` is ``total_tokens / n_docs`` computed from
    exact integer sums (order-independent), not a float ``avg()``.
    """
    toks = tokens(documents)  # (doc_id, token), lowercased whitespace split
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("total_dl")
    )  # one row — scalar broadcast via crossJoin (established pattern)
    terms = queries.select("term").distinct()
    qtoks = toks.join(F.broadcast(terms), toks.token == terms.term).select(
        "doc_id", "token"
    )
    tf = qtoks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df_t = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    return bm25_score_from_stats(tf, df_t, dl, stats, queries, k1=k1, b=b)


def bm25_score_from_stats(
    tf: DataFrame,
    df_t: DataFrame,
    dl: DataFrame,
    stats: DataFrame,
    queries: DataFrame,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """The BM25 scoring tail over pre-computed statistics relations —
    shared by the corpus-scan path (:func:`bm25_scores`) and the
    inverted-index path (``operators.bm25_index``): ``tf`` (doc_id,
    token, tf), ``df_t`` (token, df), ``dl`` (doc_id, dl), ``stats`` a
    one-row (n_docs, total_dl). The arithmetic SHAPE here is the
    determinism contract — the DuckDB oracle mirrors it textually."""
    avgdl = F.col("total_dl").cast("double") / F.col("n_docs")
    idf = F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    denom = F.col("tf") + k1 * ((1.0 - b) + b * F.col("dl") / avgdl)
    contrib = ((idf * (F.col("tf") * (k1 + 1.0))) / denom).alias("c")

    scored = (
        tf.join(df_t, "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", "token", contrib)
    )
    matched = scored.join(
        F.broadcast(queries), scored.token == queries.term
    ).select("query_id", "doc_id", "token", "c")
    # Sorted fold: collect (token, contrib), sort by token, accumulate
    # left-to-right — the sum order is data-determined, never partition-
    # determined, so the score is bit-reproducible and oracle-matchable.
    folded = F.aggregate(
        F.array_sort(
            F.collect_list(F.struct(F.col("token").alias("t"), F.col("c").alias("c")))
        ),
        F.lit(0.0),
        lambda acc, x: acc + x["c"],
    )
    return matched.groupBy("query_id", "doc_id").agg(folded.alias("score"))


def bm25_rank(scored: DataFrame, k: int = 10) -> DataFrame:
    """Deterministic top-k ranking of a BM25 score relation: 6 dp
    rounding (the embedding-score convention) + doc_id tiebreak."""
    scored = scored.withColumn("score", F.round(F.col("score"), 6))
    w = W.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "rk", "doc_id", "score")
    )


def bm25_topk(
    documents: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Top-k documents per query by BM25, deterministic rank.

    Scores are rounded at 6 dp (the embedding-score convention — the one
    place a hair of cross-engine ``ln`` drift is possible) and ties break
    on ``doc_id``. Returns ``(query_id, rk, doc_id, score)``.
    """
    return bm25_rank(bm25_scores(documents, queries, k1=k1, b=b), k=k)


def lexical_jaccard_topk(
    documents: DataFrame, n_query_docs: int = 3, k: int = 20
) -> DataFrame:
    """Token-SET Jaccard ranking: for each query document (``doc_id <
    n_query_docs``), rank all documents sharing >=1 token by exact Jaccard
    over distinct-token sets. Candidate generation is a token equi-join —
    never a cross product. Jaccard is an exact integer ratio (bit-identical
    across engines); ties break on ``doc_id``.

    Returns ``(query_id, doc_id, lex_rk)``.
    """
    toks = tokens(documents).distinct()
    sizes = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    q = toks.filter(F.col("doc_id") < n_query_docs).select(
        F.col("doc_id").alias("query_id"), "token"
    )
    inter = (
        q.join(toks, "token")
        .groupBy("query_id", "doc_id")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sq = sizes.select(F.col("doc_id").alias("query_id"), F.col("n").alias("n_q"))
    sd = sizes.select("doc_id", F.col("n").alias("n_d"))
    jac = F.col("n_inter") / (F.col("n_q") + F.col("n_d") - F.col("n_inter"))
    w = W.partitionBy("query_id").orderBy(jac.desc(), F.col("doc_id").asc())
    return (
        inter.join(F.broadcast(sq), "query_id")
        .join(sd, "doc_id")
        .withColumn("lex_rk", F.row_number().over(w))
        .filter(F.col("lex_rk") <= k)
        .select("query_id", "doc_id", "lex_rk")
    )


def conjunctive_relevance(documents: DataFrame, queries: DataFrame) -> DataFrame:
    """Boolean-AND relevance judgments: a document is relevant to a query
    iff it contains EVERY query term (the classic boolean-retrieval
    ground truth for grading a ranked retriever). Exact and SQL-mirrorable:
    distinct doc tokens equi-join the term list, and a per-(query, doc)
    match count equal to the query's term count means all terms matched."""
    toks = tokens(documents).distinct()
    terms = queries.select("query_id", "term").distinct()
    qsz = terms.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_terms"))
    matched = (
        terms.join(toks, terms.term == toks.token)
        .groupBy("query_id", "doc_id")
        .agg(F.count(F.lit(1)).alias("m"))
    )
    return (
        matched.join(F.broadcast(qsz), "query_id")
        .filter(F.col("m") == F.col("n_terms"))
        .select("query_id", "doc_id")
    )


def retrieval_metrics(
    ranked: DataFrame, relevant: DataFrame, k: int = 10
) -> DataFrame:
    """Ranked-retrieval quality metrics per query: precision@k, MRR, and
    nDCG@k of ``ranked`` (query_id, rk, doc_id) against a ``relevant``
    relation (query_id, doc_id) — the eval layer for the BM25/hybrid
    retrieval stack (standard IR definitions, e.g. Manning et al., IIR).

    Cross-engine determinism: precision and MRR are exact integer
    ratios. DCG terms use 1/ln(rank+1) — nDCG is a RATIO, so the log
    base cancels and ``ln`` keeps both engines on the same libm call —
    accumulated with the same sorted-fold trick as the BM25 score
    (ascending rank), with the final ndcg rounded at 6 dp. The hit set
    comes from a LEFT SEMI join; queries with no relevant hits in the
    top-k report zeros (left join from the relevance side keeps them)."""
    hits = ranked.join(relevant, ["query_id", "doc_id"], "left_semi")
    dcg_fold = F.aggregate(
        F.array_sort(F.collect_list("rk")),
        F.lit(0.0),
        lambda acc, r: acc + F.lit(1.0) / F.log(r + F.lit(1.0)),
    )
    per_q = hits.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_hits"),
        F.min("rk").alias("first_hit"),
        dcg_fold.alias("dcg"),
    )
    n_rel = relevant.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_rel"))
    # ideal DCG: all of min(k, n_rel) relevant docs at the top ranks
    idcg = F.aggregate(
        F.sequence(F.lit(1), F.least(F.lit(k), F.col("n_rel"))),
        F.lit(0.0),
        lambda acc, i: acc + F.lit(1.0) / F.log(i + F.lit(1.0)),
    )
    return (
        n_rel.join(per_q, "query_id", "left")
        .select(
            "query_id",
            "n_rel",
            F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits"),
            (F.coalesce(F.col("n_hits"), F.lit(0)) / F.lit(k)).alias("p_at_k"),
            F.coalesce(
                F.lit(1.0) / F.col("first_hit"), F.lit(0.0)
            ).alias("mrr"),
            F.round(
                F.coalesce(F.col("dcg"), F.lit(0.0)) / idcg, 6
            ).alias("ndcg"),
        )
    )


def hashed_bow_embeddings(
    documents: DataFrame, dims: int = 64, id_col: str = "doc_id"
) -> DataFrame:
    """Feature-hashed bag-of-words embeddings (the hashing trick,
    Weinberger et al. 2009): each token maps to dimension
    ``md5_prefix(token) % dims`` and the embedding is the per-dimension
    token count as a dense ``array<double>``. Deterministic and
    ENGINE-MIRRORABLE (md5 is the repo's cross-engine hash convention),
    which makes it the seeded-corpus vector system for grading retrieval
    fusion: embeddings correlate with the text by construction — docs
    sharing tokens are cosine-close — yet rank differently than BM25
    (no idf, no length normalization), so the two systems genuinely
    disagree and fusion has something to fuse.

    Returns ``(vec_id, embedding)``. Zero-token documents are absent
    (they have no angle to compare)."""
    toks = tokens(documents.withColumnRenamed(id_col, "doc_id"))
    d = (F.conv(F.substring(F.md5("token"), 1, 8), 16, 10).cast("long") % dims)
    cnt = (
        toks.select("doc_id", d.alias("d"))
        .groupBy("doc_id", "d")
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
    )
    m = cnt.groupBy("doc_id").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("d", "w")))
        ).alias("m")
    )
    fill = F.transform(
        F.sequence(F.lit(0).cast("long"), F.lit(dims - 1).cast("long")),
        lambda i: F.coalesce(F.element_at(F.col("m"), i), F.lit(0.0)),
    )
    return m.select(F.col("doc_id").alias("vec_id"), fill.alias("embedding"))


def rrf_fuse(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    rank_col_a: str,
    rank_col_b: str,
    k: int = 10,
    k_rrf: int = RRF_K,
) -> DataFrame:
    """Reciprocal-rank fusion of two ranked lists (Cormack et al. 2009):
    ``rrf = 1/(k_rrf + rank_a) + 1/(k_rrf + rank_b)``, a document absent
    from one list contributes 0 from it (full outer join). The two-term
    sum has a FIXED textual order, so the fused score is bit-identical
    across engines with no rounding needed.

    Inputs carry ``(query_id, doc_id, <rank_col>)``. Returns
    ``(query_id, rk, doc_id, rrf)``.
    """
    a = ranked_a.select("query_id", "doc_id", rank_col_a)
    b = ranked_b.select("query_id", "doc_id", rank_col_b)
    fused = (
        a.join(b, ["query_id", "doc_id"], "full_outer")
        .withColumn(
            "rrf",
            F.coalesce(F.lit(1.0) / (F.lit(k_rrf) + F.col(rank_col_a)), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (F.lit(k_rrf) + F.col(rank_col_b)), F.lit(0.0)),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("rrf").desc(), F.col("doc_id").asc())
    return (
        fused.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "rk", "doc_id", "rrf")
    )
