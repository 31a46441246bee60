"""Edge-case robustness: empty inputs, degenerate documents, all-tombstone
streams — operators must degrade to empty/identity results, never throw."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from mb_crdb_cdc_dlgen2_synapse_spark.operators import cdc, dedup, textops
from mb_crdb_cdc_dlgen2_synapse_spark.operators.relational import pricing_summary

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, DOC_SCHEMA)


def test_empty_lineitem_aggregate(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").filter(F.lit(False))
    assert pricing_summary(li).count() == 0


def test_degenerate_documents(spark):
    docs = _docs(
        spark,
        [
            (1, "", "en", "s", 0),              # empty text
            (2, "   ", "en", "s", 3),           # whitespace only
            (3, "one", "en", "s", 3),           # single token (< shingle k)
            (4, "a b", "en", "s", 3),           # below trigram width
        ],
    )
    # tokenizers drop empties; shingles fall back to short joins; none throw
    assert textops.token_counts(docs).count() >= 1
    sh = dedup.word_shingles(docs).collect()
    ids = {r["doc_id"] for r in sh}
    assert 1 not in ids and 2 not in ids  # no tokens -> no shingle row
    assert {3, 4} <= ids
    assert dedup.minhash_signatures(docs).count() == 2
    assert textops.quality_scores(docs).count() == 4
    assert textops.fingerprints(docs).count() == 4


def test_all_tombstone_stream_merges_to_empty(spark):
    env_schema = T.StructType(
        [
            T.StructField("after", T.StructType([T.StructField("id", T.StringType())])),
            T.StructField("key", T.ArrayType(T.StringType())),
            T.StructField("updated", T.StringType()),
        ]
    )
    rows = [
        ({"id": "a"}, ["c", "a"], "100.0"),
        (None, ["c", "a"], "200.0"),
        ({"id": "b"}, ["c", "b"], "100.0"),
        (None, ["c", "b"], "300.0"),
    ]
    env = spark.createDataFrame(rows, env_schema)
    state = cdc.merge_full_image(env, ["key"], "updated")
    assert state.count() == 0


def test_duplicate_only_stream(spark):
    env_schema = "key array<string>, updated string, v double"
    env = spark.createDataFrame(
        [(["k1"], "1.0", 5.0)] * 4 + [(["k2"], "1.0", 7.0)] * 2, env_schema
    )
    assert cdc.dedup_events(env, ["key"], "updated").count() == 2


def test_jaccard_identical_docs_is_one(spark):
    docs = _docs(
        spark,
        [
            (1, "alpha beta gamma delta epsilon", "en", "s", 30),
            (2, "alpha beta gamma delta epsilon", "en", "s", 30),
            (3, "zeta eta theta iota kappa", "en", "s", 25),
        ],
    )
    pairs = dedup.jaccard_pairs(docs, threshold=0.99).collect()
    assert [(r["doc_a"], r["doc_b"], r["jaccard"]) for r in pairs] == [(1, 2, 1.0)]


def test_frame_sample_plan_fanout(spark):
    """X5: video frame-sampling fan-out — one row per sampled timestamp."""
    from mb_crdb_cdc_dlgen2_synapse_spark.operators import multimodal

    media = spark.createDataFrame(
        [(1, b"xx", "video/mp4", (None, None, 3000)), (2, b"y", "video/mp4", (None, None, 0))],
        multimodal.MEDIA_SCHEMA,
    )
    rows = multimodal.frame_sample_plan(media, every_ms=1000).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append(r["frame_ts_ms"])
    assert sorted(by_id[1]) == [0, 1000, 2000, 3000]
    assert by_id[2] == [0]


def test_decode_image_real_boundaries(spark):
    """Round 6: decode_image_real is REAL for image/png and image/jpeg
    (pure stdlib codecs) — malformed bytes fail with each codec's own
    error, and externally-coded mimes (H.264) still hit the explicit
    refusal."""
    from mb_crdb_cdc_dlgen2_synapse_spark.operators import multimodal

    import pytest as _pytest

    bad_png = spark.createDataFrame(
        [(1, b"xx", "image/png", (None, None, None))], multimodal.MEDIA_SCHEMA
    )
    with _pytest.raises(Exception, match="bad signature|not a PNG"):
        multimodal.decode_image_real(bad_png).collect()
    bad_jpeg = spark.createDataFrame(
        [(1, b"xx", "image/jpeg", (None, None, None))], multimodal.MEDIA_SCHEMA
    )
    with _pytest.raises(Exception, match="not a JPEG"):
        multimodal.decode_image_real(bad_jpeg).collect()
    video = spark.createDataFrame(
        [(1, b"xx", "video/h264", (None, None, None))], multimodal.MEDIA_SCHEMA
    )
    with _pytest.raises(Exception, match="external codec|NotImplementedError"):
        multimodal.decode_image_real(video).collect()


def test_duplicate_clusters_resolves_chains_and_singletons(spark):
    """Connected components: a chain a-b-c-d must collapse to ONE cluster
    (pairwise survivor-picking would get this wrong), singletons stay their
    own cluster, and survivors are exactly one per component."""
    from mb_crdb_cdc_dlgen2_synapse_spark.operators.dedup import duplicate_clusters

    docs = spark.createDataFrame([(i,) for i in range(1, 8)], "doc_id long")
    # chain 1-2-3-4, pair 5-6, singleton 7
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (5, 6)], "doc_a long, doc_b long"
    )
    got = {r.doc_id: r.cluster_id for r in duplicate_clusters(docs, pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 5, 7: 7}
    survivors = [d for d, c in got.items() if d == c]
    assert sorted(survivors) == [1, 5, 7]
    # convergence-checked loop: a 50-node chain collapses (pointer jump ~log rounds)
    docs50 = spark.createDataFrame([(i,) for i in range(1, 51)], "doc_id long")
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 50)], "doc_a long, doc_b long"
    )
    got50 = {
        r.doc_id: r.cluster_id
        for r in duplicate_clusters(docs50, chain).collect()
    }
    assert set(got50.values()) == {1}


def test_duplicate_clusters_matches_union_find_on_random_graphs(spark):
    """Seeded random graphs: the convergence-checked min-label propagation
    must agree exactly with a plain union-find reference."""
    import random

    from mb_crdb_cdc_dlgen2_synapse_spark.operators.dedup import duplicate_clusters

    rng = random.Random(7)
    for trial in range(3):
        n = 30
        edges = sorted(
            {tuple(sorted(rng.sample(range(1, n + 1), 2))) for _ in range(25)}
        )
        parent = list(range(n + 1))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            parent[find(a)] = find(b)
        expected = {d: min(x for x in range(1, n + 1) if find(x) == find(d)) for d in range(1, n + 1)}

        docs = spark.createDataFrame([(i,) for i in range(1, n + 1)], "doc_id long")
        pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
        got = {
            r.doc_id: r.cluster_id
            for r in duplicate_clusters(docs, pairs).collect()
        }
        assert got == expected, f"trial {trial} diverged"


def test_paragraph_dedup_no_duplicate_segments_survive(spark, sf_dir):
    """After paragraph dedup, re-segmenting the output yields globally
    unique segments, and untouched documents round-trip verbatim."""
    from mb_crdb_cdc_dlgen2_synapse_spark.operators import textops
    from mb_crdb_cdc_dlgen2_synapse_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    deduped = textops.paragraph_dedup(docs).withColumnRenamed("dedup_text", "text")
    resegs = textops.paragraph_segments(deduped.select("doc_id", "text"))
    # NOTE: reassembly concatenates kept segments, so segment boundaries in
    # the output shift where interior segments were dropped; uniqueness must
    # hold for documents that kept everything (boundaries preserved).
    intact = deduped.filter(
        F.col("n_kept") == F.ceil(F.size(F.split("text", " ")) / 10).cast("int")
    )
    intact_segs = resegs.join(intact.select("doc_id"), "doc_id")
    dupes = (
        intact_segs.groupBy("seg").count().filter(F.col("count") > 1).count()
    )
    assert dupes == 0
    # stats and reassembly agree on kept counts
    stats = textops.paragraph_dedup_stats(docs).withColumnRenamed(
        "n_kept", "n_kept_stats"
    )
    joined = deduped.join(stats, "doc_id")
    assert joined.filter(F.col("n_kept") != F.col("n_kept_stats")).count() == 0
    # a document with zero duplicated segments reassembles to its own text
    clean = joined.filter(F.col("n_dup_segs") == 0)
    orig = docs.select("doc_id", F.col("text").alias("orig"))
    mismatched = clean.join(orig, "doc_id").filter(F.col("text") != F.col("orig"))
    assert mismatched.count() == 0


def test_asof_join_semantics(spark):
    """<= inclusion at equal timestamps, NULL payloads before any right row,
    and carry-forward across multiple left rows."""
    from mb_crdb_cdc_dlgen2_synapse_spark.operators.relational import asof_join
    from pyspark.sql import functions as F

    left = spark.createDataFrame(
        [("u1", 5, "l1"), ("u1", 10, "l2"), ("u1", 2, "l0"), ("u2", 7, "l3")],
        "k string, t int, tag string",
    )
    right = spark.createDataFrame(
        [("u1", 5, 50.0), ("u1", 3, 30.0), ("u3", 1, 10.0)],
        "k string, t int, v double",
    )
    out = {
        r.tag: (r.asof_rt, r.asof_v, r.asof_matched)
        for r in asof_join(
            left,
            right.select("k", "t", F.col("t").alias("rt"), "v"),
            key="k", left_ts="t", right_ts="t", payload_cols=["rt", "v"],
        ).collect()
    }
    assert out["l0"] == (None, None, False)      # before any right row
    assert out["l1"] == (5, 50.0, True)          # equal ts matches (<=)
    assert out["l2"] == (5, 50.0, True)          # carried forward
    assert out["l3"] == (None, None, False)      # no right rows for key


def test_route_dead_letters_classes(spark):
    """Tombstones (after null, updated present) are VALID; malformed JSON and
    missing-updated lines get their reasons; nothing is dropped."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from mb_crdb_cdc_dlgen2_synapse_spark.operators.cdc import route_dead_letters

    after_schema = T.StructType(
        [T.StructField("city", T.StringType()), T.StructField("revenue", T.DoubleType())]
    )
    rows = [
        ('{"after": {"city": "x", "revenue": 1.5}, "key": ["x","1"], "updated": "1.0"}', "valid"),
        ('{"after": null, "key": ["x","2"], "updated": "2.0"}', "valid"),  # tombstone
        ('{"after": {"city": "y", "revenue": 2.0}, "key": ["y","3"]}', "missing_updated"),
        ('{"after": {"city":', "malformed_json"),
        ("", "malformed_json"),
        ("not json at all", "malformed_json"),
    ]
    df = spark.createDataFrame([(line,) for line, _ in rows], "line string")
    got = route_dead_letters(df, after_schema).select(
        "line", F.coalesce("dlq_reason", F.lit("valid")).alias("r")
    )
    assert got.count() == len(rows)
    by_line = {r.line: r.r for r in got.collect()}
    for line, want in rows:
        if line == "":
            continue  # the text source never yields empty lines; from_json(null-ish) below
        assert by_line[line] == want, line
    # empty string parses to all-null struct with corrupt capture
    assert by_line[""] in ("malformed_json", "missing_updated")


def test_semantic_dedup_degenerate_corpora(spark):
    """1-row corpus: trivially kept. Identical embeddings: all land in one
    bucket at cosine 1.0, exactly one survives."""
    from mb_crdb_cdc_dlgen2_synapse_spark.operators.dedup import semantic_dedup

    one = spark.createDataFrame(
        [(0, [1.0] * 64)], "vec_id long, embedding array<double>"
    )
    got = semantic_dedup(one, threshold=0.5).collect()
    assert len(got) == 1 and got[0].is_kept

    same = spark.createDataFrame(
        [(i, [1.0] * 64) for i in range(5)], "vec_id long, embedding array<double>"
    )
    rows = semantic_dedup(same, threshold=0.5).collect()
    assert len(rows) == 5
    assert all(r.cos_centroid == 1.0 for r in rows)
    assert sum(r.is_kept for r in rows) == 1  # keep-one policy


def test_hamming_topk_zero_vector(spark):
    """A zero vector quantizes to all-zero words (no sign bit set) and still
    ranks deterministically."""
    from mb_crdb_cdc_dlgen2_synapse_spark.operators.similarity import (
        binary_quantize,
        knn_hamming_topk,
    )

    emb = spark.createDataFrame(
        [(0, [0.0] * 64), (1, [1.0] * 64), (2, [-1.0] * 64)],
        "vec_id long, embedding array<double>",
    )
    bq = {r.vec_id: (r.b_lo, r.b_hi) for r in binary_quantize(emb).collect()}
    assert bq[0] == (0, 0) and bq[2] == (0, 0)
    assert bq[1] == (0xFFFFFFFF, 0xFFFFFFFF)
    q = emb.filter("vec_id = 0").selectExpr("vec_id as query_id", "embedding")
    top = knn_hamming_topk(emb, q, k=3).collect()
    # 0 and 2 share the code (distance 0, id tiebreak), 1 is 64 away
    assert [(r.rk, r.vec_id, r.hamming) for r in top] == [
        (1, 0, 0), (2, 2, 0), (3, 1, 64),
    ]


def test_lm_bigram_single_token_docs_are_excluded(spark):
    """Docs with <2 tokens contribute no bigrams and drop out of the score
    relation (no divide-by-zero, no NULL rows)."""
    from mb_crdb_cdc_dlgen2_synapse_spark.operators.textops import lm_bigram_scores

    docs = spark.createDataFrame(
        [(0, "single"), (1, "two tokens"), (2, "   "), (3, "a b a b a")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.n_bigrams for r in lm_bigram_scores(docs).collect()}
    assert got == {1: 1, 3: 4}


def test_profile_table_all_null_column(spark):
    from mb_crdb_cdc_dlgen2_synapse_spark.operators.relational import profile_table

    df = spark.createDataFrame(
        [(1, None), (2, None)], "k int, v string"
    )
    got = {r.column_name: r for r in profile_table(df, ["k", "v"]).collect()}
    assert got["v"].n_nulls == 2 and got["v"].n_distinct == 0
    assert got["v"].min_value is None and got["v"].max_value is None
    assert got["k"].n_distinct == 2


def test_scd2_empty_table(spark, tmp_path):
    from mb_crdb_cdc_dlgen2_synapse_spark.txlog import TxTable, scd2_history

    t = TxTable(spark, str(tmp_path / "t"))
    assert scd2_history(t).count() == 0
