"""Winnowing fingerprints (operators/textops.winnowing_*): the MOSS
selection guarantee and the partial-duplication property that motivates the
operator over whole-document MinHash."""

from __future__ import annotations

import random

from mb_crdb_cdc_dlgen2_synapse_spark.operators import textops


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_shared_run_guarantees_shared_fingerprint(spark):
    """Any shared token run of >= window+k-1 (= 6) tokens must contribute at
    least one shared selected hash — across random surroundings."""
    rng = random.Random(7)
    shared = "alpha beta gamma delta epsilon zeta"  # 6 tokens
    rows = []
    for i in range(12):
        pre = " ".join(f"u{i}w{j}{rng.randint(0, 9)}" for j in range(rng.randint(0, 15)))
        post = " ".join(f"v{i}x{j}{rng.randint(0, 9)}" for j in range(rng.randint(0, 15)))
        rows.append((i, f"{pre} {shared} {post}".strip()))
    fps = textops.winnowing_fingerprints(_docs(spark, rows)).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    common = set.intersection(*by_doc.values())
    assert common, "every doc embeds the same 6-token run: must share a fingerprint"


def test_partial_dup_found_where_minhash_jaccard_is_diluted(spark):
    """A 30-token plagiarized block inside a 300-token novel doc: whole-doc
    Jaccard is far below any dedup threshold, but winnowing still pairs the
    two docs."""
    rng = random.Random(11)
    block = " ".join(f"stolen{j}" for j in range(30))
    noise_a = " ".join(f"a{j}{rng.randint(0, 9)}" for j in range(270))
    noise_b = " ".join(f"b{j}{rng.randint(0, 9)}" for j in range(270))
    docs = _docs(spark, [(1, f"{noise_a} {block}"), (2, f"{block} {noise_b}")])
    pairs = textops.winnowing_dup_candidates(docs, min_shared=3).collect()
    assert [(p.doc_a, p.doc_b) for p in pairs] == [(1, 2)]
    # the same pair's shingle Jaccard is tiny (~30/570) — below thresholds
    from mb_crdb_cdc_dlgen2_synapse_spark.operators.dedup import jaccard_pairs

    assert jaccard_pairs(docs, threshold=0.5).isEmpty()


def test_every_nonempty_doc_fingerprints_and_df_cap_drops_boilerplate(spark):
    rows = [(i, "tiny doc") for i in range(25)] + [(100, "x y z w q r s t u v")]
    fps = textops.winnowing_fingerprints(_docs(spark, rows))
    assert fps.select("doc_id").distinct().count() == 26  # short docs included
    # 'tiny doc' appears in 25 docs > max_fp_docs=20: df-cap removes it, so
    # no candidate pairs survive
    assert textops.winnowing_dup_candidates(
        _docs(spark, rows), min_shared=1
    ).isEmpty()
