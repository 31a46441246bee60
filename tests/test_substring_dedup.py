"""Substring-level (ExactSubstr-style) dedup semantics on a hand-crafted
corpus: duplicated >=L-token runs found, merged maximally, trimmed with the
global-first-occurrence keeper protected, and sub-L duplication invisible.
"""

from __future__ import annotations

import pytest

from mb_crdb_cdc_dlgen2_synapse_spark.operators import dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id int, text string")


W = [f"w{i}" for i in range(100)]  # distinct filler vocabulary


def test_exact_duplicate_run_found_and_merged(spark):
    # doc 0 and doc 1 share tokens s0..s9 (a 10-token run); L=4 grams give
    # starts 0..6 in each -> ONE maximal span [start, start+9] per doc.
    shared = " ".join(f"s{i}" for i in range(10))
    d = _docs(
        spark,
        [
            (0, shared + " " + " ".join(W[:5])),
            (1, " ".join(W[5:11]) + " " + shared),
        ],
    )
    spans = {
        (r.doc_id): (r.span_start, r.span_end, r.span_tokens, r.n_grams)
        for r in dedup.duplicate_spans(d, gram_words=4).collect()
    }
    assert spans[0] == (0, 9, 10, 7)
    assert spans[1] == (6, 15, 10, 7)


def test_sub_threshold_duplication_invisible(spark):
    # 3 shared tokens < L=4: no duplicated gram, no spans.
    d = _docs(
        spark,
        [(0, "a b c " + " ".join(W[:6])), (1, " ".join(W[6:12]) + " a b c")],
    )
    assert dedup.duplicate_spans(d, gram_words=4).count() == 0


def test_adjacent_coverage_merges_single_island(spark):
    # Within-doc repeat: doc 0 = R R with R of 4 tokens and L=4. Gram starts
    # 0 and 4 both duplicated (gram at 0 == gram at 4), starts 1..3 straddle
    # the boundary and are unique -> coverage [0,3] and [4,7] is contiguous
    # and must merge into one span [0,7].
    run = "r0 r1 r2 r3"
    d = _docs(spark, [(0, run + " " + run), (1, " ".join(W[:8]))])
    spans = dedup.duplicate_spans(d, gram_words=4).collect()
    assert len(spans) == 1
    r = spans[0]
    assert (r.doc_id, r.span_start, r.span_end, r.span_tokens) == (0, 0, 7, 8)


def test_stats_union_not_occurrence_sum(spark):
    shared = " ".join(f"s{i}" for i in range(10))
    d = _docs(
        spark,
        [
            (0, shared + " " + " ".join(W[:5])),
            (1, " ".join(W[5:11]) + " " + shared),
        ],
    )
    stats = {r.doc_id: r for r in dedup.substring_dedup_stats(d, gram_words=4).collect()}
    # doc 0: 15 tokens, 12 grams, 7 duplicated, 10 covered (union, not 7*4)
    assert stats[0].n_tokens == 15
    assert stats[0].n_grams == 12
    assert stats[0].n_dup_grams == 7
    assert stats[0].dup_tokens == 10
    assert stats[0].dup_fraction == pytest.approx(10 / 15)
    # every doc appears, zeros included
    d2 = _docs(spark, [(0, " ".join(W[:6])), (1, " ".join(W[6:12]))])
    zero = {r.doc_id: r for r in dedup.substring_dedup_stats(d2, gram_words=4).collect()}
    assert zero[0].dup_tokens == 0 and zero[1].dup_fraction == 0.0


def test_trim_keeps_global_first_occurrence_only(spark):
    shared = " ".join(f"s{i}" for i in range(10))
    tail0 = " ".join(W[:5])
    head1 = " ".join(W[5:11])
    d = _docs(spark, [(0, shared + " " + tail0), (1, head1 + " " + shared)])
    out = {r.doc_id: r for r in dedup.substring_dedup_trim(d, gram_words=4).collect()}
    # doc 0 holds the keeper occurrence (min (doc_id, pos)) -> untouched
    assert out[0].trimmed_text == shared + " " + tail0
    assert out[0].n_removed == 0
    # doc 1 loses exactly the shared run
    assert out[1].trimmed_text == head1
    assert out[1].n_removed == 10
    assert out[1].n_tokens == 16


def test_trim_drops_fully_duplicated_doc(spark):
    body = " ".join(f"s{i}" for i in range(8))
    d = _docs(spark, [(0, body), (1, body)])
    out = dedup.substring_dedup_trim(d, gram_words=4)
    rows = {r.doc_id: r for r in out.collect()}
    assert set(rows) == {0}  # doc 1 trimmed to nothing vanishes
    assert rows[0].trimmed_text == body


def test_within_doc_repeat_keeps_first_copy(spark):
    # R R with no other doc involved: keeper gram occurrences protect the
    # first copy; tokens covered ONLY by non-keeper occurrences go.
    run = " ".join(f"r{i}" for i in range(6))
    d = _docs(spark, [(0, run + " " + run), (1, " ".join(W[:8]))])
    out = {r.doc_id: r for r in dedup.substring_dedup_trim(d, gram_words=4).collect()}
    t = out[0].trimmed_text.split(" ")
    # first copy fully present at the front
    assert t[:6] == run.split(" ")
    # strictly fewer than the original 12 tokens survive
    assert out[0].n_removed > 0
