"""Learned BPE tokenizer (operators/bpe.py): merge learning reproduces the
published Sennrich et al. example, encoding is deterministic and
concat-exact, and the distributed encode equals the driver-side algorithm."""

from __future__ import annotations

from mb_crdb_cdc_dlgen2_synapse_spark.operators import bpe


def _corpus(spark, word_counts: dict[str, int]):
    rows = []
    did = 0
    for w, n in word_counts.items():
        for _ in range(n):
            rows.append((did, w))
            did += 1
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_train_reproduces_sennrich_example(spark):
    """The worked example from Sennrich et al. 2016 (and every BPE
    tutorial since): {low:5, lower:2, newest:6, widest:3} must learn
    (e,s), (es,t), (est,</w>), (l,o), (lo,w), ... in that order."""
    docs = _corpus(spark, {"low": 5, "lower": 2, "newest": 6, "widest": 3})
    merges = bpe.bpe_train(docs, n_merges=6)
    assert merges == [
        ("e", "s"), ("es", "t"), ("est", bpe.EOW),
        ("l", "o"), ("lo", "w"), ("e", "w"),
    ]
    ranks = {p: i for i, p in enumerate(merges)}
    assert bpe._encode_word("lowest", ranks) == ["low", "est" + bpe.EOW]
    assert bpe._encode_word("newest", ranks) == ["n", "ew", "est" + bpe.EOW]


def test_train_is_deterministic_and_tie_broken(spark):
    docs = _corpus(spark, {"aaaa": 3})
    merges = bpe.bpe_train(docs, n_merges=10)
    # (a,a) first; then ties (aa,aa) vs (aa,</w>) break lexicographically
    assert merges == [
        ("a", "a"), ("aa", bpe.EOW), ("aa", "aa" + bpe.EOW),
    ]
    assert bpe.bpe_train(docs, n_merges=10) == merges


def test_encode_concat_invariant_and_distributed_equality(spark):
    docs = spark.createDataFrame(
        [
            (0, "the cat sat on the mat"),
            (1, "the cats sat on the mats"),
            (2, "a completely unseen wordform zzzqx"),
        ],
        "doc_id long, text string",
    )
    merges = bpe.bpe_train(docs, n_merges=30)
    ranks = {p: i for i, p in enumerate(merges)}
    out = {r.doc_id: r for r in bpe.bpe_encode(docs, merges).collect()}
    for did, text in [(0, "the cat sat on the mat"),
                      (1, "the cats sat on the mats"),
                      (2, "a completely unseen wordform zzzqx")]:
        toks = out[did].tokens
        assert out[did].n_tokens == len(toks)
        # merges only concatenate: token concat reproduces words + EOW
        assert "".join(toks) == "".join(w + bpe.EOW for w in text.split())
        # distributed encode == driver algorithm, word by word
        expect = []
        for w in text.split():
            expect.extend(bpe._encode_word(w, ranks))
        assert toks == expect


def test_unknown_chars_fall_back_to_singletons(spark):
    docs = _corpus(spark, {"aaaa": 3})
    merges = bpe.bpe_train(docs, n_merges=10)
    # 'b' never seen: stays character-level, EOW unmerged
    toks = bpe._encode_word("bb", {p: i for i, p in enumerate(merges)})
    assert toks == ["b", "b", bpe.EOW]


def test_compression_actually_happens(spark):
    docs = spark.createDataFrame(
        [(i, "repetition " * 20) for i in range(10)],
        "doc_id long, text string",
    )
    merges = bpe.bpe_train(docs, n_merges=40)
    out = bpe.bpe_encode(docs, merges).collect()
    for r in out:
        # 20 copies of an 11-char word (10 chars + EOW): full merging
        # collapses each to ONE token
        assert r.n_tokens == 20
