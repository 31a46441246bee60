"""Learned byte-pair-encoding tokenizer (X4/X6): train merge rules from
the corpus, tokenize the corpus distributed — the Sennrich et al. 2016
algorithm in the industry-standard two-phase shape.

Why this split is the 100 TB design:

- **Training** operates on the WORD-FREQUENCY table, never the corpus:
  one distributed ``explode -> groupBy(word)`` pass builds it (shuffle
  keyed on words, map-side combined), and only its Zipf HEAD (``top_words``
  rows, default 50k) comes to the driver — a bounded fetch by parameter,
  not corpus size. Merge learning on the head is what GPT-2/SentencePiece
  style trainers do: tail words contribute almost no pair mass, and the
  encoder handles them compositionally anyway. The driver loop is pure
  Python over a dict of at most ``top_words`` entries.
- **Encoding** is the corpus-scale phase and is fully distributed: the
  learned merge ranks broadcast (a few KB), an Arrow-batched
  ``mapInPandas`` applies them per word with a per-batch word memo (Zipf
  again: a batch's distinct-word count is far below its token count), and
  nothing driver-side scales with the data.

Determinism: merge selection breaks count ties lexicographically, so the
same corpus always learns the same rules; tests pin the paper's worked
example ({low:5, lower:2, newest:6, widest:3} -> (e,s), (es,t),
(est,</w>), ...) and a hand-computed tie-break case.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: end-of-word sentinel (Sennrich's </w>): lets merges distinguish
#: word-final pairs and makes detokenization exact
EOW = "</w>"


def word_frequencies(
    documents: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, count) over whitespace tokenization — the relation BPE
    training consumes. One explode + one combine-friendly groupBy."""
    return (
        documents.select(
            F.explode(F.split(F.col(text_col), r"\s+")).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("count"))
    )


def bpe_train(
    documents: DataFrame,
    n_merges: int = 200,
    text_col: str = "text",
    top_words: int = 50_000,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merge rules. Distributed word counting; the
    driver trains on the top-``top_words`` head of the frequency table
    (bounded by parameter — see module docstring for why that is the
    honest shape, not a shortcut)."""
    head = (
        word_frequencies(documents, text_col)
        .orderBy(F.col("count").desc(), F.col("word"))
        .limit(top_words)
        .collect()
    )
    vocab: dict[tuple[str, ...], int] = {
        # r["count"], not r.count — Row.count is the tuple method
        tuple(r.word) + (EOW,): r["count"] for r in head
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, cnt in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + cnt
        if not pairs:
            break
        # deterministic: max count, ties broken lexicographically
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < 2:
            break
        merges.append(best)
        a, b = best
        ab = a + b
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, cnt in vocab.items():
            out = []
            i = 0
            n = len(syms)
            while i < n:
                if i + 1 < n and syms[i] == a and syms[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + cnt
        vocab = new_vocab
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Classic greedy BPE: repeatedly merge the lowest-rank adjacent pair."""
    syms = list(word) + [EOW]
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


BPE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("tokens", T.ArrayType(T.StringType()), True),
        T.StructField("n_tokens", T.IntegerType(), True),
    ]
)


def bpe_encode(
    documents: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
) -> DataFrame:
    """Tokenize every document with the learned merges -> (doc_id, tokens,
    n_tokens). Arrow-batched ``mapInPandas`` with the ranks broadcast in
    the closure (KBs) and a per-batch word memo — per-document work is
    O(distinct new words), the Zipf discount every production tokenizer
    banks on. Invariant (tested + oracled): concatenating a word's tokens
    reproduces word + EOW exactly — merges only ever concatenate."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, list[str]] = {}
        for pdf in it:
            ids, toks, counts = [], [], []
            for did, text in zip(pdf["doc_id"], pdf[text_col]):
                out: list[str] = []
                for w in str(text).split():
                    got = memo.get(w)
                    if got is None:
                        got = memo[w] = _encode_word(w, ranks)
                    out.extend(got)
                ids.append(did)
                toks.append(out)
                counts.append(len(out))
            yield pd.DataFrame(
                {"doc_id": ids, "tokens": toks, "n_tokens": counts}
            )

    return documents.select("doc_id", text_col).mapInPandas(
        batches, BPE_SCHEMA
    )
