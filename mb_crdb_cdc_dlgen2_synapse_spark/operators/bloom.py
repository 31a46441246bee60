"""Bloom filter as a RELATION (SURVEY.md §2.8 X1 scale hardening): the
dedup-on-ingest pre-filter the txlog dedup sink's docstring promises.

A bloom filter over content hashes is represented as a small (word, bits)
DataFrame — ``word = position // 32``, ``bits`` = OR of ``1 << (position %
32)`` — so the filter is built, merged, persisted, and probed entirely with
JVM built-ins (md5-prefix hashing via ``conv``, ``bit_or`` aggregation,
bitwise probe): no UDF, no driver-side bitmap, no serialized sketch blob.

Why a relation and not a sketch object: word-wise OR of two blooms IS the
bloom of the union (same mergeability as the HLL/KLL sketches in
``operators/sketches.py``), so maintenance is one tiny groupBy — and the
probe is a broadcast join against at most ``n_bits/32`` rows (32 KB-scale
for a million-bit filter), which every executor evaluates locally.

Guarantees: NO false negatives (an inserted key always probes positive —
property-tested), bounded false positives (~``(1 - e^{-kn/m})^k``; at the
default m=2^18, k=4 that is <2.4% up to ~32k keys — rebuild wider as state
grows). Deterministic md5-derived positions keep every result
oracle-checkable in DuckDB (same ``('0x'||substr(md5(..)))`` arithmetic).

At 100 TB: the streaming dedup sink's exact anti-join must probe EVERY
batch key against committed state; with the bloom in front, keys that miss
(the common case for mostly-new corpora) skip the exact check entirely,
and only bloom hits (true dups + <fp-rate noise) reach the state-hash
anti-join — the probe side of the expensive join shrinks from |batch| to
|dups + fp|. The bloom table itself is txlog-committed BEFORE the state
append, so a crash between the two commits leaves the bloom a superset of
state (extra candidates get exact-checked — never a missed duplicate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: filter width in bits (2^18 = 262,144 -> 8,192 words of 32 bits)
DEFAULT_N_BITS = 1 << 18
#: hash functions per key
DEFAULT_N_HASHES = 4


def _position(key_col, i: int, n_bits: int):
    """Deterministic position i for a key: first 8 hex digits of
    md5(key || ':' || i) mod n_bits — non-negative, < 2^32, identical
    arithmetic in the DuckDB oracle."""
    return F.pmod(
        F.conv(
            F.substring(F.md5(F.concat(key_col, F.lit(f":{i}"))), 1, 8), 16, 10
        ).cast("long"),
        F.lit(n_bits),
    )


def build_bloom(
    df: DataFrame,
    key_col: str,
    n_bits: int = DEFAULT_N_BITS,
    n_hashes: int = DEFAULT_N_HASHES,
) -> DataFrame:
    """(word, bits) bloom relation over ``df[key_col]``: one explode to
    k positions per key, one hash aggregate — partial ``bit_or`` combines
    map-side, so the shuffle carries at most n_bits/32 words per task
    regardless of input size."""
    pos = F.explode(
        F.array(*[_position(F.col(key_col), i, n_bits) for i in range(n_hashes)])
    ).alias("pos")
    return (
        df.select(pos)
        .select(
            (F.col("pos") / 32).cast("long").alias("word"),
            F.pmod(F.col("pos"), 32).cast("int").alias("bit"),
        )
        .groupBy("word")
        .agg(F.bit_or(F.expr("shiftleft(1L, bit)")).alias("bits"))
    )


def merge_blooms(a: DataFrame, b: DataFrame) -> DataFrame:
    """Word-wise OR — the bloom of the UNION of the two key sets (the
    mergeable-sketch property; merged == rebuilt is test-asserted)."""
    return (
        a.unionByName(b).groupBy("word").agg(F.bit_or(F.col("bits")).alias("bits"))
    )


def with_membership(
    df: DataFrame,
    key_col: str,
    bloom: DataFrame,
    n_bits: int = DEFAULT_N_BITS,
    n_hashes: int = DEFAULT_N_HASHES,
    out_col: str = "maybe_seen",
) -> DataFrame:
    """``df`` + boolean ``out_col``: True iff EVERY position's bit is set
    (so False is a PROOF the key was never inserted). The bloom side
    broadcasts (<= n_bits/32 rows); the probe is k rows per distinct key,
    re-grouped by key — input rows sharing a key probe once."""
    keys = df.select(F.col(key_col)).distinct()
    probe = keys.select(
        key_col,
        F.explode(
            F.array(
                *[_position(F.col(key_col), i, n_bits) for i in range(n_hashes)]
            )
        ).alias("pos"),
    ).select(
        key_col,
        (F.col("pos") / 32).cast("long").alias("word"),
        F.pmod(F.col("pos"), 32).cast("int").alias("bit"),
    )
    hit = (
        F.col("bits").isNotNull()
        & (F.expr("shiftright(bits, bit)").bitwiseAND(F.lit(1)) == 1)
    ).cast("int")
    verdict = (
        probe.join(F.broadcast(bloom), "word", "left")
        .select(key_col, hit.alias("hit"))
        .groupBy(key_col)
        .agg((F.min("hit") == 1).alias(out_col))
    )
    return df.join(verdict, key_col, "left")
