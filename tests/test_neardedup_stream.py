"""Streaming NEAR-dup dedup sink (txlog.stream_neardedup_to_tx_table):
differential-tested against an independent Python model that replays the
exact semantics — md5-arithmetic MinHash signatures, band-collision
candidates, exact shingle-Jaccard, within-batch connected components —
plus restart idempotence and the signature-superset invariant."""

from __future__ import annotations

import hashlib
import json as _json
import re

from pyspark.sql import functions as F

from mb_crdb_cdc_dlgen2_synapse_spark.operators.dedup import (
    MINHASH_P,
    minhash_params,
)
from mb_crdb_cdc_dlgen2_synapse_spark.txlog import (
    TxTable,
    stream_neardedup_to_tx_table,
)

PARAMS = minhash_params(16)
THRESH = 0.5


def _shingles(text: str) -> frozenset[str]:
    toks = [t for t in re.split(r"\s+", text.lower()) if t]
    if not toks:
        return frozenset()
    if len(toks) < 3:
        return frozenset([" ".join(toks)])
    return frozenset(" ".join(toks[i : i + 3]) for i in range(len(toks) - 2))


def _sig(sh: frozenset[str]) -> tuple[int, ...]:
    hs = [
        int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % MINHASH_P for s in sh
    ]
    return tuple(min((a * h + b) % MINHASH_P for h in hs) for a, b in PARAMS)


def _bands(sig) -> set[tuple]:
    return {(b, sig[b * 4 : (b + 1) * 4]) for b in range(4)}


def _jac(a: frozenset, b: frozenset) -> float:
    return len(a & b) / len(a | b)


def _model(batches):
    """The sink's contract, independently: per batch — exact dedup (min
    doc_id per normalized text), within-batch Jaccard components (min-id
    representative), then vs-corpus drop when any committed doc shares a
    band AND has Jaccard >= THRESH."""
    committed: list[tuple[int, frozenset, tuple]] = []
    for batch in batches:
        seen_norm: dict[str, int] = {}
        firsts = []
        for doc_id, text in sorted(batch):
            norm = re.sub(r"\s+", " ", text.lower())
            if norm not in seen_norm:
                seen_norm[norm] = doc_id
                firsts.append((doc_id, text))
        # within-batch components over exact-Jaccard pairs (>=1 shared shingle)
        parent = {d: d for d, _ in firsts}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        sh = {d: _shingles(t) for d, t in firsts}
        ids = [d for d, _ in firsts]
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                if sh[a] & sh[b] and _jac(sh[a], sh[b]) >= THRESH:
                    ra, rb = find(a), find(b)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
        reps = [d for d in ids if find(d) == d]
        for d in reps:
            s = sh[d]
            sg = _sig(s) if s else None
            dup = False
            for _cd, cs, csg in committed:
                if (
                    sg is not None
                    and csg is not None
                    and _bands(sg) & _bands(csg)
                    and _jac(s, cs) >= THRESH
                ):
                    dup = True
                    break
            if not dup:
                committed.append((d, s, sg))
    return sorted(d for d, _s, _g in committed)


B1 = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "The  Quick brown fox jumps over the lazy dog"),  # exact (normalized)
    (3, "completely different words entirely here today"),
    (4, "the quick brown fox jumps over the lazy dog extra tail tokens"),
]
B2 = [
    (5, "the quick brown fox jumps over the lazy dog"),  # cross-batch exact
    (6, "completely different words entirely here today plus more"),
    (7, "seven unique tokens appear within this string"),
]
B3 = [
    (8, "the quick brown fox jumps over the lazy dog extra tail tokens x"),
    (9, "nine totally fresh vocabulary items never used before"),
]


def _run(spark, land, table_dir, sig_dir, cp_dir):
    stream = spark.readStream.schema("doc_id long, text string").json(str(land))
    stream_neardedup_to_tx_table(
        stream, table_dir, sig_dir, cp_dir
    ).awaitTermination()


def test_streaming_matches_python_model(spark, tmp_path):
    land = tmp_path / "land"
    land.mkdir()
    dirs = (str(tmp_path / "state"), str(tmp_path / "sigs"), str(tmp_path / "cp"))
    for i, batch in enumerate([B1, B2, B3]):
        with open(land / f"b{i}.ndjson", "w") as f:
            for doc_id, text in batch:
                f.write(_json.dumps({"doc_id": doc_id, "text": text}) + "\n")
        _run(spark, land, *dirs)

    got = sorted(r.doc_id for r in TxTable(spark, dirs[0]).read().collect())
    assert got == _model([B1, B2, B3])

    # restart with no new data: txn no-op on both tables
    v_state = TxTable(spark, dirs[0]).version()
    v_sigs = TxTable(spark, dirs[1]).version()
    _run(spark, land, *dirs)
    assert TxTable(spark, dirs[0]).version() == v_state
    assert TxTable(spark, dirs[1]).version() == v_sigs

    # signature-superset invariant: every committed doc has band entries
    state_ids = {r.doc_id for r in TxTable(spark, dirs[0]).read().collect()}
    sig_ids = {r.doc_id for r in TxTable(spark, dirs[1]).read().collect()}
    assert state_ids <= sig_ids
