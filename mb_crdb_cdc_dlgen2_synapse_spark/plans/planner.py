"""Cost-based plan CONSTRUCTION from table metadata — SURVEY.md §4.2's two
candidate custom logics, built as plain Python above the DataFrame API (not
a Catalyst extension: the engine shapes the plan declaratively and the
optimizer's own rules stay in charge of everything else).

Why this layer exists at 100 TB: Catalyst's own broadcast decision sees
only scan-level size ESTIMATES (file bytes before predicate pruning), and
operator choices like "brute-force vs LSH-bucketed candidate generation"
live entirely above the plan. The txlog commit log already records exact
per-file ``rows``/``bytes`` plus column min/max (harvested at write time,
`txlog.py:_footer_stats`), so both decisions can be made from METADATA
ONLY — zero file I/O, zero Spark jobs, correct under predicate pruning.

Reference analog: Synapse serverless makes the same scan-size-driven
distribution decisions invisibly (/root/reference/README.md:181-192 runs
on the "Built-in" pool); here the policy is explicit, testable code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: explicit-broadcast ceiling: sides whose LOGGED bytes (after predicate
#: file-pruning) stay under this are broadcast regardless of Catalyst's
#: scan-level estimate. Matches session.py's autoBroadcastJoinThreshold
#: philosophy but uses post-pruning metadata, which Catalyst cannot see.
BROADCAST_MAX_BYTES = 64 << 20

#: below this many corpus rows, all-pairs candidate generation (one
#: shuffle, no signature computation) beats MinHash/LSH's fixed cost;
#: above it the banded-LSH path is the only shape that avoids n².
LSH_MIN_ROWS = 100_000

#: below this many corpus rows a brute-force top-k scan (one corpus pass,
#: query side broadcast) beats building/probing an ANN structure.
#: MEASURED (scripts/ann_recall_curve.py, 64-dim, 20 queries, k=10,
#: local[16]): at 10k rows the bucketed probe's fixed cost leaves only
#: ~1.26x over brute (build 2.5 s dominates); at 100k it is 3.4x with
#: recall@10 = 1.0 (prefix_bits=4, radius=1); at 1M it is 16.9x
#: (probe 3.9 s vs brute 66.5 s), still recall 1.0. The curve crosses
#: decisively between 10k and 100k — 100k is the conservative edge.
ANN_MIN_ROWS = 100_000


def tx_size_estimate(table, predicates: list[tuple] | None = None) -> dict:
    """{"rows", "bytes", "files"} for a txlog table — from the commit log's
    per-file stats only (no storage listing, no file I/O, no job). With
    ``predicates``, counts only files whose logged min/max or hive
    partition values may match (the same pruning rule reads use), so the
    estimate reflects what a pruned scan would actually touch. Rows are an
    upper bound under predicates (file granularity); DV-deleted rows are
    subtracted exactly (logged per-file counts).

    Stats and partition values go through the table's LOGICAL-name
    accessors (file_stats / _parts): predicates speak logical names, so on
    a column-mapped (renamed) table the raw physical-keyed state would
    silently prune nothing and inflate the estimate."""
    from ..txlog import _file_may_match

    state = table._state()
    stats = table.file_stats()  # logical-keyed per-file stats
    dv_counts = state["dv_counts"]
    rows = byts = files = 0
    for f in state["active"]:
        st = stats.get(f) or {}
        if predicates and not _file_may_match(
            st, table._parts(f, state["colmap"]), predicates
        ):
            continue
        files += 1
        rows += (st.get("rows") or 0) - dv_counts.get(f, 0)
        byts += st.get("bytes") or 0
    return {"rows": rows, "bytes": byts, "files": files}


def choose_join_strategy(
    left_est: dict, right_est: dict, threshold_bytes: int = BROADCAST_MAX_BYTES
) -> dict:
    """Pick the join construction from two size estimates. Policy: broadcast
    the smaller side if it fits (dim-to-fact — the fact side never
    shuffles); otherwise a plain shuffle join, with a note when both sides
    are large enough that bucketing/pre-partitioning the lake by the join
    key (operators/bucketing.py) would remove the exchange entirely."""
    l_b, r_b = left_est.get("bytes") or 0, right_est.get("bytes") or 0
    small, side = (l_b, "left") if l_b <= r_b else (r_b, "right")
    if small <= threshold_bytes:
        return {
            "strategy": f"broadcast_{side}",
            "reason": f"{side} side {small} B <= {threshold_bytes} B "
            f"(logged, post-pruning): dim broadcast, fact never shuffles",
        }
    return {
        "strategy": "shuffle",
        "reason": f"both sides exceed {threshold_bytes} B — one shuffle each "
        f"on the key; co-locate with bucketed layout to remove it",
    }


def planned_equi_join(
    left: DataFrame,
    right: DataFrame,
    on,
    left_est: dict,
    right_est: dict,
    how: str = "inner",
    threshold_bytes: int = BROADCAST_MAX_BYTES,
) -> tuple[DataFrame, dict]:
    """Construct the join per ``choose_join_strategy`` and return
    (joined DataFrame, the decision record). The broadcast hint is explicit
    — it holds even where Catalyst's scan-size estimate would refuse (its
    estimate ignores the predicate file-pruning the metadata reflects)."""
    decision = choose_join_strategy(left_est, right_est, threshold_bytes)
    if decision["strategy"] == "broadcast_left":
        out = F.broadcast(left).join(right, on, how)
    elif decision["strategy"] == "broadcast_right":
        out = left.join(F.broadcast(right), on, how)
    else:
        out = left.join(right, on, how)
    return out, decision


def choose_dedup_strategy(corpus_est: dict, threshold_rows: int = LSH_MIN_ROWS) -> dict:
    """SURVEY §4.2(b): near-dup candidate generation by corpus size.
    Small corpora: exact shingle-bucket all-candidates (jaccard_pairs) —
    no signature cost, still never n² (bucket equi-join). At scale: banded
    MinHash-LSH (lsh_candidates), whose candidate volume is tunable by
    bands×rows instead of growing with shared-shingle frequency."""
    n = corpus_est.get("rows") or 0
    if n < threshold_rows:
        return {
            "strategy": "shingle_buckets",
            "reason": f"{n} rows < {threshold_rows}: skip signatures, "
            f"exact shingle-bucket candidates + Jaccard",
        }
    return {
        "strategy": "minhash_lsh",
        "reason": f"{n} rows >= {threshold_rows}: banded LSH bounds "
        f"candidate volume independent of shingle hotness",
    }


def ann_recall_floor(prefix_bits: int, radius: int) -> float:
    """WORST-CASE recall of the bucketed Hamming probe — the
    radius-vs-recall trade stated with numbers. A query whose prefix
    dimensions sit ON the hyperplane margins has a ~uniform prefix
    relative to its true neighbor, so the neighbor is found only when
    <= radius of the prefix_bits coin-flips disagree:

        floor = sum_{i<=radius} C(prefix_bits, i) / 2^prefix_bits

    which equals the probed bucket fraction — in the adversarial regime
    you buy recall LINEARLY in scan fraction. MEASURED
    (scripts/ann_recall_curve.py, boundary regime, 10k-100k rows):
    p4/r1 0.25-0.40 (floor 0.3125), p4/r2 0.60-0.80 (floor 0.6875),
    p6/r1 0.10-0.20 (floor 0.1094), p6/r2 0.30-0.45 (floor 0.3438),
    p8/r1 0.05 (floor 0.0352), p8/r2 0.14-0.15 (floor 0.1445) — the
    binomial model tracks the measurement within query-sample noise.
    Near-neighbor-distributed queries (the perturbed regime, and what
    embedding retrieval usually serves) measure recall 1.0 at every
    setting; use the floor when the query stream is NOT guaranteed
    neighbor-like: p4/r2 is the smallest config whose worst case stays
    above 2/3."""
    from math import comb

    return sum(comb(prefix_bits, i) for i in range(radius + 1)) / (
        1 << prefix_bits
    )


def choose_knn_strategy(corpus_est: dict, threshold_rows: int = ANN_MIN_ROWS) -> dict:
    """X3 retrieval path by corpus size: brute-force cosine (exact, one
    corpus pass) until the corpus outgrows it, then the bucketed-probe
    Hamming pipeline (binary codes in an LSH-prefix-partitioned table,
    file-pruned probes + exact re-rank — operators/similarity.py).
    Recall guidance under adversarial query streams: ``ann_recall_floor``
    (measured + analytic)."""
    n = corpus_est.get("rows") or 0
    if n < threshold_rows:
        return {
            "strategy": "brute_force",
            "reason": f"{n} rows < {threshold_rows}: exact single-pass scan "
            f"beats ANN build+probe",
        }
    return {
        "strategy": "hamming_bucketed",
        "prefix_bits": 4,
        "radius": 2,
        "reason": f"{n} rows >= {threshold_rows}: probe bucket-pruned "
        f"binary codes, re-rank survivors exactly; p4/r2 keeps the "
        f"adversarial recall floor at {ann_recall_floor(4, 2):.2f} "
        f"(near-neighbor queries measure 1.0); pass "
        f"probed_hamming_topk(min_recall=...) to auto-escalate the "
        f"radius when the query stream is not guaranteed neighbor-like",
    }
