"""Hypothesis property tests for the PURE metadata functions the txlog's
file pruning and the ANN probe planner rest on — soundness here is what
makes 'never opens the file' claims safe at 100 TB."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from mb_crdb_cdc_dlgen2_synapse_spark.operators.similarity import (
    prefix_probe_buckets,
)
from mb_crdb_cdc_dlgen2_synapse_spark.txlog import (
    _file_all_match,
    _file_may_match,
)

_OPS = ["==", ">=", ">", "<=", "<"]


def _eval(op: str, v: float, bound: float) -> bool:
    return {
        "==": v == bound,
        ">=": v >= bound,
        ">": v > bound,
        "<=": v <= bound,
        "<": v < bound,
    }[op]


bounds = st.tuples(
    st.integers(-50, 50), st.integers(-50, 50)
).map(lambda t: (min(t), max(t)))
preds = st.lists(
    st.tuples(st.just("c"), st.sampled_from(_OPS), st.integers(-60, 60)),
    min_size=1,
    max_size=3,
)


@settings(max_examples=300, deadline=None)
@given(bounds=bounds, predicates=preds, n_null=st.integers(0, 3))
def test_pruning_is_sound_and_all_match_is_exact(bounds, predicates, n_null):
    """may_match=False must PROVE no value in [lo, hi] satisfies the
    conjunction; all_match=True must prove EVERY value does (and requires
    zero nulls). Checked against brute-force evaluation over the range."""
    lo, hi = bounds
    stats = {
        "rows": hi - lo + 1 + n_null,
        "min": {"c": lo},
        "max": {"c": hi},
        "nulls": {"c": n_null},
    }
    values = list(range(lo, hi + 1))
    sat = [v for v in values if all(_eval(op, v, b) for _c, op, b in predicates)]
    may = _file_may_match(stats, {}, predicates)
    allm = _file_all_match(stats, {}, predicates)
    if not may:
        assert not sat  # soundness: pruned file provably holds no match
    if allm:
        # exactness: every row (incl. none null) satisfies everything
        assert n_null == 0 and len(sat) == len(values)
    if sat and len(sat) == len(values) and n_null == 0:
        # completeness of the metadata-only COUNT path is NOT required
        # (all_match may be conservatively False), but may_match must hold
        assert may


@settings(max_examples=200, deadline=None)
@given(
    prefix_bits=st.integers(1, 8),
    prefix=st.integers(0, 255),
    radius=st.integers(0, 3),
)
def test_prefix_probe_buckets_exact_ball(prefix_bits, prefix, radius):
    """The probe set is EXACTLY the Hamming ball: every bucket within
    `radius` bit flips of the prefix, nothing else, no duplicates."""
    prefix %= 1 << prefix_bits
    got = prefix_probe_buckets(prefix, prefix_bits, radius)
    ball = [
        b
        for b in range(1 << prefix_bits)
        if bin(b ^ prefix).count("1") <= radius
    ]
    assert got == sorted(ball)
    assert len(got) == len(set(got))


_bloom_vals = st.one_of(
    st.integers(-1000, 1000),
    st.text(
        alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd")),
        min_size=0,
        max_size=12,
    ),
)


@settings(max_examples=300, deadline=None)
@given(
    present=st.lists(_bloom_vals, min_size=0, max_size=40),
    probes=st.lists(_bloom_vals, min_size=1, max_size=10),
    m=st.sampled_from([64, 512, 4096]),
    k=st.integers(1, 4),
)
def test_bloom_filter_never_false_negative(present, probes, m, k):
    """The pure bloom core pruning rests on: a value that was INSERTED must
    always test maybe-present (false positives allowed, negatives never) —
    checked across filter sizes, hash counts, and int/str value mixes using
    the same build/probe position function production uses."""
    import base64

    from mb_crdb_cdc_dlgen2_synapse_spark.txlog import (
        _bloom_maybe_contains,
        _bloom_positions,
    )

    bits = bytearray(m // 8)
    for v in present:
        for h in _bloom_positions(v, k, m):
            bits[h >> 3] |= 1 << (h & 7)
    bl = {"m": m, "k": k, "b64": base64.b64encode(bytes(bits)).decode()}
    for v in present:
        assert _bloom_maybe_contains(bl, v)
    for v in probes:
        # a pruned (False) probe must be PROVABLY absent
        if not _bloom_maybe_contains(bl, v):
            assert v not in present
