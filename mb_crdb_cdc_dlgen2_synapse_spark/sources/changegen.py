"""Seeded CDC changefeed generator — the test-time analog of the reference's
``cockroach workload run movr`` traffic (/root/reference/README.md:140,148-153)
feeding ``CREATE CHANGEFEED ... WITH updated`` (README.md:135-138).

Produces date-partitioned NDJSON envelope files (layout per README.md:182 /
FIXTURES.md §B) with the realistic failure modes Structured Streaming must
absorb: at-least-once duplicate re-emissions, late-arriving files, UPDATE
churn, and DELETE tombstones (``after: null``).  The golden final state is
computed independently in plain Python and returned alongside, so merge
operators are replay-tested without a SQL oracle (SURVEY.md §5.2).
"""

from __future__ import annotations

import json
import os
import random
from dataclasses import dataclass, field
from datetime import datetime, timedelta, timezone

CITIES = (
    "amsterdam",
    "boston",
    "los angeles",
    "new york",
    "paris",
    "rome",
    "san francisco",
    "seattle",
    "washington dc",
)

_EPOCH = datetime(2022, 12, 12, tzinfo=timezone.utc)  # date dir in README.md:182


@dataclass
class ChangefeedFixture:
    landing_dir: str
    files: list[str]
    expected_state: list[dict]  # final rows after merge+tombstones
    n_events: int
    n_duplicates: int
    n_deletes: int
    n_updates: int
    row_schema: dict = field(default_factory=dict)


def _envelope(row: dict | None, key: list[str], updated_ns: int) -> str:
    return json.dumps(
        {"after": row, "key": key, "updated": f"{updated_ns}.0000000000"},
        sort_keys=True,
    )


def generate_changefeed(
    landing_dir: str,
    n_rows: int = 500,
    seed: int = 42,
    update_frac: float = 0.10,
    delete_frac: float = 0.05,
    duplicate_frac: float = 0.02,
    late_frac: float = 0.05,
    n_days: int = 3,
    rows_per_file: int = 200,
) -> ChangefeedFixture:
    """Emit a movr-``rides``-shaped changefeed into ``landing_dir``.

    Guarantees (matching documented changefeed semantics):
      - per-key ``updated`` strictly increasing (per-key ordering),
      - duplicates are exact re-emissions (at-least-once),
      - DELETE emits ``after: null`` with the row key,
      - ~``late_frac`` of events land in a *later* date dir than their
        event time (late arrival for watermark tests).
    """
    rng = random.Random(seed)
    base_ns = int(_EPOCH.timestamp() * 1_000_000_000)
    day_ns = 86400 * 1_000_000_000

    events: list[tuple[int, dict | None, list[str]]] = []  # (updated_ns, row, key)
    state: dict[str, dict] = {}
    per_key_last_ts: dict[str, int] = {}

    def next_ts(key: str, day: int) -> int:
        # per-key ordering guarantee: `updated` is strictly increasing for a
        # key even when the sampled day would move backwards (changefeeds
        # never emit an older version of a row after a newer one)
        cand = base_ns + day * day_ns + rng.randrange(0, day_ns // 2)
        ts = max(cand, per_key_last_ts.get(key, 0) + 1)
        per_key_last_ts[key] = ts
        return ts

    # INSERT for every row
    for i in range(n_rows):
        city = CITIES[i % len(CITIES)]
        rid = f"{seed:04x}-{i:08d}"
        row = {
            "city": city,
            "id": rid,
            "rider_id": f"r-{rng.randrange(0, max(2, n_rows // 3)):06d}",
            "revenue": round(rng.uniform(5.0, 120.0), 2),
        }
        ts = next_ts(rid, day=i * n_days // max(1, n_rows))
        events.append((ts, row, [city, rid]))
        state[rid] = dict(row)

    inserted = list(state.items())
    # UPDATEs: new revenue, later ts
    n_updates = int(n_rows * update_frac)
    for rid, row in rng.sample(inserted, n_updates):
        new_row = dict(row)
        new_row["revenue"] = round(rng.uniform(5.0, 120.0), 2)
        ts = next_ts(rid, day=rng.randrange(0, n_days))
        events.append((ts, new_row, [row["city"], rid]))
        state[rid] = new_row

    # DELETE tombstones: after = null (README.md:140 issues DELETEs)
    n_deletes = int(n_rows * delete_frac)
    for rid, row in rng.sample([kv for kv in inserted if kv[0] in state], n_deletes):
        ts = next_ts(rid, day=rng.randrange(0, n_days))
        events.append((ts, None, [row["city"], rid]))
        state.pop(rid, None)

    # exact duplicate re-emissions (at-least-once delivery)
    n_duplicates = int(len(events) * duplicate_frac)
    for ev in rng.sample(events, n_duplicates):
        events.append(ev)

    # assign each event to a date dir; some land late (next day's dir)
    events.sort(key=lambda e: e[0])
    lines_by_day: dict[int, list[str]] = {}
    for ts, row, key in events:
        day = min((ts - base_ns) // day_ns, n_days - 1)
        if rng.random() < late_frac:
            day = min(day + 1, n_days - 1)
        lines_by_day.setdefault(int(day), []).append(_envelope(row, key, ts))

    files: list[str] = []
    for day, lines in sorted(lines_by_day.items()):
        date = (_EPOCH + timedelta(days=day)).strftime("%Y-%m-%d")
        ddir = os.path.join(landing_dir, date)
        os.makedirs(ddir, exist_ok=True)
        for fi in range(0, len(lines), rows_per_file):
            path = os.path.join(ddir, f"{fi // rows_per_file:06d}.ndjson")
            with open(path, "w") as f:
                f.write("\n".join(lines[fi : fi + rows_per_file]) + "\n")
            files.append(path)

    return ChangefeedFixture(
        landing_dir=landing_dir,
        files=files,
        expected_state=sorted(state.values(), key=lambda r: r["id"]),
        n_events=len(events),
        n_duplicates=n_duplicates,
        n_deletes=n_deletes,
        n_updates=n_updates,
        row_schema={"city": "string", "id": "string", "rider_id": "string", "revenue": "double"},
    )
