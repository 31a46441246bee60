"""CROSS-PROCESS optimistic concurrency: the in-suite thread tests share
one interpreter (GIL serialization can mask filesystem CAS races), so this
fuzz races SEPARATE OS PROCESSES through the real ``_commit`` protocol —
each worker stages genuine parquet via pyarrow and commits through the
same put-if-absent + retry loop every writer path uses. The parent then
verifies the ACID ledger with Spark: contiguous versions, every commit
landed exactly once, content == union of all writers' rows.
"""

from __future__ import annotations

import os
import subprocess
import sys

from pyspark.sql import types as T

from mb_crdb_cdc_dlgen2_synapse_spark.txlog import TxTable

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import json, os, sys, uuid

sys.path.insert(0, sys.argv[4])
from mb_crdb_cdc_dlgen2_synapse_spark.txlog import TxTable, _footer_stats

import pyarrow as pa
import pyarrow.parquet as pq

path, wid, m = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
with open(os.path.join(path, "_schema.json")) as f:
    schema_json = f.read()
t = TxTable(None, path)  # spark unused by the commit protocol
versions = []
for i in range(m):
    rel = f"part-00000-{uuid.uuid4().hex}.c000.parquet"
    pq.write_table(
        pa.table({"w": pa.array([wid] * 3, pa.int64()),
                  "i": pa.array([i, i, i], pa.int64())}),
        os.path.join(path, rel),
    )
    st = _footer_stats(os.path.join(path, rel))
    v = t._commit([rel], lambda active: [], schema_json, None, "append",
                  stats={rel: st})
    versions.append(v)
print(json.dumps(versions))
"""


def test_multiprocess_writers_commit_exactly_once(spark, tmp_path):
    import json

    n_procs, m_commits = 4, 6
    tp = str(tmp_path / "t")
    TxTable(spark, tp)  # init log dir
    schema_json = T.StructType(
        [T.StructField("w", T.LongType()), T.StructField("i", T.LongType())]
    ).json()
    with open(os.path.join(tp, "_schema.json"), "w") as f:
        f.write(schema_json)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, tp, str(w), str(m_commits), _REPO],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for w in range(n_procs)
    ]
    per_worker = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, err[-2000:]
        per_worker.append(json.loads(out.strip().splitlines()[-1]))
    os.remove(os.path.join(tp, "_schema.json"))
    # every version won by exactly one process, ledger contiguous
    all_versions = [v for vs in per_worker for v in vs]
    total = n_procs * m_commits
    assert sorted(all_versions) == list(range(total))
    t = TxTable(spark, tp)
    assert t.version() == total - 1
    assert len(t.snapshot()[1]) == total
    # content: each (w, i) exactly 3 rows (one staged file each)
    rows = t.read().groupBy("w", "i").count().collect()
    assert {(r.w, r.i): r["count"] for r in rows} == {
        (w, i): 3 for w in range(n_procs) for i in range(m_commits)
    }
    # per-worker versions strictly increase (a retry never reorders a
    # process's own history)
    for vs in per_worker:
        assert vs == sorted(vs)
    # the log itself agrees: every commit is an append of exactly 1 file
    ops = [h["op"] for h in t.history()]
    assert ops == ["append"] * total


_MANIFEST_WORKER = r"""
import json, os, sys, uuid

sys.path.insert(0, sys.argv[4])
from mb_crdb_cdc_dlgen2_synapse_spark.txlog import TxTable, _footer_stats

import pyarrow as pa
import pyarrow.parquet as pq

path, wid, m = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
with open(os.path.join(path, "_schema.json")) as f:
    schema_json = f.read()
t = TxTable(None, path)
for i in range(m):
    rel = f"part-00000-{uuid.uuid4().hex}.c000.parquet"
    pq.write_table(
        pa.table({"w": pa.array([wid], pa.int64()),
                  "i": pa.array([i], pa.int64())}),
        os.path.join(path, rel),
    )
    st = _footer_stats(os.path.join(path, rel))
    t._commit([rel], lambda active: [], schema_json, None, "append",
              stats={rel: st})
print("done")
"""


def test_multiprocess_manifest_autoupdate_ends_at_head(spark, tmp_path):
    """manifest.autoUpdate under RACING WRITER PROCESSES: every commit's
    post-commit hook regenerates unordered, but the per-table lock + the
    monotone _version marker guarantee the published manifest ends at
    the head snapshot — external readers can never be left on a stale
    or mixed file list (the round-7 advisory scenario, cross-process)."""
    import json

    from pyspark.sql import types as T

    n_procs, m_commits = 3, 5
    tp = str(tmp_path / "t")
    t0 = TxTable(spark, tp)
    t0.append(spark.createDataFrame([(99, 0)], "w long, i long").coalesce(1))
    t0.set_properties({"manifest.autoUpdate": "true"})
    schema_json = T.StructType(
        [T.StructField("w", T.LongType()), T.StructField("i", T.LongType())]
    ).json()
    with open(os.path.join(tp, "_schema.json"), "w") as f:
        f.write(schema_json)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _MANIFEST_WORKER, tp, str(w),
             str(m_commits), _REPO],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for w in range(n_procs)
    ]
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, err[-2000:]
    os.remove(os.path.join(tp, "_schema.json"))
    t = TxTable(spark, tp)
    root = os.path.join(tp, TxTable.MANIFEST_DIR)
    uris = []
    for dirpath, _d, files in os.walk(root):
        if "manifest" in files:
            with open(os.path.join(dirpath, "manifest")) as f:
                uris += [ln.strip() for ln in f if ln.strip()]
    want = sorted(
        "file://" + os.path.join(t.path, rel) for rel in t._state()["active"]
    )
    assert sorted(uris) == want  # manifest == head, not stale, not mixed
    with open(os.path.join(root, "_version")) as f:
        assert int(f.read()) == t.version()
