"""Randomized cross-feature differential fuzz: column DEFAULTs, type
widening, flat renames, CHECKs, DML, compaction, and RESTORE interleave
in seeded random orders against an independent Python model of the table
content (with per-version snapshots so RESTORE is modeled exactly).
Single-feature behavior is tested feature-by-feature elsewhere; what this
hunts is the INTERACTIONS — a default filled through a renamed column, a
widened column surviving a restore past the widening, a check evaluated
over a defaulted write."""

from __future__ import annotations

import copy
import random
from decimal import Decimal

import pytest

from mb_crdb_cdc_dlgen2_synapse_spark.txlog import TxTable


def _norm(v):
    if isinstance(v, Decimal):
        return str(v.normalize())
    if isinstance(v, float):
        return f"{v:.6f}"
    return v


def _table_content(t: TxTable):
    df = t.read()
    cols = sorted(df.columns)
    return sorted(
        (tuple(_norm(r[c]) for c in cols) for r in df.collect()), key=repr
    ), cols


def _model_content(model):
    rows, cols = model["rows"], sorted(model["cols"])
    return sorted(
        (tuple(_norm(r.get(c)) for c in cols) for r in rows), key=repr
    ), cols


@pytest.mark.parametrize("seed", [11, 23, 47, 5, 83])
def test_cross_feature_interleave(spark, tmp_path, seed):
    rng = random.Random(seed)
    t = TxTable(spark, str(tmp_path / f"t{seed}"))
    t.append(
        spark.createDataFrame([(0, 100, "seed")], "k int, amt int, v string")
    )
    model = {
        "rows": [{"k": 0, "amt": 100, "v": "seed"}],
        "cols": ["k", "amt", "v"],
        "amt_type": "int",
        "defaults": {},
        "names": {},  # current -> original amt/v tracking not needed; flat
    }
    snapshots = {t.version(): copy.deepcopy(model)}
    next_k = 1

    def vcol():
        # the string column may have been renamed
        return "payload" if "payload" in model["cols"] else "v"

    for step in range(26):
        op = rng.choice(
            [
                "append", "append_subset", "default", "drop_default",
                "widen", "rename", "check_cycle", "update", "delete",
                "compact", "restore", "copy", "append_only_cycle",
                "trigram_index", "fsck_audit", "partition_spec",
            ]
        )
        try:
            if op == "copy":
                # COPY INTO an externally-staged file: the loaded-file set
                # must make re-runs of earlier drops no-ops even amid the
                # other features (schema-conformant: k-only, defaults fill)
                k = next_k
                next_k += 1
                src = str(tmp_path / f"src{seed}_{k}")
                spark.createDataFrame([(k,)], "k int").coalesce(1).write.mode(
                    "overwrite"
                ).parquet(src)
                import os as _os

                parts = [
                    _os.path.join(src, f)
                    for f in _os.listdir(src)
                    if f.endswith(".parquet")
                ]
                r = t.copy_into(parts)
                assert r["loaded_files"] == len(parts)
                assert t.copy_into(parts)["loaded_files"] == 0
                row = {"k": k}
                for c, expr in model["defaults"].items():
                    row[c] = expr
                model["rows"].append(row)
                snapshots[t.version()] = copy.deepcopy(model)
                continue  # two commits happened; snapshot taken, verify below
            if op == "append_only_cycle":
                t.set_properties({"appendOnly": "true"})
                for blocked in (
                    lambda: t.delete_where([("k", "==", 0)]),
                    lambda: t.overwrite(
                        spark.createDataFrame([(0,)], "k int")
                    ),
                ):
                    try:
                        blocked()
                        raise AssertionError("appendOnly did not block")
                    except ValueError:
                        pass
                t.set_properties({"appendOnly": None})
            elif op == "partition_spec":
                # partition EVOLUTION is layout-only: content (and the
                # model) must be invariant under any spec change, and
                # every later write/DML/compact must keep working over
                # the era mix. NULL spec values land under the hive
                # default partition and must read back as NULL. A rename
                # of the spec column must migrate the spec (a stale name
                # would blow up the next append's partitionBy loudly).
                t.set_partitioning(rng.choice([[], ["k"], [vcol()]]))
            elif op == "trigram_index":
                t.set_bloom_index([vcol()], bits=4096, mode="trigram")
            elif op == "fsck_audit":
                rep = t.fsck(dry_run=True)
                assert rep["missing_files"] == []
                assert t.orphan_sweep(dry_run=True)["would_remove"] == []
            elif op == "append":
                k = next_k
                next_k += 1
                amt = rng.randrange(1, 1000)
                if model["amt_type"] == "int":
                    schema_amt, pyv = "int", amt
                elif model["amt_type"] == "bigint":
                    schema_amt, pyv = "bigint", amt
                else:
                    schema_amt, pyv = model["amt_type"], Decimal(amt)
                row = {"k": k, "amt": pyv, vcol(): f"r{k}"}
                t.append(
                    spark.createDataFrame(
                        [(k, pyv, f"r{k}")],
                        f"k int, amt {schema_amt}, {vcol()} string",
                    )
                )
                model["rows"].append(dict(row))
            elif op == "append_subset":
                k = next_k
                next_k += 1
                t.append(spark.createDataFrame([(k,)], "k int"))
                row = {"k": k}
                for c, expr in model["defaults"].items():
                    row[c] = expr
                model["rows"].append(row)
            elif op == "default":
                c = vcol()
                t.set_column_default(c, "'dflt'")
                model["defaults"] = {c: "dflt"}
            elif op == "drop_default":
                c = vcol()
                t.drop_column_default(c)
                model["defaults"].pop(c, None)
            elif op == "widen":
                if model["amt_type"] == "int":
                    t.widen_column_type("amt", "bigint")
                    model["amt_type"] = "bigint"
                elif model["amt_type"] == "bigint":
                    t.widen_column_type("amt", "decimal(24,2)")
                    model["amt_type"] = "decimal(24,2)"
                    for r in model["rows"]:
                        if r.get("amt") is not None:
                            r["amt"] = Decimal(r["amt"]).quantize(
                                Decimal("0.01")
                            )
            elif op == "rename":
                if "payload" in model["cols"]:
                    t.rename_column("payload", "v")
                    new, old = "v", "payload"
                else:
                    t.rename_column("v", "payload")
                    new, old = "payload", "v"
                model["cols"] = [new if c == old else c for c in model["cols"]]
                model["defaults"] = {
                    (new if c == old else c): e
                    for c, e in model["defaults"].items()
                }
                for r in model["rows"]:
                    if old in r:
                        r[new] = r.pop(old)
            elif op == "check_cycle":
                t.add_check("k_nonneg", "k >= 0")
                t.drop_check("k_nonneg")
            elif op == "update":
                k = rng.randrange(next_k)
                t.update_where(
                    [("k", "==", k)], {vcol(): f"'u{step}'"},
                    mode=rng.choice(["cow", "dv"]),
                )
                for r in model["rows"]:
                    if r["k"] == k:
                        r[vcol()] = f"u{step}"
            elif op == "delete":
                k = rng.randrange(next_k)
                t.delete_where(
                    [("k", "==", k)], mode=rng.choice(["cow", "dv"])
                )
                model["rows"] = [r for r in model["rows"] if r["k"] != k]
            elif op == "compact":
                t.compact(target_files=rng.choice([1, 2]))
            else:  # restore
                v = rng.choice(sorted(snapshots))
                t.restore(v)
                model = copy.deepcopy(snapshots[v])
        except (ValueError, FileNotFoundError):
            # refused op (e.g. widen past the chain's end, restore to a
            # vacuumed version) — model unchanged, table unchanged
            pass
        snapshots[t.version()] = copy.deepcopy(model)
        got_rows, got_cols = _table_content(t)
        want_rows, want_cols = _model_content(model)
        assert got_cols == want_cols, f"step {step} ({op}): columns diverge"
        assert got_rows == want_rows, f"step {step} ({op}): content diverges"
