"""Plan-inspection helpers: make physical-plan properties assertable in
tests (pushdown reached the scan, the dim join went broadcast, codegen
spans exist) instead of eyeballed — the engine's guard-rail against scale
regressions (SURVEY.md §4.3)."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries from every scan node in the physical plan."""
    txt = explain_str(df)
    return re.findall(r"PushedFilters: \[([^\]]*)\]", txt)


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df) or "BroadcastNestedLoopJoin" in explain_str(df)


def wholestage_codegen_spans(df: DataFrame) -> int:
    """Number of WholeStageCodegen subtrees — wider/fewer is better.

    Counts both formatted-mode nodes and simple-mode ``*(n)`` markers. Under
    AQE the markers only appear in the final plan, so callers checking an
    unexecuted plan should build the DataFrame with
    ``spark.sql.adaptive.enabled=false`` in effect.
    """
    txt = explain_str(df) + explain_str(df, "simple")
    ids = set(re.findall(r"WholeStageCodegen \((\d+)\)", txt))
    ids |= set(re.findall(r"\*\((\d+)\)", txt))
    return len(ids)
