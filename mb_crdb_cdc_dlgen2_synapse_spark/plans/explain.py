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
    """Number of WholeStageCodegen subtrees — wider/fewer is better."""
    return len(set(re.findall(r"WholeStageCodegen \((\d+)\)", explain_str(df))))
