"""Order-independent numeric aggregation.

Summing doubles is accumulation-order dependent, and at cluster scale the
order is nondeterministic (partitioning, AQE, speculative tasks) — so two
runs (or two engines) can disagree in the last bits, and *rounding doesn't
fix it* (engines also disagree on how to round a double: shortest-decimal
HALF_UP vs binary-nearest).

The fix used across the engine: money/measure columns in this domain live on
an exact 2-decimal grid (verified in tests), and their products on a 4/6
-decimal grid.  Precision stays at 18 so Spark keeps the long-backed
decimal fast path (precision >18 falls back to per-row BigDecimal — measured
~300x slower); 12 integer digits bound per-group sums at ~1e12, ample for the
bench scales, and a cluster deployment raising it pre-aggregates partial sums
per partition first.  Casting each row to DECIMAL(18,6) recovers the exact grid
value (per-row double error ~1e-10 « grid step), the decimal SUM is exact in
any order, and the final cast back to double is deterministic.  Per-row
scalar expressions need none of this: identical IEEE ops give bit-identical
doubles everywhere.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_DEC = "decimal(18,6)"


def exact_sum(col: Column | str) -> Column:
    """Accumulation-order-independent sum of a grid-decimal double column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(_DEC)).cast("double")


def exact_avg(col: Column | str) -> Column:
    """Deterministic mean: exact decimal sum / count(*). (NULL-free inputs.)"""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(_DEC)).cast("double") / F.count(F.lit(1))


def DSUM_SQL(expr: str) -> str:
    """DuckDB twin of exact_sum."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(30,6))) AS DOUBLE)"


def DAVG_SQL(expr: str) -> str:
    """DuckDB twin of exact_avg."""
    return f"({DSUM_SQL(expr)} / count(*))"
