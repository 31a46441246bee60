"""Single-pass closed-form linear models over EXACT sufficient statistics
— the scalable way to fit a quality probe / calibration line on a 100 TB
corpus: one aggregation pass builds the normal-equation sums, a k×k solve
(k = a handful of features) happens on the driver, and scoring is a pure
per-row expression. No iteration, no gradient passes, no model state on
executors.

Reproducibility design: features are INTEGER-valued expressions, so every
sufficient statistic is an exact integer sum — invariant to partitioning,
row order, and engine (a float Σx² differs in the last ulp across
shuffles; an integer one cannot). The solve then happens either

- ``simple_ridge``: the 1-feature closed form with the SAME float
  operation shape an ANSI-SQL engine would use (cast-then-divide), so an
  external oracle reproduces the coefficients BIT-FOR-BIT — this is what
  the ``doc_quality_linear_probe`` gate certifies; or
- ``ridge_fit``: general small-k ridge via an EXACT rational solve
  (python big-int Fractions over the integer normal equations, correctly
  rounded to float once at the end) — deterministic to the last bit
  regardless of condition number, something float Gaussian elimination
  cannot promise.

Reference parity: the reference stack scores documents with SQL
expressions over OPENROWSET scans (/root/reference/README.md:173-192);
this module is the train-the-scorer step expressed in the same
one-pass-aggregate vocabulary.
"""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def suff_stats(
    df: DataFrame, x_cols: list[Column | str], y_col: Column | str
) -> dict:
    """ONE aggregation producing the exact normal-equation sums for a
    linear fit with intercept: ``n``, ``sx[i]``, ``sy``, ``sxx[i][j]``
    (i<=j), ``sxy[i]`` — all python ints (Spark ``sum(long)`` is exact;
    overflow is the caller's contract: |x|·|y|·rows must fit int64 per
    term, which holds for any count/length-style feature at any corpus
    size that fits a cluster). Cost: one map-side-combinable aggregate,
    shuffle of ONE row."""
    xs = [F.col(c).cast("long") if isinstance(c, str) else c.cast("long") for c in x_cols]
    y = (F.col(y_col) if isinstance(y_col, str) else y_col).cast("long")
    k = len(xs)
    aggs = [F.count(F.lit(1)).alias("n")]
    aggs += [F.sum(xs[i]).alias(f"sx{i}") for i in range(k)]
    aggs += [F.sum(y).alias("sy")]
    aggs += [
        F.sum(xs[i] * xs[j]).alias(f"sxx{i}_{j}")
        for i in range(k)
        for j in range(i, k)
    ]
    aggs += [F.sum(xs[i] * y).alias(f"sxy{i}") for i in range(k)]
    r = df.agg(*aggs).collect()[0]  # bounded: ONE row of k(k+3)/2+2 ints
    return {
        "k": k,
        "n": int(r["n"]),
        "sx": [int(r[f"sx{i}"]) for i in range(k)],
        "sy": int(r["sy"]),
        "sxx": {
            (i, j): int(r[f"sxx{i}_{j}"])
            for i in range(k)
            for j in range(i, k)
        },
        "sxy": [int(r[f"sxy{i}"]) for i in range(k)],
    }


def simple_ridge(stats: dict, l2: int = 0) -> tuple[float, float]:
    """1-feature ridge closed form, float ops in the exact shape an
    ANSI-SQL oracle writes them (integer numerator/denominator, ONE cast
    to double each, one divide) — bit-reproducible across engines:

        slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)² + l2)
        intercept = (Σy − slope·Σx) / n
    """
    if stats["k"] != 1:
        raise ValueError("simple_ridge takes 1-feature stats; use ridge_fit")
    n, sx, sy = stats["n"], stats["sx"][0], stats["sy"]
    sxx, sxy = stats["sxx"][(0, 0)], stats["sxy"][0]
    slope = float(n * sxy - sx * sy) / float(n * sxx - sx * sx + int(l2))
    intercept = (float(sy) - slope * float(sx)) / float(n)
    return slope, intercept


def ridge_fit(
    df: DataFrame,
    x_cols: list[Column | str],
    y_col: Column | str,
    l2: int = 0,
) -> list[float]:
    """General small-k ridge with intercept: solve
    ``(Xᵀ X + l2·I') β = Xᵀ y`` (``I'`` = identity over the k features,
    no intercept penalty — the standard convention) EXACTLY over the
    integer sufficient statistics using big-int rationals, rounding to
    float once at the end. Returns ``[intercept, b1..bk]``.

    Why exact: float Gaussian elimination on ill-conditioned normal
    equations is partition-order-stable here (the sums are exact) but
    still rounds per pivot; Fractions make the fitted coefficients a
    PURE FUNCTION of the data — the determinism every other operator in
    this engine promises. k is a handful, so the O(k³) rational solve is
    driver-trivial."""
    s = suff_stats(df, x_cols, y_col)
    k = s["k"]
    # augmented normal matrix over [1, x1..xk]
    def sxx(i: int, j: int) -> int:
        return s["sxx"][(i, j) if i <= j else (j, i)]

    a: list[list[Fraction]] = []
    b: list[Fraction] = []
    for i in range(k + 1):
        row = []
        for j in range(k + 1):
            if i == 0 and j == 0:
                v = s["n"]
            elif i == 0:
                v = s["sx"][j - 1]
            elif j == 0:
                v = s["sx"][i - 1]
            else:
                v = sxx(i - 1, j - 1) + (int(l2) if i == j else 0)
            row.append(Fraction(v))
        a.append(row)
        b.append(Fraction(s["sy"] if i == 0 else s["sxy"][i - 1]))
    # exact Gaussian elimination with partial (magnitude) pivoting
    for col in range(k + 1):
        piv = max(range(col, k + 1), key=lambda r: abs(a[r][col]))
        if a[piv][col] == 0:
            raise ValueError(
                "singular normal equations (collinear features); add l2"
            )
        a[col], a[piv] = a[piv], a[col]
        b[col], b[piv] = b[piv], b[col]
        for r in range(col + 1, k + 1):
            f = a[r][col] / a[col][col]
            if f:
                for c in range(col, k + 1):
                    a[r][c] -= f * a[col][c]
                b[r] -= f * b[col]
    beta = [Fraction(0)] * (k + 1)
    for i in range(k, -1, -1):
        acc = b[i]
        for j in range(i + 1, k + 1):
            acc -= a[i][j] * beta[j]
        beta[i] = acc / a[i][i]
    return [float(v) for v in beta]


def score(df: DataFrame, x_cols: list[Column | str], beta: list[float]) -> Column:
    """Per-row prediction ``β0 + Σ βi·xi`` as a pure codegen expression —
    scoring 100 TB is a narrow projection, no shuffle, no python."""
    xs = [F.col(c) if isinstance(c, str) else c for c in x_cols]
    pred: Column = F.lit(float(beta[0]))
    for bi, x in zip(beta[1:], xs):
        pred = pred + F.lit(float(bi)) * x.cast("double")
    return pred
