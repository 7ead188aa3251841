"""Deterministic numeric aggregation helpers.

Why these exist: double-precision SUM/AVG are not associative, so a
parallel Spark aggregation and a single-threaded oracle (DuckDB) can
differ in the last bits — enough to break a value-hash comparison and,
at 100 TB, enough to make reruns non-reproducible.  The fix is exact
fixed-point accumulation: cast each row's value (itself a deterministic
per-row double expression) to a wide DECIMAL, SUM exactly (order no
longer matters), then cast back to double and round.  The per-row cast is
deterministic in both engines; the decimal sum is exact; the final
cast/round is a single deterministic operation.

The matching ANSI-SQL fragments for the DuckDB oracle are produced by
``sql_exact_sum`` / ``sql_exact_avg`` so the Spark plan and the oracle are
generated from one definition.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: wide enough for SUM over ~1e12 rows of 1e6-scale money values
_ACC = "decimal(30,6)"


def exact_sum(col: Column | str, round_to: int = 2) -> Column:
    """Order-independent SUM of a double expression (see module doc)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast(_ACC)).cast("double"), round_to)


def exact_avg(col: Column | str, round_to: int = 6) -> Column:
    """Order-independent AVG: exact decimal sum / count, rounded."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast(_ACC)).cast("double") / F.count(c), round_to)


def sql_exact_sum(expr: str, round_to: int = 2) -> str:
    """DuckDB-side fragment identical to :func:`exact_sum`."""
    return f"round(cast(sum(cast(({expr}) as decimal(30,6))) as double), {round_to})"


def sql_exact_avg(expr: str, round_to: int = 6) -> str:
    """DuckDB-side fragment identical to :func:`exact_avg`."""
    return (
        f"round(cast(sum(cast(({expr}) as decimal(30,6))) as double)"
        f" / count(({expr})), {round_to})"
    )


def dot(a: Column, b: Column) -> Column:
    """Double-precision dot product of two float-array columns, computed
    left-to-right (deterministic) entirely JVM-side.

    ``F.aggregate(zip_with(a,b,*), 0.0, +)`` folds in array order, which
    matches a simple in-order loop in the oracle.
    """
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    sq = F.transform(a, lambda x: x.cast("double") * x.cast("double"))
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two float-array columns (double math)."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
