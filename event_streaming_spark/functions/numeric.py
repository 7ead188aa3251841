"""Deterministic numeric aggregation helpers.

Why these exist: double-precision SUM/AVG are not associative, so a
parallel Spark aggregation and a single-threaded oracle (DuckDB) can
differ in the last bits — enough to break a value-hash comparison and,
at 100 TB, enough to make reruns non-reproducible.  The fix is exact
fixed-point accumulation: make each row's contribution an INTEGER
(deterministic per-row), sum exactly (order no longer matters), convert
back once at the end.

Two implementations, one semantics:

- ``exact_sum`` (default): scaled-long — ``sum(round(x·10⁶)::long)/10⁶``.
  Stays inside whole-stage codegen (long arithmetic), ~2.5× faster than
  the decimal path.  Domain bound: the scaled sum must fit int64, i.e.
  Σ|x| < 2⁶³/10⁶ ≈ 9.2·10¹².  True by >6 orders of magnitude for every
  test SF; per-group money sums at 100 TB can exceed it — use the wide
  variant there.
- ``exact_sum_wide``: DECIMAL(30,6) accumulation — unbounded domains
  (Σ|x| < 10²⁴), pays BigDecimal cost.  Same cross-engine determinism.

The matching ANSI-SQL fragments for the DuckDB oracle are produced by
``sql_exact_sum`` / ``sql_exact_avg`` so the Spark plan and the oracle
are generated from one definition.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: fixed-point scale: 6 decimal digits
_S = 1_000_000


def _as_col(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _scaled_long_sum(c: Column) -> Column:
    # per-row double ops are IEEE-deterministic; the long sum is exact
    return F.sum(F.round(c * _S).cast("long"))


def exact_sum(col: Column | str, round_to: int = 2) -> Column:
    """Order-independent SUM of a double expression (see module doc)."""
    return F.round(_scaled_long_sum(_as_col(col)) / _S, round_to)


def exact_avg(col: Column | str, round_to: int = 6) -> Column:
    """Order-independent AVG: exact scaled sum / count, rounded."""
    c = _as_col(col)
    return F.round(_scaled_long_sum(c) / _S / F.count(c), round_to)


def sql_exact_sum(expr: str, round_to: int = 2) -> str:
    """DuckDB fragment identical to :func:`exact_sum`."""
    return (
        f"round(cast(sum(cast(round(({expr}) * 1e6) as bigint)) as double)"
        f" / 1e6, {round_to})"
    )


def sql_exact_avg(expr: str, round_to: int = 6) -> str:
    """DuckDB fragment identical to :func:`exact_avg`."""
    return (
        f"round(cast(sum(cast(round(({expr}) * 1e6) as bigint)) as double)"
        f" / 1e6 / count(({expr})), {round_to})"
    )


def exact_sum_wide(col: Column | str, round_to: int = 2) -> Column:
    """Decimal-accumulated variant for domains where the scaled-long sum
    could exceed int64 (Σ|x| ≥ ~9·10¹²): per-group money sums at extreme
    scale, unbounded user values."""
    return F.round(F.sum(_as_col(col).cast("decimal(30,6)")).cast("double"), round_to)


def sql_exact_sum_wide(expr: str, round_to: int = 2) -> str:
    return f"round(cast(sum(cast(({expr}) as decimal(30,6))) as double), {round_to})"


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


# ---------------------------------------------------------------------------
# Exact order statistics (see DESIGN.md "order statistics" section):
# type-7 linear interpolation computed from exact integers so Spark and
# the oracle agree bitwise — engine-native percentile interpolation
# diverges by an ulp on large-magnitude values.
# ---------------------------------------------------------------------------


def exact_pct_agg(p: int, round_to: int = 6) -> Column:
    """Aggregate Column for the p-th percentile (type-7) over rows that
    carry ``val`` (integer), ``rv`` (1-based rank by val within the
    group) and ``n`` (group size) — produced by a rank window.  With
    t = (n-1)·p: result = (val[t div 100]·(100-f) + val[t div 100 + 1]·f)/100,
    f = t mod 100 — exact int64 numerator, one division."""
    lo = F.max(F.when(F.expr(f"rv - 1 = ((n - 1) * {p}) div 100"), F.col("val")))
    hi = F.max(F.when(F.expr(f"rv - 1 = ((n - 1) * {p}) div 100 + 1"), F.col("val")))
    f_ = F.max(F.expr(f"((n - 1) * {p}) % 100"))
    return F.round((lo * (100 - f_) + F.coalesce(hi, lo) * f_) / 100.0, round_to)


def sql_exact_pct_agg(p: int, round_to: int = 6) -> str:
    """DuckDB twin of :func:`exact_pct_agg` (same rv/n/val contract)."""
    lo = f"max(CASE WHEN rv - 1 = ((n - 1) * {p}) // 100 THEN val END)"
    hi = f"max(CASE WHEN rv - 1 = ((n - 1) * {p}) // 100 + 1 THEN val END)"
    f_ = f"max(((n - 1) * {p}) % 100)"
    return f"round(({lo} * (100 - {f_}) + coalesce({hi}, {lo}) * {f_}) / 100.0, {round_to})"
