"""Oracle-paired STATISTICS queries — trend regression and categorical
independence over the event stream.

These extend the engine's analytics surface (z-test, correlation, MAD,
anomaly z-scores) with the two classic remaining primitives a monitoring
/ experimentation stack needs:

* ``events_trend_ols_daily`` — ordinary-least-squares trend (slope /
  intercept / R²) of daily event volume per type.  The reference engine's
  users compute exactly this kind of per-series drift from the event
  store (reference: the per-topic stats surface, src/events-agency.c —
  we generalize it to a regression, the standard "is volume trending"
  question).
* ``events_chi_square_type_dow`` — Pearson chi-square independence test
  of event_type × day-of-week, the categorical counterpart of the Welch
  z-test already in the catalog.

Determinism contract (same as events_ab_value_ztest): every moment is an
EXACT int64 accumulated distributively (map-side combine, order-free);
the final statistic is a FIXED chain of IEEE ops on those identical
integers, so Spark and DuckDB agree bitwise.  Magnitude audit in the
comments at each site.

Scale: both queries are one map-side-combining aggregate over the fact
table down to a bounded summary (days×types / types×dows), then
summary-sized math.  Nothing data-sized crosses a shuffle except the
pre-aggregation's combiner output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_streaming_spark.plans.catalog import load, register

# ---------------------------------------------------------------------------
# OLS daily trend per event type.
#
# x = epoch-day (int), y = daily event count (int).  Classic closed form
# on exact integer moments:
#   slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
#   intercept = (Σy − slope·Σx) / n
#   R² = (n·Σxy − Σx·Σy)² / ((n·Σx² − (Σx)²)(n·Σy² − (Σy)²))
#
# Magnitudes at sf0.1 (6e5 events / ~30 days / 5 types): x ≈ 2.06e4,
# y ≤ ~2e4; Σx² ≈ 1.3e10, n·Σxy ≈ 7e10, Σx·Σy ≈ 7.4e10 — all int64.
# The R² NUMERATOR squared would overflow (≈5e21), so the square happens
# in doubles ON THE IDENTICAL int64 difference — same IEEE chain both
# engines.  n here is the number of DAYS (calendar-bounded, never
# data-bounded), so the moments stay int64 at any data scale.
# ---------------------------------------------------------------------------

_OLS_ORACLE = """
WITH daily AS (
  SELECT event_type,
         cast(cast(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS x,
         count(*) AS y
  FROM events
  GROUP BY 1, 2
), m AS (
  SELECT event_type,
         count(*) AS n,
         sum(x) AS sx, sum(y) AS sy,
         sum(x * x) AS sxx, sum(x * y) AS sxy, sum(y * y) AS syy
  FROM daily
  GROUP BY 1
)
SELECT event_type,
       n AS n_days,
       round(cast(n * sxy - sx * sy AS DOUBLE)
             / cast(n * sxx - sx * sx AS DOUBLE), 9) AS slope,
       round((cast(sy AS DOUBLE)
              - (cast(n * sxy - sx * sy AS DOUBLE)
                 / cast(n * sxx - sx * sx AS DOUBLE))
                * cast(sx AS DOUBLE)) / cast(n AS DOUBLE), 6) AS intercept,
       round(cast(n * sxy - sx * sy AS DOUBLE)
             * cast(n * sxy - sx * sy AS DOUBLE)
             / (cast(n * sxx - sx * sx AS DOUBLE)
                * cast(n * syy - sy * sy AS DOUBLE)), 6) AS r2
FROM m
ORDER BY event_type
"""


@register("events_trend_ols_daily", _OLS_ORACLE, tags=("events", "stats", "timeseries"))
def events_trend_ols_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type OLS trend of daily event counts (slope/intercept/R²)."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01")).cast("long").alias("x"),
    ).agg(F.count(F.lit(1)).alias("y"))
    m = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den_x = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    den_y = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    slope = num / den_x
    return m.select(
        "event_type",
        F.col("n").alias("n_days"),
        F.round(slope, 9).alias("slope"),
        F.round(
            (F.col("sy").cast("double") - slope * F.col("sx").cast("double"))
            / F.col("n").cast("double"),
            6,
        ).alias("intercept"),
        F.round(num * num / (den_x * den_y), 6).alias("r2"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# Pearson chi-square independence: event_type × day-of-week.
#
# dow = (epoch_day + 3) % 7 → 0 = Monday (1970-01-01 was a Thursday),
# pure integer arithmetic so both engines bucket identically (DuckDB's
# dayofweek() and Spark's dayofweek() disagree on numbering).
#
# Per-cell contribution, the N-scaled identity form that needs no
# rational expected value:   (O·N − R·C)² / (N·R·C)
# O·N ≤ 1.2e10, R·C ≤ 1.03e10 → the difference is int64-exact; the
# denominator N·R·C ≤ 6.2e15 is int64-exact; the SQUARE happens in
# doubles on those identical integers (same discipline as R² above).
# The total is an ORDER-FREE integer sum of the per-cell contributions
# rounded to 1e-6 (35 bounded cells), sidestepping float-sum ordering.
# Degrees of freedom computed from the observed margins, not hardcoded.
# ---------------------------------------------------------------------------

_CHI2_ORACLE = """
WITH obs AS (
  SELECT event_type,
         (cast(cast(ts AS DATE) - DATE '1970-01-01' AS BIGINT) + 3) % 7 AS dow,
         count(*) AS o
  FROM events
  GROUP BY 1, 2
), margins AS (
  SELECT event_type, dow, o,
         sum(o) OVER (PARTITION BY event_type) AS r,
         sum(o) OVER (PARTITION BY dow) AS c,
         sum(o) OVER () AS n
  FROM obs
), cells AS (
  SELECT event_type, dow, o,
         round(cast(r * c AS DOUBLE) / cast(n AS DOUBLE), 6) AS expected,
         round(cast(o * n - r * c AS DOUBLE) * cast(o * n - r * c AS DOUBLE)
               / (cast(n AS DOUBLE) * cast(r AS DOUBLE) * cast(c AS DOUBLE)),
               6) AS contrib
  FROM margins
)
SELECT event_type, dow, o AS observed, expected, contrib,
       round(cast(sum(cast(round(contrib * 1e6) AS BIGINT)) OVER ()
                  AS DOUBLE) / 1e6, 6) AS chi2_total,
       cast((count(DISTINCT event_type) OVER () - 1)
            * (count(DISTINCT dow) OVER () - 1) AS BIGINT) AS dof
FROM cells
ORDER BY event_type, dow
"""


@register(
    "events_chi_square_type_dow",
    _CHI2_ORACLE,
    tags=("events", "stats", "agg"),
)
def events_chi_square_type_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence of event_type × day-of-week, per-cell
    contributions plus the order-free integer-summed total."""
    ev = load(spark, sf_dir, "events")
    obs = ev.groupBy(
        "event_type",
        (
            (F.datediff(F.to_date("ts"), F.lit("1970-01-01")).cast("long") + 3) % 7
        ).alias("dow"),
    ).agg(F.count(F.lit(1)).alias("o"))
    # Margins as TINY aggregates of the ≤35-row cell table re-joined by
    # broadcast — no unpartitioned windows anywhere in the plan (the
    # data-sized work ended at the `obs` agg; everything below is
    # margin-cardinality math).
    rows = obs.groupBy("event_type").agg(F.sum("o").alias("r"))
    cols = obs.groupBy("dow").agg(F.sum("o").alias("c"))
    margins = obs.join(F.broadcast(rows), "event_type").join(
        F.broadcast(cols), "dow"
    )
    tot = margins.agg(
        F.sum("o").alias("n"),
        (F.countDistinct("event_type") - 1).cast("long")
        * (F.countDistinct("dow") - 1).cast("long"),
    )
    n_val, dof_val = tot.first()  # 1-row scalar probe (bounded margins)
    num = (F.col("o") * F.lit(n_val) - F.col("r") * F.col("c")).cast("double")
    cells = margins.select(
        "event_type",
        "dow",
        "o",
        F.round(
            (F.col("r") * F.col("c")).cast("double") / F.lit(float(n_val)), 6
        ).alias("expected"),
        F.round(
            num
            * num
            / (
                F.lit(float(n_val))
                * F.col("r").cast("double")
                * F.col("c").cast("double")
            ),
            6,
        ).alias("contrib"),
    )
    chi2 = (
        cells.agg(F.sum(F.round(F.col("contrib") * 1e6).cast("long")).alias("s"))
        .first()["s"]
    )
    return cells.select(
        F.col("event_type"),
        "dow",
        F.col("o").alias("observed"),
        "expected",
        "contrib",
        F.round(F.lit(chi2).cast("double") / 1e6, 6).alias("chi2_total"),
        F.lit(dof_val).cast("long").alias("dof"),
    ).orderBy("event_type", "dow")
