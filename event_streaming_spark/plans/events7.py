"""Round-9 events analytics: burst detection and the seasonal-naive
forecast backtest.

* ``events_burst_detection_trailing`` — per (event_type, day) volume
  against its own trailing-7-day baseline: a day is a BURST when its
  count is at least twice the trailing mean on a minimum absolute
  floor.  The on-call anomaly primitive (Kleinberg's burst model's
  zeroth-order approximation) phrased so every comparison is an
  integer cross-multiplication — no division, no doubles, so the
  flag can never drift between engines.
* ``events_seasonal_naive_backtest`` — the honest forecasting baseline:
  predict day d's per-type total with day d-7's, then score MAE and
  weighted sMAPE per type.  Any model the engine ships (Holt, STL,
  EWMA — plans/events4-6) has to beat THIS row to justify itself;
  publishing the baseline next to the models is the backtest
  discipline every forecasting pipeline needs.

Both are one fact-table scan feeding day×type-sized frames (≤ 37·5
rows at any SF — the day spine is data-bounded, never corpus-sized);
the trailing window and the d-7 self-join run on that tiny frame.
100 TB shape: the only corpus-sized stage is the map-side-combined
daily count/sum aggregate, a wordcount-shaped shuffle.

Reference parity note: the reference engine has no analytics surface
(SURVEY §2 — its queries are keyed lookups); these extend the driver's
LLM/analytics mandate like the rest of plans/events*.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from event_streaming_spark.plans.catalog import load, register

# ---------------------------------------------------------------------------
# Burst detection: cnt_d >= 2 * mean(cnt over the 7 preceding days),
# cross-multiplied (cnt_d * n_prev >= 2 * sum_prev) so the test is
# exact-integer, plus an absolute floor so a 1-then-3-events type never
# "bursts".  Days with no trailing history emit NULL ratio and never
# flag.  ratio_ppm = cnt * n_prev * 1e6 // sum_prev (floor division on
# nonnegative ints — identical truncation in both engines).
# ---------------------------------------------------------------------------

_BURST_MIN = 20  # absolute floor: bursts need at least this many events

_BURST_ORACLE = f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         cast(count(*) AS BIGINT) AS cnt,
         CAST(ts AS DATE) - DATE '1970-01-01' AS day_num
  FROM events GROUP BY event_type, CAST(ts AS DATE)
), trailed AS (
  SELECT event_type, day, cnt,
         cast(sum(cnt) OVER w AS BIGINT) AS prev_sum,
         cast(count(cnt) OVER w AS BIGINT) AS prev_n
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day_num
               RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING)
)
SELECT event_type, day, cnt,
       prev_sum, prev_n,
       CASE WHEN prev_sum > 0
            THEN cast(cnt * prev_n * 1000000 // prev_sum AS BIGINT) END
         AS ratio_ppm,
       CASE WHEN prev_n > 0 AND cnt >= {_BURST_MIN}
                 AND cnt * prev_n >= 2 * prev_sum
            THEN 1 ELSE 0 END AS is_burst
FROM trailed
ORDER BY event_type, day
"""


@register(
    "events_burst_detection_trailing",
    _BURST_ORACLE,
    tags=("events", "anomaly", "window"),
)
def events_burst_detection_trailing(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    daily = daily.withColumn(
        "day_num", F.datediff("day", F.lit("1970-01-01"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day_num")
        .rangeBetween(-7, -1)
    )
    trailed = daily.select(
        "event_type",
        "day",
        "cnt",
        F.sum("cnt").over(w).cast("long").alias("prev_sum"),
        F.count("cnt").over(w).cast("long").alias("prev_n"),
    )
    ratio = F.when(
        F.col("prev_sum") > 0,
        (F.col("cnt") * F.col("prev_n") * 1_000_000 / F.col("prev_sum")).cast(
            "long"
        ),
    )
    burst = F.when(
        (F.col("prev_n") > 0)
        & (F.col("cnt") >= _BURST_MIN)
        & (F.col("cnt") * F.col("prev_n") >= 2 * F.col("prev_sum")),
        F.lit(1),
    ).otherwise(F.lit(0))
    return trailed.select(
        "event_type",
        "day",
        "cnt",
        "prev_sum",
        "prev_n",
        ratio.alias("ratio_ppm"),
        burst.alias("is_burst"),
    ).orderBy("event_type", "day")


# ---------------------------------------------------------------------------
# Seasonal-naive backtest: forecast(type, d) = actual(type, d-7); score
# only days whose d-7 exists (an equi-join on (type, day_num-7), not a
# lag, so calendar gaps never misalign the season).  Per-type readout:
# days scored, MAE in exact µ-value units (long div long), and weighted
# sMAPE = Σ|a-f| / Σ(|a|+|f|) as ONE double division of two exact long
# sums, rounded 6 (the ACF convention: exact integers until the last
# IEEE-identical op; Σ here stays < 2^53 through a 100× replica —
# beyond that the sums move to DECIMAL(38,0), shape unchanged).
# ---------------------------------------------------------------------------

_SNAIVE_ORACLE = """
WITH daily AS (
  SELECT event_type,
         CAST(ts AS DATE) - DATE '1970-01-01' AS day_num,
         cast(sum(cast(round(value * 1000000) AS BIGINT)) AS BIGINT) AS v
  FROM events GROUP BY event_type, CAST(ts AS DATE)
), scored AS (
  SELECT a.event_type, a.day_num, a.v AS actual, f.v AS forecast
  FROM daily a JOIN daily f
    ON f.event_type = a.event_type AND f.day_num = a.day_num - 7
)
SELECT event_type,
       cast(count(*) AS BIGINT) AS n_days,
       cast(cast(sum(abs(actual - forecast)) AS BIGINT) // count(*)
            AS BIGINT) AS mae_micro,
       CASE WHEN sum(abs(actual) + abs(forecast)) > 0
            THEN round(cast(sum(abs(actual - forecast)) AS DOUBLE)
                       / cast(sum(abs(actual) + abs(forecast)) AS DOUBLE), 6)
       END AS smape
FROM scored
GROUP BY event_type ORDER BY event_type
"""


@register(
    "events_seasonal_naive_backtest",
    _SNAIVE_ORACLE,
    tags=("events", "forecast", "backtest"),
)
def events_seasonal_naive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    xv = F.round(F.col("value") * 1_000_000).cast("long")
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01")).alias("day_num"),
    ).agg(F.sum(xv).cast("long").alias("v"))
    fc = daily.select(
        F.col("event_type").alias("f_type"),
        (F.col("day_num") + 7).alias("f_day"),
        F.col("v").alias("forecast"),
    )
    scored = daily.join(
        fc,
        (F.col("event_type") == F.col("f_type"))
        & (F.col("day_num") == F.col("f_day")),
    ).select("event_type", "day_num", F.col("v").alias("actual"), "forecast")
    err = F.abs(F.col("actual") - F.col("forecast"))
    denom = F.abs(F.col("actual")) + F.abs(F.col("forecast"))
    return (
        scored.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.sum(err).cast("long").alias("sum_err"),
            F.sum(denom).cast("long").alias("sum_denom"),
        )
        .select(
            "event_type",
            "n_days",
            F.expr("CAST(sum_err DIV n_days AS BIGINT)").alias("mae_micro"),
            F.when(
                F.col("sum_denom") > 0,
                F.round(
                    F.col("sum_err").cast("double")
                    / F.col("sum_denom").cast("double"),
                    6,
                ),
            ).alias("smape"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# New vs returning daily actives: the growth-accounting split every
# product dashboard leads with.  new(d) = users whose FIRST-ever event
# day is d; returning = active − new.  One user-keyed min(day) and a
# join back on the SAME key (co-partitioned — AQE reuses the exchange),
# then a days-sized rollup.
# ---------------------------------------------------------------------------

_NVR_ORACLE = """
WITH firsts AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS first_day
  FROM events GROUP BY user_id
),
daily AS (
  SELECT CAST(ts AS DATE) AS day, user_id
  FROM events GROUP BY CAST(ts AS DATE), user_id
)
SELECT d.day,
       cast(count(*) AS BIGINT) AS active_users,
       cast(sum(CASE WHEN f.first_day = d.day THEN 1 ELSE 0 END) AS BIGINT)
         AS new_users,
       cast(count(*) - sum(CASE WHEN f.first_day = d.day THEN 1 ELSE 0 END)
            AS BIGINT) AS returning_users,
       cast(sum(CASE WHEN f.first_day = d.day THEN 1 ELSE 0 END) * 1000000
            // count(*) AS BIGINT) AS new_ppm
FROM daily d JOIN firsts f ON f.user_id = d.user_id
GROUP BY d.day ORDER BY d.day
"""


@register(
    "events_new_vs_returning_daily",
    _NVR_ORACLE,
    tags=("events", "growth", "agg"),
)
def events_new_vs_returning_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "user_id"
    )
    daily = ev.distinct()
    firsts = daily.groupBy("user_id").agg(F.min("day").alias("first_day"))
    is_new = F.when(F.col("first_day") == F.col("day"), 1).otherwise(0)
    return (
        daily.join(firsts, "user_id")
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("long").alias("active_users"),
            F.sum(is_new).cast("long").alias("new_users"),
        )
        .select(
            "day",
            "active_users",
            "new_users",
            (F.col("active_users") - F.col("new_users"))
            .cast("long")
            .alias("returning_users"),
            # exact integer div (not double / + cast): double round-trips
            # lose exactness once the numerator crosses 2^53 — user-count
            # numerators stay small today, but `div` costs nothing and
            # matches the oracle's `//` at any scale.
            F.expr("(new_users * CAST(1000000 AS BIGINT)) div active_users")
            .cast("long")
            .alias("new_ppm"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# Inter-arrival diagnostics per event type: mean gap, coefficient of
# variation, and the Poisson-likeness flag (an exponential process has
# CV = 1; CV >> 1 means bursty/clustered arrivals, CV << 1 means
# regular/scheduled) — the point-process readout behind capacity
# planning and the burst detector's priors.
# Scale: gaps come from a lag window partitioned by (event_type, DAY) —
# never one task per type; cross-day gaps are dropped by construction
# (the standard daily ops profile).  Second moments ride DECIMAL(38,0)
# (µs gaps square past int64); the CV is one sqrt on exact-derived
# doubles, rounded 6 (the ACF convention).
# ---------------------------------------------------------------------------

_IAT_ORACLE = """
WITH gaps AS (
  SELECT event_type,
         epoch_us(ts) - lag(epoch_us(ts)) OVER w AS g
  FROM events
  WINDOW w AS (PARTITION BY event_type, CAST(ts AS DATE)
               ORDER BY ts, event_id)
), agg AS (
  SELECT event_type,
         cast(count(*) AS BIGINT) AS n_gaps,
         cast(sum(g) AS BIGINT) AS s1,
         sum(cast(g AS HUGEINT) * g) AS s2
  FROM gaps WHERE g IS NOT NULL
  GROUP BY event_type
)
SELECT event_type, n_gaps,
       cast(s1 // n_gaps AS BIGINT) AS mean_gap_us,
       round(sqrt(cast(n_gaps AS DOUBLE) * cast(s2 AS DOUBLE)
                  - cast(s1 AS DOUBLE) * cast(s1 AS DOUBLE))
             / cast(s1 AS DOUBLE), 6) AS cv,
       CASE WHEN abs(round(sqrt(cast(n_gaps AS DOUBLE) * cast(s2 AS DOUBLE)
                  - cast(s1 AS DOUBLE) * cast(s1 AS DOUBLE))
             / cast(s1 AS DOUBLE), 6) - 1.0) <= 0.1
            THEN 1 ELSE 0 END AS poisson_like
FROM agg
ORDER BY event_type
"""


@register(
    "events_interarrival_cv_profile",
    _IAT_ORACLE,
    tags=("events", "stats", "pointprocess"),
)
def events_interarrival_cv_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type", F.to_date("ts")).orderBy(
        "ts", "event_id"
    )
    us = F.unix_micros(F.col("ts"))
    gaps = ev.select(
        "event_type", (us - F.lag(us).over(w)).alias("g")
    ).where(F.col("g").isNotNull())
    agg = gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.sum("g").cast("long").alias("s1"),
        F.sum(F.col("g").cast("decimal(38,0)") * F.col("g")).alias("s2"),
    )
    cv = F.round(
        F.sqrt(
            F.col("n_gaps").cast("double") * F.col("s2").cast("double")
            - F.col("s1").cast("double") * F.col("s1").cast("double")
        )
        / F.col("s1").cast("double"),
        6,
    )
    return agg.select(
        "event_type",
        "n_gaps",
        F.expr("CAST(s1 DIV n_gaps AS BIGINT)").alias("mean_gap_us"),
        cv.alias("cv"),
        F.when(F.abs(cv - 1.0) <= 0.1, 1).otherwise(0).alias("poisson_like"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# Peak-hour traffic profile: the (day-of-week × hour) grid with exact
# ppm shares and each weekday's peak hour — the load-shaping readout
# behind autoscaling schedules.  One fact scan to a 7×24 frame.
# DOW convention: ISO (1 = Monday) on both engines (DuckDB isodow;
# Spark dayofweek is 1 = Sunday, so it is remapped).
# ---------------------------------------------------------------------------

_PEAK_ORACLE = """
WITH grid AS (
  SELECT isodow(ts) AS dow, hour(ts) AS hr,
         cast(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY isodow(ts), hour(ts)
), tot AS (
  SELECT grid.*,
         cast(sum(n_events) OVER () AS BIGINT) AS total,
         max(n_events) OVER (PARTITION BY dow) AS dow_max
  FROM grid
)
SELECT dow, hr, n_events,
       cast(n_events * 1000000 // total AS BIGINT) AS share_ppm,
       CASE WHEN n_events = dow_max
                 AND hr = min(CASE WHEN n_events = dow_max THEN hr END)
                          OVER (PARTITION BY dow)
            THEN 1 ELSE 0 END AS is_dow_peak
FROM tot
ORDER BY dow, hr
"""


@register(
    "events_peak_hour_profile",
    _PEAK_ORACLE,
    tags=("events", "profile", "agg"),
)
def events_peak_hour_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    iso_dow = F.when(F.dayofweek("ts") == 1, 7).otherwise(
        F.dayofweek("ts") - 1
    )
    grid = ev.groupBy(
        iso_dow.alias("dow"), F.hour("ts").alias("hr")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    wall = Window.partitionBy()
    wdow = Window.partitionBy("dow")
    tot = grid.select(
        "dow",
        "hr",
        "n_events",
        F.sum("n_events").over(wall).cast("long").alias("total"),
        F.max("n_events").over(wdow).alias("dow_max"),
    )
    peak_hr = F.min(
        F.when(F.col("n_events") == F.col("dow_max"), F.col("hr"))
    ).over(wdow)
    return tot.select(
        "dow",
        "hr",
        "n_events",
        (F.col("n_events") * 1_000_000 / F.col("total")).cast("long").alias(
            "share_ppm"
        ),
        F.when(
            (F.col("n_events") == F.col("dow_max")) & (F.col("hr") == peak_hr),
            1,
        )
        .otherwise(0)
        .alias("is_dow_peak"),
    ).orderBy("dow", "hr")
