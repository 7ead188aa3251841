"""Round-10 events analytics: session-gap sensitivity and DAU/WAU/MAU.

* ``events_session_gap_sensitivity`` — the tuning curve behind every
  sessionizer: per inactivity threshold (5/15/30/60/120 min), the
  session count and mean events-per-session the corpus would produce.
  ``events_sessionize_30m`` ships ONE point of this curve; picking the
  threshold without the curve is guesswork (the knee is where session
  counts stop collapsing).  All-integer: a session starts at each
  user's first event and at every gap strictly greater than the
  threshold, so n_sessions(t) = n_users + |gaps > t|.
* ``events_dau_wau_mau_stickiness`` — the canonical engagement
  triple: per calendar day, distinct users active that day (DAU), in
  the trailing 7 days (WAU), in the trailing 30 days (MAU), and the
  DAU/MAU stickiness ratio in exact ppm.

100 TB shape: gap detection is ONE lag window partitioned by user_id
(state = one user's timeline per task — the same skew unit as every
sessionizer); the five thresholds are conditional sums inside one
aggregate, not five passes.  The rolling-active counts expand the
DEDUPLICATED (user, day) table (orders of magnitude smaller than the
fact table) by a bounded 7/30-day sequence explode, then count
distinct per spine day — the day spine is calendar-bounded, and no
unpartitioned window exists anywhere.

Reference parity note: the reference engine has no analytics surface
(SURVEY §2); these extend the events pack (plans/events*.py) under the
LLM/analytics mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from event_streaming_spark.plans.catalog import load, register

# ---------------------------------------------------------------------------
# Session-gap sensitivity curve.
# ---------------------------------------------------------------------------

_GAP_THRESHOLDS_S = (300, 900, 1800, 3600, 7200)

_GAP_ORACLE = f"""
WITH gaps AS MATERIALIZED (
  SELECT epoch_us(ts) - lag(epoch_us(ts))
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS g
  FROM events
), base AS (
  SELECT cast(count(*) AS BIGINT) AS n_events,
         cast(count(DISTINCT user_id) AS BIGINT) AS n_users
  FROM events
), curve AS (
  SELECT t.threshold_s,
         cast(count(*) FILTER (WHERE g > cast(t.threshold_s AS BIGINT) * 1000000)
              AS BIGINT) AS n_breaks
  FROM gaps, (VALUES {", ".join(f"({t})" for t in _GAP_THRESHOLDS_S)})
            AS t(threshold_s)
  WHERE g IS NOT NULL
  GROUP BY t.threshold_s
)
SELECT cast(c.threshold_s AS BIGINT) AS threshold_s,
       cast(b.n_users + c.n_breaks AS BIGINT) AS n_sessions,
       cast(b.n_events * 1000000 // (b.n_users + c.n_breaks) AS BIGINT)
         AS events_per_session_ppm
FROM curve c CROSS JOIN base b
ORDER BY threshold_s
"""


@register(
    "events_session_gap_sensitivity",
    _GAP_ORACLE,
    tags=("events", "sessions", "tuning"),
)
def events_session_gap_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session count + mean session size per inactivity threshold.

    Scale design: one user-partitioned lag window; the five thresholds
    are conditional sums inside ONE map-side-combined aggregate (the
    oracle's ×5 VALUES fanout is a DuckDB-side convenience — the Spark
    plan never multiplies the gap table).
    """
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gaps = ev.select("user_id", (us - F.lag(us).over(w)).alias("g"))
    aggs = [
        F.sum(
            F.when(F.col("g") > t * 1_000_000, 1).otherwise(0)
        ).cast("long").alias(f"b{t}")
        for t in _GAP_THRESHOLDS_S
    ]
    one = gaps.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
        *aggs,
    )
    # n_events == n_rows (one gap row per event; the first per user is NULL)
    stacked = one.select(
        F.col("n_rows").alias("n_events"),
        "n_users",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).cast("long").alias("threshold_s"),
                        F.col(f"b{t}").alias("n_breaks"),
                    )
                    for t in _GAP_THRESHOLDS_S
                ]
            )
        ).alias("r"),
    )
    return stacked.select(
        F.col("r.threshold_s").alias("threshold_s"),
        (F.col("n_users") + F.col("r.n_breaks")).cast("long").alias("n_sessions"),
        F.expr(
            "(n_events * CAST(1000000 AS BIGINT))"
            " div (n_users + r.n_breaks)"
        )
        .cast("long")
        .alias("events_per_session_ppm"),
    ).orderBy("threshold_s")


# ---------------------------------------------------------------------------
# DAU / WAU / MAU / stickiness.
# ---------------------------------------------------------------------------

_DAU_ORACLE = """
WITH ud AS MATERIALIZED (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
), bounds AS (
  SELECT min(day) AS dmin, max(day) AS dmax FROM ud
), spine AS (
  SELECT unnest(generate_series(dmin, dmax, INTERVAL 1 DAY))::DATE AS day
  FROM bounds
), dau AS (
  SELECT day, cast(count(*) AS BIGINT) AS dau FROM ud GROUP BY day
), wau AS (
  SELECT s.day, cast(count(DISTINCT u.user_id) AS BIGINT) AS wau
  FROM spine s JOIN ud u ON u.day BETWEEN s.day - 6 AND s.day
  GROUP BY s.day
), mau AS (
  SELECT s.day, cast(count(DISTINCT u.user_id) AS BIGINT) AS mau
  FROM spine s JOIN ud u ON u.day BETWEEN s.day - 29 AND s.day
  GROUP BY s.day
)
SELECT s.day AS day,
       cast(coalesce(d.dau, 0) AS BIGINT) AS dau,
       cast(coalesce(w.wau, 0) AS BIGINT) AS wau,
       cast(coalesce(m.mau, 0) AS BIGINT) AS mau,
       cast(CASE WHEN coalesce(m.mau, 0) > 0
                 THEN coalesce(d.dau, 0) * 1000000 // m.mau
                 ELSE 0 END AS BIGINT) AS stickiness_ppm
FROM spine s
LEFT JOIN dau d ON d.day = s.day
LEFT JOIN wau w ON w.day = s.day
LEFT JOIN mau m ON m.day = s.day
ORDER BY day
"""


def _rolling_active(ud: DataFrame, days: int, out: str) -> DataFrame:
    """Distinct users active in the trailing ``days``-day window ending
    each spine day: expand each (user, activity-day) to the spine days
    it keeps alive (a bounded ``days``-element sequence — the standard
    distributed rolling-distinct shape), dedupe, count."""
    pairs = ud.select(
        "user_id",
        F.explode(
            F.sequence(
                F.col("day"),
                F.date_add(F.col("day"), days - 1),
            )
        ).alias("day"),
    ).distinct()
    return pairs.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias(out)
    )


@register(
    "events_dau_wau_mau_stickiness",
    _DAU_ORACLE,
    tags=("events", "engagement", "agg"),
)
def events_dau_wau_mau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily DAU/WAU/MAU + DAU/MAU stickiness (exact ppm).

    Scale design: the expansion runs on the DEDUPLICATED (user, day)
    table, not the fact table, and fans out by at most 30 — a bounded
    multiplier on a table already orders of magnitude smaller than the
    corpus; each rolling count is then one keyed aggregate.  The spine
    is a calendar-bounded broadcast frame.  (The oracle phrases the
    same windows as spine-range joins — clearer in SQL, identical
    result.)
    """
    ev = load(spark, sf_dir, "events")
    ud = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    bounds = ud.agg(
        F.min("day").alias("dmin"), F.max("day").alias("dmax")
    ).coalesce(1)
    spine = bounds.select(
        F.explode(
            F.sequence(F.col("dmin"), F.col("dmax"))
        ).alias("day")
    )
    dau = ud.groupBy("day").agg(F.count(F.lit(1)).cast("long").alias("dau"))
    wau = _rolling_active(ud, 7, "wau")
    mau = _rolling_active(ud, 30, "mau")
    return (
        spine.join(dau, "day", "left")
        .join(wau, "day", "left")
        .join(mau, "day", "left")
        .select(
            "day",
            F.coalesce("dau", F.lit(0)).cast("long").alias("dau"),
            F.coalesce("wau", F.lit(0)).cast("long").alias("wau"),
            F.coalesce("mau", F.lit(0)).cast("long").alias("mau"),
            F.when(
                F.coalesce("mau", F.lit(0)) > 0,
                F.expr("(coalesce(dau, 0) * CAST(1000000 AS BIGINT)) div mau"),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("stickiness_ppm"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# Zero-activity outage runs: maximal runs of >= _OUTAGE_MIN_H consecutive
# silent hours per event type, over the full hour grid.  The burst
# detector (plans/events7.py) flags spikes; this is its dual — the
# monitor that catches a dead pipeline BEFORE the daily rollup does.
# Hours ride as epoch-hour integers end-to-end (no timestamp
# round-tripping between engines).
# ---------------------------------------------------------------------------

_OUTAGE_MIN_H = 3

_OUTAGE_ORACLE = f"""
WITH hourly AS MATERIALIZED (
  SELECT event_type, epoch_us(ts) // 3600000000 AS h_idx,
         cast(count(*) AS BIGINT) AS n
  FROM events GROUP BY event_type, epoch_us(ts) // 3600000000
), bounds AS (
  SELECT min(h_idx) AS hmin, max(h_idx) AS hmax FROM hourly
), types AS (SELECT DISTINCT event_type FROM hourly
), grid AS (
  SELECT t.event_type, s.h_idx
  FROM types t,
       (SELECT unnest(generate_series(hmin, hmax)) AS h_idx FROM bounds) s
), zeros AS (
  SELECT g.event_type, g.h_idx,
         g.h_idx - row_number() OVER (PARTITION BY g.event_type
                                      ORDER BY g.h_idx) AS grp
  FROM grid g LEFT JOIN hourly h
    ON h.event_type = g.event_type AND h.h_idx = g.h_idx
  WHERE h.n IS NULL
), runs AS (
  SELECT event_type, cast(count(*) AS BIGINT) AS run_h
  FROM zeros GROUP BY event_type, grp
), prof AS (
  SELECT event_type,
         cast(count(*) AS BIGINT) AS n_runs,
         cast(count(*) FILTER (WHERE run_h >= {_OUTAGE_MIN_H}) AS BIGINT)
           AS n_outages,
         cast(sum(run_h) AS BIGINT) AS silent_hours,
         cast(max(run_h) AS BIGINT) AS longest_run_h
  FROM runs GROUP BY event_type
)
SELECT t.event_type AS event_type,
       cast((SELECT hmax - hmin + 1 FROM bounds) AS BIGINT) AS grid_hours,
       cast(coalesce(p.silent_hours, 0) AS BIGINT) AS silent_hours,
       cast(coalesce(p.n_runs, 0) AS BIGINT) AS n_runs,
       cast(coalesce(p.n_outages, 0) AS BIGINT) AS n_outages,
       cast(coalesce(p.longest_run_h, 0) AS BIGINT) AS longest_run_h
FROM types t LEFT JOIN prof p ON p.event_type = t.event_type
ORDER BY event_type
"""


@register(
    "events_zero_activity_outage_runs",
    _OUTAGE_ORACLE,
    tags=("events", "ops", "anomaly"),
)
def events_zero_activity_outage_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type silent-hour profile: total silent hours, run count,
    outages (runs >= 3h), and the longest run — always one row per
    event type (zeros when the type never goes quiet, as at dense SFs:
    "no outages" is a result, not an empty frame).

    Scale design: the fact table reduces to an (event_type, hour)
    aggregate ONCE (map-side combined); everything after runs on the
    type x hour grid, which is calendar-bounded (a year is 8,760 hours
    per type, never corpus-sized).  The islands window partitions by
    event_type over grid rows.  The h_idx - row_number() trick groups
    consecutive silent hours without a lag+flag+running-sum chain.
    """
    ev = load(spark, sf_dir, "events")
    h_idx = F.expr("unix_micros(ts) div 3600000000")
    hourly = ev.groupBy("event_type", h_idx.alias("h_idx")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    bounds = hourly.agg(
        F.min("h_idx").alias("hmin"), F.max("h_idx").alias("hmax")
    ).coalesce(1)
    types = hourly.select("event_type").distinct()
    grid = types.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        F.explode(F.sequence(F.col("hmin"), F.col("hmax"))).alias("h_idx"),
    )
    zeros = (
        grid.join(hourly, ["event_type", "h_idx"], "left")
        .where(F.col("n").isNull())
        .select("event_type", "h_idx")
    )
    w = Window.partitionBy("event_type").orderBy("h_idx")
    runs = (
        zeros.withColumn("grp", F.col("h_idx") - F.row_number().over(w))
        .groupBy("event_type", "grp")
        .agg(F.count(F.lit(1)).cast("long").alias("run_h"))
    )
    prof = runs.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_runs"),
        F.sum(F.when(F.col("run_h") >= _OUTAGE_MIN_H, 1).otherwise(0))
        .cast("long")
        .alias("n_outages"),
        F.sum("run_h").cast("long").alias("silent_hours"),
        F.max("run_h").cast("long").alias("longest_run_h"),
    )
    return (
        types.crossJoin(F.broadcast(bounds))
        .join(prof, "event_type", "left")
        .select(
            "event_type",
            (F.col("hmax") - F.col("hmin") + 1).cast("long").alias("grid_hours"),
            F.coalesce("silent_hours", F.lit(0)).cast("long").alias("silent_hours"),
            F.coalesce("n_runs", F.lit(0)).cast("long").alias("n_runs"),
            F.coalesce("n_outages", F.lit(0)).cast("long").alias("n_outages"),
            F.coalesce("longest_run_h", F.lit(0)).cast("long").alias("longest_run_h"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Sample-ratio-mismatch (SRM) guardrail: the chi-square goodness-of-fit
# test every experimentation platform runs before trusting ANY A/B
# readout (Fabijan et al. 2019, "Diagnosing Sample Ratio Mismatch").
# Users split 50/50 by the deterministic md5 hash (the same split
# family the DiD/MDE queries use); per event_type we test whether the
# USERS OBSERVED in that type's traffic still split 50/50 — a skewed
# type is a logging/assignment bug, and its experiment readouts are
# garbage.  chi2 for a 50/50 split reduces to (a-b)^2/(a+b); we emit it
# micro-scaled by integer division and flag at the df=1, alpha=0.001
# critical value 10.828 via an exact integer cross-multiplication
# ((a-b)^2 * 1000 > 10828 * (a+b)) — no doubles anywhere.
# ---------------------------------------------------------------------------

_SRM_CRIT_MILLI = 10828  # chi2 critical value at df=1, alpha=0.001, x1000


def _srm_oracle() -> str:
    from event_streaming_spark.functions.hashing import sql_stable_hash32

    gate = sql_stable_hash32("'srm|' || cast(user_id AS VARCHAR)")
    return f"""
WITH assign AS MATERIALIZED (
  SELECT DISTINCT event_type, user_id, {gate} % 2 AS grp FROM events
), counts AS (
  SELECT event_type,
         cast(count(*) FILTER (WHERE grp = 0) AS BIGINT) AS n_a,
         cast(count(*) FILTER (WHERE grp = 1) AS BIGINT) AS n_b
  FROM assign GROUP BY event_type
)
SELECT event_type, n_a, n_b,
       cast((n_a - n_b) * (n_a - n_b) * 1000000 // (n_a + n_b) AS BIGINT)
         AS chi2_micro,
       CASE WHEN (n_a - n_b) * (n_a - n_b) * 1000 > {_SRM_CRIT_MILLI} * (n_a + n_b)
            THEN 1 ELSE 0 END AS srm_flag
FROM counts
ORDER BY event_type
"""


@register(
    "events_srm_check_by_type",
    _srm_oracle(),
    tags=("events", "experimentation", "guardrail"),
)
def events_srm_check_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square SRM test of the 50/50 user split, per event type.

    Scale design: ONE distinct (event_type, user) pass (map-side
    combined) then a type-keyed conditional count; the test itself is
    integer arithmetic on the type-sized frame.  At 100 TB this is the
    wordcount shape with a 2-value hash gate fused into the scan.
    """
    from event_streaming_spark.functions.hashing import stable_hash32

    ev = load(spark, sf_dir, "events")
    grp = (
        stable_hash32(F.concat(F.lit("srm|"), F.col("user_id").cast("string")))
        % 2
    )
    assign = ev.select("event_type", "user_id", grp.alias("grp")).distinct()
    counts = assign.groupBy("event_type").agg(
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).cast("long").alias("n_b"),
    )
    d2 = (F.col("n_a") - F.col("n_b")) * (F.col("n_a") - F.col("n_b"))
    return counts.select(
        "event_type",
        "n_a",
        "n_b",
        F.expr(
            "((n_a - n_b) * (n_a - n_b) * CAST(1000000 AS BIGINT))"
            " div (n_a + n_b)"
        )
        .cast("long")
        .alias("chi2_micro"),
        F.when(
            d2 * 1000 > F.lit(_SRM_CRIT_MILLI) * (F.col("n_a") + F.col("n_b")),
            1,
        )
        .otherwise(0)
        .cast("int")
        .alias("srm_flag"),
    ).orderBy("event_type")
