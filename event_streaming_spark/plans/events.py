"""Event-stream queries — the reference's data plane as batch analytics.

The reference's events are schemaless JSON documents on topics
(/root/reference/include/events-agency.h:8,29,51-52); its consumers do
keyed lookups, JSON field extraction and category routing.  These queries
exercise that vocabulary over the ``events`` table: schema-on-read JSON
(O38), category filter/route (O42/O43), enum dictionary (O46), time
formatting (O35/O36), tumbling windows, and sessionization.

Scale: events is THE 100 TB table in this engine's target deployment.
Every query below is a single scan → (optional) single shuffle on the
group/session key; the JSON extraction is JVM-side `get_json_object`
(no Python).  The event store (sources/store.py) date-partitions this
table so time-bounded variants prune partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from event_streaming_spark.functions.numeric import exact_avg, exact_sum, sql_exact_avg, sql_exact_sum
from event_streaming_spark.plans.catalog import load, register

# ---------------------------------------------------------------------------
# Flagship (SURVEY §7.1): daily tumbling count+avg per event_type.
# Exercises scan → JSON extract → category filter → time bucket → agg → sort
# in one plan: the reference's entire data-plane vocabulary.
# ---------------------------------------------------------------------------

_DAILY_ORACLE = f"""
SELECT CAST(ts AS DATE) AS event_date,
       event_type,
       count(*) AS n_events,
       count(DISTINCT user_id) AS n_users,
       {sql_exact_sum('value')} AS total_value,
       {sql_exact_avg('value')} AS avg_value,
       {sql_exact_avg("cast(json_extract_string(props, '$.k') as int)", 6)} AS avg_k
FROM events
WHERE event_type IN ('click', 'purchase', 'view', 'signup', 'error')
GROUP BY CAST(ts AS DATE), event_type
"""


@register("events_daily_type_rollup", _DAILY_ORACLE, tags=("events", "agg", "json"), bench=True)
def events_daily_type_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_type").isin("click", "purchase", "view", "signup", "error"))
        .withColumn("k", F.get_json_object("props", "$.k").cast("int"))
        .groupBy(F.to_date("ts").alias("event_date"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            exact_sum("value").alias("total_value"),
            exact_avg("value").alias("avg_value"),
            exact_avg("k", 6).alias("avg_k"),
        )
    )


# ---------------------------------------------------------------------------
# Schema-on-read JSON extraction with default (SURVEY O38/O39): the
# reference's json_get_value(jobj, type, key, default) macro family.
# ---------------------------------------------------------------------------

_JSON_ORACLE = """
SELECT event_id,
       coalesce(cast(json_extract_string(props, '$.k') as int), -1) AS k,
       coalesce(cast(json_extract_string(props, '$.missing') as int), -1) AS missing_with_default
FROM events
WHERE event_type = 'purchase'
"""


@register("events_json_get_with_default", _JSON_ORACLE, tags=("events", "json"))
def events_json_get_with_default(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.filter(F.col("event_type") == "purchase").select(
        "event_id",
        F.coalesce(F.get_json_object("props", "$.k").cast("int"), F.lit(-1)).alias("k"),
        F.coalesce(F.get_json_object("props", "$.missing").cast("int"), F.lit(-1)).alias(
            "missing_with_default"
        ),
    )


# ---------------------------------------------------------------------------
# enum↔string dictionary (SURVEY O46) + category routing (O42/O43):
# conditional aggregation routes values into per-category columns.
# ---------------------------------------------------------------------------

_ROUTE_ORACLE = f"""
SELECT user_id,
       count(*) FILTER (WHERE event_type = 'click')    AS n_click,
       count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
       count(*) FILTER (WHERE event_type = 'error')    AS n_error,
       {sql_exact_sum("CASE WHEN event_type = 'purchase' THEN value ELSE 0 END")} AS purchase_value,
       max(CASE event_type WHEN 'click' THEN 1 WHEN 'view' THEN 2 WHEN 'signup' THEN 3
                           WHEN 'purchase' THEN 4 WHEN 'error' THEN 5 ELSE 0 END) AS max_type_code
FROM events
GROUP BY user_id
"""


@register("events_route_by_category", _ROUTE_ORACLE, tags=("events", "agg"))
def events_route_by_category(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    type_code = (
        F.when(F.col("event_type") == "click", 1)
        .when(F.col("event_type") == "view", 2)
        .when(F.col("event_type") == "signup", 3)
        .when(F.col("event_type") == "purchase", 4)
        .when(F.col("event_type") == "error", 5)
        .otherwise(0)
    )
    return ev.groupBy("user_id").agg(
        F.count(F.when(F.col("event_type") == "click", 1)).alias("n_click"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("n_purchase"),
        F.count(F.when(F.col("event_type") == "error", 1)).alias("n_error"),
        exact_sum(
            F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(F.lit(0.0))
        ).alias("purchase_value"),
        F.max(type_code).alias("max_type_code"),
    )


# ---------------------------------------------------------------------------
# time formatting (SURVEY O35/O36): strftime-equivalent formatting, GMT.
# Note RFC-2822 day/month names are exercised in unit tests, not here —
# DuckDB %a/%b are locale-stable but the hash compare is stricter in tests.
# ---------------------------------------------------------------------------

_TIMEFMT_ORACLE = """
SELECT event_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_fmt,
       strftime(ts, '%Y-%m-%d') AS ts_date,
       cast(extract(hour FROM ts) as int) AS ts_hour,
       epoch_ms(date_trunc('millisecond', ts)) AS ts_ms
FROM events
WHERE user_id < 10
"""


@register("events_time_formatting", _TIMEFMT_ORACLE, tags=("events", "scalar"))
def events_time_formatting(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.filter(F.col("user_id") < 10).select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_fmt"),
        F.date_format("ts", "yyyy-MM-dd").alias("ts_date"),
        F.hour("ts").cast("int").alias("ts_hour"),
        F.unix_millis(F.date_trunc("millisecond", F.col("ts"))).alias("ts_ms"),
    )


# ---------------------------------------------------------------------------
# sessionization — gap-based sessions (30 min) via lag + cumulative flag.
# Batch analogue of streaming session_window (SURVEY §2.4); one shuffle on
# user_id, all window functions over the same partitioning.
# ---------------------------------------------------------------------------

_SESSION_ORACLE = f"""
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - lag(ts) OVER w <= INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessions AS (
  SELECT user_id, ts, value,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id, cast(session_id as int) AS session_id,
       count(*) AS n_events,
       epoch_ms(date_trunc('millisecond', min(ts))) AS session_start_ms,
       round(cast(epoch_ms(max(ts)) - epoch_ms(min(ts)) as double) / 1000.0, 3) AS duration_s,
       {sql_exact_sum('value')} AS session_value
FROM sessions
GROUP BY user_id, session_id
"""


@register("events_sessionize_30m", _SESSION_ORACLE, tags=("events", "window", "session"), bench=True)
def events_sessionize_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    gap_s = F.unix_millis(F.col("ts")) - F.unix_millis(F.lag("ts").over(w))
    flagged = ev.withColumn(
        "new_session",
        F.when(gap_s <= 30 * 60 * 1000, F.lit(0)).otherwise(F.lit(1)),
    )
    sessions = flagged.withColumn("session_id", F.sum("new_session").over(run).cast("int"))
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.unix_millis(F.date_trunc("millisecond", F.min("ts"))).alias("session_start_ms"),
        F.round(
            (F.unix_millis(F.max("ts")) - F.unix_millis(F.min("ts"))).cast("double") / 1000.0, 3
        ).alias("duration_s"),
        exact_sum("value").alias("session_value"),
    )


# ---------------------------------------------------------------------------
# as-of join (SURVEY §2.4): for each purchase, the most recent prior click
# by the same user.  Spark-first: union the two streams tagged, one window
# pass carries the last click forward — a single shuffle on user_id, no
# range cross-join.  (The applyInPandas merge_asof variant lives in
# operators/joins.py for the general case.)
# ---------------------------------------------------------------------------

_ASOF_ORACLE = """
WITH tagged AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN event_type = 'click' THEN ts END AS click_ts
  FROM events WHERE event_type IN ('click', 'purchase')
), carried AS (
  SELECT user_id, ts, event_id, event_type,
         max(click_ts) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_ts
  FROM tagged
)
SELECT event_id AS purchase_id,
       user_id,
       epoch_ms(date_trunc('millisecond', ts)) AS purchase_ms,
       epoch_ms(date_trunc('millisecond', last_click_ts)) AS last_click_ms
FROM carried
WHERE event_type = 'purchase'
"""


@register("events_asof_last_click_before_purchase", _ASOF_ORACLE, tags=("events", "join", "asof"), bench=True)
def events_asof_last_click_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("event_type").isin("click", "purchase"))
    tagged = ev.withColumn(
        "click_ts", F.when(F.col("event_type") == "click", F.col("ts"))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carried = tagged.withColumn("last_click_ts", F.max("click_ts").over(w))
    return carried.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.unix_millis(F.date_trunc("millisecond", F.col("ts"))).alias("purchase_ms"),
        F.unix_millis(F.date_trunc("millisecond", F.col("last_click_ts"))).alias("last_click_ms"),
    )


# ---------------------------------------------------------------------------
# sliding windows (batch twin of streaming window(ts, "2 days", "1 day")):
# every event lands in two overlapping day-aligned windows.
# Scale: explode factor = window/slide (2×) before the shuffle — acceptable;
# larger ratios should pre-aggregate per slide then roll up.
# ---------------------------------------------------------------------------

_SLIDING_ORACLE = f"""
SELECT epoch_ms(ws) AS win_start_ms, event_type,
       count(*) AS n_events,
       {sql_exact_sum('value')} AS total_value
FROM (
  SELECT unnest([date_trunc('day', ts), date_trunc('day', ts) - INTERVAL 1 DAY]) AS ws,
         event_type, value
  FROM events
)
GROUP BY ws, event_type
"""


@register("events_sliding_window_2d_1d", _SLIDING_ORACLE, tags=("events", "window", "agg"))
def events_sliding_window_2d_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "2 days", "1 day").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            exact_sum("value").alias("total_value"),
        )
        .select(
            F.unix_millis(F.col("w.start")).alias("win_start_ms"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


# ---------------------------------------------------------------------------
# pivot (O43 route-by-category, wide form): daily counts per event_type as
# columns.  Fixed pivot value list → no extra distinct-scan pass.
# ---------------------------------------------------------------------------

_PIVOT_ORACLE = """
SELECT CAST(ts AS DATE) AS event_date,
       count(*) FILTER (WHERE event_type = 'click')    AS click,
       count(*) FILTER (WHERE event_type = 'view')     AS view,
       count(*) FILTER (WHERE event_type = 'signup')   AS signup,
       count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
       count(*) FILTER (WHERE event_type = 'error')    AS error
FROM events
GROUP BY CAST(ts AS DATE)
"""


@register("events_pivot_daily_type_counts", _PIVOT_ORACLE, tags=("events", "pivot"))
def events_pivot_daily_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    kinds = ["click", "view", "signup", "purchase", "error"]
    wide = (
        ev.groupBy(F.to_date("ts").alias("event_date"))
        .pivot("event_type", kinds)
        .count()
    )
    return wide.select(
        "event_date", *[F.coalesce(F.col(k), F.lit(0)).alias(k) for k in kinds]
    )


# ---------------------------------------------------------------------------
# value histogram via width_bucket (SURVEY §2.4 analytics breadth):
# fixed-range bucketing is the shuffle-free histogram at any scale.
# ---------------------------------------------------------------------------

# DuckDB 1.0 has no width_bucket — explicit equivalent arithmetic
# (bucket i covers [min+(i-1)w, min+iw); 0 below range, n+1 at/above max).
_HISTOGRAM_ORACLE = f"""
SELECT event_type,
       cast(CASE WHEN value < 0.0 THEN 0
                 WHEN value >= 200.0 THEN 21
                 ELSE floor(value / 10.0) + 1 END as int) AS bucket,
       count(*) AS n,
       {sql_exact_sum('value')} AS bucket_value
FROM events
GROUP BY event_type, bucket
"""


@register("events_value_histogram", _HISTOGRAM_ORACLE, tags=("events", "agg"))
def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "event_type",
            F.width_bucket(F.col("value"), F.lit(0.0), F.lit(200.0), F.lit(20))
            .cast("int")
            .alias("bucket"),
        )
        .agg(F.count(F.lit(1)).alias("n"), exact_sum("value").alias("bucket_value"))
    )


# ---------------------------------------------------------------------------
# unpivot (stack) — the inverse of events_pivot_daily_type_counts; wide
# per-day type counts melted back to long form (SURVEY §2.4 pivot/unpivot).
# ---------------------------------------------------------------------------

_UNPIVOT_ORACLE = """
WITH wide AS (
  SELECT CAST(ts AS DATE) AS event_date,
         count(*) FILTER (WHERE event_type = 'click')    AS click,
         count(*) FILTER (WHERE event_type = 'purchase') AS purchase
  FROM events GROUP BY 1
)
SELECT event_date, kind, n FROM (
  SELECT event_date, 'click' AS kind, click AS n FROM wide
  UNION ALL
  SELECT event_date, 'purchase' AS kind, purchase AS n FROM wide
) WHERE n > 0
"""


@register("events_unpivot_type_counts", _UNPIVOT_ORACLE, tags=("events", "pivot"))
def events_unpivot_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    wide = (
        ev.groupBy(F.to_date("ts").alias("event_date"))
        .agg(
            F.count(F.when(F.col("event_type") == "click", 1)).alias("click"),
            F.count(F.when(F.col("event_type") == "purchase", 1)).alias("purchase"),
        )
    )
    long = wide.selectExpr(
        "event_date", "stack(2, 'click', click, 'purchase', purchase) AS (kind, n)"
    )
    return long.filter(F.col("n") > 0)


# ---------------------------------------------------------------------------
# SCD2 (type-2 slowly-changing dimension) history build: treat each
# user's event_type as an observed attribute; collapse consecutive equal
# observations into validity intervals (valid_from, valid_to half-open,
# NULL valid_to = current).  The standard warehouse history-table build,
# as one shuffle on user_id with all window passes over that same
# partitioning (change flag → island id → interval bounds via lead).
# Exactly-integer interval bounds (epoch ms); deterministic tiebreak on
# event_id for same-ts observations.
# ---------------------------------------------------------------------------

_SCD2_ORACLE = """
WITH obs AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN event_type = lag(event_type) OVER w THEN 0 ELSE 1
         END AS chg
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), isl AS (
  SELECT user_id, ts, event_id, event_type,
         sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS island
  FROM obs
), iv AS (
  SELECT user_id, event_type, island,
         epoch_ms(date_trunc('millisecond', min(ts))) AS valid_from_ms,
         count(*) AS n_obs
  FROM isl
  GROUP BY user_id, event_type, island
)
SELECT user_id, event_type,
       valid_from_ms,
       lead(valid_from_ms) OVER (PARTITION BY user_id ORDER BY island)
         AS valid_to_ms,
       CASE WHEN lead(valid_from_ms) OVER (PARTITION BY user_id ORDER BY island)
                 IS NULL THEN 1 ELSE 0 END AS is_current,
       n_obs
FROM iv
ORDER BY user_id, valid_from_ms, event_type
"""


@register(
    "events_scd2_type_history",
    _SCD2_ORACLE,
    tags=("events", "window", "warehouse"),
)
def events_scd2_type_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    obs = ev.withColumn(
        "chg",
        F.when(F.col("event_type") == F.lag("event_type").over(w), F.lit(0)).otherwise(
            F.lit(1)
        ),
    )
    isl = obs.withColumn("island", F.sum("chg").over(run))
    iv = isl.groupBy("user_id", "event_type", "island").agg(
        F.unix_millis(F.date_trunc("millisecond", F.min("ts"))).alias("valid_from_ms"),
        F.count(F.lit(1)).alias("n_obs"),
    )
    wl = Window.partitionBy("user_id").orderBy("island")
    return (
        iv.withColumn("valid_to_ms", F.lead("valid_from_ms").over(wl))
        .withColumn(
            "is_current",
            F.when(F.col("valid_to_ms").isNull(), F.lit(1)).otherwise(F.lit(0)),
        )
        .select(
            "user_id", "event_type", "valid_from_ms", "valid_to_ms", "is_current",
            "n_obs",
        )
        .orderBy("user_id", "valid_from_ms", "event_type")
    )


# ---------------------------------------------------------------------------
# Funnel analysis: strictly-ordered stage progression (view → click →
# purchase) per user, earliest-completion semantics — the canonical
# event-analytics query over a pub/sub event stream.  One shuffle on
# user_id; each stage is a conditional min over the previous stage's
# timestamp, all inside a single aggregate pass (no self-joins, no
# window cascade).  Deterministic: stage times are min() over exact
# timestamps.
# ---------------------------------------------------------------------------

_FUNNEL_ORACLE = """
WITH s1 AS (
  SELECT user_id, min(ts) AS t1
  FROM events WHERE event_type = 'view' GROUP BY user_id
), s2 AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN s1 ON s1.user_id = e.user_id
  WHERE e.event_type = 'click' AND e.ts > s1.t1
  GROUP BY e.user_id
), s3 AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN s2 ON s2.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
  GROUP BY e.user_id
)
SELECT cast(count(s1.user_id) AS BIGINT) AS n_view,
       cast(count(s2.user_id) AS BIGINT) AS n_click,
       cast(count(s3.user_id) AS BIGINT) AS n_purchase,
       round(cast(count(s3.user_id) AS DOUBLE) / count(s1.user_id), 6)
         AS conversion
FROM s1
LEFT JOIN s2 ON s2.user_id = s1.user_id
LEFT JOIN s3 ON s3.user_id = s1.user_id
"""


@register(
    "events_funnel_conversion",
    _FUNNEL_ORACLE,
    tags=("events", "analytics", "funnel"),
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    # single aggregate pass per stage chain: conditional mins over the
    # previous stage's time, all partitioned on user_id
    t1 = ev.where(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("ts").alias("t1")
    )
    t2 = (
        ev.where(F.col("event_type") == "click")
        .join(t1, "user_id")
        .where(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    t3 = (
        ev.where(F.col("event_type") == "purchase")
        .join(t2, "user_id")
        .where(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    funnel = t1.join(t2, "user_id", "left").join(t3, "user_id", "left")
    return funnel.agg(
        F.count("t1").cast("bigint").alias("n_view"),
        F.count("t2").cast("bigint").alias("n_click"),
        F.count("t3").cast("bigint").alias("n_purchase"),
        F.round(
            F.count("t3").cast("double") / F.count("t1").cast("double"), 6
        ).alias("conversion"),
    )


# ---------------------------------------------------------------------------
# Retention cohorts: users grouped by first-seen WEEK, activity counted
# per week offset — the cohort-retention matrix every product-analytics
# stack computes.  Two shuffles (first-seen per user; cohort × offset
# rollup), both on bounded keys; distinct-user counts are exact.
# ---------------------------------------------------------------------------

_RETENTION_ORACLE = """
WITH first_seen AS (
  SELECT user_id,
         date_diff('day', DATE '2024-01-01', CAST(min(ts) AS DATE)) // 7
           AS cohort_week
  FROM events GROUP BY user_id
), activity AS (
  SELECT e.user_id, f.cohort_week,
         date_diff('day', DATE '2024-01-01', CAST(e.ts AS DATE)) // 7
           - f.cohort_week AS week_offset
  FROM events e JOIN first_seen f ON f.user_id = e.user_id
)
SELECT cast(cohort_week AS INT) AS cohort_week,
       cast(week_offset AS INT) AS week_offset,
       cast(count(DISTINCT user_id) AS BIGINT) AS n_active,
       cast(count(*) AS BIGINT) AS n_events
FROM activity
GROUP BY cohort_week, week_offset
ORDER BY cohort_week, week_offset
"""


@register(
    "events_retention_cohorts",
    _RETENTION_ORACLE,
    tags=("events", "analytics", "cohort"),
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("user_id", "ts")
    epoch = F.lit("2024-01-01").cast("date")
    week = lambda c: (F.datediff(F.to_date(c), epoch) / 7).cast("int")  # noqa: E731
    first_seen = ev.groupBy("user_id").agg(week(F.min("ts")).alias("cohort_week"))
    activity = ev.join(first_seen, "user_id").select(
        "user_id",
        "cohort_week",
        (week(F.col("ts")) - F.col("cohort_week")).cast("int").alias("week_offset"),
    )
    return (
        activity.groupBy("cohort_week", "week_offset")
        .agg(
            F.countDistinct("user_id").cast("bigint").alias("n_active"),
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
        )
        .orderBy("cohort_week", "week_offset")
    )


# ---------------------------------------------------------------------------
# Pareto concentration: how few top users carry 50% / 80% / 95% of total
# event value.  Users aggregate first (bounded key), then the
# scale-safe global cumsum (operators/ranks.py — range buckets +
# offsets, no single-task window) ranks them by value descending;
# thresholds read off the cumulative share.  Exact integers end-to-end:
# value in cents, thresholds via integer comparison.
# ---------------------------------------------------------------------------

_PARETO_ORACLE = """
WITH u AS (
  SELECT user_id, cast(sum(cast(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY user_id
), ranked AS (
  SELECT user_id, cents,
         sum(cents) OVER (ORDER BY cents DESC, user_id
                          ROWS UNBOUNDED PRECEDING) AS cum,
         sum(cents) OVER () AS total
  FROM u
)
SELECT
  cast(min(CASE WHEN cum * 100 >= total * 50 THEN rn END) AS BIGINT) AS users_to_50pct,
  cast(min(CASE WHEN cum * 100 >= total * 80 THEN rn END) AS BIGINT) AS users_to_80pct,
  cast(min(CASE WHEN cum * 100 >= total * 95 THEN rn END) AS BIGINT) AS users_to_95pct,
  cast(count(*) AS BIGINT) AS n_users
FROM (SELECT *, row_number() OVER (ORDER BY cents DESC, user_id) AS rn FROM ranked)
"""


@register(
    "events_pareto_user_value",
    _PARETO_ORACLE,
    tags=("events", "analytics", "rank"),
)
def events_pareto_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    from event_streaming_spark.operators.ranks import (
        with_global_cumsum,
        with_global_row_number,
    )

    ev = load(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.sum(F.round(F.col("value") * 100).cast("bigint")).cast("bigint").alias("cents")
    )
    order = [F.desc("cents"), F.asc("user_id")]
    cum, total = with_global_cumsum(u, order, "cents", "cum")
    ranked, n_users = with_global_row_number(cum, order, "rn")
    # bigint literals: an int32 `total` times pct overflows 32-bit ANSI
    # arithmetic (Spark types small literals as INTEGER)
    hit = lambda pct: F.min(  # noqa: E731
        F.when(
            F.col("cum") * F.lit(100).cast("bigint")
            >= F.lit(int(total)).cast("bigint") * F.lit(pct).cast("bigint"),
            F.col("rn"),
        )
    ).cast("bigint")
    return ranked.agg(
        hit(50).alias("users_to_50pct"),
        hit(80).alias("users_to_80pct"),
        hit(95).alias("users_to_95pct"),
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
    )


# ---------------------------------------------------------------------------
# Exact distributed variance: per-type mean/variance derived from
# EXACT integer moments (count, sum of cents, sum of squared cents) —
# the float-free version of the textbook two-pass-free variance.  The
# moments are order-independent int64 sums (max |cents| ~1e5, squares
# ~1e10, 1e9 rows before overflow at 100 TB — document the DECIMAL(38)
# escalation there), so mean and variance are bit-identical across
# engines: the same IEEE divisions of the same exact integers.
# ---------------------------------------------------------------------------

_VARSTATS_ORACLE = """
WITH m AS (
  SELECT event_type,
         count(*) AS n,
         cast(sum(cast(round(value * 100) AS BIGINT)) AS BIGINT) AS s1,
         cast(sum(cast(round(value * 100) AS BIGINT)
                  * cast(round(value * 100) AS BIGINT)) AS BIGINT) AS s2
  FROM events GROUP BY event_type
)
SELECT event_type, n, s1, s2,
       round(cast(s1 AS DOUBLE) / n / 100.0, 6) AS mean_value,
       round((cast(s2 AS DOUBLE) / n
              - (cast(s1 AS DOUBLE) / n) * (cast(s1 AS DOUBLE) / n))
             / 10000.0, 6) AS variance_value
FROM m
ORDER BY event_type
"""


@register(
    "events_exact_variance_by_type",
    _VARSTATS_ORACLE,
    tags=("events", "agg", "exact"),
)
def events_exact_variance_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("bigint")
    m = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(cents).cast("bigint").alias("s1"),
        F.sum(cents * cents).cast("bigint").alias("s2"),
    )
    s1d = F.col("s1").cast("double")
    s2d = F.col("s2").cast("double")
    nd = F.col("n").cast("double")
    return m.select(
        "event_type", "n", "s1", "s2",
        F.round(s1d / nd / 100.0, 6).alias("mean_value"),
        F.round((s2d / nd - (s1d / nd) * (s1d / nd)) / 10000.0, 6).alias(
            "variance_value"
        ),
    ).orderBy("event_type")
