"""Event-analytics tranche: funnel conversion, weekly retention cohorts,
user-value deciles — the canonical product-analytics queries an event
streaming engine is FOR (the reference's topics carry exactly this kind
of click/view/purchase traffic; include/events-agency.h:29,51-52 defines
the event flow, these queries are what consumers compute from it).

Scale notes per query; shared discipline: everything keys on ``user_id``
(the natural partition key for behavioral analytics), so each query is
one shuffle on user_id followed by cheap re-aggregations of the
already-small per-user summaries.  Timestamp math is integer-exact
(µs timestamps, week-truncated date arithmetic), so no float drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from event_streaming_spark.functions.numeric import (
    exact_pct_agg,
    sql_exact_pct_agg,
    sql_exact_sum,
)
from event_streaming_spark.plans.catalog import load, register

# ---------------------------------------------------------------------------
# Ordered funnel: view → click (after the first view) → purchase (after
# that click).  The sequential-min formulation (t1 = min view; t2 = min
# click > t1; t3 = min purchase > t2) is the standard strict-funnel
# semantics.  Scale: three passes over a user_id-partitioned fact — each
# stage's output is per-user (150 rows/SF), so stages 2-3 join a
# broadcast-small summary back to the fact; no O(n²) anywhere.
# ---------------------------------------------------------------------------

_FUNNEL_ORACLE = """
WITH v AS (
  SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.t1
  GROUP BY e.user_id
), p AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t2
  GROUP BY e.user_id
)
SELECT (SELECT count(*) FROM v) AS n_view,
       (SELECT count(*) FROM c) AS n_view_click,
       (SELECT count(*) FROM p) AS n_view_click_purchase
"""


@register("events_funnel_view_click_purchase", _FUNNEL_ORACLE, tags=("events", "funnel", "agg"))
def events_funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        v.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_view_click")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_view_click_purchase")))
    )


# ---------------------------------------------------------------------------
# Weekly retention cohorts: users grouped by the week of their first event;
# for each (cohort_week, weeks-since-cohort) the distinct active users.
# Both sides of the offset arithmetic are Monday-truncated dates, so the
# day-difference is an exact multiple of 7 in both engines.  Scale: one
# shuffle on user_id for first-event, one join back (per-user summary
# broadcasts), one distinct-agg on the (cohort, offset) pair.
# ---------------------------------------------------------------------------

_RETENTION_ORACLE = """
WITH first_seen AS (
  SELECT user_id, cast(date_trunc('week', min(ts)) AS DATE) AS cohort_week
  FROM events GROUP BY user_id
)
SELECT cohort_week,
       cast(date_diff('day', cohort_week, cast(date_trunc('week', e.ts) AS DATE)) / 7 AS INT)
         AS week_offset,
       count(DISTINCT e.user_id) AS n_active
FROM events e JOIN first_seen f ON e.user_id = f.user_id
GROUP BY cohort_week, week_offset
"""


@register("events_retention_weekly_cohorts", _RETENTION_ORACLE, tags=("events", "agg", "window"))
def events_retention_weekly_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("user_id", "ts")
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    week = F.date_trunc("week", F.col("ts")).cast("date")
    return (
        ev.join(first_seen, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff(week, F.col("cohort_week")) / 7).cast("int").alias("week_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_active"))
    )


# ---------------------------------------------------------------------------
# User-value deciles: ntile(10) + percent_rank semantics over per-user
# purchase spend, WITHOUT a global single-partition window sort.
#
# Scale design (billions of users): range-partition the per-user summary
# on the rank order, row_number() within each range bucket (parallel
# local sorts), then add per-bucket offsets.  The offsets come from one
# count per bucket — O(#partitions) rows, bounded by cluster config, not
# by data — collected to the driver and folded back in as literals.  The
# bucketed frame is pinned via the materializer so the count job and the
# final job see the same (sampled) range boundaries.  From the global
# row number rn, both outputs are closed-form:
#   percent_rank = (rn-1)/(N-1)
#   ntile(10)    = first N%10 tiles get ceil(N/10) rows, rest floor(N/10)
# which reproduces the window functions bit-for-bit (ORDER BY is total:
# user_id is a unique tiebreak).
# ---------------------------------------------------------------------------

_DECILES_ORACLE = f"""
WITH per_user AS (
  SELECT user_id, {sql_exact_sum('value')} AS total_value
  FROM events WHERE event_type = 'purchase' GROUP BY user_id
)
SELECT user_id, total_value,
       ntile(10) OVER (ORDER BY total_value DESC, user_id) AS decile,
       round(percent_rank() OVER (ORDER BY total_value DESC, user_id), 6) AS pct_rank
FROM per_user
"""


@register("events_user_value_deciles", _DECILES_ORACLE, tags=("events", "window", "agg"))
def events_user_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from event_streaming_spark.functions.numeric import exact_sum
    from event_streaming_spark.operators.ranks import with_global_row_number

    per_user = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(exact_sum("value").alias("total_value"))
    )
    ranked, n_total = with_global_row_number(
        per_user, [F.desc("total_value"), F.asc("user_id")], "rn"
    )
    rn = F.col("rn")
    tile_q, tile_r = divmod(n_total, 10)  # ntile fill: first r tiles get q+1 rows
    if tile_q == 0:
        decile = rn
    else:
        cut = tile_r * (tile_q + 1)
        decile = F.when(
            rn <= F.lit(cut), F.floor((rn - 1) / F.lit(tile_q + 1)) + 1
        ).otherwise(F.lit(tile_r) + F.floor((rn - F.lit(cut) - 1) / F.lit(tile_q)) + 1)
    pct = (
        F.lit(0.0)
        if n_total <= 1
        else F.round((rn - 1).cast("double") / F.lit(float(n_total - 1)), 6)
    )
    return ranked.select(
        "user_id",
        "total_value",
        decile.cast("int").alias("decile"),
        pct.alias("pct_rank"),
    )


# ---------------------------------------------------------------------------
# Sequence pattern matching (MATCH_RECOGNIZE-lite): encode each user's
# time-ordered event types as a letter string, count funnel occurrences
# with a regex ('v[vc]*p' = views, optional clicks, then a purchase;
# non-overlapping, leftmost-greedy in both engines).  Ordering inside the
# aggregation is made deterministic by sorting on the UNIQUE (ts,
# event_id) pair — collect_list alone has no order contract under
# parallelism.  Scale: one shuffle on user_id; per-user sequences are
# memory-bounded by per-user activity (cap with a windowed top-N slice if
# a key can be pathological).
# ---------------------------------------------------------------------------

_CODE_SQL = ("CASE event_type WHEN 'view' THEN 'v' WHEN 'click' THEN 'c' "
             "WHEN 'purchase' THEN 'p' WHEN 'signup' THEN 's' ELSE 'e' END")
_PATTERN = "v[vc]*p"

_SEQ_ORACLE = f"""
WITH seq AS (
  SELECT user_id,
         string_agg({_CODE_SQL}, '' ORDER BY ts, event_id) AS s
  FROM events GROUP BY user_id
)
SELECT user_id,
       len(regexp_extract_all(s, '{_PATTERN}')) AS n_funnels,
       len(s) AS n_events
FROM seq
"""


@register("events_sequence_pattern_funnels", _SEQ_ORACLE, tags=("events", "funnel", "regex"))
def events_sequence_pattern_funnels(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    code = (
        F.when(F.col("event_type") == "view", "v")
        .when(F.col("event_type") == "click", "c")
        .when(F.col("event_type") == "purchase", "p")
        .when(F.col("event_type") == "signup", "s")
        .otherwise("e")
    )
    seq = (
        ev.select("user_id", F.struct("ts", "event_id", code.alias("code")).alias("rec"))
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(F.array_sort(F.collect_list("rec")), lambda r: r["code"]), ""
            ).alias("s")
        )
    )
    return seq.select(
        "user_id",
        F.size(F.regexp_extract_all("s", F.lit(_PATTERN), 0)).cast("long").alias("n_funnels"),
        F.length("s").cast("long").alias("n_events"),
    )


# ---------------------------------------------------------------------------
# Daily volume anomalies per event type: z-score of each day's count
# against that type's mean/std.  Every moment (Σn, Σn², day count) is an
# exact integer, so mu/sigma and the z-scores are identical doubles in
# both engines (sqrt and division are correctly-rounded IEEE ops).
# Scale: the z-score layer runs over the per-(type, day) rollup — $
# |types × days| rows — never the raw fact; the same shape monitors
# billions of events/day with the incremental-rollup partials as input.
# ---------------------------------------------------------------------------

_ANOMALY_ORACLE = """
WITH daily AS (
  SELECT event_type, cast(ts AS DATE) AS event_date, count(*) AS n_events
  FROM events GROUP BY 1, 2
), stats AS (
  SELECT event_type,
         cast(sum(n_events) as double) / count(*) AS mu,
         sqrt(greatest(cast(sum(n_events * n_events) as double) / count(*)
                       - (cast(sum(n_events) as double) / count(*))
                         * (cast(sum(n_events) as double) / count(*)), 0)) AS sigma
  FROM daily GROUP BY event_type
)
SELECT d.event_type, d.event_date, d.n_events,
       round((d.n_events - s.mu) / nullif(s.sigma, 0), 6) AS zscore,
       (abs(d.n_events - s.mu) > 2 * s.sigma) AS is_anomaly
FROM daily d JOIN stats s ON d.event_type = s.event_type
"""


@register("events_daily_anomaly_zscore", _ANOMALY_ORACLE, tags=("events", "agg", "audit"))
def events_daily_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("event_date")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    n = F.col("n_events")
    cnt = F.count(F.lit(1))
    mu = F.sum(n).cast("double") / cnt
    sigma = F.sqrt(
        F.greatest(
            F.sum(n * n).cast("double") / cnt - mu * mu,
            F.lit(0.0),
        )
    )
    stats = daily.groupBy(F.col("event_type").alias("s_type")).agg(
        mu.alias("mu"), sigma.alias("sigma")
    )
    return (
        daily.join(F.broadcast(stats), daily.event_type == F.col("s_type"))
        .select(
            "event_type",
            "event_date",
            "n_events",
            F.round((n - F.col("mu")) / F.nullif(F.col("sigma"), F.lit(0.0)), 6).alias(
                "zscore"
            ),
            (F.abs(n - F.col("mu")) > 2 * F.col("sigma")).alias("is_anomaly"),
        )
    )


# ---------------------------------------------------------------------------
# Stream-to-dimension enrichment: purchases joined to the customer
# dimension (events.user_id ↔ c_custkey per TESTDATA.md), rolled up by
# market segment.  The canonical streaming-enrichment shape: the fact
# filters at the scan, the dimension broadcasts, one agg shuffle on a
# low-cardinality key collapsed map-side.
# ---------------------------------------------------------------------------

_ENRICH_ORACLE = f"""
SELECT c_mktsegment,
       count(*) AS n_purchases,
       count(DISTINCT user_id) AS n_buyers,
       {sql_exact_sum('value')} AS total_value
FROM events JOIN customer ON user_id = c_custkey
WHERE event_type = 'purchase'
GROUP BY c_mktsegment
"""


@register("events_enrich_purchases_by_segment", _ENRICH_ORACLE, tags=("events", "join", "agg"))
def events_enrich_purchases_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from event_streaming_spark.functions.numeric import exact_sum

    ev = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        ev.join(cust, ev.user_id == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.count_distinct("user_id").alias("n_buyers"),
            exact_sum("value").alias("total_value"),
        )
    )


# ---------------------------------------------------------------------------
# Time-series gap-fill / resample: daily event counts per type with
# missing days emitted as explicit zeros over each type's own [min, max]
# day span — the regularization step before any rolling-window or anomaly
# model (a gap and a zero are different signals; events_daily_anomaly_
# zscore assumes a dense series).  Scale: the dense day axis is built
# from the per-type span AGGREGATE (|types| rows, a few KB at any corpus
# size) exploded to |types| × days rows, then a left join back to the
# daily aggregate on (type, day) — both sides are post-aggregation
# smalls; the raw fact is touched once by the count.
# ---------------------------------------------------------------------------

_GAP_FILL_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
  FROM events GROUP BY 1, 2
), spans AS (
  SELECT event_type, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1
), axis AS (
  SELECT event_type, unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
  FROM spans
)
SELECT axis.event_type AS event_type, axis.day AS day,
       coalesce(daily.n, 0) AS n_events,
       CASE WHEN daily.n IS NULL THEN 1 ELSE 0 END AS gap_filled
FROM axis LEFT JOIN daily ON axis.event_type = daily.event_type AND axis.day = daily.day
"""


@register("events_gap_fill_daily", _GAP_FILL_ORACLE, tags=("events", "timeseries"))
def events_gap_fill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        load(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    axis = (
        daily.groupBy("event_type")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select("event_type", F.explode(F.sequence("d0", "d1")).alias("day"))
    )
    return (
        axis.join(daily, ["event_type", "day"], "left")
        .select(
            "event_type",
            "day",
            F.coalesce("n", F.lit(0)).alias("n_events"),
            F.when(F.col("n").isNull(), F.lit(1)).otherwise(F.lit(0)).alias("gap_filled"),
        )
    )


# ---------------------------------------------------------------------------
# Deterministic mode per group: each user's most frequent event type, ties
# broken lexically — the categorical analogue of max/avg in feature
# engineering (e.g. "dominant behavior" features).  Built-in ``mode()``
# is tie-nondeterministic in both engines, so the contract is expressed
# as count-then-rank: one partial-aggregated count shuffle on
# (user, type), then a rank over the tiny per-user type summary (≤|types|
# rows per user).  Scale: both shuffles key on user_id × low-cardinality
# type — no skew beyond user skew itself, no global ordering anywhere.
# ---------------------------------------------------------------------------

_MODE_ORACLE = """
WITH counts AS (
  SELECT user_id, event_type, count(*) AS n
  FROM events GROUP BY 1, 2
), ranked AS (
  SELECT user_id, event_type, n,
         row_number() OVER (PARTITION BY user_id ORDER BY n DESC, event_type) AS rn
  FROM counts
)
SELECT user_id, event_type AS modal_type, n AS n_occurrences
FROM ranked WHERE rn = 1
"""


@register("events_modal_type_per_user", _MODE_ORACLE, tags=("events", "agg", "window"))
def events_modal_type_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    counts = (
        load(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("user_id").orderBy(F.col("n").desc(), F.col("event_type"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("modal_type"), F.col("n").alias("n_occurrences"))
    )


# ---------------------------------------------------------------------------
# Equi-depth histogram of event values: 9 exact decile boundaries (one
# tiny global aggregate, broadcast as a single row), then a stateless
# bucket-index projection and one count shuffle on ≤10 keys — the data
# profile that feeds skew decisions and range-partition planning.
# Boundaries are rounded to 6 dp before bucketing so both engines cut at
# identical doubles.  At 100 TB: swap percentile → approx_percentile,
# identical downstream plan.
# ---------------------------------------------------------------------------

_EQUIDEPTH_ORACLE = """
WITH b AS (
  SELECT [round(quantile_cont(value, 0.1), 6), round(quantile_cont(value, 0.2), 6), round(quantile_cont(value, 0.3), 6), round(quantile_cont(value, 0.4), 6), round(quantile_cont(value, 0.5), 6), round(quantile_cont(value, 0.6), 6), round(quantile_cont(value, 0.7), 6), round(quantile_cont(value, 0.8), 6), round(quantile_cont(value, 0.9), 6)] AS bs
  FROM events
)
SELECT bucket, count(*) AS n_events,
       round(min(value), 6) AS lo, round(max(value), 6) AS hi
FROM (
  SELECT value, len(list_filter(b.bs, x -> x <= value)) AS bucket
  FROM events, b
)
GROUP BY bucket
"""


@register("events_value_equidepth_histogram", _EQUIDEPTH_ORACLE, tags=("events", "agg", "profile"))
def events_value_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    bounds = ev.agg(
        F.array(
            *[F.round(F.expr(f"percentile(value, {x/10.0})"), 6) for x in range(1, 10)]
        ).alias("bs")
    )
    bucket = F.size(F.filter(F.col("bs"), lambda x: x <= F.col("value")))
    return (
        ev.crossJoin(F.broadcast(bounds))
        .select("value", bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.min("value"), 6).alias("lo"),
            F.round(F.max("value"), 6).alias("hi"),
        )
    )


# ---------------------------------------------------------------------------
# Skew report: the 20 hottest keys with their event share — the diagnosis
# run BEFORE choosing salting / AQE skew-join settings (operators/
# skew.py).  Scale: per-key count with map-side combine, TakeOrdered
# top-20 (never a global sort), then rank/share computed over the 20
# surviving rows — bounded state by construction, no unpartitioned
# window over the key space.
# ---------------------------------------------------------------------------

_SKEW_ORACLE = """
WITH c AS (
  SELECT user_id, count(*) AS n_events FROM events GROUP BY 1
), tot AS (SELECT sum(n_events) AS t FROM c),
top AS (
  SELECT user_id, n_events FROM c ORDER BY n_events DESC, user_id LIMIT 20
)
SELECT row_number() OVER (ORDER BY n_events DESC, user_id) AS rnk,
       user_id, n_events,
       round(cast(n_events AS DOUBLE) / t, 6) AS share
FROM top, tot
"""


@register("events_skew_report_hot_users", _SKEW_ORACLE, tags=("events", "agg", "profile"))
def events_skew_report_hot_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    counts = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    total = counts.agg(F.sum("n_events").alias("t"))
    top = counts.orderBy(F.desc("n_events"), F.asc("user_id")).limit(20)
    w = Window.orderBy(F.desc("n_events"), F.asc("user_id"))  # 20 rows — bounded
    return (
        top.crossJoin(F.broadcast(total))
        .withColumn("rnk", F.row_number().over(w))
        .select(
            "rnk",
            "user_id",
            "n_events",
            F.round(F.col("n_events").cast("double") / F.col("t"), 6).alias("share"),
        )
    )


# ---------------------------------------------------------------------------
# Inter-event gap percentiles per event type: lag() partitioned by user
# (per-user partitions — never global), gaps in integer microseconds, then an
# exact percentile aggregate per type.  The latency/recency profile that
# sets session-gap and watermark thresholds.  Tie-break on event_id makes
# the lag deterministic under equal timestamps (replay-safe).
# ---------------------------------------------------------------------------

# Exact-integer linear interpolation (type-7, the quantile_cont /
# percentile() formula) computed BY HAND in both engines: engine-native
# interpolation differs in float evaluation order, which showed up as a
# last-ulp mismatch at sf0.1 (p99 over 240k gaps).  Gaps are integer µs,
# so with t = (n-1)·p: lo = gap[t div 100], f = t mod 100, the
# interpolated value is (lo·(100-f) + hi·f)/100 — an exact int64
# numerator and ONE identical division.

_PCTS = (50, 90, 99)


_GAPS_ORACLE = f"""
WITH g AS (
  SELECT event_type,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
  FROM events
), pos AS (
  SELECT event_type, gap_us AS val,
         row_number() OVER (PARTITION BY event_type ORDER BY gap_us) AS rv,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM g WHERE gap_us IS NOT NULL
)
SELECT event_type, max(n) AS n_gaps,
       {", ".join(f"{sql_exact_pct_agg(p)} AS p{p}_us" for p in _PCTS)}
FROM pos
GROUP BY event_type
"""


@register("events_user_gap_percentiles", _GAPS_ORACLE, tags=("events", "window", "agg"))
def events_user_gap_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from event_streaming_spark.operators.ranks import with_group_rank

    ev = load(spark, sf_dir, "events")
    # the lag window partitions by user_id — high cardinality, scales out
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sec = F.unix_micros(F.col("ts"))
    g = ev.select(
        "event_type", (sec - F.lag(sec).over(w)).alias("gap_us")
    ).filter(F.col("gap_us").isNotNull())
    # ...but the percentile rank must NOT partition by event_type (a
    # handful of types = one task per type at any scale); use the
    # range-partitioned group-rank primitive instead.
    pos = with_group_rank(
        g.select("event_type", F.col("gap_us").alias("val")), "event_type", "val"
    )
    return pos.groupBy("event_type").agg(
        F.max("n").alias("n_gaps"),
        *[exact_pct_agg(p).alias(f"p{p}_us") for p in _PCTS],
    )
