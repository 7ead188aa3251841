"""Time-series analytics tranche 3: time-weighted averages, exact
cross-series correlation, and OHLC bars — the timeseries-DB surface
(kdb/InfluxDB/TimescaleDB staples) expressed Spark-first over the events
table.

Determinism design (repo rule, functions/numeric.py): no float SUM ever
crosses an engine boundary.  TWA accumulates ``round(value·10⁶)::decimal
× weight_µs`` (exact integers; DECIMAL(38) headroom), correlation is the
integer-moments Pearson formula (sqrt/div on exact ints — IEEE sqrt is
correctly rounded, so both engines produce the same double), OHLC picks
raw doubles by a total (ts, event_id) order with no arithmetic at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from event_streaming_spark.functions.numeric import exact_sum, sql_exact_sum
from event_streaming_spark.plans.catalog import load, register

# ---------------------------------------------------------------------------
# Time-weighted average: each event's value "holds" until the user's next
# event that day; segment weight = microseconds held.  The standard
# irregular-sampling aggregate (kdb twa / TimescaleDB time_weight).
# Scale: one lead() window partitioned by (user, day) — key cardinality
# grows with the data so the sort is fully parallel, no global window;
# then one small per-day agg.  The value×weight product is exact:
# scaled-long value × µs weight in DECIMAL(38,0) (can exceed int64 —
# 10⁹ scale × 8.6·10¹⁰ µs/day — so the narrow exact_sum is not enough).
# ---------------------------------------------------------------------------

_TWA_ORACLE = """
WITH seg AS (
  SELECT CAST(ts AS DATE) AS event_date,
         cast(round(value * 1e6) as hugeint) AS v_scaled,
         lead(epoch_us(ts)) OVER (
           PARTITION BY user_id, CAST(ts AS DATE) ORDER BY ts, event_id
         ) - epoch_us(ts) AS w_us
  FROM events
)
SELECT event_date,
       cast(count(*) as bigint) AS n_segments,
       cast(sum(w_us) as bigint) AS total_w_us,
       round(cast(sum(v_scaled * w_us) as double) / 1e6 / sum(w_us), 6) AS twa_value
FROM seg WHERE w_us IS NOT NULL
GROUP BY event_date
"""


@register("events_time_weighted_avg_daily", _TWA_ORACLE, tags=("events", "timeseries"), bench=True)
def events_time_weighted_avg_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day TWA of `value` across all users' holding segments.

    The last event of a user-day has no holding period and is dropped —
    the sampled-and-held contract (reference events are point-in-time
    observations, /root/reference/include/events.h event ts semantics)."""
    ev = load(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("user_id", F.to_date("ts")).orderBy("ts", "event_id")
    seg = ev.select(
        F.to_date("ts").alias("event_date"),
        F.round(F.col("value") * 1e6).cast("decimal(38,0)").alias("v_scaled"),
        (F.lead(us).over(w) - us).alias("w_us"),
    ).filter(F.col("w_us").isNotNull())
    return seg.groupBy("event_date").agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.sum("w_us").cast("long").alias("total_w_us"),
        F.round(
            F.sum(F.col("v_scaled") * F.col("w_us").cast("decimal(38,0)")).cast("double")
            / 1e6
            / F.sum("w_us"),
            6,
        ).alias("twa_value"),
    )


# ---------------------------------------------------------------------------
# Cross-series Pearson correlation between event types' daily volumes,
# on the DENSE day×type grid (absent days count 0 — skipping them biases
# r).  Integer-moments formula: all five sums are exact bigints; the one
# float step (sqrt, divide) is IEEE-identical across engines.
# Scale: the only data-sized op is the (day,type) count with map-side
# combine; the grid/pair joins touch days×types rows (bounded,
# broadcast); at 100 TB this is the canonical "aggregate first, then
# analyze the tiny summary" shape.
# ---------------------------------------------------------------------------

_CORR_ORACLE = """
WITH cnt AS (
  SELECT CAST(ts AS DATE) AS d, event_type AS t, cast(count(*) as bigint) AS c
  FROM events GROUP BY 1, 2
),
days AS (SELECT DISTINCT d FROM cnt),
types AS (SELECT DISTINCT t FROM cnt),
dense AS (
  SELECT days.d, types.t, coalesce(cnt.c, 0) AS c
  FROM days CROSS JOIN types LEFT JOIN cnt ON cnt.d = days.d AND cnt.t = types.t
),
pairs AS (
  SELECT a.t AS type_a, b.t AS type_b, a.c AS x, b.c AS y
  FROM dense a JOIN dense b ON a.d = b.d AND a.t < b.t
),
m AS (
  SELECT type_a, type_b, cast(count(*) as bigint) AS n,
         sum(x) AS sx, sum(y) AS sy, sum(x*x) AS sxx, sum(y*y) AS syy, sum(x*y) AS sxy
  FROM pairs GROUP BY type_a, type_b
)
SELECT type_a, type_b, n,
       CASE WHEN (n*sxx - sx*sx) > 0 AND (n*syy - sy*sy) > 0
            THEN round(cast(n*sxy - sx*sy as double) /
                       (sqrt(cast(n*sxx - sx*sx as double)) * sqrt(cast(n*syy - sy*sy as double))), 6)
       END AS pearson_r
FROM m
"""


@register("events_type_volume_correlation", _CORR_ORACLE, tags=("events", "timeseries", "stats"))
def events_type_volume_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    cnt = ev.groupBy(
        F.to_date("ts").alias("d"), F.col("event_type").alias("t")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    days = cnt.select("d").distinct()
    types = cnt.select("t").distinct()
    dense = (
        days.crossJoin(types)
        .join(cnt, ["d", "t"], "left")
        .select("d", "t", F.coalesce("c", F.lit(0)).alias("c"))
    )
    a, b = dense.alias("a"), dense.alias("b")
    pairs = a.join(b, (F.col("a.d") == F.col("b.d")) & (F.col("a.t") < F.col("b.t"))).select(
        F.col("a.t").alias("type_a"),
        F.col("b.t").alias("type_b"),
        F.col("a.c").alias("x"),
        F.col("b.c").alias("y"),
    )
    m = pairs.groupBy("type_a", "type_b").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    denx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    deny = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return m.select(
        "type_a",
        "type_b",
        "n",
        F.when(
            (denx > 0) & (deny > 0), F.round(num / (F.sqrt(denx) * F.sqrt(deny)), 6)
        ).alias("pearson_r"),
    )


# ---------------------------------------------------------------------------
# OHLC bars per (event_type, day) — open/close elected by the total
# (ts, event_id) order via struct-min/max (no window, no sort: one
# map-side-combining agg).  high/low/count/volume ride the same pass.
# ---------------------------------------------------------------------------

_OHLC_ORACLE = f"""
SELECT event_type, CAST(ts AS DATE) AS event_date,
       first(value ORDER BY ts, event_id) AS open,
       max(value) AS high,
       min(value) AS low,
       last(value ORDER BY ts, event_id) AS close,
       cast(count(*) as bigint) AS n_events,
       {sql_exact_sum('value')} AS volume
FROM events
GROUP BY event_type, CAST(ts AS DATE)
"""


# ---------------------------------------------------------------------------
# Token-bucket rate limiting (admission audit): capacity 3 tokens, refill
# 1 token / 2 h of EVENT time, per user, full bucket at start, (ts,
# event_id) processing order.  The per-key recurrence is sequential —
# Spark runs it as a grouped-map Pandas fold (operators/ratelimit.py, one
# key shuffle then linear per-group work); the oracle expresses the same
# integer µtoken recurrence as a recursive CTE.  Bit-identical because
# every step is bigint min/floor-div.
# ---------------------------------------------------------------------------

_RL_CAP = 3 * 1_000_000
_RL_DEN_US = 7200 * 1_000_000

_RL_REFILL = f"least({_RL_CAP}, r.tokens + (s.us - r.us) * 1000000 // {_RL_DEN_US})"

_RL_ORACLE = f"""
WITH RECURSIVE seq AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS i
  FROM events
),
r AS (
  SELECT user_id, event_id, event_type, i, us,
         TRUE AS admitted, cast({_RL_CAP - 1_000_000} as bigint) AS tokens
  FROM seq WHERE i = 1
  UNION ALL
  SELECT s.user_id, s.event_id, s.event_type, s.i, s.us,
         {_RL_REFILL} >= 1000000 AS admitted,
         {_RL_REFILL} - CASE WHEN {_RL_REFILL} >= 1000000 THEN 1000000 ELSE 0 END AS tokens
  FROM r JOIN seq s ON s.user_id = r.user_id AND s.i = r.i + 1
)
SELECT event_type,
       cast(count(*) as bigint) AS n_events,
       cast(sum(CASE WHEN admitted THEN 1 ELSE 0 END) as bigint) AS n_admitted,
       cast(sum(CASE WHEN admitted THEN 0 ELSE 1 END) as bigint) AS n_rejected
FROM r GROUP BY event_type
"""


@register("events_rate_limit_admission", _RL_ORACLE, tags=("events", "streaming", "state"))
def events_rate_limit_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    from event_streaming_spark.operators.ratelimit import admission_summary, token_bucket_batch

    ev = load(spark, sf_dir, "events")
    audited = token_bucket_batch(
        ev, rate_seconds_per_token=7200, capacity_tokens=3
    )
    return admission_summary(audited)


@register("events_ohlc_daily", _OHLC_ORACLE, tags=("events", "timeseries"))
def events_ohlc_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    key = F.struct(F.col("ts"), F.col("event_id"), F.col("value"))
    return ev.groupBy("event_type", F.to_date("ts").alias("event_date")).agg(
        F.min(key)["value"].alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(key)["value"].alias("close"),
        F.count(F.lit(1)).alias("n_events"),
        exact_sum("value").alias("volume"),
    )


# ---------------------------------------------------------------------------
# Last-touch attribution: every purchase's value is credited to the most
# recent PRECEDING non-purchase event of the same user, provided it
# happened within the 30-minute attribution window — otherwise the
# purchase is 'direct'.  One keyed window pass (LAST ... IGNORE NULLS
# over rows-preceding), the standard marketing-analytics shape on an
# event stream.
#
# Scale: a single per-user window over user-partitioned data — one
# shuffle on user_id, no self-join, no sessionize intermediate; the
# rollup output is |channels|-sized.
# ---------------------------------------------------------------------------

_ATTR_ORACLE = """
WITH seq AS (
  SELECT user_id, ts, event_type,
         cast(round(value * 100) AS BIGINT) AS cents,
         last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                    IGNORE NULLS) OVER w AS touch_type,
         last_value(CASE WHEN event_type <> 'purchase' THEN ts END
                    IGNORE NULLS) OVER w AS touch_ts
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
), attributed AS (
  SELECT CASE WHEN touch_type IS NOT NULL
               AND ts - touch_ts <= INTERVAL 30 MINUTE
              THEN touch_type ELSE 'direct' END AS channel,
         cents
  FROM seq WHERE event_type = 'purchase'
)
SELECT channel, count(*) AS n_purchases,
       cast(sum(cents) AS BIGINT) AS attributed_cents
FROM attributed GROUP BY channel ORDER BY channel
"""


@register(
    "events_attribution_last_touch",
    _ATTR_ORACLE,
    tags=("events", "window", "attribution"),
)
def events_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    non_purchase = F.col("event_type") != "purchase"
    seq = ev.select(
        "ts",
        "event_type",
        "cents",
        F.last(F.when(non_purchase, F.col("event_type")), ignorenulls=True)
        .over(w)
        .alias("touch_type"),
        F.last(F.when(non_purchase, F.col("ts")), ignorenulls=True)
        .over(w)
        .alias("touch_ts"),
    ).where(F.col("event_type") == "purchase")
    channel = F.when(
        F.col("touch_type").isNotNull()
        & (
            F.unix_micros("ts") - F.unix_micros("touch_ts")
            <= 30 * 60 * 1_000_000
        ),
        F.col("touch_type"),
    ).otherwise(F.lit("direct"))
    return (
        seq.select(channel.alias("channel"), "cents")
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum("cents").cast("bigint").alias("attributed_cents"),
        )
        .orderBy("channel")
    )
