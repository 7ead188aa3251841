"""Round-8 tranches 9/11: bitmap-index engagement analytics,
position-based multi-touch attribution, autocorrelation of the daily
series, type-affinity Jaccard, and clickstream path mining — capability
classes the catalog lacked.

Scale design notes (the reason each query exists):

* The ACTIVITY BITMAP packs a user's last-62-day presence into ONE
  BIGINT (bit i = active on max_day − i), the classic bitmap-index
  trick: engagement features (popcounts over masked windows, cross-week
  retention AND-tests) become per-row constant-time bit ops on a
  users-sized table instead of repeated date-range scans of the fact
  table.  One (user, day) dedup shuffle + one groupBy — the fact table
  is touched once no matter how many windows are derived.  Longest
  streak rides gaps-and-islands on the SAME deduped user-day rows
  (bitmaps answer membership/popcount; runs are a sort-within-user
  property — two windows, no self-join).
* POSITION-BASED (U-shaped) attribution is the multi-touch complement
  of `events_attribution_last_touch`: 40 % first / 40 % last / 20 %
  split over middles, all in exact integer ppm (the floor remainder of
  the middle split goes to the FIRST touch so every conversion's
  credit sums to exactly 1,000,000).  One pass builds purchase epochs
  with a running count; converted/count/position are whole-partition
  windows over (user, epoch) — one fact scan, zero joins.
* The ACF query is "aggregate first, then analyze the tiny summary":
  the only data-sized op is the per-day count; lag products run on the
  days-sized series.  Integer-moments form (devs scaled by n so no
  division happens until the end) with DECIMAL(38,0)/HUGEINT products,
  one IEEE-identical round(num/den, 6) at the boundary — same
  determinism recipe as `events_type_volume_correlation`.
* TYPE-AFFINITY JACCARD projects the bipartite user×type graph onto
  types WITHOUT a user×user join: the per-user distinct type set is
  bounded by |types|, so the pair explosion is ≤ C(|types|,2) rows per
  user — linear in users, never quadratic.
* PATH MINING builds each (user, day) journey with one keyed collect +
  array_sort (struct field order = the (ts, event_id) total order) —
  no window, no self-join; identical paths count through a
  wordcount-shaped shuffle.

Determinism: engine-boundary values are exact integers (ppm floor
division per the repo convention) except the ACF's final round(·, 6),
which is bit-identical across engines on the same integer moments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from event_streaming_spark.plans.catalog import capture_plan, load, register

# ---------------------------------------------------------------------------
# 62-day activity bitmap per user.  Window anchored at the global max
# event date (bit i = active on max_day − i); 62 bits keeps the mask a
# positive BIGINT.  Popcount features and the week-over-week retention
# test are mask arithmetic; longest streak is gaps-and-islands over the
# same deduped user-day rows.
# ---------------------------------------------------------------------------

_BITMAP_ORACLE = """
WITH ud AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
), anchor AS (
  SELECT max(day) AS max_day FROM ud
), idx AS (
  SELECT user_id, datediff('day', day, max_day) AS day_idx
  FROM ud CROSS JOIN anchor
  WHERE datediff('day', day, max_day) BETWEEN 0 AND 61
), m AS (
  SELECT user_id,
         bit_or(CAST(1 AS BIGINT) << day_idx) AS mask
  FROM idx GROUP BY user_id
), runs AS (
  SELECT user_id,
         day_idx - row_number() OVER (PARTITION BY user_id ORDER BY day_idx)
           AS island
  FROM idx
), streaks AS (
  SELECT user_id, cast(max(run_len) AS BIGINT) AS longest_streak
  FROM (SELECT user_id, island, count(*) AS run_len
        FROM runs GROUP BY user_id, island)
  GROUP BY user_id
)
SELECT m.user_id,
       m.mask,
       cast(bit_count(m.mask) AS BIGINT) AS active_days,
       cast(bit_count(m.mask & 127) AS BIGINT) AS days_last7,
       cast(bit_count((m.mask >> 7) & 127) AS BIGINT) AS days_prior7,
       s.longest_streak,
       CASE WHEN (m.mask & 127) <> 0 AND ((m.mask >> 21) & 127) <> 0
            THEN 1 ELSE 0 END AS retained_w1_w4
FROM m JOIN streaks s ON s.user_id = m.user_id
ORDER BY m.user_id
"""


@register(
    "events_user_activity_bitmap",
    _BITMAP_ORACLE,
    tags=("events", "bitmap", "engagement"),
    bench=True,  # r8: new capability class — tracked round-over-round
)
def events_user_activity_bitmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from event_streaming_spark.operators.materialize import materialize

    ev = load(spark, sf_dir, "events")
    # One fact scan: the deduped (user, day) set is materialized and
    # feeds anchor, mask, and streak branches — without the pin, each
    # branch would re-scan events (4 scans in the dumped plan).
    ud = materialize(
        ev.select("user_id", F.to_date("ts").alias("day")).distinct(),
        name="activity-user-days",
    )
    anchor = ud.agg(F.max("day").alias("max_day"))
    idx = (
        ud.crossJoin(F.broadcast(anchor))
        .select("user_id", F.datediff("max_day", "day").alias("day_idx"))
        .filter(F.col("day_idx").between(0, 61))
    )
    m = idx.groupBy("user_id").agg(
        F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), day_idx))").alias("mask")
    )
    w = Window.partitionBy("user_id").orderBy("day_idx")
    streaks = (
        idx.select("user_id", (F.col("day_idx") - F.row_number().over(w)).alias("island"))
        .groupBy("user_id", "island")
        .agg(F.count(F.lit(1)).alias("run_len"))
        .groupBy("user_id")
        .agg(F.max("run_len").cast("long").alias("longest_streak"))
    )
    out = (
        m.join(streaks, "user_id")
        .select(
            "user_id",
            "mask",
            F.bit_count("mask").cast("long").alias("active_days"),
            F.bit_count(F.col("mask").bitwiseAND(F.lit(127)))
            .cast("long")
            .alias("days_last7"),
            F.bit_count(F.shiftright("mask", 7).bitwiseAND(F.lit(127)))
            .cast("long")
            .alias("days_prior7"),
            "longest_streak",
            F.when(
                (F.col("mask").bitwiseAND(F.lit(127)) != 0)
                & (F.shiftright("mask", 21).bitwiseAND(F.lit(127)) != 0),
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .alias("retained_w1_w4"),
        )
        .orderBy("user_id")
    )
    capture_plan("events_user_activity_bitmap", out)
    return out


# ---------------------------------------------------------------------------
# U-shaped (position-based) multi-touch attribution: each purchase
# distributes exactly 1,000,000 ppm of credit over the view/click
# touches since the previous purchase — 40 % first, 40 % last, 20 %
# split over middles (floor; remainder to the first touch).  Epochs come
# from ONE running count of prior purchases per user; the converted
# flag, touch count, and touch position are whole-partition windows over
# (user, epoch) in the SAME sort — one fact scan, no ts-range join, no
# self-join (the oracle states the equivalent join form).  Touches after
# a user's final purchase never convert and drop out.
# ---------------------------------------------------------------------------

_UATTR_ORACLE = """
WITH seq AS (
  SELECT user_id, event_id, ts, event_type,
         coalesce(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS epoch
  FROM events
), touches AS (
  SELECT user_id, epoch, event_type AS touch_type, ts, event_id
  FROM seq WHERE event_type IN ('view', 'click')
), conv AS (
  SELECT user_id, epoch FROM seq WHERE event_type = 'purchase'
), pos AS (
  SELECT t.touch_type,
         row_number() OVER (PARTITION BY t.user_id, t.epoch
                            ORDER BY t.ts, t.event_id) AS p,
         count(*) OVER (PARTITION BY t.user_id, t.epoch) AS n
  FROM touches t JOIN conv c
    ON c.user_id = t.user_id AND c.epoch = t.epoch
), credit AS (
  SELECT touch_type,
         CASE WHEN n = 1 THEN 'solo'
              WHEN p = 1 THEN 'first'
              WHEN p = n THEN 'last'
              ELSE 'middle' END AS position_class,
         CASE WHEN n = 1 THEN 1000000
              WHEN n = 2 THEN 500000
              WHEN p = 1 THEN 400000 + (200000 % (n - 2))
              WHEN p = n THEN 400000
              ELSE 200000 // (n - 2) END AS ppm
  FROM pos
)
SELECT touch_type, position_class,
       cast(count(*) AS BIGINT) AS n_touches,
       cast(sum(ppm) AS BIGINT) AS credit_ppm_total
FROM credit
GROUP BY touch_type, position_class
ORDER BY touch_type, position_class
"""


@register(
    "events_attribution_position_based",
    _UATTR_ORACLE,
    tags=("events", "attribution", "window"),
)
def events_attribution_position_based(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    wseq = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seq = ev.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.coalesce(
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).over(wseq),
            F.lit(0),
        ).alias("epoch"),
    )
    # Within (user, epoch) the purchase — if the epoch converted at all —
    # is by construction the LAST row and the ONLY purchase (rows after
    # it advance to epoch+1).  So the touch↔conversion match needs no
    # join: whole-partition windows over (user, epoch) supply the
    # converted flag, the touch count n, and the running touch position
    # p in the same sort the epoch window already established — ONE fact
    # scan, one partition-sort family, zero self-joins.
    is_touch = F.when(F.col("event_type").isin("view", "click"), 1).otherwise(0)
    wp = Window.partitionBy("user_id", "epoch")
    wrun = wp.orderBy("ts", "event_id").rowsBetween(Window.unboundedPreceding, 0)
    pos = (
        seq.select(
            F.col("event_type").alias("touch_type"),
            is_touch.alias("is_touch"),
            F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .over(wp)
            .alias("converted"),
            F.sum(is_touch).over(wp).alias("n"),
            F.sum(is_touch).over(wrun).alias("p"),
        )
        .filter((F.col("is_touch") == 1) & (F.col("converted") == 1))
        .select("touch_type", "p", "n")
    )
    n, p = F.col("n"), F.col("p")
    ppm = (
        F.when(n == 1, F.lit(1_000_000))
        .when(n == 2, F.lit(500_000))
        .when(p == 1, F.lit(400_000) + F.lit(200_000) % (n - 2))
        .when(p == n, F.lit(400_000))
        .otherwise(F.expr("200000 div (n - 2)"))
    )
    cls = (
        F.when(n == 1, F.lit("solo"))
        .when(p == 1, F.lit("first"))
        .when(p == n, F.lit("last"))
        .otherwise(F.lit("middle"))
    )
    out = (
        pos.select(F.col("touch_type"), cls.alias("position_class"), ppm.alias("ppm"))
        .groupBy("touch_type", "position_class")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_touches"),
            F.sum("ppm").cast("long").alias("credit_ppm_total"),
        )
        .orderBy("touch_type", "position_class")
    )
    capture_plan("events_attribution_position_based", out)
    return out


# ---------------------------------------------------------------------------
# Autocorrelation of the DENSE daily event-count series at lags 1..7
# (absent days count 0 — skipping them shifts every lag).  Integer
# moments: dev_t = n·c_t − S (a bigint), so
# acf_k = Σ dev_t·dev_{t+k} / Σ dev_t² is division-free until one
# IEEE-identical round(·, 6).  Products ride DECIMAL(38,0) (Spark) /
# HUGEINT (DuckDB) so a decade-long 100 TB series cannot overflow.
# ---------------------------------------------------------------------------

_ACF_ORACLE = """
WITH cnt AS (
  SELECT CAST(ts AS DATE) AS day, cast(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1
), spine AS (
  SELECT unnest(generate_series(min(day), max(day), INTERVAL 1 DAY))::DATE AS day
  FROM cnt
), dense AS (
  SELECT datediff('day', (SELECT min(day) FROM spine), spine.day) AS t,
         coalesce(cnt.c, 0) AS c
  FROM spine LEFT JOIN cnt ON cnt.day = spine.day
), tot AS (
  SELECT cast(count(*) AS BIGINT) AS n, cast(sum(c) AS BIGINT) AS s FROM dense
), dev AS (
  SELECT t, (tot.n * c - tot.s) AS d FROM dense CROSS JOIN tot
), den AS (
  SELECT sum(CAST(d AS HUGEINT) * d) AS den FROM dev
), lags AS (
  SELECT unnest([1, 2, 3, 4, 5, 6, 7]) AS k
), num AS (
  SELECT lags.k, sum(CAST(a.d AS HUGEINT) * b.d) AS num,
         cast(count(*) AS BIGINT) AS n_terms
  FROM lags JOIN dev a ON TRUE JOIN dev b ON b.t = a.t + lags.k
  GROUP BY lags.k
)
SELECT num.k AS lag, num.n_terms,
       CASE WHEN den.den > 0
            THEN round(CAST(num.num AS DOUBLE) / CAST(den.den AS DOUBLE), 6)
       END AS acf_r
FROM num CROSS JOIN den
ORDER BY lag
"""


@register(
    "events_acf_daily_lags",
    _ACF_ORACLE,
    tags=("events", "timeseries", "stats"),
)
def events_acf_daily_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    from event_streaming_spark.operators.materialize import materialize

    ev = load(spark, sf_dir, "events")
    # Pin the days-sized summary: bounds/spine/tot/dev/den/num all read
    # it — unpinned, each branch re-scans and re-aggregates the fact
    # table (6 scans in the dumped plan; 1 after the pin).
    cnt = materialize(
        ev.groupBy(F.to_date("ts").alias("day")).agg(
            F.count(F.lit(1)).cast("long").alias("c")
        ),
        name="acf-daily-counts",
    )
    bounds = cnt.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    spine = bounds.select(
        F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias("day"),
        "d0",
    )
    dense = spine.join(cnt, "day", "left").select(
        F.datediff("day", "d0").alias("t"),
        F.coalesce("c", F.lit(0)).alias("c"),
    )
    tot = dense.agg(
        F.count(F.lit(1)).cast("long").alias("n"), F.sum("c").cast("long").alias("s")
    )
    dev = dense.crossJoin(F.broadcast(tot)).select(
        "t", (F.col("n") * F.col("c") - F.col("s")).alias("d")
    )
    den = dev.agg(
        F.sum(F.col("d").cast("decimal(38,0)") * F.col("d")).alias("den")
    )
    lags = dev.sparkSession.range(1, 8).select(F.col("id").cast("int").alias("k"))
    a = dev.select(F.col("t").alias("ta"), F.col("d").alias("da"))
    b = dev.select(F.col("t").alias("tb"), F.col("d").alias("db"))
    num = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.col("tb") == F.col("ta") + F.col("k"))
        .groupBy("k")
        .agg(
            F.sum(F.col("da").cast("decimal(38,0)") * F.col("db")).alias("num"),
            F.count(F.lit(1)).cast("long").alias("n_terms"),
        )
    )
    out = (
        num.crossJoin(F.broadcast(den))
        .select(
            F.col("k").alias("lag"),
            "n_terms",
            F.when(
                F.col("den") > 0,
                F.round(F.col("num").cast("double") / F.col("den").cast("double"), 6),
            ).alias("acf_r"),
        )
        .orderBy("lag")
    )
    capture_plan("events_acf_daily_lags", out)
    return out


# ---------------------------------------------------------------------------
# Type-affinity Jaccard: |users(a) ∩ users(b)| / |users(a) ∪ users(b)|
# between event types, projected from the bipartite user×type graph.
# The pair stage self-joins the per-user DISTINCT type rows on user_id —
# at most C(|types|, 2) rows per user, so the explosion is linear in
# users and bounded by the (tiny) type vocabulary, never user×user.
# ---------------------------------------------------------------------------

_AFFINITY_ORACLE = """
WITH ut AS (
  SELECT DISTINCT user_id, event_type FROM events
), sz AS (
  SELECT event_type, cast(count(*) AS BIGINT) AS n_users FROM ut GROUP BY 1
), pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         cast(count(*) AS BIGINT) AS n_both
  FROM ut a JOIN ut b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT p.type_a, p.type_b, sa.n_users AS n_a, sb.n_users AS n_b, p.n_both,
       p.n_both * 1000000 // (sa.n_users + sb.n_users - p.n_both)
         AS jaccard_ppm
FROM pairs p
JOIN sz sa ON sa.event_type = p.type_a
JOIN sz sb ON sb.event_type = p.type_b
ORDER BY type_a, type_b
"""


@register(
    "events_type_affinity_jaccard",
    _AFFINITY_ORACLE,
    tags=("events", "similarity", "graph"),
)
def events_type_affinity_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from event_streaming_spark.operators.materialize import materialize

    ev = load(spark, sf_dir, "events")
    # Pin the deduped bipartite edges: both self-join sides and the
    # per-type sizes read them — unpinned, each reference re-scans the
    # fact table and re-runs the dedup shuffle.
    ut = materialize(
        ev.select("user_id", "event_type").distinct(), name="affinity-user-types"
    )
    sz = ut.groupBy("event_type").agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    a, b = ut.alias("a"), ut.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_both"))
    )
    out = (
        pairs.join(
            F.broadcast(sz.select(F.col("event_type").alias("type_a"), F.col("n_users").alias("n_a"))),
            "type_a",
        )
        .join(
            F.broadcast(sz.select(F.col("event_type").alias("type_b"), F.col("n_users").alias("n_b"))),
            "type_b",
        )
        .select(
            "type_a",
            "type_b",
            "n_a",
            "n_b",
            "n_both",
            (
                (F.col("n_both") * 1_000_000)
                / (F.col("n_a") + F.col("n_b") - F.col("n_both"))
            )
            .cast("long")
            .alias("jaccard_ppm"),
        )
        .orderBy("type_a", "type_b")
    )
    capture_plan("events_type_affinity_jaccard", out)
    return out


# ---------------------------------------------------------------------------
# Clickstream PATH MINING: the top-10 most frequent ordered event-type
# sequences per (user, day) journey, with a deterministic tie-break —
# the "what do users actually do" complement of the Markov transition
# matrix (which only sees adjacent pairs).  The journey build is one
# keyed aggregate: collect the day's (ts, event_id, type) structs,
# array_sort (struct order = field order, so the (ts, event_id) total
# order), then project the types — no window, no self-join; the
# frequency count is a wordcount-shaped shuffle over journey strings.
# Scale: journeys are bounded by per-user-per-day activity (a data
# property, not a plan property — the collect_list is per (user, day),
# never per user); the top-10 is TakeOrdered on the path vocabulary.
# ---------------------------------------------------------------------------

_PATHS_ORACLE = """
WITH j AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         string_agg(event_type, '>' ORDER BY ts, event_id) AS path
  FROM events GROUP BY user_id, CAST(ts AS DATE)
), c AS (
  SELECT path, cast(count(*) AS BIGINT) AS n_journeys FROM j GROUP BY path
), r AS (
  SELECT path, n_journeys,
         row_number() OVER (ORDER BY n_journeys DESC, path) AS rnk
  FROM c
)
SELECT path, n_journeys, rnk FROM r WHERE rnk <= 10
"""


@register(
    "events_top_session_paths",
    _PATHS_ORACLE,
    tags=("events", "sequence", "agg"),
    bench=True,  # r8: new capability class — tracked round-over-round
)
def events_top_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    journeys = (
        ev.groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("ts", "event_id", "event_type"))
                    ),
                    lambda s: s["event_type"],
                ),
                ">",
            ).alias("path")
        )
    )
    counts = journeys.groupBy("path").agg(
        F.count(F.lit(1)).cast("long").alias("n_journeys")
    )
    top = counts.orderBy(F.col("n_journeys").desc(), "path").limit(10)
    return top.select(
        "path",
        "n_journeys",
        F.row_number()
        .over(Window.orderBy(F.col("n_journeys").desc(), F.col("path")))
        .alias("rnk"),
    )


# ---------------------------------------------------------------------------
# NEAREST as-of enrichment: each purchase matched to the user's closest
# 'error' event in EITHER direction (operators/joins.py
# ``asof_join_nearest`` — the pandas merge_asof direction='nearest'
# analogue; the catalog's existing as-of is backward-only).  Exact-tie
# distances resolve backward; several errors at the same matched
# instant resolve max-event_id backward / min-event_id forward (each
# leg's deterministic carry order).  The oracle states the same
# semantics with monotone max/min carries plus a per-instant id
# resolution join.
# Scale: two keyed window sorts over purchases+errors — no ts-range
# join, no per-row probe; gap arithmetic in exact µs longs.
# ---------------------------------------------------------------------------

_NEAREST_ORACLE = """
WITH t AS (
  SELECT user_id, epoch_us(ts) AS us, event_id,
         CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS isr
  FROM events WHERE event_type IN ('error', 'purchase')
), carried AS (
  SELECT user_id, us, event_id, isr,
         max(CASE WHEN isr = 1 THEN us END)
           OVER (PARTITION BY user_id ORDER BY us, isr DESC, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bus,
         min(CASE WHEN isr = 1 THEN us END)
           OVER (PARTITION BY user_id ORDER BY us, isr, event_id
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS fus
  FROM t
), eagg AS (
  SELECT user_id, us, max(event_id) AS max_eid, min(event_id) AS min_eid
  FROM t WHERE isr = 1 GROUP BY 1, 2
), chosen AS (
  SELECT c.user_id, c.event_id AS purchase_id, c.us,
         CASE WHEN c.bus IS NOT NULL
                   AND (c.fus IS NULL OR (c.us - c.bus) <= (c.fus - c.us))
              THEN TRUE ELSE FALSE END AS take_b,
         coalesce(CASE WHEN c.bus IS NOT NULL
                            AND (c.fus IS NULL OR (c.us - c.bus) <= (c.fus - c.us))
                       THEN c.bus END, c.fus) AS mus
  FROM carried c WHERE c.isr = 0
)
SELECT ch.user_id, ch.purchase_id,
       CASE WHEN ch.take_b THEN e.max_eid ELSE e.min_eid END AS error_id,
       cast(ch.mus - ch.us AS BIGINT) AS gap_us
FROM chosen ch
LEFT JOIN eagg e ON e.user_id = ch.user_id AND e.us = ch.mus
ORDER BY ch.purchase_id
"""


@register(
    "events_asof_nearest_error_context",
    _NEAREST_ORACLE,
    tags=("events", "join", "asof"),
)
def events_asof_nearest_error_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    from event_streaming_spark.operators.joins import asof_join_nearest

    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("error", "purchase")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.unix_micros("ts").alias("us"),
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id",
        F.unix_micros("ts").alias("us"),
        F.col("event_id").alias("error_id"),
    )
    out = asof_join_nearest(
        purchases,
        errors,
        on="us",
        by=["user_id"],
        value_cols=["error_id"],
        gap_col="gap_us",
    )
    return out.select("user_id", "purchase_id", "error_id", "gap_us").orderBy(
        "purchase_id"
    )
