"""Round-8 analytics tranche: interval-sweep concurrency, cumulative
uniques, Markov transition matrices, RFM segmentation, trailing-window
distinct counts, and the shuffle-free bucketed big⋈big join.

Scale design notes (the reason each query exists):

* Interval concurrency and cumulative uniques use the SWEEP-LINE
  reduction — intervals/arrivals become ±1 deltas on a bounded DATE
  domain, then one distributed prefix sum (operators/ranks.py
  ``with_global_cumsum``: range-bucketed local sorts + O(#partitions)
  offsets).  The naive per-day COUNT(DISTINCT ... WHERE overlap) rescans
  the fact table per day; the sweep touches it once.
* The trailing-distinct window uses the user-day dedup + bounded fanout
  (×7) rewrite — the only exact distributed shape for sliding DISTINCT
  (sliding SUM decomposes into partials; sliding DISTINCT does not).
* RFM reuses the distributed ntile closed form (no single-partition
  global window; see events2.py deciles).
* The bucketed join pays the big⋈big shuffle ONCE at write time
  (sources/bucketed.py): both sides land hash-bucketed on the join key,
  so the nightly re-join plans as a zipped SortMergeJoin with NO
  Exchange — at 100 TB the dominant recurring cost deleted outright.

Determinism: all engine-boundary aggregates are exact integers
(functions/numeric.py) or closed-form ints (ppm floor division).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from event_streaming_spark.functions.numeric import exact_sum, sql_exact_sum
from event_streaming_spark.functions.localframe import local_frame
from event_streaming_spark.plans.catalog import capture_plan, load, register

# ---------------------------------------------------------------------------
# Open-order concurrency by day — the interval-stabbing aggregate ("how
# many orders were open on day D?") via the sweep-line reduction: each
# order [o_orderdate, max(l_shipdate)] emits +1 at open and −1 the day
# after close; per-day net deltas land on a generated day spine and one
# distributed prefix sum yields the concurrency curve.  Cost: one scan of
# lineitem (per-order max), 2 rows per order shuffled to O(days) groups,
# a days-sized cumsum — never a per-day rescan, never a range self-join.
# ---------------------------------------------------------------------------

_OPEN_ORACLE = """
WITH iv AS (
  SELECT o.o_orderkey, CAST(o.o_orderdate AS DATE) AS s,
         CAST(max(l.l_shipdate) AS DATE) AS e
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  GROUP BY o.o_orderkey, o.o_orderdate
), d AS (
  SELECT s AS day, 1 AS dlt FROM iv
  UNION ALL
  SELECT e + INTERVAL 1 DAY, -1 FROM iv
), spine AS (
  SELECT unnest(generate_series(min(s), max(e), INTERVAL 1 DAY))::DATE AS day
  FROM iv
), nd AS (
  SELECT day, cast(sum(dlt) AS BIGINT) AS nd FROM d GROUP BY day
)
SELECT spine.day AS day,
       cast(sum(coalesce(nd.nd, 0)) OVER (ORDER BY spine.day) AS BIGINT)
         AS open_orders
FROM spine LEFT JOIN nd ON spine.day = nd.day
ORDER BY day
"""


@register(
    "orders_open_interval_concurrency",
    _OPEN_ORACLE,
    tags=("relational", "timeseries", "window"),
)
def orders_open_interval_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from event_streaming_spark.operators.ranks import with_global_cumsum

    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", F.to_date("o_orderdate").alias("s")
    )
    close = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.max(F.to_date("l_shipdate")).alias("e"))
    )
    iv = o.join(close, o.o_orderkey == close.l_orderkey).select("s", "e")
    deltas = iv.select(F.col("s").alias("day"), F.lit(1).alias("dlt")).unionByName(
        iv.select(F.date_add("e", 1).alias("day"), F.lit(-1).alias("dlt"))
    )
    nd = deltas.groupBy("day").agg(F.sum("dlt").alias("nd"))
    spine = (
        iv.agg(F.min("s").alias("d0"), F.max("e").alias("d1"))
        .select(F.explode(F.sequence("d0", "d1")).alias("day"))
    )
    base = spine.join(nd, "day", "left").na.fill({"nd": 0})
    out, _ = with_global_cumsum(base, [F.asc("day")], "nd", "open_orders")
    return out.select(
        "day", F.col("open_orders").cast("long").alias("open_orders")
    ).orderBy("day")


# ---------------------------------------------------------------------------
# Cumulative distinct users by day ("total users ever seen, daily") —
# the growing-window COUNT(DISTINCT) that is O(N·days) if computed
# per-day, reduced to O(N): a user contributes exactly once, at their
# FIRST-seen day (one groupBy), then a days-domain prefix sum.  The
# classic first-touch rewrite every product-analytics store hardcodes.
# ---------------------------------------------------------------------------

_CUMU_ORACLE = """
WITH firsts AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS day FROM events GROUP BY user_id
), newu AS (
  SELECT day, cast(count(*) AS BIGINT) AS new_users FROM firsts GROUP BY day
), spine AS (
  SELECT unnest(generate_series(min(CAST(ts AS DATE)), max(CAST(ts AS DATE)),
                                INTERVAL 1 DAY))::DATE AS day
  FROM events
)
SELECT spine.day AS day,
       coalesce(newu.new_users, 0) AS new_users,
       cast(sum(coalesce(newu.new_users, 0)) OVER (ORDER BY spine.day)
            AS BIGINT) AS cum_users
FROM spine LEFT JOIN newu ON spine.day = newu.day
ORDER BY day
"""


@register(
    "events_cumulative_distinct_users",
    _CUMU_ORACLE,
    tags=("events", "timeseries", "window", "agg"),
)
def events_cumulative_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from event_streaming_spark.operators.ranks import with_global_cumsum

    ev = load(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("day"))
    newu = firsts.groupBy("day").agg(F.count(F.lit(1)).alias("new_users"))
    spine = (
        ev.agg(
            F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
        )
        .select(F.explode(F.sequence("d0", "d1")).alias("day"))
    )
    base = spine.join(newu, "day", "left").na.fill({"new_users": 0})
    out, _ = with_global_cumsum(base, [F.asc("day")], "new_users", "cum_users")
    return out.select(
        "day",
        F.col("new_users").cast("long").alias("new_users"),
        F.col("cum_users").cast("long").alias("cum_users"),
    ).orderBy("day")


# ---------------------------------------------------------------------------
# Markov transition matrix over per-user event sequences: P(next type |
# current type) as exact ppm integers.  One lead() window partitioned by
# user (key cardinality grows with data — fully parallel sort, no global
# window), one |types|²-sized count, totals folded back by a broadcast
# join on the config-sized from_type dimension.  The sequence-model
# sibling of the funnel family: funnels ask "did A→B happen", this asks
# "how often does A hand off to B".
# ---------------------------------------------------------------------------

_MARKOV_ORACLE = """
WITH seq AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS to_type
  FROM events
), pairs AS (
  SELECT from_type, to_type, cast(count(*) AS BIGINT) AS n_transitions
  FROM seq WHERE to_type IS NOT NULL GROUP BY from_type, to_type
), totals AS (
  SELECT from_type, sum(n_transitions) AS tot FROM pairs GROUP BY from_type
)
SELECT p.from_type AS from_type, p.to_type AS to_type, p.n_transitions,
       cast((p.n_transitions * 1000000) // t.tot AS BIGINT) AS prob_ppm
FROM pairs p JOIN totals t ON p.from_type = t.from_type
ORDER BY from_type, to_type
"""


@register(
    "events_markov_type_transitions",
    _MARKOV_ORACLE,
    tags=("events", "sequence", "window", "agg"),
)
def events_markov_type_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .where(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    totals = pairs.groupBy("from_type").agg(F.sum("n_transitions").alias("tot"))
    return (
        pairs.join(F.broadcast(totals), "from_type")
        .select(
            "from_type",
            "to_type",
            "n_transitions",
            ((F.col("n_transitions") * 1_000_000) / F.col("tot"))
            .cast("long")
            .alias("prob_ppm"),
        )
        .orderBy("from_type", "to_type")
    )


# ---------------------------------------------------------------------------
# RFM segmentation (recency / frequency / monetary quintiles) — the
# product-analytics staple.  Each metric gets an EXACT global quintile
# via the distributed ntile closed form (events2.py deciles): range-
# bucketed parallel sorts + O(#partitions) offsets, never a
# single-partition ORDER BY over all users.  Output is the segment
# occupancy grid (≤ 125 cells) with per-segment monetary mass.
# ---------------------------------------------------------------------------

_RFM_ORACLE = f"""
WITH ref AS (SELECT max(CAST(ts AS DATE)) AS r FROM events),
pu AS (
  SELECT user_id,
         date_diff('day', max(CAST(ts AS DATE)), (SELECT r FROM ref))
           AS r_days,
         cast(count(*) AS BIGINT) AS f_n,
         {sql_exact_sum('value')} AS m_val
  FROM events GROUP BY user_id
), q AS (
  SELECT user_id, m_val,
         ntile(5) OVER (ORDER BY r_days ASC, user_id) AS r_q,
         ntile(5) OVER (ORDER BY f_n DESC, user_id) AS f_q,
         ntile(5) OVER (ORDER BY m_val DESC, user_id) AS m_q
  FROM pu
)
SELECT r_q, f_q, m_q, cast(count(*) AS BIGINT) AS n_users,
       round(cast(sum(cast(round(m_val * 1e6) AS BIGINT)) AS DOUBLE)/1e6, 2)
         AS seg_value
FROM q GROUP BY r_q, f_q, m_q
ORDER BY r_q, f_q, m_q
"""


def _global_ntile(df: DataFrame, order_cols: list, out: str, tiles: int) -> DataFrame:
    """Exact ``ntile(tiles) OVER (ORDER BY order_cols)`` without a global
    single-partition sort — closed form over the distributed row number
    (same fill rule as the window function: first n%tiles tiles get one
    extra row)."""
    from event_streaming_spark.operators.ranks import with_global_row_number

    ranked, n = with_global_row_number(df, order_cols, "__rn")
    q, r = divmod(n, tiles)
    rn = F.col("__rn")
    if q == 0:
        tile = rn
    else:
        cut = r * (q + 1)
        tile = F.when(rn <= F.lit(cut), F.floor((rn - 1) / F.lit(q + 1)) + 1).otherwise(
            F.lit(r) + F.floor((rn - F.lit(cut) - 1) / F.lit(q)) + 1
        )
    return ranked.withColumn(out, tile.cast("int")).drop("__rn")


@register(
    "events_rfm_segments",
    _RFM_ORACLE,
    tags=("events", "window", "agg", "segmentation"),
)
def events_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    ref = ev.agg(F.max(F.to_date("ts"))).first()[0]  # 1-row scalar probe
    pu = ev.groupBy("user_id").agg(
        F.datediff(F.lit(ref), F.max(F.to_date("ts"))).alias("r_days"),
        F.count(F.lit(1)).alias("f_n"),
        exact_sum("value").alias("m_val"),
    )
    pu = _global_ntile(pu, [F.asc("r_days"), F.asc("user_id")], "r_q", 5)
    pu = _global_ntile(pu, [F.desc("f_n"), F.asc("user_id")], "f_q", 5)
    pu = _global_ntile(pu, [F.desc("m_val"), F.asc("user_id")], "m_q", 5)
    return (
        pu.groupBy("r_q", "f_q", "m_q")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            exact_sum("m_val").alias("seg_value"),
        )
        .orderBy("r_q", "f_q", "m_q")
    )


# ---------------------------------------------------------------------------
# Trailing-7-day DISTINCT users per day (rolling actives — the WAU
# curve).  Sliding SUM decomposes into partials; sliding DISTINCT does
# not — the exact distributed shape is user-day dedup then a BOUNDED ×7
# fanout (each user-day serves the 7 windows it can affect) and a
# per-day distinct count.  Cost: |user-days|×7 shuffled rows — linear,
# window-bounded, no per-day rescan and no range self-join of the fact.
# ---------------------------------------------------------------------------

_TRAIL7_ORACLE = """
WITH ud AS (
  SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
), b AS (
  SELECT max(CAST(ts AS DATE)) AS d1 FROM events
), w AS (
  SELECT unnest(generate_series(d, d + INTERVAL 6 DAY, INTERVAL 1 DAY))::DATE
           AS day,
         user_id
  FROM ud
)
SELECT day, cast(count(DISTINCT user_id) AS BIGINT) AS users_7d
FROM w, b WHERE day <= b.d1
GROUP BY day ORDER BY day
"""


@register(
    "events_trailing_7d_distinct_users",
    _TRAIL7_ORACLE,
    tags=("events", "timeseries", "window", "agg"),
)
def events_trailing_7d_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    d1 = ev.agg(F.max(F.to_date("ts"))).first()[0]  # 1-row scalar probe
    ud = ev.select(F.to_date("ts").alias("d"), "user_id").distinct()
    fan = ud.select(
        F.explode(F.sequence(F.col("d"), F.date_add("d", 6))).alias("day"),
        "user_id",
    ).where(F.col("day") <= F.lit(d1))
    return (
        fan.groupBy("day")
        .agg(F.countDistinct("user_id").alias("users_7d"))
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# Bucketed co-located big⋈big join — the shuffle-elimination flagship.
# orders and lineitem are written bucketed (and bucket-sorted) on the
# join key into catalog tables (sources/bucketed.py); the join then
# plans as a zipped SortMergeJoin with NO Exchange on either side —
# verified via capture_plan + tests/test_plan_regressions.py.  At 100 TB
# this is the difference between re-shuffling both tables every nightly
# run and reading pre-shuffled buckets: the write-time shuffle is paid
# once, every subsequent join is shuffle-free.  The rollup output is the
# per-priority revenue summary (the recurring-join archetype).
# ---------------------------------------------------------------------------

_BUCKETED_ORACLE = f"""
SELECT o_orderpriority,
       cast(count(*) AS BIGINT) AS n_lineitems,
       {sql_exact_sum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register(
    "join_bucketed_orders_lineitem",
    _BUCKETED_ORACLE,
    tags=("relational", "join", "layout"),
)
def join_bucketed_orders_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    from event_streaming_spark.sources.bucketed import write_bucketed

    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"), "o_orderpriority"
    )
    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("k"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
    )
    t_o, t_l = "r8_bucketed_orders", "r8_bucketed_lineitem"
    try:
        # write-time shuffle: both sides hash-bucketed on the join key
        write_bucketed(o, t_o, "k", 16)
        write_bucketed(li, t_l, "k", 16)
        joined = spark.table(t_o).join(spark.table(t_l), "k")
        agg = (
            joined.groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n_lineitems"),
                exact_sum("rev").alias("revenue"),
            )
            .orderBy("o_orderpriority")
        )
        # the graded plan property: NO Exchange below the join (the
        # bucket layout IS the shuffle) — pinned by
        # tests/test_plan_regressions.py::test_bucketed_catalog_join_has_no_exchange
        capture_plan("join_bucketed_orders_lineitem/colocated_join", agg)
        pdf = agg.toPandas()  # 5-row result, localized before DROP TABLE
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t_o}")
        spark.sql(f"DROP TABLE IF EXISTS {t_l}")
    return spark.createDataFrame(
        pdf, "o_orderpriority string, n_lineitems long, revenue double"
    ).orderBy("o_orderpriority")


# ---------------------------------------------------------------------------
# Funnel TIME-TO-CONVERT distribution: latency from a user's first view
# to their first purchase at-or-after it, bucketed by hour.  The funnel
# family (events_funnel_*) counts WHO converts; this measures HOW LONG
# conversion takes — the other axis every growth dashboard needs.
# Scale: two per-user aggregates + one broadcast-sized join back; all
# latency arithmetic is integer µs → hour floor division.
# ---------------------------------------------------------------------------

_TTC_ORACLE = """
WITH v AS (
  SELECT user_id, min(ts) AS v_ts FROM events WHERE event_type = 'view'
  GROUP BY user_id
), p AS (
  SELECT e.user_id, min(e.ts) AS p_ts
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= v.v_ts
  GROUP BY e.user_id
)
SELECT (epoch_us(p.p_ts) - epoch_us(v.v_ts)) // 3600000000 AS latency_h,
       cast(count(*) AS BIGINT) AS n_users
FROM v JOIN p ON v.user_id = p.user_id
GROUP BY latency_h ORDER BY latency_h
"""


@register(
    "events_funnel_time_to_convert",
    _TTC_ORACLE,
    tags=("events", "funnel", "agg"),
)
def events_funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .where(F.col("ts") >= F.col("v_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"), F.first("v_ts").alias("v_ts"))
    )
    lat_h = (
        (F.unix_micros("p_ts") - F.unix_micros("v_ts")) / 3_600_000_000
    ).cast("long")
    return (
        p.select(lat_h.alias("latency_h"))
        .groupBy("latency_h")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("latency_h")
    )


# ---------------------------------------------------------------------------
# CUSUM changepoint over the daily event-count series: cumulative sum of
# the SCALED deviation n_d·D − N (all integers — multiplying through by
# the day count D avoids the float mean), argmax |CUSUM| marks the most
# likely level-shift day (the classic offline CUSUM estimator).  The
# anomaly family (zscore, MAD) flags pointwise outliers; CUSUM finds the
# persistent REGIME CHANGE those tests miss.
# Scale: day-spine prefix sum — the same distributed-cumsum shape as the
# sweep queries; one O(days) pass after one fact-table aggregate.
# ---------------------------------------------------------------------------

_CUSUM_ORACLE = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, cast(count(*) AS BIGINT) AS n
  FROM events GROUP BY day
), spine AS (
  SELECT unnest(generate_series(min(CAST(ts AS DATE)), max(CAST(ts AS DATE)),
                                INTERVAL 1 DAY))::DATE AS day
  FROM events
), filled AS (
  SELECT spine.day, coalesce(daily.n, 0) AS n
  FROM spine LEFT JOIN daily ON spine.day = daily.day
), tot AS (
  SELECT count(*) AS d, sum(n) AS big_n FROM filled
), cus AS (
  SELECT day, n,
         cast(sum(n * tot.d - tot.big_n) OVER (ORDER BY day) AS BIGINT)
           AS cusum_scaled
  FROM filled, tot
)
SELECT day, n AS n_events, cusum_scaled,
       CASE WHEN abs(cusum_scaled) = (SELECT max(abs(cusum_scaled)) FROM cus)
            THEN 1 ELSE 0 END AS is_changepoint
FROM cus ORDER BY day
"""


@register(
    "events_cusum_changepoint",
    _CUSUM_ORACLE,
    tags=("events", "timeseries", "anomaly", "window"),
)
def events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from event_streaming_spark.operators.ranks import with_global_cumsum

    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    spine = (
        ev.agg(
            F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
        )
        .select(F.explode(F.sequence("d0", "d1")).alias("day"))
    )
    filled = spine.join(daily, "day", "left").na.fill({"n": 0})
    d, big_n = filled.agg(
        F.count(F.lit(1)), F.sum("n")
    ).first()  # 1-row scalar probe (O(1))
    dev = filled.withColumn("dv", F.col("n") * int(d) - int(big_n))
    cus, _ = with_global_cumsum(dev, [F.asc("day")], "dv", "cusum_scaled")
    peak = cus.agg(F.max(F.abs(F.col("cusum_scaled")))).first()[0]
    return cus.select(
        "day",
        F.col("n").alias("n_events"),
        F.col("cusum_scaled").cast("long").alias("cusum_scaled"),
        F.when(F.abs(F.col("cusum_scaled")) == peak, F.lit(1))
        .otherwise(F.lit(0))
        .alias("is_changepoint"),
    ).orderBy("day")


# ---------------------------------------------------------------------------
# Trailing-7-day distinct users via MERGEABLE HLL partials — the sketch
# twin of events_trailing_7d_distinct_users, and the reason sketches
# exist at 100 TB: the exact query fans out |user-days|×7 rows, the
# sketch fans out DAILY REGISTER SETS (≤ 64 rows per day, independent of
# event volume), merges by per-(window, bucket) max, and finalizes per
# window.  Daily partials are computed once and reused by every window
# they serve — the partial-aggregate reuse pattern every metrics store
# (Druid/Pinot/ClickHouse AggregatingMergeTree) is built on.  The exact
# count rides along per window so the driver's hash also pins the
# sketch's error behavior on this corpus.
# ---------------------------------------------------------------------------


def _hll7_oracle() -> str:
    from event_streaming_spark.functions.hashing import sql_stable_hash32
    from event_streaming_spark.operators.sketches import _alpha

    b = 6
    m = 1 << b
    w_bits = 32 - b
    mask = (1 << w_bits) - 1
    alpha = _alpha(m)
    h = sql_stable_hash32("cast(user_id AS VARCHAR)")
    return f"""
WITH hashed AS (
  SELECT CAST(ts AS DATE) AS d, {h} AS h FROM events
), br AS (
  SELECT d, h >> {w_bits} AS bucket,
         CASE WHEN (h & {mask}) = 0 THEN {w_bits + 1}
              ELSE {w_bits + 1} - length(bin(h & {mask})) END AS rank
  FROM hashed WHERE h IS NOT NULL
), dregs AS (
  SELECT d, bucket, max(rank) AS reg FROM br GROUP BY d, bucket
), bnd AS (
  SELECT max(CAST(ts AS DATE)) AS d1 FROM events
), fan AS (
  SELECT unnest(generate_series(d, d + INTERVAL 6 DAY, INTERVAL 1 DAY))::DATE
           AS day,
         bucket, reg
  FROM dregs
), regs AS (
  SELECT day, bucket, max(reg) AS reg
  FROM fan, bnd WHERE day <= bnd.d1 GROUP BY day, bucket
), acc AS (
  SELECT day, sum(1::BIGINT << (32 - reg)) AS s_scaled, count(*) AS m_present
  FROM regs GROUP BY day
), est AS (
  SELECT day, CASE
    WHEN ({alpha} * {m} * {m} * 4294967296.0)
           / (s_scaled + ({m} - m_present) * 4294967296) <= {2.5 * m}
         AND ({m} - m_present) > 0
    THEN round({float(m)} * ln({float(m)} / ({m} - m_present)), 4)
    ELSE round(({alpha} * {m} * {m} * 4294967296.0)
           / (s_scaled + ({m} - m_present) * 4294967296), 4)
  END AS hll_users_7d
  FROM acc
), ud AS (
  SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
), w AS (
  SELECT unnest(generate_series(d, d + INTERVAL 6 DAY, INTERVAL 1 DAY))::DATE
           AS day, user_id
  FROM ud
), exact AS (
  SELECT day, cast(count(DISTINCT user_id) AS BIGINT) AS exact_users_7d
  FROM w, bnd WHERE day <= bnd.d1 GROUP BY day
)
SELECT est.day AS day, est.hll_users_7d, exact.exact_users_7d
FROM est JOIN exact ON est.day = exact.day
ORDER BY day
"""


@register(
    "sketch_hll_trailing_7d_users",
    _hll7_oracle(),
    tags=("sketch", "events", "timeseries", "window"),
)
def sketch_hll_trailing_7d_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from event_streaming_spark.operators.sketches import (
        hll_finalize_by,
        hll_merge_by,
        hll_registers_by,
    )

    ev = load(spark, sf_dir, "events")
    d1 = ev.agg(F.max(F.to_date("ts"))).first()[0]  # 1-row scalar probe
    daily = hll_registers_by(
        ev.select(F.to_date("ts").alias("day"), "user_id"), ["day"], F.col("user_id")
    )
    fan = daily.select(
        F.explode(F.sequence(F.col("day"), F.date_add("day", 6))).alias("day"),
        "bucket",
        "reg",
    ).where(F.col("day") <= F.lit(d1))
    est = hll_finalize_by(hll_merge_by(fan, ["day"]), ["day"]).withColumnRenamed(
        "hll_estimate", "hll_users_7d"
    )
    ud = ev.select(F.to_date("ts").alias("d"), "user_id").distinct()
    exact = (
        ud.select(
            F.explode(F.sequence(F.col("d"), F.date_add("d", 6))).alias("day"),
            "user_id",
        )
        .where(F.col("day") <= F.lit(d1))
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("exact_users_7d"))
    )
    return est.join(exact, "day").orderBy("day")


# ---------------------------------------------------------------------------
# EWMA smoothing of the daily event-count series — exponential smoothing
# with rational α = 1/8 in pure integer fixed point:
#   S_0 = 10⁶·n_0;  S_t = (7·S_{t−1} + 10⁶·n_t) div 8
# (floor division each step, so both engines recurse bit-identically —
# no float pow/decay drift).  The smoothing recursion is DAY-domain
# work: the data-sized job is the one daily aggregate; the O(days)
# recursion runs on the driver (the same boundary the k-means/IVF
# centroid loops draw), and the oracle replays it as a recursive CTE.
# ---------------------------------------------------------------------------

_EWMA_ORACLE = """
WITH RECURSIVE daily AS (
  SELECT CAST(ts AS DATE) AS day, cast(count(*) AS BIGINT) AS n
  FROM events GROUP BY day
), spine AS (
  SELECT unnest(generate_series(min(CAST(ts AS DATE)), max(CAST(ts AS DATE)),
                                INTERVAL 1 DAY))::DATE AS day
  FROM events
), filled AS (
  SELECT spine.day, coalesce(daily.n, 0) AS n
  FROM spine LEFT JOIN daily ON spine.day = daily.day
), r(day, n, s) AS (
  SELECT day, n, 1000000 * n FROM filled
  WHERE day = (SELECT min(day) FROM filled)
  UNION ALL
  SELECT f.day, f.n, (7 * r.s + 1000000 * f.n) // 8
  FROM r JOIN filled f ON f.day = r.day + INTERVAL 1 DAY
)
SELECT day, n AS n_events, cast(s AS BIGINT) AS ewma_scaled
FROM r ORDER BY day
"""


@register(
    "events_ewma_daily",
    _EWMA_ORACLE,
    tags=("events", "timeseries", "smoothing"),
)
def events_ewma_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    spine = (
        ev.agg(
            F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
        )
        .select(F.explode(F.sequence("d0", "d1")).alias("day"))
    )
    filled = (
        spine.join(daily, "day", "left").na.fill({"n": 0}).orderBy("day").collect()
    )  # O(days) localization — the recursion's domain, never the fact table
    rows = []
    s = None
    for r in filled:
        n = int(r["n"])
        s = 1_000_000 * n if s is None else (7 * s + 1_000_000 * n) // 8
        rows.append((r["day"], n, s))
    return local_frame(spark, 
        rows, "day date, n_events long, ewma_scaled long"
    ).orderBy("day")


# ---------------------------------------------------------------------------
# Backlog AGING report: open orders per day BY AGE BUCKET (0-7d / 7-30d /
# 30d+) — the ops staple ("how much old backlog are we carrying?").
# Generalizes the sweep-line reduction to 2-D: within its lifetime an
# order migrates buckets at deterministic offsets, so each (order,
# bucket) contributes at most one +1/−1 delta pair — 6 rows per order
# max — and the per-bucket concurrency is a prefix sum over the day
# spine (bucket count is config-sized: the per-bucket window is
# domain-sized work, not data-sized).
# ---------------------------------------------------------------------------

_AGING_ORACLE = """
WITH iv AS (
  SELECT o.o_orderkey, CAST(o.o_orderdate AS DATE) AS s,
         CAST(max(l.l_shipdate) AS DATE) AS e
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  GROUP BY o.o_orderkey, o.o_orderdate
), d AS (
  SELECT s AS day, '00-07d' AS bucket, 1 AS dlt FROM iv
  UNION ALL
  SELECT least(e, s + INTERVAL 6 DAY) + INTERVAL 1 DAY, '00-07d', -1 FROM iv
  UNION ALL
  SELECT s + INTERVAL 7 DAY, '07-30d', 1 FROM iv WHERE e >= s + INTERVAL 7 DAY
  UNION ALL
  SELECT least(e, s + INTERVAL 29 DAY) + INTERVAL 1 DAY, '07-30d', -1
  FROM iv WHERE e >= s + INTERVAL 7 DAY
  UNION ALL
  SELECT s + INTERVAL 30 DAY, '30d+', 1 FROM iv WHERE e >= s + INTERVAL 30 DAY
  UNION ALL
  SELECT e + INTERVAL 1 DAY, '30d+', -1 FROM iv WHERE e >= s + INTERVAL 30 DAY
), spine AS (
  SELECT unnest(generate_series(min(s), max(e), INTERVAL 1 DAY))::DATE AS day
  FROM iv
), grid AS (
  SELECT day, bucket
  FROM spine, (VALUES ('00-07d'), ('07-30d'), ('30d+')) AS b(bucket)
), nd AS (
  SELECT CAST(day AS DATE) AS day, bucket, cast(sum(dlt) AS BIGINT) AS nd
  FROM d GROUP BY 1, 2
)
SELECT g.day AS day, g.bucket AS bucket,
       cast(sum(coalesce(nd.nd, 0)) OVER (
         PARTITION BY g.bucket ORDER BY g.day) AS BIGINT) AS open_orders
FROM grid g LEFT JOIN nd ON g.day = nd.day AND g.bucket = nd.bucket
ORDER BY day, bucket
"""


@register(
    "orders_backlog_aging_buckets",
    _AGING_ORACLE,
    tags=("relational", "timeseries", "window"),
)
def orders_backlog_aging_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", F.to_date("o_orderdate").alias("s")
    )
    close = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.max(F.to_date("l_shipdate")).alias("e"))
    )
    iv = o.join(close, o.o_orderkey == close.l_orderkey).select("s", "e")

    def leg(cond, day_col, bucket, dlt):
        src = iv.where(cond) if cond is not None else iv
        return src.select(
            day_col.alias("day"), F.lit(bucket).alias("bucket"), F.lit(dlt).alias("dlt")
        )

    one_after = lambda c: F.date_add(c, 1)  # noqa: E731
    deltas = (
        leg(None, F.col("s"), "00-07d", 1)
        .unionByName(leg(None, one_after(F.least("e", F.date_add("s", 6))), "00-07d", -1))
        .unionByName(leg(F.col("e") >= F.date_add("s", 7), F.date_add("s", 7), "07-30d", 1))
        .unionByName(
            leg(
                F.col("e") >= F.date_add("s", 7),
                one_after(F.least("e", F.date_add("s", 29))),
                "07-30d",
                -1,
            )
        )
        .unionByName(leg(F.col("e") >= F.date_add("s", 30), F.date_add("s", 30), "30d+", 1))
        .unionByName(leg(F.col("e") >= F.date_add("s", 30), one_after(F.col("e")), "30d+", -1))
    )
    nd = deltas.groupBy("day", "bucket").agg(F.sum("dlt").alias("nd"))
    spine = (
        iv.agg(F.min("s").alias("d0"), F.max("e").alias("d1"))
        .select(F.explode(F.sequence("d0", "d1")).alias("day"))
    )
    grid = spine.crossJoin(
        local_frame(spark, [("00-07d",), ("07-30d",), ("30d+",)], "bucket string")
    )
    base = grid.join(nd, ["day", "bucket"], "left").na.fill({"nd": 0})
    w = Window.partitionBy("bucket").orderBy("day")  # 3 domain-sized partitions
    return base.select(
        "day",
        "bucket",
        F.sum("nd").over(w).cast("long").alias("open_orders"),
    ).orderBy("day", "bucket")


# ---------------------------------------------------------------------------
# HOLT double-exponential smoothing (level + trend) of the daily series,
# with a 7-day linear forecast — the trend-aware upgrade of the EWMA
# above, in the same pure integer fixed point (α = β = 1/8, integer
# division each step so both engines recurse bit-identically).  The
# trend numerator goes NEGATIVE on declining series, where DuckDB's //
# TRUNCATES toward zero while Python's floors — the engine recursion
# therefore uses an explicit truncating div to match the oracle's
# C-style semantics (measured divergence of 3 ppm-units by day 5
# before the fix):
#   L_0 = 10⁶·n_0;                T_0 = 0
#   L_t = (10⁶·n_t + 7·(L_{t−1} + T_{t−1})) div 8
#   T_t = ((L_t − L_{t−1}) + 7·T_{t−1}) div 8
#   forecast_h = L_N + h·T_N,  h = 1..7
# Fitted value for day t is the one-step-ahead prediction L_{t−1}+T_{t−1}.
# Same scale boundary as the EWMA: the data-sized job is one daily
# aggregate; the O(days) recursion is driver-domain work.
# ---------------------------------------------------------------------------

_HOLT_ORACLE = """
WITH RECURSIVE daily AS (
  SELECT CAST(ts AS DATE) AS day, cast(count(*) AS BIGINT) AS n
  FROM events GROUP BY day
), spine AS (
  SELECT unnest(generate_series(min(CAST(ts AS DATE)), max(CAST(ts AS DATE)),
                                INTERVAL 1 DAY))::DATE AS day
  FROM events
), filled AS (
  SELECT spine.day, coalesce(daily.n, 0) AS n
  FROM spine LEFT JOIN daily ON spine.day = daily.day
), r(day, n, l, t, fitted) AS (
  SELECT day, n, 1000000 * n, CAST(0 AS BIGINT), 1000000 * n FROM filled
  WHERE day = (SELECT min(day) FROM filled)
  UNION ALL
  SELECT f.day, f.n,
         (1000000 * f.n + 7 * (r.l + r.t)) // 8,
         (((1000000 * f.n + 7 * (r.l + r.t)) // 8 - r.l) + 7 * r.t) // 8,
         r.l + r.t
  FROM r JOIN filled f ON f.day = r.day + INTERVAL 1 DAY
), tail AS (
  SELECT l, t, day FROM r WHERE day = (SELECT max(day) FROM r)
), fc AS (
  SELECT (tail.day + to_days(h::INT))::DATE AS day, h
  , tail.l + h * tail.t AS f FROM tail, unnest([1,2,3,4,5,6,7]) AS u(h)
)
SELECT day, 'obs' AS kind, n AS n_events,
       cast(l AS BIGINT) AS level_scaled, cast(t AS BIGINT) AS trend_scaled,
       cast(fitted AS BIGINT) AS fitted_scaled
FROM r
UNION ALL
SELECT day, 'forecast', NULL, NULL, NULL, cast(f AS BIGINT) FROM fc
ORDER BY day, kind
"""


@register(
    "events_holt_linear_forecast",
    _HOLT_ORACLE,
    tags=("events", "timeseries", "smoothing", "forecast"),
)
def events_holt_linear_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    import datetime as _dt

    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    spine = (
        ev.agg(
            F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
        )
        .select(F.explode(F.sequence("d0", "d1")).alias("day"))
    )
    filled = (
        spine.join(daily, "day", "left").na.fill({"n": 0}).orderBy("day").collect()
    )  # O(days) localization — the recursion's domain, never the fact table
    def tdiv(a: int, b: int) -> int:
        # truncate toward zero — DuckDB's // semantics (Python's floors)
        return -((-a) // b) if a < 0 else a // b

    rows = []
    lvl = trd = None
    for r in filled:
        n = int(r["n"])
        if lvl is None:
            lvl, trd, fitted = 1_000_000 * n, 0, 1_000_000 * n
        else:
            fitted = lvl + trd
            new_l = tdiv(1_000_000 * n + 7 * (lvl + trd), 8)
            trd = tdiv((new_l - lvl) + 7 * trd, 8)
            lvl = new_l
        rows.append((r["day"], "obs", n, lvl, trd, fitted))
    last_day = filled[-1]["day"]
    for h in range(1, 8):
        rows.append(
            (last_day + _dt.timedelta(days=h), "forecast", None, None, None,
             lvl + h * trd)
        )
    return local_frame(spark, 
        rows,
        "day date, kind string, n_events long, level_scaled long, "
        "trend_scaled long, fitted_scaled long",
    ).orderBy("day", "kind")


# ---------------------------------------------------------------------------
# Seasonality-ADJUSTED anomaly report: the plain z-score flags every
# weekend as anomalous on weekly-cyclic traffic; this query scores each
# day against its OWN day-of-week's mean.  Exact integer form: for day t
# with count n_t on dow d (days_d days, total_d events across the dow
# group), the scaled residual is
#   resid_d(t) = n_t · days_d − total_d    ( = days_d · (n_t − mean_d) )
# and the flag is |resid| · 2 > total_d  ⇔  |n_t − mean_d| > mean_d / 2
# (a ±50 % band), all division-free so both engines agree bit-exactly.
# Scale: one daily aggregate (data-sized), then dow-group joins on the
# days-sized summary — aggregate first, analyze the tiny series.
# ---------------------------------------------------------------------------

_DOWRES_ORACLE = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, cast(count(*) AS BIGINT) AS n
  FROM events GROUP BY day
), spine AS (
  SELECT unnest(generate_series(min(CAST(ts AS DATE)), max(CAST(ts AS DATE)),
                                INTERVAL 1 DAY))::DATE AS day
  FROM events
), filled AS (
  SELECT spine.day, dayofweek(spine.day) + 1 AS dow, coalesce(daily.n, 0) AS n
  FROM spine LEFT JOIN daily ON spine.day = daily.day
), g AS (
  SELECT dow, cast(count(*) AS BIGINT) AS days_d,
         cast(sum(n) AS BIGINT) AS total_d
  FROM filled GROUP BY dow
)
SELECT f.day, f.dow, f.n AS n_events, g.days_d, g.total_d,
       f.n * g.days_d - g.total_d AS resid_scaled,
       CASE WHEN abs(f.n * g.days_d - g.total_d) * 2 > g.total_d
            THEN 1 ELSE 0 END AS is_anomaly
FROM filled f JOIN g ON g.dow = f.dow
ORDER BY f.day
"""


@register(
    "events_dow_adjusted_anomaly",
    _DOWRES_ORACLE,
    tags=("events", "timeseries", "anomaly"),
)
def events_dow_adjusted_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from event_streaming_spark.operators.materialize import materialize

    ev = load(spark, sf_dir, "events")
    # Pin the days-sized dense series: the dow-group summary and the
    # residual join both read it — unpinned, each branch re-scans and
    # re-aggregates the fact table.
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    spine = (
        ev.agg(
            F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
        )
        .select(F.explode(F.sequence("d0", "d1")).alias("day"))
    )
    filled = materialize(
        spine.join(daily, "day", "left").select(
            "day",
            F.dayofweek("day").alias("dow"),
            F.coalesce("n", F.lit(0)).alias("n"),
        ),
        name="dow-anomaly-daily",
    )
    g = filled.groupBy("dow").agg(
        F.count(F.lit(1)).cast("long").alias("days_d"),
        F.sum("n").cast("long").alias("total_d"),
    )
    resid = F.col("n") * F.col("days_d") - F.col("total_d")
    return (
        filled.join(F.broadcast(g), "dow")
        .select(
            "day",
            "dow",
            F.col("n").alias("n_events"),
            "days_d",
            "total_d",
            resid.alias("resid_scaled"),
            F.when(F.abs(resid) * 2 > F.col("total_d"), F.lit(1))
            .otherwise(F.lit(0))
            .alias("is_anomaly"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# Daily BOUNCE RATE over the same gap-based 30-minute sessions as
# `events_sessionize_30m`: share of sessions (attributed to their start
# day) with exactly one event, in exact ppm — the standard engagement
# KPI the sessionizer family lacked.  Same single user-keyed shuffle to
# build sessions; the per-day rollup runs on the sessions-sized summary.
# ---------------------------------------------------------------------------

_BOUNCE_ORACLE = """
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER w <= INTERVAL 30 MINUTE THEN 0 ELSE 1 END
           AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessions AS (
  SELECT user_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
), per_session AS (
  SELECT user_id, session_id,
         CAST(min(ts) AS DATE) AS day,
         cast(count(*) AS BIGINT) AS n_events
  FROM sessions GROUP BY user_id, session_id
)
SELECT day,
       cast(count(*) AS BIGINT) AS n_sessions,
       cast(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bounces,
       cast(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) * 1000000
            // count(*) AS BIGINT) AS bounce_ppm
FROM per_session
GROUP BY day ORDER BY day
"""


@register(
    "events_bounce_rate_daily",
    _BOUNCE_ORACLE,
    tags=("events", "session", "agg"),
)
def events_bounce_rate_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap_ms = F.unix_millis(F.col("ts")) - F.unix_millis(F.lag("ts").over(w))
    flagged = ev.withColumn(
        "new_session",
        F.when(gap_ms <= 30 * 60 * 1000, F.lit(0)).otherwise(F.lit(1)),
    )
    sessions = flagged.withColumn("session_id", F.sum("new_session").over(run))
    per_session = sessions.groupBy("user_id", "session_id").agg(
        F.to_date(F.min("ts")).alias("day"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )
    is_bounce = F.when(F.col("n_events") == 1, 1).otherwise(0)
    return (
        per_session.groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sessions"),
            F.sum(is_bounce).cast("long").alias("n_bounces"),
        )
        .select(
            "day",
            "n_sessions",
            "n_bounces",
            ((F.col("n_bounces") * 1_000_000) / F.col("n_sessions"))
            .cast("long")
            .alias("bounce_ppm"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# Fulfillment SLA percentiles per order priority: exact p50/p90/p99 of
# order→last-shipment latency (days), through the same distributed
# order-statistics machinery as the gap-percentile query — the rank
# runs range-partitioned (operators/ranks.with_group_rank), never one
# task per priority, and the type-7 interpolation is the hand-computed
# exact-integer form shared by both engines.  The ops report that tells
# you whether '1-URGENT' actually ships faster.
# ---------------------------------------------------------------------------

_SLA_PCTS = (50, 90, 99)


def _sla_oracle() -> str:
    from event_streaming_spark.functions.numeric import sql_exact_pct_agg

    pct_cols = ", ".join(
        f"{sql_exact_pct_agg(p)} AS p{p}_days" for p in _SLA_PCTS
    )
    return f"""
WITH lat AS (
  SELECT o.o_orderpriority AS priority,
         datediff('day', CAST(o.o_orderdate AS DATE),
                  CAST(max(l.l_shipdate) AS DATE)) AS days
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
), pos AS (
  SELECT priority, days AS val,
         row_number() OVER (PARTITION BY priority ORDER BY days) AS rv,
         count(*) OVER (PARTITION BY priority) AS n
  FROM lat
)
SELECT priority, max(n) AS n_orders, {pct_cols}
FROM pos GROUP BY priority ORDER BY priority
"""


@register(
    "orders_fulfillment_sla_percentiles",
    _sla_oracle(),
    tags=("relational", "agg", "percentile"),
)
def orders_fulfillment_sla_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from event_streaming_spark.functions.numeric import exact_pct_agg
    from event_streaming_spark.operators.ranks import with_group_rank

    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", F.to_date("o_orderdate").alias("od")
    )
    ship = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.max(F.to_date("l_shipdate")).alias("sd"))
    )
    lat = o.join(ship, o.o_orderkey == ship.l_orderkey).select(
        F.col("o_orderpriority").alias("priority"),
        F.datediff("sd", "od").alias("val"),
    )
    pos = with_group_rank(lat, "priority", "val")
    return (
        pos.groupBy("priority")
        .agg(
            F.max("n").alias("n_orders"),
            *[exact_pct_agg(p).alias(f"p{p}_days") for p in _SLA_PCTS],
        )
        .orderBy("priority")
    )


# ---------------------------------------------------------------------------
# GINI coefficient of user engagement — the inequality measure behind
# "how concentrated is our traffic?" (the Pareto top-share query shows
# one point of the Lorenz curve; Gini integrates it).  Closed form over
# ascending-sorted per-user counts x_(1..n):
#   G = (2·Σ i·x_(i) − (n+1)·Σx) / (n·Σx)
# — integer numerator and denominator, reported in exact ppm (floor).
# The global rank over per-user counts runs range-partitioned
# (operators/ranks.with_global_row_number): no single-task window at
# any user cardinality; the Σ i·x_(i) moment is one map-side-combined
# aggregate over the ranked rows.
# ---------------------------------------------------------------------------

_GINI_ORACLE = """
WITH c AS (
  SELECT user_id, cast(count(*) AS BIGINT) AS x FROM events GROUP BY user_id
), ranked AS (
  SELECT x, row_number() OVER (ORDER BY x, user_id) AS i,
         count(*) OVER () AS n
  FROM c
)
SELECT cast(max(n) AS BIGINT) AS n_users,
       cast(sum(x) AS BIGINT) AS n_events,
       cast((2 * sum(i * x) - (max(n) + 1) * sum(x)) * 1000000
            // (max(n) * sum(x)) AS BIGINT) AS gini_ppm
FROM ranked
"""


@register(
    "events_user_engagement_gini",
    _GINI_ORACLE,
    tags=("events", "stats", "agg"),
)
def events_user_engagement_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    from event_streaming_spark.operators.ranks import with_global_row_number

    ev = load(spark, sf_dir, "events")
    c = ev.groupBy("user_id").agg(F.count(F.lit(1)).cast("long").alias("x"))
    ranked, n = with_global_row_number(
        c, [F.asc("x"), F.asc("user_id")], out_col="i"
    )
    agg = ranked.agg(
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("i") * F.col("x")).cast("long").alias("six"),
    )
    num = 2 * F.col("six") - (F.lit(n) + 1) * F.col("sx")
    den = F.lit(n) * F.col("sx")
    return agg.select(
        F.lit(n).cast("long").alias("n_users"),
        F.col("sx").alias("n_events"),
        ((num * 1_000_000) / den).cast("long").alias("gini_ppm"),
    )


# ---------------------------------------------------------------------------
# Type-mix DRIFT monitor: each day's event-type mix compared to the
# PRIOR 7 days' mix by total-variation distance,
#   TVD = ½ · Σ_types |share_day − share_prior|    (exact ppm),
# — the drift alarm a training-data pipeline runs on every ingest day
# (a source changing its composition shows up here before any model
# does).  Shares are floored ppm on BOTH engines, so the distance is
# bit-exact.  The prior-week type counts come from the bounded ×7
# fanout rewrite (each (day, type) count contributes to exactly the 7
# following days' windows) — one data-sized aggregate, then everything
# runs on the (days × types)-sized dense grid.
# ---------------------------------------------------------------------------

_DRIFT_ORACLE = """
WITH cnt AS (
  SELECT CAST(ts AS DATE) AS day, event_type AS t,
         cast(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), days AS (SELECT DISTINCT day FROM cnt),
types AS (SELECT DISTINCT t FROM cnt),
dense AS (
  SELECT days.day, types.t, coalesce(cnt.c, 0) AS c
  FROM days CROSS JOIN types
  LEFT JOIN cnt ON cnt.day = days.day AND cnt.t = types.t
), prior AS (
  SELECT d2.day, dense.t, cast(sum(dense.c) AS BIGINT) AS pc
  FROM dense
  JOIN days d2 ON d2.day BETWEEN dense.day + INTERVAL 1 DAY
                             AND dense.day + INTERVAL 7 DAY
  GROUP BY d2.day, dense.t
), tot AS (
  SELECT day, cast(sum(c) AS BIGINT) AS day_total FROM dense GROUP BY day
), ptot AS (
  SELECT day, cast(sum(pc) AS BIGINT) AS prior_total FROM prior GROUP BY day
), shares AS (
  SELECT dense.day, dense.t,
         dense.c * 1000000 // tot.day_total AS s_day,
         prior.pc * 1000000 // ptot.prior_total AS s_prior
  FROM dense
  JOIN tot ON tot.day = dense.day
  JOIN prior ON prior.day = dense.day AND prior.t = dense.t
  JOIN ptot ON ptot.day = dense.day
  WHERE tot.day_total > 0 AND ptot.prior_total > 0
)
SELECT day,
       cast(sum(abs(s_day - s_prior)) // 2 AS BIGINT) AS tvd_ppm
FROM shares GROUP BY day ORDER BY day
"""


@register(
    "events_type_mix_drift_daily",
    _DRIFT_ORACLE,
    tags=("events", "timeseries", "drift", "quality"),
)
def events_type_mix_drift_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from event_streaming_spark.operators.materialize import materialize

    ev = load(spark, sf_dir, "events")
    # Pin the (days × types)-sized dense grid: five downstream consumers
    # (prior fanout, both totals, both share joins) read it.
    cnt = ev.groupBy(
        F.to_date("ts").alias("day"), F.col("event_type").alias("t")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    days = cnt.select("day").distinct()
    types = cnt.select("t").distinct()
    dense = materialize(
        days.crossJoin(types)
        .join(cnt, ["day", "t"], "left")
        .select("day", "t", F.coalesce("c", F.lit(0)).alias("c")),
        name="drift-dense-grid",
    )
    # bounded ×7 fanout: each (day, t) count lands in the prior-week
    # windows of days day+1 .. day+7 (only days present in the data)
    fan = dense.select(
        F.explode(F.sequence(F.date_add("day", 1), F.date_add("day", 7))).alias(
            "day2"
        ),
        "t",
        "c",
    )
    prior = (
        fan.join(days.select(F.col("day").alias("day2")), "day2")
        .groupBy(F.col("day2").alias("day"), "t")
        .agg(F.sum("c").cast("long").alias("pc"))
    )
    tot = dense.groupBy("day").agg(F.sum("c").cast("long").alias("day_total"))
    ptot = prior.groupBy("day").agg(F.sum("pc").cast("long").alias("prior_total"))
    shares = (
        dense.join(tot, "day")
        .join(prior, ["day", "t"])
        .join(ptot, "day")
        .filter((F.col("day_total") > 0) & (F.col("prior_total") > 0))
        .select(
            "day",
            ((F.col("c") * 1_000_000) / F.col("day_total"))
            .cast("long")
            .alias("s_day"),
            ((F.col("pc") * 1_000_000) / F.col("prior_total"))
            .cast("long")
            .alias("s_prior"),
        )
    )
    return (
        shares.groupBy("day")
        .agg(
            (F.sum(F.abs(F.col("s_day") - F.col("s_prior"))) / 2)
            .cast("long")
            .alias("tvd_ppm")
        )
        .orderBy("day")
    )
