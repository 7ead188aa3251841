"""Round-8 tranche 13: time-series decomposition, interval-estimate
analytics, and cohort lifetime value — three capability classes the
catalog lacked (the reference's events surface stops at scalar time
formatting, include/events-agency.h:70-76; these are the standard
analytics a production deployment layers on the same event log).

Scale design notes (the reason each query exists):

* STL-STYLE DECOMPOSITION is "aggregate first, then analyze the tiny
  summary" (the ACF/Holt recipe): the only data-sized op is the per-day
  count; the centered 7-row moving average, day-of-week seasonal means,
  and residuals all run on the days-sized series.  Exactness recipe:
  every intermediate is an INTEGER (detrended values are carried ×7 so
  the /7 never happens mid-pipeline — ``detr7 = 7·n − sum7``); the only
  float ops are the boundary divisions, written as the identical
  expression tree on both engines (IEEE division is deterministic).
* WILSON CONFIDENCE INTERVALS upgrade a share-of-traffic point estimate
  to an interval the way an experimentation platform must (a 2 %
  purchase share over 40 events is not a 2 % purchase share over
  40 M events).  The per-group inputs are two exact integers (x, n);
  the score-interval formula is a fixed expression over them — sqrt is
  IEEE-correctly-rounded, so both engines agree bit-for-bit.  One fact
  scan, one tiny groupBy.
* COHORT LTV is the classic acquisition-cohort × months-since-first
  revenue triangle.  The first-order month is a per-customer MIN — a
  partial-agg-friendly shuffle on o_custkey — joined back to orders on
  the same key (co-partitioned, no second shuffle of the fact table at
  scale when both sides hash-partition on custkey); month arithmetic is
  pure integers (y·12+m), revenue the repo's exact fixed-point sum.

Determinism: integer counts, integer month offsets, exact-decimal money
sums, and boundary-only float division/sqrt rounded to 6 — bit-identical
across Spark and DuckDB per the repo convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from event_streaming_spark.functions.hashing import sql_stable_hash32
from event_streaming_spark.functions.numeric import exact_sum, sql_exact_sum
from event_streaming_spark.functions.localframe import local_frame
from event_streaming_spark.plans.catalog import capture_plan, load, register, spread

# ---------------------------------------------------------------------------
# STL-style additive decomposition of the daily event count:
#   trend    = centered 7-row moving average (full windows only)
#   seasonal = per-day-of-week mean of the detrended series
#   residual = observed − trend − seasonal
# Carried ×7 in integers until the boundary: detr7 = 7·n − sum7, so
# trend = sum7/7, seasonal = Σdetr7/(7·cnt), residual = detr7/7 − seasonal.
# ---------------------------------------------------------------------------

_STL_ORACLE = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, count(*) AS n
  FROM events GROUP BY CAST(ts AS DATE)
), win AS (
  SELECT day, n,
         sum(n)   OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS sum7,
         count(*) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS cnt7
  FROM daily
), mid AS (
  SELECT day, n, sum7, dayofweek(day) + 1 AS dow, 7 * n - sum7 AS detr7
  FROM win WHERE cnt7 = 7
), seas AS (
  SELECT dow, sum(detr7) AS s_num, count(*) AS s_cnt FROM mid GROUP BY dow
)
SELECT mid.day, mid.n AS n_events,
       round(cast(sum7 AS double) / 7.0, 6) AS trend,
       round(cast(s_num AS double) / (7.0 * s_cnt), 6) AS seasonal,
       round(cast(detr7 AS double) / 7.0
             - cast(s_num AS double) / (7.0 * s_cnt), 6) AS residual
FROM mid JOIN seas USING (dow)
ORDER BY day
"""


@register(
    "events_stl_decompose_daily",
    _STL_ORACLE,
    tags=("events", "timeseries", "window"),
)
def events_stl_decompose_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive trend/seasonal/residual decomposition of the daily count.

    One fact scan → days-sized series; every op after the first groupBy
    touches O(#days) rows.  The 7-row centered window is a single-node
    series op here by design (days ≪ data); at 100 TB the daily rollup
    is the partial-agg shuffle and this stays exactly as cheap.
    """
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(F.count(F.lit(1)).alias("n"))
    w7 = Window.orderBy("day").rowsBetween(-3, 3)
    win = daily.select(
        "day",
        "n",
        F.sum("n").over(w7).alias("sum7"),
        F.count(F.lit(1)).over(w7).alias("cnt7"),
    )
    mid = win.where(F.col("cnt7") == 7).select(
        "day",
        "n",
        "sum7",
        F.dayofweek("day").alias("dow"),
        (F.lit(7) * F.col("n") - F.col("sum7")).alias("detr7"),
    )
    seas = mid.groupBy("dow").agg(
        F.sum("detr7").alias("s_num"), F.count(F.lit(1)).alias("s_cnt")
    )
    seasonal = F.col("s_num").cast("double") / (F.lit(7.0) * F.col("s_cnt"))
    return (
        mid.join(F.broadcast(seas), "dow")
        .select(
            "day",
            F.col("n").alias("n_events"),
            F.round(F.col("sum7").cast("double") / F.lit(7.0), 6).alias("trend"),
            F.round(seasonal, 6).alias("seasonal"),
            F.round(
                F.col("detr7").cast("double") / F.lit(7.0) - seasonal, 6
            ).alias("residual"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# Wilson 95 % score intervals for the purchase share of each day-of-week.
# x, n are exact integers per group; the interval is
#   (p̂ + z²/2n ± z·√(p̂(1−p̂)/n + z²/4n²)) / (1 + z²/n),  z = 1.96.
# The expression tree is written identically on both engines — every
# operand derives from (x, n) by IEEE-deterministic ops (÷, ×, √).
# ---------------------------------------------------------------------------

_WILSON_EXPR = (
    "round((p + {zz} / (2.0 * n) - {z} * sqrt(p * (1.0 - p) / n"
    " + {zz} / (4.0 * n * n))) / (1.0 + {zz} / n), 6)",
    "round((p + {zz} / (2.0 * n) + {z} * sqrt(p * (1.0 - p) / n"
    " + {zz} / (4.0 * n * n))) / (1.0 + {zz} / n), 6)",
)
_Z = "1.96"
_ZZ = "3.8416"  # z² exactly (1.96² = 3.8416, exact in binary? no — but the
# LITERAL 3.8416 parses to the same double in both engines, which is all
# determinism needs; deriving it as 1.96*1.96 would also match, but a
# shared literal removes even that dependency)

_WILSON_ORACLE = f"""
WITH g AS (
  SELECT dayofweek(CAST(ts AS DATE)) + 1 AS dow,
         count(*) AS n_events,
         count(*) FILTER (WHERE event_type = 'purchase') AS purchases
  FROM events GROUP BY 1
), p AS (
  SELECT dow, n_events, purchases,
         cast(purchases AS double) / n_events AS p,
         cast(n_events AS double) AS n
  FROM g
)
SELECT dow, n_events, purchases,
       round(p, 6) AS p_hat,
       {_WILSON_EXPR[0].format(z=_Z, zz=_ZZ)} AS wilson_low,
       {_WILSON_EXPR[1].format(z=_Z, zz=_ZZ)} AS wilson_high
FROM p
ORDER BY dow
"""


@register(
    "events_wilson_ci_purchase_share",
    _WILSON_ORACLE,
    tags=("events", "stats"),
)
def events_wilson_ci_purchase_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson 95 % score interval for the per-day-of-week purchase share.

    One fact scan, one 7-group rollup; the interval math runs on the
    7-row summary.  The Wilson form (unlike the naive Wald interval)
    stays inside [0,1] and is well-behaved at small n — the estimator an
    experimentation readout actually needs.
    """
    ev = load(spark, sf_dir, "events")
    g = ev.groupBy(F.dayofweek(F.to_date("ts")).alias("dow")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("purchases"),
    )
    p = F.col("purchases").cast("double") / F.col("n_events")
    n = F.col("n_events").cast("double")
    z, zz = F.lit(1.96), F.lit(3.8416)
    half = zz / (F.lit(2.0) * n)
    rad = F.sqrt(p * (F.lit(1.0) - p) / n + zz / (F.lit(4.0) * n * n))
    denom = F.lit(1.0) + zz / n
    return g.select(
        "dow",
        "n_events",
        "purchases",
        F.round(p, 6).alias("p_hat"),
        F.round((p + half - z * rad) / denom, 6).alias("wilson_low"),
        F.round((p + half + z * rad) / denom, 6).alias("wilson_high"),
    ).orderBy("dow")


# ---------------------------------------------------------------------------
# Cohort LTV triangle: customers grouped by first-order month; revenue
# per (cohort month, months-since-first).  Month arithmetic in integers
# (y·12 + m); revenue via the exact fixed-point sum.
# ---------------------------------------------------------------------------

_LTV_ORACLE = f"""
WITH first_o AS (
  SELECT o_custkey,
         min(date_trunc('month', CAST(o_orderdate AS DATE))) AS cohort_month
  FROM orders GROUP BY o_custkey
), joined AS (
  SELECT f.cohort_month,
         (year(CAST(o.o_orderdate AS DATE)) * 12 + month(CAST(o.o_orderdate AS DATE)))
         - (year(f.cohort_month) * 12 + month(f.cohort_month)) AS month_offset,
         o.o_custkey, o.o_totalprice
  FROM orders o JOIN first_o f ON f.o_custkey = o.o_custkey
)
SELECT cohort_month, month_offset,
       count(DISTINCT o_custkey) AS active_customers,
       count(*) AS n_orders,
       {sql_exact_sum('o_totalprice')} AS revenue
FROM joined
GROUP BY cohort_month, month_offset
ORDER BY cohort_month, month_offset
"""


@register(
    "orders_cohort_ltv_matrix",
    _LTV_ORACLE,
    tags=("orders", "cohort", "agg"),
)
def orders_cohort_ltv_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Acquisition-cohort × month-offset revenue triangle over orders.

    Two shuffles on the SAME key (o_custkey): the per-customer MIN and
    the join back — at scale both sides hash-partition identically, so
    the join is co-partitioned (no third fact-table shuffle); the final
    rollup output is months² rows.  This is the canonical LTV shape: no
    window over the fact table, no per-customer driver loop.
    """
    orders = load(spark, sf_dir, "orders")
    first_o = orders.groupBy("o_custkey").agg(
        F.min(F.date_trunc("month", F.to_date("o_orderdate")).cast("date")).alias(
            "cohort_month"
        )
    )
    mnum = lambda c: F.year(c) * 12 + F.month(c)  # noqa: E731
    joined = orders.join(first_o, "o_custkey").select(
        F.col("cohort_month"),
        (mnum(F.to_date("o_orderdate")) - mnum(F.col("cohort_month"))).alias(
            "month_offset"
        ),
        "o_custkey",
        "o_totalprice",
    )
    return (
        joined.groupBy("cohort_month", "month_offset")
        .agg(
            F.countDistinct("o_custkey").alias("active_customers"),
            F.count(F.lit(1)).alias("n_orders"),
            exact_sum("o_totalprice").alias("revenue"),
        )
        .orderBy("cohort_month", "month_offset")
    )


# ---------------------------------------------------------------------------
# Markov removal-effect attribution — completes the attribution family
# (last-touch, position-based/U-shaped → data-driven).  Journeys are the
# (user, day) event sequences of `events_top_session_paths`, truncated
# at the first purchase; the chain has states {START} ∪ channels and
# absorbers {CONV, DROP}.  A channel's credit is its REMOVAL EFFECT
# (Anderl et al. 2014, public paper): base absorption probability minus
# the absorption probability of the chain with that channel's node
# deleted (transitions touching it fall to DROP — the standard, no
# renormalization).  Absorption probabilities run K=12 fixed iterations
# of  pc(s) ← p(s→CONV) + Σ_d p(s→d)·pc(d)  in exact integer ppm
# (product scaled back with floor div), so both engines agree
# bit-for-bit; paths longer than K channel hops contribute 0 on BOTH
# sides identically.
#
# Scale: the data-sized stages are one (user, day)-keyed window pass and
# a wordcount-shaped transition count; everything after lives on the
# (variants × states) grid — ≤ (|types|+1)² rows, schema-bounded, like
# the ACF/OLS "aggregate first, analyze the tiny summary" recipe.  The
# variant dimension makes the removal sweep ONE relational program
# instead of |channels| separate chains.
# ---------------------------------------------------------------------------

_MK_ITERS = 12

_MK_TRANS = """
seq AS (
  SELECT user_id, CAST(ts AS DATE) AS day, event_type,
         row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                            ORDER BY ts, event_id) AS rn
  FROM events
), fp AS (
  SELECT user_id, day,
         min(rn) FILTER (WHERE event_type = 'purchase') AS fp
  FROM seq GROUP BY user_id, day
), kept AS (
  SELECT s.user_id, s.day, s.event_type, s.rn
  FROM seq s JOIN fp f USING (user_id, day)
  WHERE f.fp IS NULL OR s.rn < f.fp
), step AS (
  SELECT coalesce(lag(event_type) OVER (PARTITION BY user_id, day
                                        ORDER BY rn), '__start__') AS src,
         event_type AS dst
  FROM kept
), lastk AS (
  SELECT user_id, day, max_by(event_type, rn) AS last_type
  FROM kept GROUP BY user_id, day
), term AS (
  SELECT coalesce(k.last_type, '__start__') AS src,
         CASE WHEN f.fp IS NOT NULL THEN '__conv__' ELSE '__drop__' END AS dst
  FROM fp f LEFT JOIN lastk k USING (user_id, day)
), trans AS MATERIALIZED (
  SELECT src, dst, count(*) AS c
  FROM (SELECT src, dst FROM step UNION ALL SELECT src, dst FROM term)
  GROUP BY src, dst
), outs AS (SELECT src, sum(c) AS tot FROM trans GROUP BY src),
p AS MATERIALIZED (
  SELECT t.src, t.dst, (t.c * 1000000) // o.tot AS p
  FROM trans t JOIN outs o USING (src)
), channels AS (
  SELECT DISTINCT dst AS ch FROM trans
  WHERE dst NOT IN ('__conv__', '__drop__')
), variants AS (
  SELECT '__base__' AS v UNION ALL SELECT ch FROM channels
), states AS (
  SELECT '__start__' AS s UNION ALL SELECT ch FROM channels
), vstates AS (
  SELECT v, s FROM variants CROSS JOIN states WHERE s <> v
), convp AS MATERIALIZED (
  SELECT vs.v, vs.s, coalesce(max(p.p), 0) AS cp
  FROM vstates vs
  LEFT JOIN p ON p.src = vs.s AND p.dst = '__conv__'
  GROUP BY vs.v, vs.s
), ctrans AS MATERIALIZED (
  SELECT va.v, p.src AS s, p.dst AS d, p.p
  FROM p JOIN variants va
    ON (va.v = '__base__' OR (p.src <> va.v AND p.dst <> va.v))
  WHERE p.dst NOT IN ('__conv__', '__drop__')
)"""


def _markov_oracle() -> str:
    parts = [
        "WITH " + _MK_TRANS.strip().lstrip(),
        "pc0 AS (SELECT v, s, CAST(0 AS BIGINT) AS val FROM vstates)",
    ]
    for k in range(1, _MK_ITERS + 1):
        parts.append(
            f"""pc{k} AS (
  SELECT c.v, c.s,
         c.cp + coalesce(sum(t.p * q.val), 0) // 1000000 AS val
  FROM convp c
  LEFT JOIN ctrans t ON t.v = c.v AND t.s = c.s
  LEFT JOIN pc{k - 1} q ON q.v = t.v AND q.s = t.d
  GROUP BY c.v, c.s, c.cp
)"""
        )
    parts.append(
        f"""eff AS (
  SELECT ch AS channel,
         (SELECT val FROM pc{_MK_ITERS}
          WHERE v = '__base__' AND s = '__start__') - pc.val AS effect
  FROM channels JOIN pc{_MK_ITERS} pc ON pc.v = ch AND pc.s = '__start__'
), tot AS (SELECT sum(effect) AS te FROM eff)"""
    )
    body = ",\n".join(parts)
    return f"""{body}
SELECT channel, CAST(effect AS BIGINT) AS removal_effect_ppm,
       CAST(CASE WHEN te > 0 THEN (effect * 1000000) // te ELSE 0 END
            AS BIGINT) AS attribution_share_ppm
FROM eff, tot ORDER BY channel
"""


@register(
    "events_attribution_markov_removal",
    _markov_oracle(),
    tags=("events", "attribution", "iterative"),
    bench=True,  # heaviest tranche-15 addition -> regression-tracked
)
def events_attribution_markov_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov-chain attribution: per-channel removal effect and share.

    One (user, day)-keyed window pass + a wordcount transition count are
    the only data-sized stages; the K=12 absorption iterations run on
    the (variants × states) grid (≤ (|types|+1)² rows, schema-bounded).
    """
    from event_streaming_spark.operators.materialize import materialize

    ev = load(spark, sf_dir, "events")
    wday = Window.partitionBy("user_id", "day").orderBy("ts", "event_id")
    wall = Window.partitionBy("user_id", "day")
    # ONE fact scan, ONE keyed exchange: both windows (the ordered rn/lag
    # pass and the whole-partition fp/last-kept aggregates) share the
    # (user_id, day) partitioning, so Spark plans a single shuffle; every
    # journey row emits its transitions through one explode — no
    # seq⋈fp⋈lastk join tree (the first cut's join shape scanned the
    # fact table 5 times; plan-tested below).
    seq = (
        ev.select(
            "user_id",
            F.to_date("ts").alias("day"),
            "event_type",
            "ts",
            "event_id",
        )
        .withColumn("rn", F.row_number().over(wday))
        .withColumn("lag_type", F.lag("event_type").over(wday))
        .withColumn(
            "fp",
            F.min(F.when(F.col("event_type") == "purchase", F.col("rn"))).over(wall),
        )
        .withColumn("kept", F.col("fp").isNull() | (F.col("rn") < F.col("fp")))
        .withColumn(
            "last_kept",
            F.expr(
                "max_by(CASE WHEN kept THEN event_type END,"
                " CASE WHEN kept THEN rn END)"
            ).over(wall),
        )
    )
    step_arr = F.when(
        F.col("kept"),
        F.array(
            F.struct(
                F.coalesce(F.col("lag_type"), F.lit("__start__")).alias("src"),
                F.col("event_type").alias("dst"),
            )
        ),
    ).otherwise(F.array().cast("array<struct<src:string,dst:string>>"))
    term_arr = F.when(
        F.col("rn") == 1,
        F.array(
            F.struct(
                F.coalesce(F.col("last_kept"), F.lit("__start__")).alias("src"),
                F.when(F.col("fp").isNotNull(), F.lit("__conv__"))
                .otherwise(F.lit("__drop__"))
                .alias("dst"),
            )
        ),
    ).otherwise(F.array().cast("array<struct<src:string,dst:string>>"))
    t = seq.select(F.explode(F.concat(step_arr, term_arr)).alias("tr")).select(
        F.col("tr.src").alias("src"), F.col("tr.dst").alias("dst")
    )
    trans_plan = (
        t.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("c")).repartition(1)
    )
    capture_plan("events_attribution_markov_removal/transition_count", trans_plan)
    trans = materialize(trans_plan, "markov-trans")
    # the transition matrix: ≤ (|types|+2)² rows, SCHEMA-bounded

    # The absorption sweep runs on the collected matrix — a bounded
    # collect per the repo convention (the MG completeness proof's
    # O(#sources) totals): at ANY data scale this is ≤ (|types|+2)²
    # integers.  Running 12 Spark jobs over an 81-row grid pays ~20 s of
    # scheduler/checkpoint floors for work a loop does in microseconds —
    # measured before this rewrite; the arithmetic below mirrors the
    # oracle's unrolled CTEs operation-for-operation (integer ppm, floor
    # division), so the hash gate still certifies it.
    rows = [(r["src"], r["dst"], r["c"]) for r in trans.collect()]
    tot: dict = {}
    for s, _d, c in rows:
        tot[s] = tot.get(s, 0) + c
    p = {(s, d): (c * 1_000_000) // tot[s] for s, d, c in rows}
    channels = sorted({d for _s, d, _c in rows if d not in ("__conv__", "__drop__")})
    states = ["__start__"] + channels

    def absorb(v: str) -> int:
        live = [s for s in states if s != v]
        pc = {s: 0 for s in live}
        for _ in range(_MK_ITERS):
            nxt = {}
            for s in live:
                acc = 0
                for d in channels:
                    if d == v:
                        continue
                    acc += p.get((s, d), 0) * pc[d]
                nxt[s] = p.get((s, "__conv__"), 0) + acc // 1_000_000
            pc = nxt
        return pc["__start__"]

    base = absorb("__base__")
    effects = [(ch, base - absorb(ch)) for ch in channels]
    te = sum(e for _ch, e in effects)
    out = [
        (ch, e, (e * 1_000_000) // te if te > 0 else 0) for ch, e in effects
    ]
    return local_frame(spark, 
        out, "channel string, removal_effect_ppm long, attribution_share_ppm long"
    ).orderBy("channel")



# ---------------------------------------------------------------------------
# Kaplan–Meier survival curve for time-to-first-purchase.  Each user
# enters at their first event; converts at their first purchase
# (duration in whole days) or is right-censored at the global max
# timestamp.  Standard KM: at each distinct conversion time t,
#   n_t = #users with duration ≥ t   (censored-at-t count as at-risk),
#   d_t = #conversions at exactly t,
#   S(t) = Π_{t_i ≤ t} (1 − d_i/n_i).
# Determinism recipe: the product is computed as exp of a RUNNING sum
# (ordered by t — a fixed accumulation order on both engines) of
# per-step ln factors each rounded to 9 decimals; the d=n terminal step
# (factor 0) is flagged and forces S=0 from there on instead of ln(0).
# Inputs to every ln are identical doubles from exact integers (d, n) —
# the tfidf/ltv precedent; one round(·, 6) at the boundary.
#
# Scale: one fact scan → per-user (first event, first purchase) via a
# single groupBy on user_id; the curve lives on the duration-days grid
# (calendar-bounded).  The classic survival shape: no per-user loop, no
# per-time rescan.
# ---------------------------------------------------------------------------

_KM_ORACLE = """
WITH per_user AS (
  SELECT user_id,
         min(ts) AS t0,
         min(ts) FILTER (WHERE event_type = 'purchase') AS tp
  FROM events GROUP BY user_id
), g AS (SELECT max(ts) AS tmax FROM events),
dur AS (
  SELECT CASE WHEN tp IS NOT NULL THEN datediff('day', t0, tp)
              ELSE datediff('day', t0, tmax) END AS t_days,
         CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS conv
  FROM per_user, g
), grid AS (
  SELECT t_days, count(*) AS n_exit,
         cast(sum(conv) AS BIGINT) AS d_conv
  FROM dur GROUP BY t_days
), risk AS (
  SELECT t_days, d_conv,
         cast(sum(n_exit) OVER (ORDER BY t_days DESC
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS BIGINT) AS n_risk
  FROM grid
), steps AS (
  SELECT t_days, d_conv, n_risk,
         CASE WHEN d_conv < n_risk
              THEN round(ln(1.0 - cast(d_conv AS double) / n_risk), 9)
              ELSE 0.0 END AS lnf,
         CASE WHEN d_conv = n_risk THEN 1 ELSE 0 END AS zf
  FROM risk WHERE d_conv > 0
), cum AS (
  SELECT t_days, d_conv, n_risk,
         sum(lnf) OVER (ORDER BY t_days ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS cs,
         sum(zf)  OVER (ORDER BY t_days ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS zc
  FROM steps
)
SELECT t_days, n_risk, d_conv,
       CASE WHEN zc > 0 THEN 0.0 ELSE round(exp(cs), 6) END AS s_hat
FROM cum ORDER BY t_days
"""


@register(
    "events_survival_km_purchase",
    _KM_ORACLE,
    tags=("events", "stats", "timeseries"),
)
def events_survival_km_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier curve of time-to-first-purchase (days), right-
    censored at the global max timestamp.

    One user-keyed groupBy is the only data-sized op; the at-risk
    counts, step factors, and running product all live on the
    duration-days grid.
    """
    ev = load(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min("ts").alias("t0"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("tp"),
    )
    tmax = ev.agg(F.max("ts")).first()[0]  # 1-row scalar probe
    dur = per_user.select(
        F.when(
            F.col("tp").isNotNull(), F.datediff(F.to_date("tp"), F.to_date("t0"))
        )
        .otherwise(F.datediff(F.to_date(F.lit(tmax)), F.to_date("t0")))
        .alias("t_days"),
        F.when(F.col("tp").isNotNull(), F.lit(1)).otherwise(F.lit(0)).alias("conv"),
    )
    grid = dur.groupBy("t_days").agg(
        F.count(F.lit(1)).alias("n_exit"), F.sum("conv").alias("d_conv")
    )
    w_desc = Window.orderBy(F.col("t_days").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = grid.select(
        "t_days", "d_conv", F.sum("n_exit").over(w_desc).alias("n_risk")
    )
    steps = risk.where(F.col("d_conv") > 0).select(
        "t_days",
        "d_conv",
        "n_risk",
        F.when(
            F.col("d_conv") < F.col("n_risk"),
            F.round(
                F.log(
                    F.lit(1.0) - F.col("d_conv").cast("double") / F.col("n_risk")
                ),
                9,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("lnf"),
        F.when(F.col("d_conv") == F.col("n_risk"), F.lit(1))
        .otherwise(F.lit(0))
        .alias("zf"),
    )
    w_asc = Window.orderBy("t_days").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = steps.select(
        "t_days",
        "d_conv",
        "n_risk",
        F.sum("lnf").over(w_asc).alias("cs"),
        F.sum("zf").over(w_asc).alias("zc"),
    )
    return cum.select(
        "t_days",
        "n_risk",
        "d_conv",
        F.when(F.col("zc") > 0, F.lit(0.0))
        .otherwise(F.round(F.exp(F.col("cs")), 6))
        .alias("s_hat"),
    ).orderBy("t_days")


# ---------------------------------------------------------------------------
# Poisson-bootstrap 95 % CI for the mean event value — the one-pass
# bootstrap that actually works at 100 TB (Chamandy et al., "Estimating
# Uncertainty for Massive Data Streams", Google 2012, public paper):
# instead of materializing B resamples, each row draws a Poisson(1) weight
# per replicate from a DETERMINISTIC hash (md5 of 'boot|event_id|b'
# bucketed through the exact integer Poisson CDF thresholds), so the
# whole bootstrap is one map-side projection + a B-group partial
# aggregate.  Replicate means use the repo's scaled-long exact sums; the
# CI is read off the rank-ordered replicate means (ranks 3/98 of B=100
# ≈ the 2.5/97.5 percentiles).  Every value both engines compare is an
# exact integer or a fixed IEEE chain on identical integers.
#
# Scale: B× per-row weight draws are embarrassingly parallel and
# map-side-combined — the shuffle carries B×|partitions| partial rows,
# never B× the data; the rank pass runs on B rows.
# ---------------------------------------------------------------------------

_BOOT_B = 100
# Poisson(1) CDF × 1000, floored: P(k≤0)=.3679, ≤1=.7358, ≤2=.9197,
# ≤3=.9810, ≤4=.9963, ≤5=.9994 → thresholds on h ∈ [0, 999]:
_BOOT_THRESH = (368, 736, 920, 981, 996, 999)


def _boot_w_sql(h: str) -> str:
    cases = " ".join(
        f"WHEN {h} < {t} THEN {k}" for k, t in enumerate(_BOOT_THRESH)
    )
    return f"CASE {cases} ELSE 6 END"


_BOOT_ORACLE = f"""
WITH b AS (SELECT cast(range AS BIGINT) AS b FROM range(0, {_BOOT_B})),
w AS (
  SELECT b.b,
         {_boot_w_sql(sql_stable_hash32(
             "'boot|' || cast(event_id AS VARCHAR) || '|' || cast(b.b AS VARCHAR)"
         ) + " % 1000")} AS w,
         cast(round(value * 1e6) AS BIGINT) AS xv
  FROM events CROSS JOIN b
), means AS (
  SELECT b, round(cast(sum(w * xv) AS double) / 1e6 / sum(w), 6) AS m
  FROM w GROUP BY b
), ranked AS (
  SELECT m, row_number() OVER (ORDER BY m, b) AS rk FROM means
)
SELECT
  (SELECT round(cast(sum(cast(round(value * 1e6) AS BIGINT)) AS double)
                / 1e6 / count(*), 6) FROM events) AS mean_value,
  (SELECT m FROM ranked WHERE rk = 3) AS ci_low,
  (SELECT m FROM ranked WHERE rk = {_BOOT_B - 2}) AS ci_high,
  {_BOOT_B} AS n_resamples
"""


@register(
    "events_bootstrap_ci_value_mean",
    _BOOT_ORACLE,
    tags=("events", "stats", "sampling"),
    bench=True,  # B x rows weight draws -> regression-tracked
)
def events_bootstrap_ci_value_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass Poisson-bootstrap 95 % CI for mean(value), B=100
    deterministic hash-drawn replicates.

    The replicate dimension explodes map-side and partial-aggregates
    before the shuffle — the exchange carries B×partitions rows, never
    B× the data; ranks run on the B-row replicate table.

    Cost knobs (VERDICT r8 #3 note): the per-(row×replicate) md5-derived
    draw is the dominant cost and exists ONLY for cross-engine hash
    parity with the DuckDB oracle.  A production deployment not bound by
    that gate would (a) swap ``stable_hash32`` for the JVM-native
    ``xxhash64`` (same plan shape, no md5 string round-trip — roughly
    halves the replicate pass), and/or (b) drop B from 100 to 50, which
    halves replicate work linearly and widens the CI's Monte-Carlo error
    by ~sqrt(2) (Chamandy et al., "Estimating Uncertainty for Massive
    Data Streams", 2012 — B in the tens suffices for a 95 % interval).
    """
    from event_streaming_spark.functions.hashing import stable_hash32

    # spread() BEFORE the replicate explode: the fixture scan is one
    # parquet split, so without it the whole B×rows md5 pass — the
    # query's entire cost — runs in ONE task (measured 10.9 s in a
    # single 100 %-CPU task at sf0.1).  The shuffle moves only
    # (event_id, value) rows once; on a deployment whose scan already
    # has file parallelism spread() is a no-op passthrough.
    ev = spread(load(spark, sf_dir, "events").select("event_id", "value"))
    xv = F.round(F.col("value") * 1e6).cast("long")
    # The md5 input is "boot|<event_id>|<b>"; the "boot|<event_id>|"
    # prefix is per-ROW, so build it once before the B-way explode
    # instead of re-concatenating (and re-casting event_id) per
    # replicate — byte-identical hash input, ~B× fewer prefix builds.
    h = (
        stable_hash32(F.concat(F.col("pre"), F.col("b").cast("string")))
        % 1000
    )
    w_expr = F.when(h < _BOOT_THRESH[0], 0)
    for k, t in enumerate(_BOOT_THRESH[1:], start=1):
        w_expr = w_expr.when(h < t, k)
    w_expr = w_expr.otherwise(6)
    w = ev.select(
        F.explode(F.sequence(F.lit(0), F.lit(_BOOT_B - 1))).alias("b"),
        xv.alias("xv"),
        F.concat(
            F.lit("boot|"), F.col("event_id").cast("string"), F.lit("|")
        ).alias("pre"),
    ).select("b", w_expr.alias("w"), "xv")
    means = w.groupBy("b").agg(
        F.round(
            F.sum(F.col("w") * F.col("xv")).cast("double")
            / F.lit(1e6)
            / F.sum("w"),
            6,
        ).alias("m")
    )
    ranked = means.select(
        "m", F.row_number().over(Window.orderBy("m", "b")).alias("rk")
    )
    point = ev.agg(
        F.round(
            F.sum(xv).cast("double") / F.lit(1e6) / F.count(F.lit(1)), 6
        ).alias("mean_value")
    )
    lo = ranked.where(F.col("rk") == 3).select(F.col("m").alias("ci_low"))
    hi = ranked.where(F.col("rk") == _BOOT_B - 2).select(F.col("m").alias("ci_high"))
    return (
        point.crossJoin(F.broadcast(lo))
        .crossJoin(F.broadcast(hi))
        .select(
            "mean_value",
            "ci_low",
            "ci_high",
            F.lit(_BOOT_B).cast("int").alias("n_resamples"),
        )
    )


# ---------------------------------------------------------------------------
# Difference-in-differences: mean event value of a deterministic
# hash-assigned user cohort vs the rest, before/after the calendar
# midpoint (the synthetic fixture has no natural treatment roster — the
# md5 split plays that role and guarantees both cohorts are populated at
# every SF; swap in a real assignment table in production).  The classic 2×2 causal read on observational
# event data: DiD = (T_post − T_pre) − (C_post − C_pre).  Every cell
# mean is the repo's exact scaled-long sum over integer-keyed groups;
# the midpoint is exact integer day arithmetic; the final subtraction
# is one fixed IEEE chain on the four identical doubles.
# Scale: one user-keyed semi-aggregate for the treatment flag broadcast
# back into a single fact scan (the flag table is users-sized), then a
# 4-cell rollup.
# ---------------------------------------------------------------------------

_DID_ORACLE = """
WITH treat AS (
  SELECT DISTINCT user_id,
         cast(('0x' || substr(md5('did|' || cast(user_id AS VARCHAR)), 1, 8))
              AS BIGINT) % 2 AS treated
  FROM events
), bounds AS (
  SELECT min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS d1
  FROM events
), cells AS (
  SELECT t.treated,
         CASE WHEN datediff('day', b.d0, CAST(e.ts AS DATE))
                   >= datediff('day', b.d0, b.d1) // 2
              THEN 1 ELSE 0 END AS post,
         count(*) AS n,
         cast(sum(cast(round(e.value * 1e6) AS BIGINT)) AS BIGINT) AS sv
  FROM events e JOIN treat t USING (user_id) CROSS JOIN bounds b
  GROUP BY 1, 2
), m AS (
  SELECT treated, post, n,
         cast(sv AS double) / 1e6 / n AS mean_v
  FROM cells
)
SELECT
  round((SELECT mean_v FROM m WHERE treated = 1 AND post = 1), 6) AS t_post,
  round((SELECT mean_v FROM m WHERE treated = 1 AND post = 0), 6) AS t_pre,
  round((SELECT mean_v FROM m WHERE treated = 0 AND post = 1), 6) AS c_post,
  round((SELECT mean_v FROM m WHERE treated = 0 AND post = 0), 6) AS c_pre,
  round(((SELECT mean_v FROM m WHERE treated = 1 AND post = 1)
       - (SELECT mean_v FROM m WHERE treated = 1 AND post = 0))
      - ((SELECT mean_v FROM m WHERE treated = 0 AND post = 1)
       - (SELECT mean_v FROM m WHERE treated = 0 AND post = 0)), 6) AS did
"""


@register(
    "events_diff_in_diff_signup",
    _DID_ORACLE,
    tags=("events", "stats", "causal"),
)
def events_diff_in_diff_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2×2 diff-in-differences of mean event value: hash-assigned
    cohort vs rest, pre/post the calendar midpoint."""
    ev = load(spark, sf_dir, "events")
    from event_streaming_spark.functions.hashing import stable_hash32

    treat = ev.select("user_id").distinct().select(
        "user_id",
        (
            stable_hash32(F.concat(F.lit("did|"), F.col("user_id").cast("string")))
            % 2
        ).alias("treated"),
    )
    b = ev.agg(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
    ).first()
    half = (b["d1"] - b["d0"]).days // 2
    cells = (
        ev.join(treat, "user_id")
        .select(
            "treated",
            F.when(
                F.datediff(F.to_date("ts"), F.lit(b["d0"])) >= F.lit(half),
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .alias("post"),
            F.round(F.col("value") * 1e6).cast("long").alias("xv"),
        )
        .groupBy("treated", "post")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("xv").alias("sv"))
        .select(
            "treated",
            "post",
            (F.col("sv").cast("double") / F.lit(1e6) / F.col("n")).alias("mean_v"),
        )
    )
    # 4-cell grid — bounded collect.  Use .get so a degenerate fixture
    # with an empty 2x2 cell yields NULLs (mirroring the oracle's AVG over
    # an empty group) instead of a driver-side KeyError.
    g = {(r["treated"], r["post"]): r["mean_v"] for r in cells.collect()}
    c11, c10 = g.get((1, 1)), g.get((1, 0))
    c01, c00 = g.get((0, 1)), g.get((0, 0))
    did = (
        (c11 - c10) - (c01 - c00)
        if None not in (c11, c10, c01, c00)
        else None
    )
    rnd = lambda x: round(x, 6) if x is not None else None
    row = [(rnd(c11), rnd(c10), rnd(c01), rnd(c00), rnd(did))]
    return local_frame(spark, 
        row, "t_post double, t_pre double, c_post double, c_pre double, did double"
    )


# ---------------------------------------------------------------------------
# Minimum-detectable-effect planner per event type: given the observed
# exact variance and daily volume, the two-sample MDE at α=.05 / power
# .8 is (z_α/2 + z_β)·√(2σ²/n) for a 14-day 50/50 test.  Moments come
# from the exact scaled-integer sums with the squared moment in
# DECIMAL(19,0)² (the z-test recipe — int64 overflows on Σx²); the
# final chain is fixed IEEE ops on identical doubles.  The planning
# readout every experimentation platform ships next to its z-test.
# ---------------------------------------------------------------------------

_MDE_Z = "2.8016"  # z_{.025} + z_{.20} = 1.9600 + 0.8416, shared literal

_MDE_ORACLE = f"""
WITH m AS (
  SELECT event_type,
         count(*) AS n_events,
         sum(cast(round(value * 1e6) AS BIGINT)) AS s1,
         sum(cast(round(value * 1e6) AS DECIMAL(19,0))
             * cast(round(value * 1e6) AS DECIMAL(19,0))) AS s2,
         max(CAST(ts AS DATE)) AS dmax,
         min(CAST(ts AS DATE)) AS dmin
  FROM events GROUP BY event_type
), v AS (
  SELECT event_type, n_events,
         (cast(s2 AS DOUBLE) / 1e12 - (cast(s1 AS DOUBLE) / 1e6)
            * (cast(s1 AS DOUBLE) / 1e6) / n_events) / (n_events - 1)
           AS variance,
         cast(n_events AS double)
           / (datediff('day', dmin, dmax) + 1) * 14.0 / 2.0 AS n_arm
  FROM m
)
SELECT event_type, n_events,
       round(variance, 6) AS variance,
       round({_MDE_Z} * sqrt(2.0 * variance / n_arm), 6) AS mde_14d
FROM v ORDER BY event_type
"""


@register(
    "events_mde_planner_by_type",
    _MDE_ORACLE,
    tags=("events", "stats"),
)
def events_mde_planner_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample minimum detectable effect per event type for a 14-day
    50/50 experiment at α=.05, power=.8 — exact integer moments, one
    IEEE chain at the boundary."""
    ev = load(spark, sf_dir, "events")
    xv = F.round(F.col("value") * 1e6).cast("long")
    xd = xv.cast("decimal(19,0)")
    m = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(xv).alias("s1"),
        F.sum(xd * xd).alias("s2"),
        F.max(F.to_date("ts")).alias("dmax"),
        F.min(F.to_date("ts")).alias("dmin"),
    )
    s1d = F.col("s1").cast("double") / F.lit(1e6)
    variance = (
        F.col("s2").cast("double") / F.lit(1e12)
        - s1d * s1d / F.col("n_events")
    ) / (F.col("n_events") - 1)
    n_arm = (
        F.col("n_events").cast("double")
        / (F.datediff("dmax", "dmin") + 1)
        * F.lit(14.0)
        / F.lit(2.0)
    )
    return m.select(
        "event_type",
        "n_events",
        F.round(variance, 6).alias("variance"),
        F.round(
            F.lit(2.8016) * F.sqrt(F.lit(2.0) * variance / n_arm), 6
        ).alias("mde_14d"),
    ).orderBy("event_type")
