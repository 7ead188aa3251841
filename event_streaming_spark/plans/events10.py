"""Round-11 tranche 3 — attribution game theory and sequential testing:
exact Shapley-value multi-touch attribution and the mSPRT always-valid
experiment monitor.

* ``events_attribution_shapley`` — Shapley-value attribution (Shapley
  1953; Zhao et al. 2018 "Shapley Value Methods for Attribution
  Modeling in Online Advertising"): each converting (user, day)
  journey contributes its SET of pre-conversion channels; the
  coalition game is v(S) = number of journeys whose channel set is a
  non-empty subset of S, and each channel's Shapley value is computed
  EXACTLY over the 2^k subset lattice (k = distinct non-purchase
  event types, capped at ``_SH_MAX_CH``).  All weights are scaled by
  k! so every output is an integer — the efficiency property
  (Σφ_c = v(K)) holds exactly and is asserted in tests.  This is the
  4th member of the attribution family (last-touch, position-based,
  Markov removal — plans/events3.py:284, events6.py:390) and the only
  one with the fairness axioms.
* ``events_msprt_always_valid`` — the mixture Sequential Probability
  Ratio Test (Johari, Koomen, Pekelis & Walsh, KDD 2017 — the
  "peeking problem" paper): a daily-cumulative two-sample mean
  comparison between the user_id-parity arms, with the normal-mixture
  likelihood ratio ln Λ_d = ½·ln(V/(V+τ²)) + Δ²τ²/(2·V·(V+τ²))
  evaluated from EXACT integer/decimal cumulative moments, and the
  always-valid p-value ln p_d = −max(0, max_{d'≤d} ln Λ_{d'}).
  Λ is kept in log space end-to-end (no exp), every per-day statistic
  is one fixed IEEE chain over exact integers rounded to 6dp, and the
  running max runs over the ROUNDED values — both engines agree
  bit-for-bit.

100 TB shape: each query is ONE map-side-combining keyed aggregate
over the fact table — (user, day) journey masks / (day, arm) moment
rows — followed by work on schema- or calendar-bounded frames (the
2^k subset lattice, the day spine).  The channel dictionary and the
subset lattice broadcast; nothing corpus-sized is ever windowed or
collected.

Reference parity note: the reference engine has no statistics surface
(SURVEY §2 O50 covers scalar math only); these extend the
experimentation pack (events8.py: SRM guardrail; events9.py: CUPED).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from event_streaming_spark.functions.localframe import local_frame
from event_streaming_spark.plans.catalog import load, register

# ---------------------------------------------------------------------------
# Shapley-value attribution.
# ---------------------------------------------------------------------------

_SH_MAX_CH = 8  # 2^8 = 256-row lattice; schema-bounded in practice (k = 4)

_SHAPLEY_ORACLE = f"""
WITH ev AS MATERIALIZED (
  SELECT user_id, CAST(ts AS DATE) AS day, event_type, ts
  FROM events
), channels AS (
  SELECT event_type AS ch,
         row_number() OVER (ORDER BY count(*) DESC, event_type) - 1 AS bit
  FROM ev WHERE event_type <> 'purchase'
  GROUP BY event_type
  ORDER BY count(*) DESC, event_type
  LIMIT {_SH_MAX_CH}
), k AS (
  SELECT cast(count(*) AS BIGINT) AS k,
         cast(factorial(cast(count(*) AS INTEGER)) AS BIGINT) AS kf
  FROM channels
), fp AS (
  SELECT user_id, day, min(ts) AS fpts
  FROM ev WHERE event_type = 'purchase'
  GROUP BY user_id, day
), masks AS (
  SELECT e.user_id, e.day,
         cast(bit_or(1 << c.bit) AS BIGINT) AS mask
  FROM ev e
  JOIN fp USING (user_id, day)
  JOIN channels c ON c.ch = e.event_type
  WHERE e.ts < fp.fpts
  GROUP BY e.user_id, e.day
), nc AS (
  SELECT mask, cast(count(*) AS BIGINT) AS n FROM masks GROUP BY mask
), lattice AS (
  SELECT cast(range AS BIGINT) AS s
  FROM range({1 << _SH_MAX_CH}), k WHERE range < (1 << cast(k.k AS INTEGER))
), v AS (
  SELECT l.s, cast(coalesce(sum(nc.n), 0) AS BIGINT) AS v
  FROM lattice l LEFT JOIN nc ON (nc.mask & l.s) = nc.mask
  GROUP BY l.s
), phi AS (
  SELECT c.ch AS channel,
         cast(sum(CASE
           WHEN (v.s & (1 << cast(c.bit AS INTEGER))) <> 0 THEN
             cast(factorial(cast(bit_count(v.s) - 1 AS INTEGER)) AS BIGINT)
             * cast(factorial(cast(k.k - bit_count(v.s) AS INTEGER)) AS BIGINT) * v.v
           ELSE
             - cast(factorial(cast(bit_count(v.s) AS INTEGER)) AS BIGINT)
             * cast(factorial(cast(k.k - bit_count(v.s) - 1 AS INTEGER)) AS BIGINT) * v.v
         END) AS BIGINT) AS shapley_num
  FROM channels c CROSS JOIN k CROSS JOIN v
  GROUP BY c.ch
), tot AS (
  SELECT v AS vk FROM v, k WHERE v.s = (1 << k.k) - 1
)
SELECT p.channel, p.shapley_num, k.kf AS k_factorial, tot.vk AS converted_journeys,
       cast(CASE WHEN tot.vk > 0 THEN
         (2000000 * p.shapley_num + k.kf * tot.vk) // (2 * k.kf * tot.vk)
       ELSE 0 END AS BIGINT) AS share_ppm
FROM phi p, k, tot
ORDER BY p.channel
"""


@register(
    "events_attribution_shapley",
    _SHAPLEY_ORACLE,
    tags=("events", "attribution", "stats"),
)
def events_attribution_shapley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Shapley-value channel attribution over the subset lattice.

    Scale design: the ONLY data-sized stages are the first-purchase
    aggregate and the journey-mask aggregate, both keyed on
    (user_id, day) — one shuffle each, co-partitioned, map-side
    combining.  The channel dictionary (≤ |event types| rows), the
    mask histogram (≤ 2^k rows) and the subset lattice (2^k rows,
    k ≤ 8) are broadcast frames; the Shapley sweep is a
    channels × lattice cross join of ≤ 8·256 rows.  Every weight is
    scaled by k! so the output is integer-exact — Σφ = v(K)
    (efficiency) holds exactly.
    """
    ev = load(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day"), "event_type", "ts"
    )
    # channel dictionary: ≤ |distinct event_type| rows — the unpartitioned
    # row_number head is schema-bounded (pinned in test_plan_regressions).
    channels = (
        ev.where(F.col("event_type") != "purchase")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn(
            "bit",
            F.row_number().over(Window.orderBy(F.desc("cnt"), "event_type")) - 1,
        )
        .where(F.col("bit") < _SH_MAX_CH)
        .select(F.col("event_type").alias("ch"), "bit")
    )
    k = channels.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.factorial(F.count(F.lit(1)).cast("int")).alias("kf"),
    )
    fp = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id", "day")
        .agg(F.min("ts").alias("fpts"))
    )
    masks = (
        ev.join(fp, ["user_id", "day"])
        .join(F.broadcast(channels), ev["event_type"] == channels["ch"])
        .where(F.col("ts") < F.col("fpts"))
        .groupBy("user_id", "day")
        .agg(F.bit_or(F.expr("shiftleft(1, cast(bit as int))")).cast("long").alias("mask"))
    )
    nc = masks.groupBy("mask").agg(F.count(F.lit(1)).cast("long").alias("n"))
    n_masks = (
        spark.range(1 << _SH_MAX_CH)
        .crossJoin(F.broadcast(k))
        .where(F.col("id") < F.expr("shiftleft(1, cast(k as int))"))
        .select(F.col("id").alias("s"))
    )
    v = (
        n_masks.join(
            F.broadcast(nc),
            (F.col("mask").bitwiseAND(F.col("s"))) == F.col("mask"),
            "left",
        )
        .groupBy("s")
        .agg(F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("v"))
    )
    pc = F.bit_count(F.col("s")).cast("int")
    in_s = (F.col("s").bitwiseAND(F.expr("shiftleft(1, cast(bit as int))"))) != 0
    term = F.when(
        in_s,
        F.factorial(pc - 1) * F.factorial((F.col("k") - pc).cast("int")) * F.col("v"),
    ).otherwise(
        -F.factorial(pc) * F.factorial((F.col("k") - pc - 1).cast("int")) * F.col("v")
    )
    phi = (
        F.broadcast(channels)
        .crossJoin(F.broadcast(k))
        .crossJoin(v)
        .groupBy("ch")
        .agg(F.sum(term).cast("long").alias("shapley_num"))
    )
    tot = (
        v.crossJoin(F.broadcast(k))
        .where(F.col("s") == F.expr("shiftleft(1, cast(k as int)) - 1"))
        .select(F.col("v").alias("vk"))
    )
    share = F.when(
        F.col("vk") > 0,
        F.expr("(2000000 * shapley_num + kf * vk) div (2 * kf * vk)"),
    ).otherwise(F.lit(0))
    return (
        phi.crossJoin(F.broadcast(k))
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("ch").alias("channel"),
            "shapley_num",
            F.col("kf").cast("long").alias("k_factorial"),
            F.col("vk").alias("converted_journeys"),
            share.cast("long").alias("share_ppm"),
        )
        .orderBy("channel")
    )


# ---------------------------------------------------------------------------
# mSPRT always-valid monitor.
# ---------------------------------------------------------------------------

_MSPRT_TAU2 = 4.0  # mixture variance: effects of ~2 value-units are typical
_MSPRT_LN_INV_ALPHA = 2.995732  # ln(1/0.05), 6dp — compare on 6dp-rounded lnΛ

_MSPRT_ORACLE = f"""
WITH ev AS MATERIALIZED (
  SELECT CAST(ts AS DATE) AS day, user_id % 2 AS arm,
         cast(round(value * 1e6) AS BIGINT) AS v6
  FROM events
), d AS (
  SELECT day,
         cast(coalesce(sum(CASE WHEN arm = 0 THEN 1 END), 0) AS BIGINT) AS na,
         cast(coalesce(sum(CASE WHEN arm = 1 THEN 1 END), 0) AS BIGINT) AS nb,
         cast(coalesce(sum(CASE WHEN arm = 0 THEN v6 END), 0) AS BIGINT) AS sa,
         cast(coalesce(sum(CASE WHEN arm = 1 THEN v6 END), 0) AS BIGINT) AS sb,
         cast(coalesce(sum(CASE WHEN arm = 0 THEN cast(v6 AS DECIMAL(38,0))
                                    * v6 END), 0) AS DECIMAL(38,0)) AS qa,
         cast(coalesce(sum(CASE WHEN arm = 1 THEN cast(v6 AS DECIMAL(38,0))
                                    * v6 END), 0) AS DECIMAL(38,0)) AS qb
  FROM ev GROUP BY day
), c AS (
  SELECT day,
         cast(sum(na) OVER w AS BIGINT) AS na,
         cast(sum(nb) OVER w AS BIGINT) AS nb,
         cast(sum(sa) OVER w AS BIGINT) AS sa,
         cast(sum(sb) OVER w AS BIGINT) AS sb,
         cast(sum(qa) OVER w AS DECIMAL(38,0)) AS qa,
         cast(sum(qb) OVER w AS DECIMAL(38,0)) AS qb
  FROM d
  WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), s AS (
  SELECT day, na, nb,
         round((cast(sb AS DOUBLE) / 1e6 / nb)
               - (cast(sa AS DOUBLE) / 1e6 / na), 6) AS delta_mean,
         round(
           CASE WHEN na > 1 AND nb > 1 AND vv > 0 THEN
             0.5 * ln(vv / (vv + {_MSPRT_TAU2}))
             + dd * dd * {_MSPRT_TAU2} / (2.0 * vv * (vv + {_MSPRT_TAU2}))
           ELSE 0.0 END, 6) AS ln_lambda
  FROM (
    SELECT day, na, nb, sa, sb,
           (cast(sb AS DOUBLE) / 1e6 / nb) - (cast(sa AS DOUBLE) / 1e6 / na) AS dd,
           CASE WHEN na > 1 AND nb > 1 THEN
             ((cast(qa AS DOUBLE) / 1e12
               - (cast(sa AS DOUBLE) / 1e6) * (cast(sa AS DOUBLE) / 1e6) / na)
              / (na - 1)) / na
             + ((cast(qb AS DOUBLE) / 1e12
               - (cast(sb AS DOUBLE) / 1e6) * (cast(sb AS DOUBLE) / 1e6) / nb)
              / (nb - 1)) / nb
           END AS vv
    FROM c)
)
SELECT day, na AS n_a, nb AS n_b, delta_mean, ln_lambda,
       round(-greatest(0.0, max(ln_lambda)
             OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW)), 6) + 0.0 AS ln_avp,
       CASE WHEN max(ln_lambda)
             OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW) > {_MSPRT_LN_INV_ALPHA}
            THEN 1 ELSE 0 END AS rejected
FROM s
ORDER BY day
"""


@register(
    "events_msprt_always_valid",
    _MSPRT_ORACLE,
    tags=("events", "stats", "experimentation"),
)
def events_msprt_always_valid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mSPRT always-valid p-value monitor over daily cumulative arms.

    Scale design: ONE map-side-combining aggregate turns the fact
    table into a (day)-keyed moment frame (counts, 6dp-scaled sums,
    DECIMAL(38,0) sums of squares — exact at any volume); every
    window below runs on that calendar-bounded day spine (pinned in
    test_plan_regressions).  Λ stays in log space (no exp); per-day
    statistics are single fixed IEEE chains over exact integers,
    rounded to 6dp BEFORE the running max, so the always-valid
    p-value is bit-identical on both engines.
    """
    tau2 = F.lit(_MSPRT_TAU2)
    ev = load(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"),
        (F.col("user_id") % 2).alias("arm"),
        F.round(F.col("value") * 1e6).cast("long").alias("v6"),
    )
    d = ev.groupBy("day").agg(
        F.coalesce(F.sum(F.when(F.col("arm") == 0, 1)), F.lit(0)).cast("long").alias("na"),
        F.coalesce(F.sum(F.when(F.col("arm") == 1, 1)), F.lit(0)).cast("long").alias("nb"),
        F.coalesce(F.sum(F.when(F.col("arm") == 0, F.col("v6"))), F.lit(0))
        .cast("long").alias("sa"),
        F.coalesce(F.sum(F.when(F.col("arm") == 1, F.col("v6"))), F.lit(0))
        .cast("long").alias("sb"),
        F.coalesce(
            F.sum(F.when(F.col("arm") == 0, F.col("v6").cast("decimal(38,0)") * F.col("v6"))),
            F.lit(0),
        ).cast("decimal(38,0)").alias("qa"),
        F.coalesce(
            F.sum(F.when(F.col("arm") == 1, F.col("v6").cast("decimal(38,0)") * F.col("v6"))),
            F.lit(0),
        ).cast("decimal(38,0)").alias("qb"),
    )
    # calendar-bounded day spine: cumulative moments + running max
    wc = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    c = d.select(
        "day",
        F.sum("na").over(wc).cast("long").alias("na"),
        F.sum("nb").over(wc).cast("long").alias("nb"),
        F.sum("sa").over(wc).cast("long").alias("sa"),
        F.sum("sb").over(wc).cast("long").alias("sb"),
        F.sum("qa").over(wc).cast("decimal(38,0)").alias("qa"),
        F.sum("qb").over(wc).cast("decimal(38,0)").alias("qb"),
    )
    ma = F.col("sa").cast("double") / 1e6 / F.col("na")
    mb = F.col("sb").cast("double") / 1e6 / F.col("nb")
    dd = mb - ma
    va = (
        (
            F.col("qa").cast("double") / 1e12
            - (F.col("sa").cast("double") / 1e6)
            * (F.col("sa").cast("double") / 1e6)
            / F.col("na")
        )
        / (F.col("na") - 1)
    ) / F.col("na")
    vb = (
        (
            F.col("qb").cast("double") / 1e12
            - (F.col("sb").cast("double") / 1e6)
            * (F.col("sb").cast("double") / 1e6)
            / F.col("nb")
        )
        / (F.col("nb") - 1)
    ) / F.col("nb")
    vv = va + vb
    ok = (F.col("na") > 1) & (F.col("nb") > 1) & (vv > 0)
    ln_lambda = F.round(
        F.when(
            ok,
            0.5 * F.log(vv / (vv + tau2))
            + dd * dd * tau2 / (2.0 * vv * (vv + tau2)),
        ).otherwise(0.0),
        6,
    )
    s = c.select(
        "day",
        F.col("na").alias("n_a"),
        F.col("nb").alias("n_b"),
        F.round(dd, 6).alias("delta_mean"),
        ln_lambda.alias("ln_lambda"),
    )
    runmax = F.max("ln_lambda").over(wc)
    return s.select(
        "day",
        "n_a",
        "n_b",
        "delta_mean",
        "ln_lambda",
        # + 0.0 folds the IEEE −0.0 (when the running max is ≤ 0) to +0.0
        # on both engines — repr(−0.0) would otherwise hash-differ.
        (F.round(-F.greatest(F.lit(0.0), runmax), 6) + 0.0).alias("ln_avp"),
        F.when(runmax > _MSPRT_LN_INV_ALPHA, 1).otherwise(0).alias("rejected"),
    ).orderBy("day")


# ---------------------------------------------------------------------------
# STREAMING mSPRT drain: the always-valid monitor deployed as a stream —
# the actual production shape of sequential testing (Johari et al. 2017
# §6: the whole point of an always-valid p-value is that it is read
# CONTINUOUSLY).  Streaming state is the per-(day, arm) moment rows —
# calendar-bounded, never volume-bounded; the cumulative lnΛ chain runs
# as an epilogue on the drained moments with operation-for-operation the
# batch twin's arithmetic.  Oracle: the SAME batch SQL (stream ≡ batch).
# ---------------------------------------------------------------------------


@register(
    "streaming_msprt_drain",
    _MSPRT_ORACLE,
    tags=("streaming", "stats", "experimentation"),
)
def streaming_msprt_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Publish events → topic log → availableNow drain keyed (day, arm)
    → cumulative mSPRT epilogue on the drained moment rows.

    Scale design: each micro-batch does ONE map-side-combined aggregate
    to (day, arm) rows carrying (count, Σv6, Σv6² as DECIMAL(38,0)) —
    exact at any volume, state bounded by the calendar; the lnΛ chain
    (identical IEEE operation order to the batch twin, including the
    6dp half-up rounding BEFORE the running max) runs on the final
    state-sized frame.
    """
    import math
    import shutil
    import tempfile

    from pyspark.sql import types as T

    from event_streaming_spark.streaming.agency import EventsAgency

    ev = load(spark, sf_dir, "events")

    root = tempfile.mkdtemp(prefix="est-msprtdrain-")
    batches: list = []
    try:
        agency = EventsAgency(spark, root=root, log_format="parquet")
        ctx = agency.topic("driver-gate", "events-msprt")
        ctx.publish(ev)

        def moments(df: DataFrame) -> DataFrame:
            v6 = F.round(F.col("value") * 1e6).cast("long")
            return (
                df.select("ts", (F.col("user_id") % 2).alias("arm"), v6.alias("v6"))
                .withWatermark("ts", "1 hour")
                .groupBy(F.window("ts", "1 day"), "arm")
                .agg(
                    F.count(F.lit(1)).cast("long").alias("n"),
                    F.sum("v6").cast("long").alias("s"),
                    F.sum(F.col("v6").cast("decimal(38,0)") * F.col("v6"))
                    .cast("decimal(38,0)")
                    .alias("q"),
                )
            )

        def on_notify(c, batch_df: DataFrame, batch_id: int) -> None:
            pdf = batch_df.select(
                F.to_date(F.col("window.start")).alias("day"), "arm", "n", "s", "q"
            ).toPandas()
            pdf["batch_id"] = batch_id
            batches.append(pdf)

        ctx.consume(
            on_notify,
            once=True,
            transform=moments,
            output_mode="update",
            state_partitions=8,
        )
        agency.close(remove_logs=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)

    schema = T.StructType(
        [
            T.StructField("day", T.DateType()),
            T.StructField("n_a", T.LongType()),
            T.StructField("n_b", T.LongType()),
            T.StructField("delta_mean", T.DoubleType()),
            T.StructField("ln_lambda", T.DoubleType()),
            T.StructField("ln_avp", T.DoubleType()),
            T.StructField("rejected", T.IntegerType()),
        ]
    )
    if not batches:
        return local_frame(spark, [], schema)

    import pandas as pd

    all_updates = pd.concat(batches, ignore_index=True)
    last = (
        all_updates.sort_values("batch_id", kind="stable")
        .groupby(["day", "arm"], as_index=False)
        .last()
    )

    def r6(x: float) -> float:
        # HALF_UP at 6dp, sign-aware — the JVM/DuckDB round() convention
        return math.copysign(math.floor(abs(x) * 1e6 + 0.5), x) / 1e6

    by_day: dict = {}
    for r in last.itertuples():
        d = by_day.setdefault(r.day, {0: (0, 0, 0), 1: (0, 0, 0)})
        d[int(r.arm)] = (int(r.n), int(r.s), int(r.q))
    na = nb = sa = sb = 0
    qa = qb = 0
    out_rows = []
    runmax = None
    for day in sorted(by_day):
        a0, a1 = by_day[day][0], by_day[day][1]
        na += a0[0]; sa += a0[1]; qa += a0[2]
        nb += a1[0]; sb += a1[1]; qb += a1[2]
        ma = (float(sa) / 1e6) / na if na else 0.0
        mb = (float(sb) / 1e6) / nb if nb else 0.0
        dd = mb - ma
        if na > 1 and nb > 1:
            va = ((float(qa) / 1e12 - (float(sa) / 1e6) * (float(sa) / 1e6) / na)
                  / (na - 1)) / na
            vb = ((float(qb) / 1e12 - (float(sb) / 1e6) * (float(sb) / 1e6) / nb)
                  / (nb - 1)) / nb
            vv = va + vb
        else:
            vv = 0.0
        if na > 1 and nb > 1 and vv > 0:
            ln_lambda = r6(
                0.5 * math.log(vv / (vv + _MSPRT_TAU2))
                + dd * dd * _MSPRT_TAU2 / (2.0 * vv * (vv + _MSPRT_TAU2))
            )
        else:
            ln_lambda = 0.0
        runmax = ln_lambda if runmax is None else max(runmax, ln_lambda)
        out_rows.append(
            (
                day,
                na,
                nb,
                r6(dd),
                ln_lambda,
                r6(-max(0.0, runmax)) + 0.0,
                1 if runmax > _MSPRT_LN_INV_ALPHA else 0,
            )
        )
    return local_frame(spark, out_rows, schema)


# ---------------------------------------------------------------------------
# Session predictability: the entropy rate of the (user, day) journey
# Markov chain.  Per-state conditional entropy H(next | s) plus each
# state's contribution to the empirical entropy rate Σ_s π_s·H(·|s) —
# the standard "how templated is user behavior" readout (Song et al.
# 2010 limits-of-predictability framing), and the information-theoretic
# companion of events_markov_type_transitions.  Every term is rounded
# to 6dp fixed point BEFORE its sum, so the per-state integers are
# order-free and bit-identical cross-engine.
# ---------------------------------------------------------------------------

_ENT_ORACLE = """
WITH seq AS MATERIALIZED (
  SELECT user_id, CAST(ts AS DATE) AS day, event_type, ts, event_id
  FROM events
), tr AS MATERIALIZED (
  SELECT src, dst FROM (
    SELECT lag(event_type) OVER (PARTITION BY user_id, day
                                 ORDER BY ts, event_id) AS src,
           event_type AS dst
    FROM seq
  ) WHERE src IS NOT NULL
), csd AS (
  SELECT src, dst, cast(count(*) AS BIGINT) AS c FROM tr GROUP BY src, dst
), cs AS (
  SELECT src, cast(sum(c) AS BIGINT) AS cs FROM csd GROUP BY src
), n AS (
  SELECT cast(sum(c) AS BIGINT) AS n FROM csd
)
SELECT d.src,
       cs.cs AS n_transitions,
       cast(sum(cast(round(-(cast(d.c AS DOUBLE) / cs.cs)
                 * ln(cast(d.c AS DOUBLE) / cs.cs) * 1e6) AS BIGINT))
            AS BIGINT) AS h_cond_fp6,
       cast(sum(cast(round(-(cast(d.c AS DOUBLE) / n.n)
                 * ln(cast(d.c AS DOUBLE) / cs.cs) * 1e6) AS BIGINT))
            AS BIGINT) AS contrib_fp6
FROM csd d JOIN cs ON cs.src = d.src CROSS JOIN n
GROUP BY d.src, cs.cs
ORDER BY d.src
"""


@register(
    "events_markov_entropy_rate",
    _ENT_ORACLE,
    tags=("events", "stats", "markov"),
)
def events_markov_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-state conditional entropy + entropy-rate contribution of the
    journey transition chain.

    Scale design: ONE (user, day)-keyed ordered window produces the
    transition stream; the (src, dst) wordcount aggregate map-side
    combines to a ≤|types|² frame, and all entropy arithmetic runs on
    that schema-bounded grid with broadcast totals.  Per-term 6dp
    fixed-point rounding BEFORE the sums keeps the integers order-free.
    """
    wday = Window.partitionBy("user_id", "day").orderBy("ts", "event_id")
    seq = load(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day"), "event_type", "ts", "event_id"
    )
    tr = (
        seq.withColumn("src", F.lag("event_type").over(wday))
        .where(F.col("src").isNotNull())
        .select("src", F.col("event_type").alias("dst"))
    )
    csd = tr.groupBy("src", "dst").agg(F.count(F.lit(1)).cast("long").alias("c"))
    cs = csd.groupBy("src").agg(F.sum("c").cast("long").alias("cs"))
    n = csd.agg(F.sum("c").cast("long").alias("n"))
    p = F.col("c").cast("double") / F.col("cs")
    h_term = F.round(-p * F.log(p) * 1e6).cast("long")
    r_term = F.round(
        -(F.col("c").cast("double") / F.col("n"))
        * F.log(F.col("c").cast("double") / F.col("cs"))
        * 1e6
    ).cast("long")
    return (
        csd.join(F.broadcast(cs), "src")
        .crossJoin(F.broadcast(n))
        .select("src", F.col("cs").alias("n_transitions"), h_term.alias("ht"), r_term.alias("rt"))
        .groupBy("src", "n_transitions")
        .agg(
            F.sum("ht").cast("long").alias("h_cond_fp6"),
            F.sum("rt").cast("long").alias("contrib_fp6"),
        )
        .orderBy("src")
    )
