"""Round-11 experimentation / monitoring statistics: CUPED variance
reduction and the PSI population-stability monitor.

* ``events_cuped_variance_reduction`` — CUPED (Deng, Xu, Kohavi &
  Walker, WSDM 2013): the standard A/B variance-reduction estimator.
  Users are hash-split into two arms; the experiment-period metric
  (per-user value sum over the second half of the date span) is
  adjusted by the pre-period covariate (first half) with the pooled
  theta = cov(x,y)/var(x), and the output reports per-arm raw vs
  CUPED-adjusted variance plus the achieved reduction.  Every moment
  comes from exact integer/decimal sums (functions/numeric.py
  discipline), so theta and the variances are identical IEEE chains
  on both engines.
* ``events_value_psi_daily`` — the Population Stability Index drift
  monitor every production scorer runs: the `value` distribution of
  each day vs a fixed baseline window (first ``_PSI_BASE_DAYS``
  days), over 10 equi-width bins derived from the BASELINE's integer
  µ-value range, add-1 smoothed.  Bin assignment is pure int64
  arithmetic; each bin's (q-p)·ln(q/p) term is rounded to 6dp fixed
  point BEFORE the 10-term sum, so the day's PSI is an exact integer
  on both engines.

100 TB shape: both are one map-side-combining aggregate over the fact
table (per-user sums / per-(day, bin) counts) followed by work on
user- or day-sized frames; the baseline stats and theta are 1-row
broadcast scalars.  No shuffle beyond the keyed aggregates.

Reference parity note: the reference engine has no statistics surface
(SURVEY §2 O50 covers scalar math only); these extend the stats pack
(plans/scale_ops2.py, events8.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_streaming_spark.functions.localframe import local_frame
from event_streaming_spark.plans.catalog import load, register

# ---------------------------------------------------------------------------
# CUPED variance reduction.
# ---------------------------------------------------------------------------

_CUPED_ORACLE = """
WITH ev AS MATERIALIZED (
  SELECT user_id, CAST(ts AS DATE) AS day,
         cast(round(value * 1e6) AS BIGINT) AS v6
  FROM events
), bounds AS (
  SELECT min(day) AS d0, date_diff('day', min(day), max(day)) + 1 AS span
  FROM ev
), u AS MATERIALIZED (
  SELECT user_id, user_id % 2 AS arm,
         cast(coalesce(sum(v6) FILTER (
           WHERE date_diff('day', b.d0, day) < b.span // 2), 0) AS BIGINT)
           AS x6,
         cast(coalesce(sum(v6) FILTER (
           WHERE date_diff('day', b.d0, day) >= b.span // 2), 0) AS BIGINT)
           AS y6
  FROM ev, bounds b
  GROUP BY user_id, b.d0, b.span
), pool AS (
  SELECT cast(count(*) AS BIGINT) AS n,
         cast(sum(x6) AS BIGINT) AS sx, cast(sum(y6) AS BIGINT) AS sy,
         sum(cast(x6 AS DECIMAL(19,0)) * cast(x6 AS DECIMAL(19,0))) AS sxx,
         sum(cast(x6 AS DECIMAL(19,0)) * cast(y6 AS DECIMAL(19,0))) AS sxy
  FROM u
), theta AS (
  SELECT ((cast(sxy AS DOUBLE) / 1e12
           - (cast(sx AS DOUBLE) / 1e6) * (cast(sy AS DOUBLE) / 1e6) / n)
          / (n - 1))
         / ((cast(sxx AS DOUBLE) / 1e12
             - (cast(sx AS DOUBLE) / 1e6) * (cast(sx AS DOUBLE) / 1e6) / n)
            / (n - 1)) AS th
  FROM pool
), a AS (
  SELECT arm, cast(count(*) AS BIGINT) AS n_users,
         cast(sum(x6) AS BIGINT) AS sx, cast(sum(y6) AS BIGINT) AS sy,
         sum(cast(x6 AS DECIMAL(19,0)) * cast(x6 AS DECIMAL(19,0))) AS sxx,
         sum(cast(y6 AS DECIMAL(19,0)) * cast(y6 AS DECIMAL(19,0))) AS syy,
         sum(cast(x6 AS DECIMAL(19,0)) * cast(y6 AS DECIMAL(19,0))) AS sxy
  FROM u GROUP BY arm
), s AS (
  SELECT arm, n_users, th,
         (cast(sy AS DOUBLE) / 1e6) / n_users AS mean_y,
         (cast(syy AS DOUBLE) / 1e12
          - (cast(sy AS DOUBLE) / 1e6) * (cast(sy AS DOUBLE) / 1e6) / n_users)
           / (n_users - 1) AS var_y,
         (cast(sxx AS DOUBLE) / 1e12
          - (cast(sx AS DOUBLE) / 1e6) * (cast(sx AS DOUBLE) / 1e6) / n_users)
           / (n_users - 1) AS var_x,
         (cast(sxy AS DOUBLE) / 1e12
          - (cast(sx AS DOUBLE) / 1e6) * (cast(sy AS DOUBLE) / 1e6) / n_users)
           / (n_users - 1) AS cov_xy
  FROM a, theta
)
SELECT cast(arm AS BIGINT) AS arm, n_users,
       round(mean_y, 6) AS mean_y,
       round(var_y, 6) AS var_y,
       round(var_y - 2 * th * cov_xy + th * th * var_x, 6) AS var_cuped,
       round(th, 6) AS theta,
       round(1 - (var_y - 2 * th * cov_xy + th * th * var_x) / var_y, 6)
         AS var_reduction
FROM s ORDER BY arm
"""


@register(
    "events_cuped_variance_reduction",
    _CUPED_ORACLE,
    tags=("agg", "stats", "experiment"),
)
def events_cuped_variance_reduction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-arm raw vs CUPED-adjusted variance with pooled theta.

    Scale design: ONE keyed aggregate over the fact builds the
    per-user (pre, post) value sums; every later frame is user-count-
    or arm-sized.  Squared moments accumulate in DECIMAL(38,0) (int64
    overflows at ~1e5 µ-scaled rows — the z-test lesson), and theta /
    variances are the same fixed double chain on both engines, so the
    6dp rounding is stable.  The date-span split and arm assignment
    are derived declaratively (min/max + modulus) — no data-dependent
    cohort that could degenerate at small SF.
    """
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        F.col("ts").cast("date").alias("day"),
        F.round(F.col("value") * 1e6).cast("long").alias("v6"),
    )
    bounds = ev.agg(
        F.min("day").alias("d0"),
        (F.datediff(F.max("day"), F.min("day")) + 1).alias("span"),
    )
    is_pre = F.datediff(F.col("day"), F.col("d0")) < F.expr("span div 2")
    u = (
        ev.crossJoin(F.broadcast(bounds))
        .groupBy("user_id")
        .agg(
            F.coalesce(F.sum(F.when(is_pre, F.col("v6"))), F.lit(0))
            .cast("long")
            .alias("x6"),
            F.coalesce(F.sum(F.when(~is_pre, F.col("v6"))), F.lit(0))
            .cast("long")
            .alias("y6"),
        )
        .select(
            "user_id",
            F.pmod("user_id", F.lit(2)).alias("arm"),
            "x6",
            "y6",
        )
    )
    xd = F.col("x6").cast("decimal(19,0)")
    yd = F.col("y6").cast("decimal(19,0)")
    pool = u.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x6").cast("long").alias("sx"),
        F.sum("y6").cast("long").alias("sy"),
        F.sum(xd * xd).alias("sxx"),
        F.sum(xd * yd).alias("sxy"),
    )
    th = (
        (
            F.col("sxy").cast("double") / 1e12
            - (F.col("sx").cast("double") / 1e6)
            * (F.col("sy").cast("double") / 1e6)
            / F.col("n")
        )
        / (F.col("n") - 1)
    ) / (
        (
            F.col("sxx").cast("double") / 1e12
            - (F.col("sx").cast("double") / 1e6)
            * (F.col("sx").cast("double") / 1e6)
            / F.col("n")
        )
        / (F.col("n") - 1)
    )
    theta = pool.select(th.alias("th"))
    a = u.groupBy("arm").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("x6").cast("long").alias("sx"),
        F.sum("y6").cast("long").alias("sy"),
        F.sum(xd * xd).alias("sxx"),
        F.sum(yd * yd).alias("syy"),
        F.sum(xd * yd).alias("sxy"),
    )
    n = F.col("n_users")
    mean_y = (F.col("sy").cast("double") / 1e6) / n
    var_y = (
        F.col("syy").cast("double") / 1e12
        - (F.col("sy").cast("double") / 1e6)
        * (F.col("sy").cast("double") / 1e6)
        / n
    ) / (n - 1)
    var_x = (
        F.col("sxx").cast("double") / 1e12
        - (F.col("sx").cast("double") / 1e6)
        * (F.col("sx").cast("double") / 1e6)
        / n
    ) / (n - 1)
    cov_xy = (
        F.col("sxy").cast("double") / 1e12
        - (F.col("sx").cast("double") / 1e6)
        * (F.col("sy").cast("double") / 1e6)
        / n
    ) / (n - 1)
    var_cuped = var_y - 2 * F.col("th") * cov_xy + F.col("th") * F.col("th") * var_x
    return (
        a.crossJoin(F.broadcast(theta))
        .select(
            F.col("arm").cast("long").alias("arm"),
            "n_users",
            F.round(mean_y, 6).alias("mean_y"),
            F.round(var_y, 6).alias("var_y"),
            F.round(var_cuped, 6).alias("var_cuped"),
            F.round(F.col("th"), 6).alias("theta"),
            F.round(1 - var_cuped / var_y, 6).alias("var_reduction"),
        )
        .orderBy("arm")
    )


# ---------------------------------------------------------------------------
# PSI population-stability monitor.
# ---------------------------------------------------------------------------

_PSI_BASE_DAYS = 10  # baseline window: first N days of the span
_PSI_BINS = 10

_PSI_ORACLE = f"""
WITH ev AS MATERIALIZED (
  SELECT CAST(ts AS DATE) AS day,
         cast(round(value * 1e6) AS BIGINT) AS v6
  FROM events
), d0 AS (SELECT min(day) AS d0 FROM ev),
base AS MATERIALIZED (
  SELECT v6 FROM ev, d0 WHERE date_diff('day', d0.d0, day) < {_PSI_BASE_DAYS}
), rng AS (
  SELECT min(v6) AS vmin6, max(v6) AS vmax6,
         cast(count(*) AS BIGINT) AS bn
  FROM base
), bbin AS (
  SELECT least({_PSI_BINS - 1}, greatest(0,
           (v6 - rng.vmin6) * {_PSI_BINS} // (rng.vmax6 - rng.vmin6 + 1)))
           AS bin,
         cast(count(*) AS BIGINT) AS bc
  FROM base, rng GROUP BY 1
), dbin AS (
  SELECT day, least({_PSI_BINS - 1}, greatest(0,
           (v6 - rng.vmin6) * {_PSI_BINS} // (rng.vmax6 - rng.vmin6 + 1)))
           AS bin,
         cast(count(*) AS BIGINT) AS dc
  FROM ev, rng GROUP BY 1, 2
), dtot AS (
  SELECT day, cast(sum(dc) AS BIGINT) AS dn FROM dbin GROUP BY day
), grid AS (
  SELECT dtot.day, dtot.dn, b.bin,
         coalesce(dbin.dc, 0) AS dc, coalesce(bbin.bc, 0) AS bc, rng.bn
  FROM dtot
  CROSS JOIN (SELECT unnest(generate_series(0, {_PSI_BINS - 1})) AS bin) b
  CROSS JOIN rng
  LEFT JOIN dbin ON dbin.day = dtot.day AND dbin.bin = b.bin
  LEFT JOIN bbin ON bbin.bin = b.bin
), terms AS (
  SELECT day, dn,
         cast(round((
           (cast(dc + 1 AS DOUBLE) / cast(dn + {_PSI_BINS} AS DOUBLE)
            - cast(bc + 1 AS DOUBLE) / cast(bn + {_PSI_BINS} AS DOUBLE))
           * ln((cast(dc + 1 AS DOUBLE) / cast(dn + {_PSI_BINS} AS DOUBLE))
                / (cast(bc + 1 AS DOUBLE) / cast(bn + {_PSI_BINS} AS DOUBLE)))
         ) * 1e6) AS BIGINT) AS term_fp
  FROM grid
)
SELECT day, cast(dn AS BIGINT) AS n_events,
       cast(sum(term_fp) AS BIGINT) AS psi_fp6
FROM terms GROUP BY day, dn ORDER BY day
"""


@register(
    "events_value_psi_daily",
    _PSI_ORACLE,
    tags=("agg", "stats", "drift", "quality"),
)
def events_value_psi_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily PSI of the value distribution vs the baseline window.

    Scale design: bin edges are pure int64 arithmetic from the
    baseline's µ-value range (1-row broadcast), so binning happens
    map-side inside the same pass that counts (day, bin) — the fact
    table is aggregated ONCE and everything after runs on the
    (days x 10)-bin dense grid.  Each PSI term is rounded to 6dp
    fixed point BEFORE the 10-term sum, making the sum order-free and
    the day's PSI an exact integer on both engines.
    """
    ev = load(spark, sf_dir, "events").select(
        F.col("ts").cast("date").alias("day"),
        F.round(F.col("value") * 1e6).cast("long").alias("v6"),
    )
    d0 = ev.agg(F.min("day").alias("d0"))
    base = ev.crossJoin(F.broadcast(d0)).where(
        F.datediff(F.col("day"), F.col("d0")) < _PSI_BASE_DAYS
    )
    rng = base.agg(
        F.min("v6").alias("vmin6"),
        F.max("v6").alias("vmax6"),
        F.count(F.lit(1)).cast("long").alias("bn"),
    )
    bin_expr = F.least(
        F.lit(_PSI_BINS - 1),
        F.greatest(
            F.lit(0),
            F.expr(
                f"(v6 - vmin6) * {_PSI_BINS} div (vmax6 - vmin6 + 1)"
            ),
        ),
    ).cast("long")
    bbin = (
        base.crossJoin(F.broadcast(rng))
        .groupBy(bin_expr.alias("bin"))
        .agg(F.count(F.lit(1)).cast("long").alias("bc"))
    )
    dbin = (
        ev.crossJoin(F.broadcast(rng))
        .groupBy("day", bin_expr.alias("bin"))
        .agg(F.count(F.lit(1)).cast("long").alias("dc"))
    )
    dtot = dbin.groupBy("day").agg(F.sum("dc").cast("long").alias("dn"))
    grid = (
        dtot.select(
            "day",
            "dn",
            F.explode(F.sequence(F.lit(0), F.lit(_PSI_BINS - 1))).alias("bin"),
        )
        .select("day", "dn", F.col("bin").cast("long").alias("bin"))
        .join(dbin, ["day", "bin"], "left")
        .join(F.broadcast(bbin), ["bin"], "left")
        .crossJoin(F.broadcast(rng.select("bn")))
        .select(
            "day",
            "dn",
            F.coalesce("dc", F.lit(0)).cast("long").alias("dc"),
            F.coalesce("bc", F.lit(0)).cast("long").alias("bc"),
            "bn",
        )
    )
    q = (F.col("dc") + 1).cast("double") / (F.col("dn") + _PSI_BINS).cast("double")
    p = (F.col("bc") + 1).cast("double") / (F.col("bn") + _PSI_BINS).cast("double")
    term_fp = F.round((q - p) * F.log(q / p) * 1e6).cast("long")
    return (
        grid.select("day", "dn", term_fp.alias("term_fp"))
        .groupBy("day", "dn")
        .agg(F.sum("term_fp").cast("long").alias("psi_fp6"))
        .select("day", F.col("dn").alias("n_events"), "psi_fp6")
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# STREAMING PSI drift drain: the monitor deployed as a stream.  The bin
# edges and baseline histogram are STATIC reference artifacts (computed
# once, batch-side, from the baseline window — exactly what a production
# scorer ships with its model); the stream maintains only (day, bin)
# counts in state, and the per-day PSI epilogue runs on the drained
# (days x 10)-sized final counts.  Oracle: the SAME batch PSI SQL —
# stream ≡ batch, verified by the driver's value hash.
# ---------------------------------------------------------------------------


@register(
    "streaming_psi_drift_drain",
    _PSI_ORACLE,
    tags=("streaming", "drift", "quality", "agg"),
)
def streaming_psi_drift_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Publish events → topic log → availableNow drain keyed (day, bin)
    → per-day PSI vs the static baseline histogram.

    Scale design: streaming state is (days x 10) count rows — bounded
    by the calendar, never by event volume; binning is int64 math on
    broadcast-literal edges inside the streaming aggregate, so each
    micro-batch does one map-side-combined count.  The callback
    receives state-sized updates only; the PSI epilogue (add-1 terms,
    6dp fixed point BEFORE the 10-term sum — identical arithmetic to
    the batch twin, in C-libm doubles) runs on the final counts.
    """
    import math
    import shutil
    import tempfile

    from pyspark.sql import types as T

    from event_streaming_spark.streaming.agency import EventsAgency

    ev = load(spark, sf_dir, "events")
    v6 = F.round(F.col("value") * 1e6).cast("long")
    # static reference artifacts: baseline bin edges + histogram
    d0 = ev.agg(F.min(F.col("ts").cast("date")).alias("d0")).collect()[0]["d0"]
    base = ev.where(
        F.datediff(F.col("ts").cast("date"), F.lit(d0)) < _PSI_BASE_DAYS
    ).select(v6.alias("v6"))
    vmin6, vmax6, bn = base.agg(
        F.min("v6"), F.max("v6"), F.count(F.lit(1)).cast("long")
    ).collect()[0]
    bin_sql = (
        f"least({_PSI_BINS - 1}, greatest(0, "
        f"(v6 - {vmin6}L) * {_PSI_BINS} div ({vmax6}L - {vmin6}L + 1)))"
    )
    bc = {
        r["bin"]: r["bc"]
        for r in base.groupBy(F.expr(bin_sql).alias("bin"))
        .agg(F.count(F.lit(1)).cast("long").alias("bc"))
        .collect()
    }

    root = tempfile.mkdtemp(prefix="est-psidrain-")
    batches: list = []
    try:
        agency = EventsAgency(spark, root=root, log_format="parquet")
        ctx = agency.topic("driver-gate", "events-psi")
        ctx.publish(ev)

        def binned(df: DataFrame) -> DataFrame:
            return (
                df.select("ts", v6.alias("v6"))
                .withWatermark("ts", "1 hour")
                .groupBy(F.window("ts", "1 day"), F.expr(bin_sql).alias("bin"))
                .agg(F.count(F.lit(1)).cast("long").alias("dc"))
            )

        def on_notify(c, batch_df: DataFrame, batch_id: int) -> None:
            pdf = batch_df.select(
                F.to_date(F.col("window.start")).alias("day"), "bin", "dc"
            ).toPandas()
            pdf["batch_id"] = batch_id
            batches.append(pdf)

        ctx.consume(
            on_notify,
            once=True,
            transform=binned,
            output_mode="update",
            state_partitions=8,
        )
        agency.close(remove_logs=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)

    schema = T.StructType(
        [
            T.StructField("day", T.DateType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("psi_fp6", T.LongType()),
        ]
    )
    if not batches:
        return local_frame(spark, [], schema)

    import pandas as pd

    all_updates = pd.concat(batches, ignore_index=True)
    last = (
        all_updates.sort_values("batch_id", kind="stable")
        .groupby(["day", "bin"], as_index=False)
        .last()
    )
    out_rows = []
    for day, grp in last.groupby("day"):
        dc = {int(r.bin): int(r.dc) for r in grp.itertuples()}
        dn = sum(dc.values())
        psi = 0
        for b in range(_PSI_BINS):
            q = (dc.get(b, 0) + 1) / (dn + _PSI_BINS)
            p = (bc.get(b, 0) + 1) / (bn + _PSI_BINS)
            term = (q - p) * math.log(q / p)
            psi += int(math.floor(term * 1e6 + 0.5))  # terms are >= 0
        out_rows.append((day, dn, psi))
    out_rows.sort(key=lambda r: r[0])
    return local_frame(spark, out_rows, schema)
