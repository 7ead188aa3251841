"""Relational core queries (SURVEY.md §2.4 surface) over the TPC-H-ish tables.

The reference implements no relational algebra (its "queries" are keyed
lookups / sorted scans — SURVEY §2.2); the driver's north star mandates the
standard surface anyway.  Everything here is built-in DataFrame API: Catalyst
gets predicate pushdown, column pruning, partial aggregation and join
selection for free.

Scale notes per query are inline: which side broadcasts, where the shuffle
is, why the plan survives 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from event_streaming_spark.functions.numeric import (
    exact_avg,
    exact_sum,
    sql_exact_avg,
    sql_exact_sum,
)
from event_streaming_spark.plans.catalog import load, register

# ---------------------------------------------------------------------------
# q1: TPC-H Q1 pricing summary — full-scan hash aggregate.
# Scale: partial agg map-side → 4-group shuffle is O(partitions), trivial at
# any SF; the parquet scan prunes to 7 of 11 columns (ReadSchema) and pushes
# the shipdate filter down to row-group min/max.
# ---------------------------------------------------------------------------

_Q1_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       {sql_exact_sum('l_quantity')} AS sum_qty,
       {sql_exact_sum('l_extendedprice')} AS sum_base_price,
       {sql_exact_sum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
       {sql_exact_sum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
       {sql_exact_avg('l_quantity')} AS avg_qty,
       {sql_exact_avg('l_extendedprice')} AS avg_price,
       {sql_exact_avg('l_discount')} AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register("q1_pricing_summary", _Q1_ORACLE, tags=("agg", "tpch"), bench=True)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            exact_sum("l_quantity").alias("sum_qty"),
            exact_sum("l_extendedprice").alias("sum_base_price"),
            exact_sum(disc_price).alias("sum_disc_price"),
            exact_sum(charge).alias("sum_charge"),
            exact_avg("l_quantity").alias("avg_qty"),
            exact_avg("l_extendedprice").alias("avg_price"),
            exact_avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# q3: shipping-priority style 3-way join + agg + top-N.
# Scale: customer filter prunes the build side; orders⋈lineitem is the big
# shuffle join on orderkey (co-partitioned by the groupBy that follows —
# one shuffle serves both); top-10 via sort-limit (TakeOrderedAndProject),
# never a full global sort.
# ---------------------------------------------------------------------------

_Q3_ORACLE = f"""
SELECT l_orderkey,
       {sql_exact_sum('l_extendedprice * (1 - l_discount)')} AS revenue,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       o_orderpriority AS orderpriority
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@register("q3_shipping_priority", _Q3_ORACLE, tags=("join", "agg", "topk", "tpch"), bench=True)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp")
    cust = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.col("o_orderpriority").alias("orderpriority"),
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# q5: local-supplier volume — 5-way join through two broadcast dims.
# Scale: region/nation/supplier are tiny at every SF → broadcast; only
# orders⋈lineitem shuffles.  Join order written big-to-small; AQE re-plans
# if stats disagree.
# ---------------------------------------------------------------------------

_Q5_ORACLE = f"""
SELECT n_name AS nation,
       {sql_exact_sum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey  = c_custkey
  JOIN supplier ON l_suppkey  = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
WHERE r_name IN ('ASIA', 'EUROPE')
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
GROUP BY n_name
"""


@register("q5_local_supplier_volume", _Q5_ORACLE, tags=("join", "agg", "tpch"), bench=True)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01 00:00:00").cast("timestamp"))
    )
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name").isin("ASIA", "EUROPE"))
    dim = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "n_name")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust.select("c_custkey"), orders.o_custkey == F.col("c_custkey"))
        .join(dim, li.l_suppkey == dim.s_suppkey)
        .groupBy("n_name")
        .agg(exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select(F.col("n_name").alias("nation"), "revenue")
    )


# ---------------------------------------------------------------------------
# q6: forecast revenue change — pure scan + filter + single scalar agg.
# Scale: no shuffle at all beyond the final 1-row reduce; every predicate
# pushes to parquet row-group stats.
# ---------------------------------------------------------------------------

_Q6_ORACLE = f"""
SELECT {sql_exact_sum('l_extendedprice * l_discount')} AS revenue,
       count(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@register("q6_forecast_revenue", _Q6_ORACLE, tags=("scan", "agg", "tpch"), bench=True)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            exact_sum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# ---------------------------------------------------------------------------
# top-k per group (window rank) — SURVEY §2.4 "ranking windows".
# Scale: single shuffle on the partition key; rank+filter prunes before the
# final projection, no global sort.
# ---------------------------------------------------------------------------

_TOPK_ORACLE = """
SELECT c_custkey, o_orderkey, o_totalprice, rn
FROM (
  SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
)
WHERE rn <= 3
"""


@register("window_topk_orders_per_customer", _TOPK_ORACLE, tags=("window", "topk"), bench=True)
def window_topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            F.col("o_custkey").alias("c_custkey"),
            "o_orderkey",
            "o_totalprice",
            "rn",
        )
    )


# ---------------------------------------------------------------------------
# lag/lead analytics — days between consecutive orders per customer.
# ---------------------------------------------------------------------------

_LAG_ORACLE = """
SELECT o_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       date_diff('day',
                 lag(o_orderdate) OVER (PARTITION BY o_custkey
                                        ORDER BY o_orderdate, o_orderkey),
                 o_orderdate) AS days_since_prev
FROM orders
"""


@register("window_lag_order_gap", _LAG_ORACLE, tags=("window",))
def window_lag_order_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_orderdate").over(w)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        F.datediff(F.to_date("o_orderdate"), F.to_date(prev)).alias("days_since_prev"),
    )


# ---------------------------------------------------------------------------
# running (cumulative) sum per key — frame-based window agg.
# Decimal accumulation keeps the running sum exact, so prefix sums are
# reproducible regardless of partitioning.
# ---------------------------------------------------------------------------

_RUNSUM_ORACLE = """
SELECT o_custkey, o_orderkey,
       round(cast(sum(cast(o_totalprice as decimal(30,6)))
                  OVER (PARTITION BY o_custkey
                        ORDER BY o_orderdate, o_orderkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             as double), 2) AS running_spend
FROM orders
"""


@register("window_running_total", _RUNSUM_ORACLE, tags=("window",))
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = F.sum(F.col("o_totalprice").cast("decimal(30,6)")).over(w)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(run.cast("double"), 2).alias("running_spend"),
    )


# ---------------------------------------------------------------------------
# rollup / grouping sets — SURVEY §2.4.
# ---------------------------------------------------------------------------

_ROLLUP_ORACLE = f"""
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       grouping(l_returnflag) + grouping(l_linestatus) AS lvl,
       {sql_exact_sum('l_quantity')} AS sum_qty,
       count(*) AS n_rows
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


@register("rollup_flag_status", _ROLLUP_ORACLE, tags=("agg", "rollup"))
def rollup_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            (F.grouping("l_returnflag") + F.grouping("l_linestatus")).alias("lvl"),
            exact_sum("l_quantity").alias("sum_qty"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "lvl",
            "sum_qty",
            "n_rows",
        )
    )


# ---------------------------------------------------------------------------
# join flavors: left / semi / anti (SURVEY O16 delete = anti-join,
# O17 point lookup = semi/broadcast probe).
# Scale: anti/semi on a broadcastable side never shuffles the big fact.
# ---------------------------------------------------------------------------

_ANTI_ORACLE = """
SELECT c_custkey, c_name
FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
"""


@register("join_anti_customers_without_orders", _ANTI_ORACLE, tags=("join",))
def join_anti_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").select("o_custkey").distinct()
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


_SEMI_ORACLE = """
SELECT p_partkey, p_name
FROM part
WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 49)
"""


@register("join_semi_parts_with_bulk_orders", _SEMI_ORACLE, tags=("join",))
def join_semi_parts_with_bulk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    bulk = load(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 49)
    return part.join(
        bulk, part.p_partkey == bulk.l_partkey, "left_semi"
    ).select("p_partkey", "p_name")


_LEFT_ORACLE = f"""
SELECT c_custkey, c_name,
       count(o_orderkey) AS n_orders,
       {sql_exact_sum('o_totalprice')} AS total_spend
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_name
"""


@register("join_left_customer_order_stats", _LEFT_ORACLE, tags=("join", "agg"))
def join_left_customer_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            exact_sum("o_totalprice").alias("total_spend"),
        )
    )


# ---------------------------------------------------------------------------
# set operations (SURVEY §2.4): union / intersect / except.
# ---------------------------------------------------------------------------

_SETOPS_ORACLE = """
WITH big_buyers AS (
  SELECT DISTINCT o_custkey AS k FROM orders WHERE o_totalprice > 50000
), building AS (
  SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
)
SELECT 'union' AS op, count(*) AS n FROM (SELECT k FROM big_buyers UNION SELECT k FROM building)
UNION ALL
SELECT 'intersect' AS op, count(*) AS n FROM (SELECT k FROM big_buyers INTERSECT SELECT k FROM building)
UNION ALL
SELECT 'except' AS op, count(*) AS n FROM (SELECT k FROM big_buyers EXCEPT SELECT k FROM building)
"""


@register("setops_customer_cohorts", _SETOPS_ORACLE, tags=("setops",))
def setops_customer_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    big = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 50000)
        .select(F.col("o_custkey").alias("k"))
        .distinct()
    )
    building = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("k"))
    )
    def one(op: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n")).select(F.lit(op).alias("op"), "n")

    return (
        one("union", big.union(building).distinct())
        .unionAll(one("intersect", big.intersect(building)))
        .unionAll(one("except", big.exceptAll(building.intersect(big))))
    )


# ---------------------------------------------------------------------------
# distinct aggregates + exact percentile (SURVEY §2.4 approx row gets the
# exact variant here so the oracle can match bit-for-bit; the approximate
# sketch variant lives in a rows-only query).
# ---------------------------------------------------------------------------

_DISTINCT_ORACLE = """
SELECT l_returnflag,
       count(DISTINCT l_suppkey) AS n_suppliers,
       count(DISTINCT l_partkey) AS n_parts,
       round(quantile_cont(l_quantity, 0.5), 6) AS median_qty
FROM lineitem
GROUP BY l_returnflag
"""


@register("agg_distinct_and_percentile", _DISTINCT_ORACLE, tags=("agg",))
def agg_distinct_and_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.round(F.expr("percentile(l_quantity, 0.5)"), 6).alias("median_qty"),
    )


# approx sketch variant.  r1-r8 this used Spark's engine-native
# approx_count_distinct (HLL++ with engine-internal hashing — not
# replicable in any other engine, hence rows-only).  r9 (VERDICT r8 #3):
# rebuilt on the repo's md5-derived cross-engine HLL
# (operators/sketches.py), whose registers are bit-identical in Spark and
# DuckDB, so the approximate answer itself is now full value-hash-gated.
# The exact count rides along to exhibit the approximation error, exactly
# as sketch_hll_distinct_cross_engine does.  Same plan shape at scale:
# one (grp, bucket) map-side-combined shuffle, ≤ m registers per group.


def _approx_sketch_oracle() -> str:
    from event_streaming_spark.operators.sketches import sql_hll_estimate_by

    est = sql_hll_estimate_by("l_returnflag", "l_partkey", "lineitem")
    return f"""
WITH est AS ({est}),
cnt AS (
  SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts,
         count(*) AS n_rows
  FROM lineitem GROUP BY l_returnflag
)
SELECT c.l_returnflag, e.hll_estimate AS approx_parts, c.exact_parts, c.n_rows
FROM cnt c JOIN est e ON e.grp = c.l_returnflag
ORDER BY l_returnflag
"""


@register(
    "agg_approx_distinct_sketch",
    _approx_sketch_oracle(),
    tags=("agg", "approx", "sketch"),
)
def agg_approx_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from event_streaming_spark.operators.sketches import hll_estimate_by

    li = load(spark, sf_dir, "lineitem")
    est = hll_estimate_by(li, F.col("l_returnflag"), F.col("l_partkey"))
    cnt = li.groupBy(F.col("l_returnflag").alias("grp")).agg(
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    return (
        cnt.join(est, "grp")
        .select(
            F.col("grp").alias("l_returnflag"),
            F.col("hll_estimate").alias("approx_parts"),
            "exact_parts",
            "n_rows",
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# sorted emit with NULLS FIRST (SURVEY O18/O30 — do NOT replicate the
# reference's comparator NULL-asymmetry bug, src/events-agency.c:133).
# ---------------------------------------------------------------------------

_SORT_ORACLE = """
SELECT o_orderkey, o_orderstatus, o_orderpriority
FROM orders
ORDER BY o_orderstatus ASC NULLS FIRST, o_orderkey
LIMIT 100
"""


@register("sort_nulls_first_limit", _SORT_ORACLE, tags=("sort",))
def sort_nulls_first_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.asc_nulls_first("o_orderstatus"), F.asc("o_orderkey"))
        .select("o_orderkey", "o_orderstatus", "o_orderpriority")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# top-k per key, AGGREGATION formulation: collect per-key (price, id) pairs
# map-side, keep only the top-3 via slice(reverse(array_sort(...))) — no
# per-key row_number sort pass.  Same semantics as the window variant
# (same oracle); different physical plan: partial aggregation bounds the
# shuffled state to k entries per key per mapper, where the window variant
# shuffles EVERY row then sorts.  At 100 TB with bounded k this is the
# cheaper plan; the window variant wins when k is large or unbounded.
# ---------------------------------------------------------------------------


@register("window_topk_agg_variant", _TOPK_ORACLE, tags=("agg", "topk"))
def window_topk_agg_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    # sort key: (-price, orderkey) ascending == (price desc, orderkey asc)
    pairs = F.collect_list(F.struct((-F.col("o_totalprice")).alias("np"), F.col("o_orderkey").alias("k"), F.col("o_totalprice").alias("p")))
    top3 = F.slice(F.array_sort(pairs), 1, 3)
    agged = orders.groupBy(F.col("o_custkey").alias("c_custkey")).agg(top3.alias("top"))
    ex = agged.select("c_custkey", F.posexplode("top").alias("i", "s"))
    return ex.select(
        "c_custkey",
        F.col("s.k").alias("o_orderkey"),
        F.col("s.p").alias("o_totalprice"),
        (F.col("i") + 1).alias("rn"),
    )
