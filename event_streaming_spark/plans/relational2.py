"""Second relational tranche: interval/range join, cube grouping sets,
embedding near-dup blocking — remaining SURVEY §2.4/§2.5 rows.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_streaming_spark.functions.numeric import cosine, exact_sum, sql_exact_sum
from event_streaming_spark.plans.catalog import load, register

# ---------------------------------------------------------------------------
# Interval (range) join — SURVEY §2.4 "theta & range joins" / "as-of /
# interval join (events ↔ dimension validity)".  Orders are joined to
# OVERLAPPING promotion windows on o_orderdate ∈ [start, end) — not
# rewritable as an equi bucket join because windows overlap arbitrarily.
# Scale: the interval dimension is tiny (every realistic validity table
# is) → broadcast nested-loop with the range predicate; the fact side
# streams through one scan, no shuffle.  For two BIG range sides, the
# plan is bucket-by-coarse-granule + equi-join + residual filter
# (operators/joins.py shows the pattern).
# ---------------------------------------------------------------------------

_PROMOS = [
    # (promo_id, start, end): 120-day stride, 60..150-day lengths → overlaps
    (i, dt.date(1995, 1, 1) + dt.timedelta(days=120 * i),
     dt.date(1995, 1, 1) + dt.timedelta(days=120 * i + 60 + (i * 13) % 90))
    for i in range(20)
]

_PROMO_VALUES = ", ".join(f"({i}, DATE '{s}', DATE '{e}')" for i, s, e in _PROMOS)

_RANGE_ORACLE = f"""
WITH promos(promo_id, p_start, p_end) AS (VALUES {_PROMO_VALUES})
SELECT promo_id,
       count(*) AS n_orders,
       {sql_exact_sum('o_totalprice')} AS promo_revenue
FROM orders JOIN promos
  ON o_orderdate >= p_start AND o_orderdate < p_end
GROUP BY promo_id
"""


@register("range_join_orders_in_promo_windows", _RANGE_ORACLE, tags=("join", "range"))
def range_join_orders_in_promo_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    promos = spark.createDataFrame(
        [(i, s, e) for i, s, e in _PROMOS], "promo_id INT, p_start DATE, p_end DATE"
    )
    od = F.to_date("o_orderdate")
    return (
        orders.join(
            F.broadcast(promos), (od >= F.col("p_start")) & (od < F.col("p_end"))
        )
        .groupBy("promo_id")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            exact_sum("o_totalprice").alias("promo_revenue"),
        )
    )


# ---------------------------------------------------------------------------
# CUBE grouping sets with grouping_id (completes rollup from tranche 1).
# ---------------------------------------------------------------------------

_CUBE_ORACLE = f"""
SELECT coalesce(o_orderstatus, 'ALL') AS orderstatus,
       coalesce(o_orderpriority, 'ALL') AS orderpriority,
       grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS gid,
       count(*) AS n_orders,
       {sql_exact_sum('o_totalprice')} AS total_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


@register("cube_status_priority", _CUBE_ORACLE, tags=("agg", "rollup"))
def cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            exact_sum("o_totalprice").alias("total_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("orderpriority"),
            "gid",
            "n_orders",
            "total_price",
        )
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup pairs (SURVEY §2.5 "embedding-cosine near-dup"):
# blocking key = label (the IVF-cell analogue), exact cosine within block.
# Scale: the self-join shuffles on label only; within-block pair count is
# (n/cells)² per cell — the blocking key IS the scale knob.  Cross-block
# recall comes from the LSH-ANN path (emb_lsh_ann_topk).
# ---------------------------------------------------------------------------

_EMB_NEARDUP_ORACLE = """
SELECT vec_a, vec_b, label, cos_sim FROM (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label AS label,
         round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
               (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
                sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 6) AS cos_sim
  FROM embeddings a JOIN embeddings b
    ON a.label = b.label AND a.vec_id < b.vec_id
) WHERE cos_sim >= 0.29
"""


@register("emb_cosine_near_dup_pairs", _EMB_NEARDUP_ORACLE, tags=("llm", "ann", "dedup"))
def emb_cosine_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    a, b = emb.alias("a"), emb.alias("b")
    return (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label")) & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.col("a.label").alias("label"),
            F.round(cosine(F.col("a.embedding"), F.col("b.embedding")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= 0.29)
    )


# ---------------------------------------------------------------------------
# Full outer join (completes the join-flavor matrix: inner/left/semi/anti
# are in tranche 1).  Customers vs event-active users: either side may be
# missing.
# ---------------------------------------------------------------------------

_FULL_ORACLE = """
SELECT coalesce(c.c_custkey, e.user_id) AS entity_id,
       c.c_name AS c_name,
       e.n_events AS n_events
FROM customer c
FULL OUTER JOIN (
  SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id
) e ON c.c_custkey = e.user_id
WHERE coalesce(c.c_custkey, e.user_id) < 300
"""


@register("join_full_outer_customers_events", _FULL_ORACLE, tags=("join",))
def join_full_outer_customers_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    ev = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    return (
        cust.join(ev, cust.c_custkey == ev.user_id, "full_outer")
        .select(
            F.coalesce(cust.c_custkey, ev.user_id).alias("entity_id"),
            F.col("c_name"),
            F.col("n_events"),
        )
        .filter(F.coalesce(cust.c_custkey, ev.user_id) < 300)
    )


# ---------------------------------------------------------------------------
# Correlated EXISTS / NOT EXISTS subqueries (decorrelated by Catalyst into
# semi/anti joins — written as SQL to exercise the SQL surface).
# ---------------------------------------------------------------------------

_EXISTS_ORACLE = """
SELECT c_custkey, c_mktsegment
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
                    AND o.o_orderpriority = '1-URGENT')
"""


@register("subquery_exists_not_exists", _EXISTS_ORACLE, tags=("join", "subquery"))
def subquery_exists_not_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_EXISTS_ORACLE.replace("NOT EXISTS", "NOT EXISTS"))
