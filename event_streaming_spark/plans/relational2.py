"""Second relational tranche: interval/range join, cube grouping sets,
embedding near-dup blocking — remaining SURVEY §2.4/§2.5 rows.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_streaming_spark.functions.numeric import cosine, exact_sum, sql_exact_sum
from event_streaming_spark.operators.joins import triangle_self_pair_join
from event_streaming_spark.functions.localframe import local_frame
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
    promos = local_frame(spark, 
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
# Scale: triangle-bucketed self-join shuffles on (label, bucket-cell) so
# a block's quadratic pair space is parallel work, not one straggler task;
# blocking key + bucket count are the scale knobs.  Cross-block recall
# comes from the LSH-ANN path (emb_lsh_ann_topk).
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
    # Triangle-bucketed self-join: a plain label-blocked self-join shuffles
    # on label alone (10 distinct values), so each label's quadratic pair
    # space is ONE task — measured >10 min on one core at a 10× corpus.
    # With B=8 buckets each label splits into 36 independent cells.
    emb = load(spark, sf_dir, "embeddings")
    pairs = triangle_self_pair_join(
        emb, id_col="vec_id", block_cols=["label"], n_buckets=8
    )
    return (
        pairs.select(
            F.least(F.col("a.vec_id"), F.col("b.vec_id")).alias("vec_a"),
            F.greatest(F.col("a.vec_id"), F.col("b.vec_id")).alias("vec_b"),
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


# ---------------------------------------------------------------------------
# q10-style: top returned-revenue customers (join + filtered agg + top-N).
# Scale: returnflag filter pushes to the lineitem scan; customer side
# broadcasts; TakeOrderedAndProject for the top-20.
# ---------------------------------------------------------------------------

_Q10_ORACLE = f"""
SELECT c_custkey, c_name,
       {sql_exact_sum('l_extendedprice * (1 - l_discount)')} AS revenue,
       n_name AS nation
FROM customer
  JOIN nation   ON c_nationkey = n_nationkey
  JOIN orders   ON o_custkey = c_custkey
  JOIN lineitem ON l_orderkey = o_orderkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@register("q10_returned_item_customers", _Q10_ORACLE, tags=("join", "agg", "topk", "tpch"), bench=True)
def q10_returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    cdim = cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey).select(
        "c_custkey", "c_name", "n_name"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cdim, orders.o_custkey == cdim.c_custkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", F.col("n_name").alias("nation"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q12-style: order-priority buckets by ship-mode-ish predicate (conditional
# counting over a join — map-side agg after one shuffle).
# ---------------------------------------------------------------------------

_Q12_ORACLE = """
SELECT CAST(extract(year FROM l_shipdate) AS INT) AS ship_year,
       count(*) FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')) AS high_line_count,
       count(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1999-01-01 00:00:00'
GROUP BY 1
"""


@register("q12_priority_by_ship_year", _Q12_ORACLE, tags=("join", "agg", "tpch"))
def q12_priority_by_ship_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01 00:00:00").cast("timestamp"))
    )
    orders = load(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.year("l_shipdate").cast("int").alias("ship_year"))
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# q14-style: promo revenue share — ratio of conditional exact sums.
# ---------------------------------------------------------------------------

_Q14_ORACLE = f"""
SELECT round(
         100.0 * ({sql_exact_sum("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END", 6)})
               / ({sql_exact_sum('l_extendedprice * (1 - l_discount)', 6)}), 4) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-07-01 00:00:00'
"""


@register("q14_promo_revenue_share", _Q14_ORACLE, tags=("join", "agg", "tpch"))
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    )
    part = load(spark, sf_dir, "part")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc).otherwise(F.lit(0.0))
    return (
        li.join(part.select("p_partkey", "p_type"), li.l_partkey == F.col("p_partkey"))
        .agg(
            F.round(100.0 * exact_sum(promo, 6) / exact_sum(disc, 6), 4).alias(
                "promo_revenue_pct"
            )
        )
    )


# ---------------------------------------------------------------------------
# Skew-safe two-stage (salted) aggregation under the correctness gate:
# identical results to a plain groupBy, by construction (exact integer
# partials compose associatively).  Oracle = the plain aggregation.
# ---------------------------------------------------------------------------

_SALTED_ORACLE = f"""
SELECT event_type,
       count(*) AS n_events,
       {sql_exact_sum('value')} AS total_value
FROM events
GROUP BY event_type
"""


@register("skew_salted_type_rollup", _SALTED_ORACLE, tags=("events", "agg", "skew"))
def skew_salted_type_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from event_streaming_spark.operators.skew import salted_agg

    ev = load(spark, sf_dir, "events")
    out = salted_agg(
        ev,
        ["event_type"],
        {
            "n_events": (F.count(F.lit(1)), F.sum("n_events")),
            "__scaled": (
                F.sum(F.round(F.col("value") * 1e6).cast("long")),
                F.sum("__scaled"),
            ),
        },
        n_salts=8,
    )
    return out.select(
        "event_type",
        "n_events",
        F.round(F.col("__scaled") / 1e6, 2).alias("total_value"),
    )


# ---------------------------------------------------------------------------
# q4-style: priority counts for orders with at least one late-shipped line
# (EXISTS decorrelated to a semi-join on orderkey).
# ---------------------------------------------------------------------------

_Q4_ORACLE = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
"""


@register("q4_order_priority_late_ship", _Q4_ORACLE, tags=("join", "agg", "tpch"))
def q4_order_priority_late_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (li.l_orderkey == orders.o_orderkey)
        & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


# ---------------------------------------------------------------------------
# q7-style: shipping volume between two nations by year — the classic
# "two role-played dimension joins" shape (customer nation ≠ supplier
# nation), both dims broadcast.
# ---------------------------------------------------------------------------

_Q7_ORACLE = f"""
SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
       CAST(extract(year FROM l_shipdate) AS INT) AS ship_year,
       {sql_exact_sum('l_extendedprice * (1 - l_discount)')} AS volume
FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
WHERE cn.n_name IN ('NATION_1', 'NATION_2') AND sn.n_name IN ('NATION_1', 'NATION_2')
  AND cn.n_name <> sn.n_name
GROUP BY cn.n_name, sn.n_name, ship_year
"""


@register("q7_nation_pair_volume", _Q7_ORACLE, tags=("join", "agg", "tpch"))
def q7_nation_pair_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    pair = ["NATION_1", "NATION_2"]
    cdim = cust.join(
        F.broadcast(nation.filter(F.col("n_name").isin(pair))),
        cust.c_nationkey == nation.n_nationkey,
    ).select("c_custkey", F.col("n_name").alias("cust_nation"))
    sdim = supp.join(
        F.broadcast(nation.filter(F.col("n_name").isin(pair))),
        supp.s_nationkey == nation.n_nationkey,
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cdim, orders.o_custkey == cdim.c_custkey)
        .join(sdim, li.l_suppkey == sdim.s_suppkey)
        .filter(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy("cust_nation", "supp_nation", F.year("l_shipdate").cast("int").alias("ship_year"))
        .agg(exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"))
    )


# ---------------------------------------------------------------------------
# q18-style: large-volume customers — aggregate HAVING filter, then join
# back to customers.  The HAVING side is tiny after the filter → broadcast.
# ---------------------------------------------------------------------------

_Q18_ORACLE = f"""
SELECT c_custkey, c_name, o_orderkey,
       {sql_exact_sum('l_quantity')} AS total_qty
FROM customer
  JOIN orders   ON c_custkey = o_custkey
  JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY c_custkey, c_name, o_orderkey
HAVING sum(l_quantity) > 120
"""


@register("q18_large_volume_orders", _Q18_ORACLE, tags=("join", "agg", "tpch"))
def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name", "o_orderkey")
        .agg(
            exact_sum("l_quantity").alias("total_qty"),
            F.sum("l_quantity").alias("__raw_qty"),
        )
        .filter(F.col("__raw_qty") > 120)
        .drop("__raw_qty")
    )


# ---------------------------------------------------------------------------
# q19-style: disjunction of bracketed conjunctive predicates across a join
# — exercises CNF handling / partial pushdown of OR-trees.
# ---------------------------------------------------------------------------

_Q19_ORACLE = f"""
SELECT {sql_exact_sum('l_extendedprice * (1 - l_discount)')} AS revenue,
       count(*) AS n_lines
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 20 AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#17' AND p_size BETWEEN 10 AND 40 AND l_quantity BETWEEN 10 AND 40)
   OR (p_type = 'PROMO' AND l_quantity >= 45)
"""


@register("q19_disjunctive_predicates", _Q19_ORACLE, tags=("join", "scan", "tpch"))
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    j = li.join(part, li.l_partkey == part.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 20) & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#17") & F.col("p_size").between(10, 40) & F.col("l_quantity").between(10, 40))
        | ((F.col("p_type") == "PROMO") & (F.col("l_quantity") >= 45))
    )
    return j.filter(cond).agg(
        exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


# ---------------------------------------------------------------------------
# q22-style: scalar subquery (global average) as a filter + anti-join —
# customers with above-average balance and no orders.
# ---------------------------------------------------------------------------

_Q22_ORACLE = f"""
SELECT c_mktsegment,
       count(*) AS n_customers,
       {sql_exact_sum('c_acctbal')} AS total_bal
FROM customer
WHERE c_acctbal > (SELECT round(cast(sum(cast(round(c_acctbal * 1e6) as bigint)) as double)
                                / 1e6 / count(*), 6)
                   FROM customer WHERE c_acctbal > 0)
  AND (SELECT count(*) FROM orders WHERE o_custkey = c_custkey) < 6
GROUP BY c_mktsegment
"""


@register("q22_above_avg_inactive_customers", _Q22_ORACLE, tags=("join", "agg", "subquery", "tpch"))
def q22_above_avg_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    # scalar subquery: deterministic global average via exact scaled sum
    avg_row = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg(
            F.round(
                F.sum(F.round(F.col("c_acctbal") * 1e6).cast("long")) / 1e6 / F.count(F.lit(1)),
                6,
            ).alias("avg_bal")
        )
        .collect()[0]
    )
    threshold = float(avg_row["avg_bal"])  # tiny scalar → literal (never data-sized)
    # NOTE: per_cust is keyed on o_custkey — it grows with |customers|, so it
    # must NOT be broadcast (OOMs the build side at scale). Shuffle join on
    # the key and let AQE pick the physical strategy.
    per_cust = orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_orders"))
    return (
        cust.filter(F.col("c_acctbal") > threshold)
        .join(per_cust, cust.c_custkey == F.col("o_custkey"), "left")
        .filter(F.coalesce(F.col("n_orders"), F.lit(0)) < 6)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            exact_sum("c_acctbal").alias("total_bal"),
        )
    )


# ---------------------------------------------------------------------------
# q2-style: correlated min subquery — cheapest supplier per part, phrased
# Spark-first as a min-aggregate join back (the decorrelated plan Catalyst
# would produce anyway).
# ---------------------------------------------------------------------------

_Q2_ORACLE = """
SELECT p.p_partkey, p.p_name, s.s_suppkey, s.s_acctbal
FROM part p
  JOIN lineitem l ON l.l_partkey = p.p_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
WHERE s.s_acctbal = (SELECT min(s2.s_acctbal)
                     FROM lineitem l2 JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey
                     WHERE l2.l_partkey = p.p_partkey)
GROUP BY p.p_partkey, p.p_name, s.s_suppkey, s.s_acctbal
"""


@register("q2_min_cost_supplier_per_part", _Q2_ORACLE, tags=("join", "subquery", "tpch"))
def q2_min_cost_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = load(spark, sf_dir, "part").select("p_partkey", "p_name")
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_acctbal")
    ps = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .select("l_partkey", "s_suppkey", "s_acctbal")
        .distinct()
    )
    mins = ps.groupBy("l_partkey").agg(F.min("s_acctbal").alias("min_bal"))
    a, m = ps.alias("a"), mins.alias("m")
    return (
        a.join(
            m,
            (F.col("a.l_partkey") == F.col("m.l_partkey"))
            & (F.col("a.s_acctbal") == F.col("m.min_bal")),
        )
        .join(part, F.col("a.l_partkey") == part.p_partkey)
        .select("p_partkey", "p_name", F.col("a.s_suppkey").alias("s_suppkey"),
                F.col("a.s_acctbal").alias("s_acctbal"))
        .distinct()
    )
