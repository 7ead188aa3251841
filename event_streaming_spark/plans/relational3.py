"""Third relational tranche: the remaining TPC-H-shaped queries (q8, q9,
q11, q13, q15, q16, q17, q20, q21 analogues) — completing the full
22-query sweep together with tranches 1/2.

The driver testdata has no ``partsupp`` table and no
``l_commitdate``/``l_receiptdate`` columns, so the queries that need a
part↔supplier bridge (q9/q11/q16/q20) derive it from ``lineitem`` (the
precedent set by ``q2_min_cost_supplier_per_part``), and q21's "late"
predicate is re-based on ``l_shipdate > o_orderdate + 90 days``.

Scale notes are inline per query; the common discipline: dimensions
(part/supplier/nation/region and anything post-HAVING-tiny) broadcast,
the single big fact shuffle is on the join key Catalyst needs anyway,
and every money aggregate uses exact fixed-point accumulation
(functions/numeric.py) so results are bit-identical across engines,
partitionings, and reruns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_streaming_spark.functions.numeric import exact_sum, sql_exact_sum
from event_streaming_spark.plans.catalog import load, register

_DISC = "l_extendedprice * (1 - l_discount)"


def _disc() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# ---------------------------------------------------------------------------
# q8-style: national market share — the share of ASIA-region ECONOMY-part
# revenue supplied by NATION_1, per order year.  Ratio of two conditional
# exact sums inside one aggregation (single shuffle on o_orderkey; all
# four dimensions broadcast).
# ---------------------------------------------------------------------------

_Q8_ORACLE = f"""
SELECT CAST(extract(year FROM o_orderdate) AS INT) AS o_year,
       round({sql_exact_sum(f"CASE WHEN sn.n_name = 'NATION_1' THEN {_DISC} ELSE 0 END", 6)}
             / {sql_exact_sum(_DISC, 6)}, 6) AS mkt_share
FROM lineitem
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation cn ON cn.n_nationkey = c_nationkey
  JOIN region   ON r_regionkey = cn.n_regionkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation sn ON sn.n_nationkey = s_nationkey
  JOIN part     ON p_partkey = l_partkey
WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
  AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY o_year
"""


@register("q8_national_market_share", _Q8_ORACLE, tags=("join", "agg", "tpch"), bench=True)
def q8_national_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cdim = (
        load(spark, sf_dir, "customer")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    sdim = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    part = load(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    nat = F.when(F.col("supp_nation") == "NATION_1", _disc()).otherwise(F.lit(0.0))
    return (
        li.join(
            orders.select("o_orderkey", "o_custkey", "o_orderdate"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .join(cdim, orders.o_custkey == cdim.c_custkey)
        .join(sdim, li.l_suppkey == sdim.s_suppkey)
        .join(part, li.l_partkey == part.p_partkey)
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(F.round(exact_sum(nat, 6) / exact_sum(_disc(), 6), 6).alias("mkt_share"))
    )


# ---------------------------------------------------------------------------
# q9-style: product-type profit by supplier nation and year.  No
# ps_supplycost exists → cost is modeled as 10% of p_retailprice per unit.
# One fact shuffle (lineitem⋈orders on orderkey); part/supplier/nation
# broadcast.
# ---------------------------------------------------------------------------

_Q9_PROFIT = f"{_DISC} - 0.1 * p_retailprice * l_quantity"

_Q9_ORACLE = f"""
SELECT sn.n_name AS nation,
       CAST(extract(year FROM o_orderdate) AS INT) AS o_year,
       {sql_exact_sum(_Q9_PROFIT)} AS profit
FROM lineitem
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN part     ON p_partkey = l_partkey
  JOIN nation sn ON sn.n_nationkey = s_nationkey
WHERE p_name LIKE '%gear%'
GROUP BY nation, o_year
"""


@register("q9_product_type_profit", _Q9_ORACLE, tags=("join", "agg", "tpch"), bench=True)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    part = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%gear%"))
        .select("p_partkey", "p_retailprice")
    )
    sdim = (
        load(spark, sf_dir, "supplier")
        .join(
            F.broadcast(load(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    profit = _disc() - 0.1 * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == F.col("o_orderkey"))
        .join(sdim, li.l_suppkey == sdim.s_suppkey)
        .groupBy("nation", F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(exact_sum(profit).alias("profit"))
    )


# ---------------------------------------------------------------------------
# q11-style: important stock — parts whose AMERICA-region supply value
# exceeds 0.1% of the total.  The partsupp value is derived from lineitem
# discounted revenue.  The global-total scalar is computed from the SAME
# per-part exact longs the HAVING compares against, so the threshold is
# bit-identical across engines (integer partials compose exactly).
# Scale: one shuffle on l_partkey; the scalar total is a second pass over
# the (small, post-agg) per-part result, never over the fact.
# ---------------------------------------------------------------------------

_Q11_ORACLE = """
WITH base AS (
  SELECT l_partkey,
         sum(cast(round((l_extendedprice * (1 - l_discount)) * 1e6) as bigint)) AS v
  FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    JOIN region   ON r_regionkey = n_regionkey
  WHERE r_name = 'AMERICA'
  GROUP BY l_partkey
)
SELECT l_partkey AS partkey,
       round(cast(v as double) / 1e6, 2) AS part_value
FROM base
WHERE cast(v as double) > (SELECT cast(sum(v) as double) FROM base) * 0.001
"""


@register("q11_important_stock_value", _Q11_ORACLE, tags=("join", "agg", "subquery", "tpch"))
def q11_important_stock_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    sdim = (
        load(spark, sf_dir, "supplier")
        .join(
            F.broadcast(load(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(load(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey")
    )
    base = (
        li.join(sdim, li.l_suppkey == sdim.s_suppkey)
        .groupBy("l_partkey")
        .agg(F.sum(F.round(_disc() * 1e6).cast("long")).alias("v"))
    )
    total = base.agg(F.sum("v").cast("double").alias("t"))  # tiny: one row
    return (
        base.join(F.broadcast(total))
        .filter(F.col("v").cast("double") > F.col("t") * 0.001)
        .select(
            F.col("l_partkey").alias("partkey"),
            F.round(F.col("v").cast("double") / 1e6, 2).alias("part_value"),
        )
    )


# ---------------------------------------------------------------------------
# q13-style: customer order-count distribution — LEFT join with an extra
# join-side predicate (kept in the ON clause, NOT the WHERE, so zero-order
# customers survive), then a two-level aggregation.  All-integer → no
# float determinism concerns.
# ---------------------------------------------------------------------------

_Q13_ORACLE = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
"""


@register("q13_customer_order_distribution", _Q13_ORACLE, tags=("join", "agg", "tpch"))
def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    orders = load(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderpriority")
    per_cust = (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# ---------------------------------------------------------------------------
# q15-style: top supplier(s) by Q1-1996 revenue — the revenue CTE is
# computed once; its max is a one-row scalar; exact sums make the
# equality comparison safe (no float ties lost).
# ---------------------------------------------------------------------------

_Q15_REV = f"""
  SELECT l_suppkey AS supplier_no,
         {sql_exact_sum(_DISC)} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
"""

_Q15_ORACLE = f"""
WITH revenue AS ({_Q15_REV})
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
"""


@register("q15_top_supplier", _Q15_ORACLE, tags=("join", "agg", "subquery", "tpch"))
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        exact_sum(_disc()).alias("total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("m")).collect()[0]["m"]
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.filter(F.col("total_revenue") == F.lit(max_rev))
        .join(supp, F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# ---------------------------------------------------------------------------
# q16-style: supplier count per (brand, type, size) — NOT-IN rewritten as
# an anti-join against negative-balance suppliers (keys are non-null so
# the NULL-semantics trap doesn't bite), then COUNT(DISTINCT).  Scale:
# the distinct agg is a two-phase shuffle on the group key; the exclusion
# set broadcasts.
# ---------------------------------------------------------------------------

_Q16_ORACLE = """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM part JOIN lineitem ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#2' AND p_type <> 'PROMO'
  AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


@register("q16_supplier_part_counts", _Q16_ORACLE, tags=("join", "agg", "tpch"))
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#2")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    )
    bad_supp = load(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(bad_supp, li.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .join(part, F.col("l_partkey") == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# q17-style: small-quantity-order revenue — the correlated per-part AVG
# subquery decorrelated into a grouped aggregate joined back (exactly the
# plan Catalyst produces for the SQL form).  The 0.2·avg threshold is
# derived from exact scaled-long sums so both engines compute the same
# double.  Scale: per-part stats computed only for the (tiny, broadcast)
# filtered part set.
# ---------------------------------------------------------------------------

_Q17_ORACLE = f"""
SELECT round(cast(sum(cast(round(l_extendedprice * 1e6) as bigint)) as double)
             / 1e6 / 7.0, 2) AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#3' AND p_size < 10
  AND l_quantity < (
    SELECT 0.2 * (cast(sum(cast(round(l2.l_quantity * 1e6) as bigint)) as double)
                  / 1e6 / count(*))
    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
"""


@register("q17_small_quantity_revenue", _Q17_ORACLE, tags=("join", "agg", "subquery", "tpch"))
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = (
        load(spark, sf_dir, "part")
        .filter((F.col("p_brand") == "Brand#3") & (F.col("p_size") < 10))
        .select("p_partkey")
    )
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity", "l_extendedprice")
    # restrict to relevant parts first: per-part stats over a tiny slice
    rel = li.join(part, li.l_partkey == part.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    thresholds = rel.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (
            0.2
            * (
                F.sum(F.round(F.col("l_quantity") * 1e6).cast("long")) / 1e6
                / F.count(F.lit(1))
            )
        ).alias("qty_threshold")
    )
    return (
        rel.join(thresholds, rel.l_partkey == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            F.round(
                F.sum(F.round(F.col("l_extendedprice") * 1e6).cast("long")) / 1e6 / 7.0, 2
            ).alias("avg_yearly")
        )
    )


# ---------------------------------------------------------------------------
# q20-style: suppliers in EUROPE with significant 1996 shipments of red
# parts — the IN-subquery becomes a semi-join from a HAVING-filtered
# aggregate.  The HAVING compares exact scaled longs to an integer
# literal (40 units → 40_000_000 micro-units): no float boundary risk.
# ---------------------------------------------------------------------------

_Q20_ORACLE = """
SELECT s_suppkey, s_name
FROM supplier
  JOIN nation ON n_nationkey = s_nationkey
  JOIN region ON r_regionkey = n_regionkey
WHERE r_name = 'EUROPE' AND s_suppkey IN (
  SELECT l_suppkey
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE 'red%'
    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  GROUP BY l_suppkey, l_partkey
  HAVING sum(cast(round(l_quantity * 1e6) as bigint)) > 40000000)
"""


@register("q20_promotion_part_suppliers", _Q20_ORACLE, tags=("join", "agg", "subquery", "tpch"))
def q20_promotion_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part").filter(F.col("p_name").like("red%")).select("p_partkey")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    qualifying = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.round(F.col("l_quantity") * 1e6).cast("long")).alias("qty_scaled"))
        .filter(F.col("qty_scaled") > 40_000_000)
        .select("l_suppkey")
        .distinct()
    )
    supp = (
        load(spark, sf_dir, "supplier")
        .join(
            F.broadcast(load(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name")
    )
    return supp.join(qualifying, supp.s_suppkey == F.col("l_suppkey"), "left_semi")


# ---------------------------------------------------------------------------
# q21-style: suppliers who kept orders waiting.  Without
# l_receiptdate/l_commitdate, "late" = shipped >90 days after the order
# date.  The double-EXISTS shape (another supplier participated / no other
# supplier was late) is computed with one per-order distinct-count
# aggregate instead of two correlated scans — one pass over the fact, the
# per-order summary re-joined (both sides already partitioned on
# l_orderkey, so the second join reuses the shuffle).
# ---------------------------------------------------------------------------

_Q21_ORACLE = """
WITH j AS (
  SELECT l_orderkey, l_suppkey,
         (l_shipdate > o_orderdate + INTERVAL 90 DAY) AS late
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  WHERE o_orderstatus = 'F'
),
po AS (
  SELECT l_orderkey,
         count(DISTINCT l_suppkey) AS n_supp,
         count(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late
  FROM j GROUP BY l_orderkey
),
guilty AS (
  SELECT DISTINCT j.l_orderkey, j.l_suppkey
  FROM j JOIN po ON j.l_orderkey = po.l_orderkey
  WHERE j.late AND po.n_supp > 1 AND po.n_late = 1
)
SELECT s_name, count(*) AS numwait
FROM guilty
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation   ON n_nationkey = s_nationkey
  JOIN region   ON r_regionkey = n_regionkey
WHERE r_name = 'ASIA'
GROUP BY s_name
"""


@register("q21_suppliers_kept_waiting", _Q21_ORACLE, tags=("join", "agg", "subquery", "tpch"), bench=True)
def q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    orders = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    j = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")).alias("late"),
    )
    po = j.groupBy(F.col("l_orderkey").alias("po_orderkey")).agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(F.when(F.col("late"), F.col("l_suppkey"))).alias("n_late"),
    )
    guilty = (
        j.filter("late")
        .select("l_orderkey", "l_suppkey")
        .distinct()
        .join(
            po.filter((F.col("n_supp") > 1) & (F.col("n_late") == 1)),
            F.col("l_orderkey") == F.col("po_orderkey"),
        )
        .select("l_orderkey", "l_suppkey")
    )
    sdim = (
        load(spark, sf_dir, "supplier")
        .join(
            F.broadcast(load(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name")
    )
    return (
        guilty.join(sdim, guilty.l_suppkey == sdim.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
