"""Fourth relational tranche: explicit GROUPING SETS (the one grouping
flavor rollup/cube don't cover) and a RANGE-frame time window (the one
window-frame flavor the ROWS-frame queries don't cover).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from event_streaming_spark.functions.numeric import sql_exact_sum
from event_streaming_spark.plans.catalog import load, register

# ---------------------------------------------------------------------------
# GROUPING SETS with disjoint sets (status-only, year-only, grand total) —
# not expressible as rollup/cube.  Written as SQL and executed verbatim on
# BOTH engines (the dialect subset here is identical), exercising the SQL
# front door.  Scale: Spark expands grouping sets into a single Expand +
# one hash agg — one shuffle total, not one per set.
# ---------------------------------------------------------------------------

_GSETS_SQL = f"""
WITH base AS (
  SELECT o_orderstatus, CAST(extract(year FROM o_orderdate) AS INT) AS o_year, o_totalprice
  FROM orders
)
SELECT coalesce(o_orderstatus, 'ALL') AS orderstatus,
       coalesce(o_year, -1) AS o_year,
       count(*) AS n_orders,
       {sql_exact_sum('o_totalprice')} AS total_price
FROM base
GROUP BY GROUPING SETS ((o_orderstatus), (o_year), ())
"""


@register("grouping_sets_status_year", _GSETS_SQL, tags=("agg", "rollup", "sql"))
def grouping_sets_status_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_GSETS_SQL)


# ---------------------------------------------------------------------------
# Trailing-7-day revenue via a RANGE frame over a day-number order key.
# The frame sums exact scaled longs, so the windowed sums are
# order-independent and bit-identical across engines.  Scale: the daily
# pre-aggregation shrinks the fact to one row per day BEFORE the window;
# a single-partition window over ~thousands of days is trivial (for
# per-key windows the partitionBy distributes — this one is global by
# construction).
# ---------------------------------------------------------------------------

_RANGE_FRAME_ORACLE = """
WITH daily AS (
  SELECT cast(o_orderdate AS DATE) AS d,
         date_diff('day', DATE '1995-01-01', cast(o_orderdate AS DATE)) AS day_no,
         sum(cast(round(o_totalprice * 1e6) as bigint)) AS rev_scaled
  FROM orders GROUP BY 1, 2
)
SELECT d,
       round(cast(rev_scaled as double) / 1e6, 2) AS day_revenue,
       round(cast(sum(rev_scaled) OVER w as double) / 1e6, 2) AS trailing_7d_revenue,
       cast(count(*) OVER w AS INT) AS n_days_in_window
FROM daily
WINDOW w AS (ORDER BY day_no RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
"""


@register("window_range_trailing_7d", _RANGE_FRAME_ORACLE, tags=("window", "agg"))
def window_range_trailing_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("d"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")).alias(
            "day_no"
        ),
    ).agg(F.sum(F.round(F.col("o_totalprice") * 1e6).cast("long")).alias("rev_scaled"))
    w = Window.orderBy("day_no").rangeBetween(-6, 0)
    return daily.select(
        "d",
        F.round(F.col("rev_scaled").cast("double") / 1e6, 2).alias("day_revenue"),
        F.round(F.sum("rev_scaled").over(w).cast("double") / 1e6, 2).alias(
            "trailing_7d_revenue"
        ),
        F.count(F.lit(1)).over(w).cast("int").alias("n_days_in_window"),
    )


# ---------------------------------------------------------------------------
# Market-basket affinity: the 20 part pairs most often bought together,
# from the pair self-join WITHIN each order.  The per-basket join is
# bounded by basket size (TPC-H lineitem ≤ 7 rows per order), so the
# candidate volume is Σ C(|basket|, 2) = O(rows × max_basket) — linear
# in lineitem, never all-pairs across orders; the pair aggregate
# combines map-side.  distinct() first: an order can list the same part
# on two lineitems, which must not self-pair or double-count.
# ---------------------------------------------------------------------------

_BASKET_ORACLE = """
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
)
SELECT part_a, part_b, count(*) AS n_orders,
       row_number() OVER (ORDER BY count(*) DESC, part_a, part_b) AS rnk
FROM pairs GROUP BY part_a, part_b
ORDER BY rnk LIMIT 20
"""


@register(
    "parts_basket_affinity",
    _BASKET_ORACLE,
    tags=("tpch", "join", "affinity"),
)
def parts_basket_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    items = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = items.alias("a"), items.alias("b")
    pairs = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    ).select(
        F.col("a.l_partkey").alias("part_a"),
        F.col("b.l_partkey").alias("part_b"),
    )
    counts = pairs.groupBy("part_a", "part_b").agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    # global top-20: TakeOrdered via orderBy+limit (no full sort at scale)
    top = counts.orderBy(
        F.desc("n_orders"), "part_a", "part_b"
    ).limit(20)
    w = Window.orderBy(F.desc("n_orders"), "part_a", "part_b")
    return top.withColumn("rnk", F.row_number().over(w).cast("long")).orderBy("rnk")


# ---------------------------------------------------------------------------
# Market-basket association rules (brand granularity): support, confidence
# and lift with exact DECIMAL ppm arithmetic.  parts_basket_affinity above
# stops at raw pair support; this is the full Agrawal-Srikant readout the
# merchandising side actually consumes.  Scale: lineitem⋈part is the only
# fact-sized join (brand dictionary pruned to 2 columns); the per-order
# brand sets are ≤ 7-item lists so the pair fanout is ≤ C(7,2)·|orders|;
# everything after the (brand_a, brand_b) count is a ≤ C(25,2)-row frame.
# DECIMAL(38,0) keeps N·n_ab·10⁶ exact far past int64 (sf ≥ 10⁴).
# ---------------------------------------------------------------------------

_MB_MIN_SUPPORT = 10
_MB_K = 20

_MB_ORACLE = f"""
WITH ob AS MATERIALIZED (
  SELECT DISTINCT l.l_orderkey, p.p_brand
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
), n AS (
  SELECT cast(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM ob
), ba AS (
  SELECT p_brand, cast(count(*) AS BIGINT) AS n_b FROM ob GROUP BY p_brand
), pairs AS (
  SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
         cast(count(*) AS BIGINT) AS n_ab
  FROM ob a JOIN ob b
    ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
  GROUP BY a.p_brand, b.p_brand
)
SELECT brand_a, brand_b, n_ab AS support_orders,
       cast((2000000 * cast(n_ab AS HUGEINT) + xa.n_b)
            // (2 * cast(xa.n_b AS HUGEINT)) AS BIGINT) AS conf_a_to_b_ppm,
       cast((2000000 * cast(n.n_orders AS HUGEINT) * n_ab
              + xa.n_b * cast(xb.n_b AS HUGEINT))
            // (2 * cast(xa.n_b AS HUGEINT) * xb.n_b)
         AS BIGINT) AS lift_ppm
FROM pairs
JOIN ba xa ON xa.p_brand = brand_a
JOIN ba xb ON xb.p_brand = brand_b
CROSS JOIN n
WHERE n_ab >= {_MB_MIN_SUPPORT}
ORDER BY lift_ppm DESC, brand_a, brand_b
LIMIT {_MB_K}
"""


@register(
    "orders_market_basket_lift",
    _MB_ORACLE,
    tags=("tpch", "affinity", "stats"),
)
def orders_market_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules over order baskets: top-k brand pairs by lift.

    Scale design: ONE fact-sized join (lineitem⋈part, columns pruned
    to the keys + brand) feeds a distinct (order, brand) frame; the
    pair self-join fans out ≤ C(7,2) per order on the co-partitioned
    order key; the rule statistics run on the ≤ C(|brands|,2)-row
    count frame with the brand totals broadcast.  All ppm arithmetic
    is DECIMAL(38,0) round-half-up integer division — exact on both
    engines at any scale.
    """
    part = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    ob = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .join(part, F.col("p_partkey") == F.col("l_partkey"))
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    n = ob.agg(F.countDistinct("l_orderkey").cast("long").alias("n_orders"))
    ba = ob.groupBy("p_brand").agg(F.count(F.lit(1)).cast("long").alias("n_b"))
    a, b = ob.alias("a"), ob.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.p_brand") < F.col("b.p_brand")),
        )
        .select(
            F.col("a.p_brand").alias("brand_a"),
            F.col("b.p_brand").alias("brand_b"),
        )
        .groupBy("brand_a", "brand_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
    )
    xa = ba.select(F.col("p_brand").alias("ba_brand"), F.col("n_b").alias("na"))
    xb = ba.select(F.col("p_brand").alias("bb_brand"), F.col("n_b").alias("nb"))
    conf = F.expr(
        "cast((2000000 * cast(n_ab as decimal(38,0)) + na)"
        " div (2 * cast(na as decimal(38,0))) as bigint)"
    )
    lift = F.expr(
        "cast((2000000 * cast(n_orders as decimal(38,0)) * n_ab"
        " + na * cast(nb as decimal(38,0)))"
        " div (2 * cast(na as decimal(38,0)) * nb) as bigint)"
    )
    return (
        pairs.where(F.col("n_ab") >= _MB_MIN_SUPPORT)
        .join(F.broadcast(xa), F.col("ba_brand") == F.col("brand_a"))
        .join(F.broadcast(xb), F.col("bb_brand") == F.col("brand_b"))
        .crossJoin(F.broadcast(n))
        .select(
            "brand_a",
            "brand_b",
            F.col("n_ab").alias("support_orders"),
            conf.alias("conf_a_to_b_ppm"),
            lift.alias("lift_ppm"),
        )
        .orderBy(F.desc("lift_ppm"), "brand_a", "brand_b")
        .limit(_MB_K)
    )


# ---------------------------------------------------------------------------
# Supplier concentration (Herfindahl-Hirschman index) per brand: the
# supply-chain risk readout — a brand whose spend concentrates in one
# supplier is one bankruptcy away from a stockout.  Exact arithmetic:
# per-(brand, supplier) spend in integer cents, HHI/top-share ppm via
# HUGEINT/DECIMAL round-half-up division (Σs² at 100 TB is DECIMAL
# territory).  Scale: ONE fact join (lineitem⋈part pruned to 3 cols),
# one (brand, supplier) aggregate, then brand-sized frames.
# ---------------------------------------------------------------------------

_HHI_ORACLE = """
WITH bs AS MATERIALIZED (
  SELECT p.p_brand, l.l_suppkey,
         cast(sum(cast(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY p.p_brand, l.l_suppkey
), b AS (
  SELECT p_brand,
         cast(count(*) AS BIGINT) AS n_suppliers,
         cast(sum(cents) AS BIGINT) AS total_cents,
         cast(sum(cast(cents AS HUGEINT) * cents) AS HUGEINT) AS sq,
         cast(max(cents) AS BIGINT) AS top_cents
  FROM bs GROUP BY p_brand
)
SELECT p_brand AS brand, n_suppliers, total_cents,
       cast((2000000 * sq + cast(total_cents AS HUGEINT) * total_cents)
            // (2 * cast(total_cents AS HUGEINT) * total_cents) AS BIGINT)
         AS hhi_ppm,
       cast((2000000 * cast(top_cents AS HUGEINT) + total_cents)
            // (2 * cast(total_cents AS HUGEINT)) AS BIGINT) AS top_share_ppm
FROM b
ORDER BY brand
"""


@register(
    "orders_supplier_hhi_by_brand",
    _HHI_ORACLE,
    tags=("tpch", "stats", "risk"),
)
def orders_supplier_hhi_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl supplier-concentration index per part brand.

    Scale design: lineitem⋈part is the only fact-sized stage (columns
    pruned to partkey/suppkey/price); spend reduces to integer cents
    per (brand, supplier) in one map-side-combined aggregate; the HHI
    arithmetic runs on brand-sized frames with DECIMAL(38,0) squares —
    exact on both engines at any volume.
    """
    part = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    bs = (
        load(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey", "l_extendedprice")
        .join(part, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "l_suppkey")
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    b = bs.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("long").alias("n_suppliers"),
        F.sum("cents").cast("long").alias("total_cents"),
        F.sum(F.col("cents").cast("decimal(38,0)") * F.col("cents"))
        .cast("decimal(38,0)")
        .alias("sq"),
        F.max("cents").cast("long").alias("top_cents"),
    )
    hhi = F.expr(
        "cast((2000000 * sq + cast(total_cents as decimal(38,0)) * total_cents)"
        " div (2 * cast(total_cents as decimal(38,0)) * total_cents) as bigint)"
    )
    top = F.expr(
        "cast((2000000 * cast(top_cents as decimal(38,0)) + total_cents)"
        " div (2 * cast(total_cents as decimal(38,0))) as bigint)"
    )
    return b.select(
        F.col("p_brand").alias("brand"),
        "n_suppliers",
        "total_cents",
        hhi.alias("hhi_ppm"),
        top.alias("top_share_ppm"),
    ).orderBy("brand")
