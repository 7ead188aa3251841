"""Scale-technique tranche: operators whose POINT is the 100 TB shape.

- star-contraction connected components (O(log² n) rounds) — same output
  contract (and same recursive-CTE oracle) as the label-propagation
  clusters query, so the two implementations pin each other;
- Bloom-pre-filtered semi join — map-side candidate thinning before the
  shuffle, exact-join backstop, plain-SQL semi join as oracle;
- Z-order clustering key — the shared bit-interleave fragment runs
  verbatim in both engines (one definition, two engines);
- grouped weighted median via a pandas GROUPED_AGG UDAF — the Arrow
  UDAF surface, pinned by an exact cumulative-weight window oracle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from event_streaming_spark.functions.numeric import exact_sum, sql_exact_sum
from event_streaming_spark.operators.components import connected_components_star
from event_streaming_spark.operators.joins import bloom_semi_join
from event_streaming_spark.operators.layout import sql_zorder_key, zorder_key
from event_streaming_spark.plans.catalog import load, register
from event_streaming_spark.plans.curation import _CC_ORACLE
from event_streaming_spark.plans.llm_similarity import minhash_lsh_near_dup_pairs

# ---------------------------------------------------------------------------
# Connected components, star-contraction variant.  Label propagation
# (dedup_near_dup_clusters) needs O(diameter) rounds — fine for shallow
# near-dup clusters, quadratic-ish disaster on long-chain graphs.  The
# large-star/small-star alternation (Kiveris et al., SoCC'14) converges
# in O(log² n) rounds on ANY graph with the same per-round shuffle cost.
# Registering it against the SAME recursive-CTE oracle as the
# propagation variant means the two independent implementations must
# agree bit-for-bit on the cluster labeling.
# ---------------------------------------------------------------------------


@register(
    "dedup_clusters_star_variant",
    _CC_ORACLE,
    tags=("llm", "dedup", "iterative", "scale"),
    bench=True,
)
def dedup_clusters_star_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id")
    edges = minhash_lsh_near_dup_pairs(spark, sf_dir).select("doc_a", "doc_b")
    labels = connected_components_star(docs, edges)
    return labels.select(
        F.col("node").alias("doc_id"), F.col("component").alias("cluster_id")
    )


# ---------------------------------------------------------------------------
# Bloom-pre-filtered semi join: lineitem rows belonging to big-ticket
# orders.  The build side (order keys over the price threshold) is ~9%
# of orders; the Bloom literal thins lineitem AT THE SCAN, so the
# exact semi join that follows shuffles only candidates.  Oracle is the
# plain semi join — the Bloom layer must be semantically invisible.
# ---------------------------------------------------------------------------

_BIG_ORDER_PRICE = 460000

_BLOOM_ORACLE = f"""
SELECT l_returnflag,
       count(*) AS n_items,
       {sql_exact_sum("l_quantity")} AS sum_qty
FROM lineitem
WHERE l_orderkey IN (
  SELECT o_orderkey FROM orders WHERE o_totalprice > {_BIG_ORDER_PRICE}
)
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register(
    "join_bloom_semi_lineitem_big_orders",
    _BLOOM_ORACLE,
    tags=("join", "bloom", "scale"),
    bench=True,
)
def join_bloom_semi_lineitem_big_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    lineitem = load(spark, sf_dir, "lineitem")
    big = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") > _BIG_ORDER_PRICE)
        .select(F.col("o_orderkey").alias("l_orderkey"))
    )
    kept = bloom_semi_join(lineitem, big, "l_orderkey")
    return (
        kept.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            exact_sum("l_quantity").alias("sum_qty"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Z-order clustering key over events: interleave (user bucket, day
# index) so one range-sort clusters BOTH dimensions for parquet min/max
# pruning.  The bit-interleave fragment is generated once and runs
# verbatim in Spark and DuckDB.  The query emits the head of the
# z-curve — any divergence in the interleave or the day arithmetic
# breaks the hash match.
# ---------------------------------------------------------------------------

_ZBITS = 16
_ZFRAG = sql_zorder_key(["x", "y"], _ZBITS)

_ZORDER_ORACLE = f"""
WITH xy AS (
  SELECT event_id,
         user_id % 65536 AS x,
         (epoch_us(ts) // 86400000000) % 65536 AS y
  FROM events
)
SELECT event_id, x, y, {_ZFRAG} AS zkey
FROM xy
ORDER BY zkey, event_id
LIMIT 100
"""


@register("events_zorder_curve_head", _ZORDER_ORACLE, tags=("layout", "scale"))
def events_zorder_curve_head(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    xy = ev.select(
        "event_id",
        (F.col("user_id") % 65536).alias("x"),
        (F.expr("unix_micros(ts) div 86400000000") % 65536).alias("y"),
    )
    return (
        xy.withColumn("zkey", zorder_key(["x", "y"], _ZBITS))
        .orderBy("zkey", "event_id")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Grouped weighted median via a pandas GROUPED_AGG UDAF — the one
# aggregation surface the catalog had not yet exercised (scalar pandas
# UDFs, grouped-map, mapInPandas, UDTFs are covered elsewhere).  Weight
# is a deterministic integer derived from event_id so the oracle can
# reproduce it.  Semantics: LOWER weighted median — the smallest value v
# such that 2·(cumulative weight through v) ≥ total weight.  Selection
# only (no float arithmetic), so both engines return identical doubles.
#
# Scale note: GROUPED_AGG gathers each group's values into one Arrow
# batch on one executor — right for group counts ≪ rows (here: event
# types).  For high-cardinality keys the window formulation in the
# oracle is the distributed path (cumsum window partitioned per key).
# ---------------------------------------------------------------------------

_WMEDIAN_ORACLE = """
WITH w AS (
  SELECT event_type, value, 1 + event_id % 7 AS wt FROM events
), pervalue AS (
  SELECT event_type, value, sum(wt) AS vw FROM w GROUP BY 1, 2
), cum AS (
  SELECT event_type, value,
         sum(vw) OVER (PARTITION BY event_type ORDER BY value) AS cw,
         sum(vw) OVER (PARTITION BY event_type) AS tw
  FROM pervalue
)
SELECT event_type, min(value) AS wmedian_value
FROM cum WHERE 2 * cw >= tw
GROUP BY event_type
ORDER BY event_type
"""


# DataType instance, not a DDL string: string return types are parsed at
# decoration time and require a live SparkContext, which this module
# must not assume at import.
@F.pandas_udf(T.DoubleType())
def _weighted_median_udaf(v: pd.Series, w: pd.Series) -> float:
    order = v.values.argsort(kind="stable")
    vv, ww = v.values[order], w.values[order]
    cum = ww.cumsum()
    pos = int((2 * cum >= cum[-1]).argmax())
    return float(vv[pos])


@register(
    "events_weighted_median_value_per_type",
    _WMEDIAN_ORACLE,
    tags=("agg", "udaf"),
)
def events_weighted_median_value_per_type(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "event_type", "value", (1 + F.col("event_id") % 7).alias("wt")
    )
    return (
        ev.groupBy("event_type")
        .agg(_weighted_median_udaf("value", "wt").alias("wmedian_value"))
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# The same weighted median, FULLY DISTRIBUTED — the 100 TB twin of the
# GROUPED_AGG demo above.  Plan: per-(type, value) weight totals (one
# shuffle, map-side combine), then a per-group cumulative weight via the
# range-partitioned global cumsum primitive — the group's prefix offset
# falls out distributively as min(global_cum − own_weight) over the
# group (the cum BEFORE the group's first row), so no driver-side
# ordering assumptions and no per-group single task anywhere.  Weights
# are integers, so every cumulative is exact int64 and the selection
# (min value with 2·cum ≥ total) is arithmetic-free — both engines
# return identical doubles.  Same oracle as the UDAF form: the two
# implementations cross-check each other through one SQL definition.
# ---------------------------------------------------------------------------


@register(
    "events_weighted_median_distributed",
    _WMEDIAN_ORACLE,
    tags=("agg", "scale", "window"),
)
def events_weighted_median_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from event_streaming_spark.operators.ranks import with_global_cumsum

    ev = load(spark, sf_dir, "events").select(
        "event_type", "value", (1 + F.col("event_id") % 7).alias("wt")
    )
    pervalue = ev.groupBy("event_type", "value").agg(F.sum("wt").alias("vw"))
    cum, _ = with_global_cumsum(
        pervalue, [F.col("event_type"), F.col("value")], "vw", out_col="gcw"
    )
    bounds = cum.groupBy("event_type").agg(
        F.min(F.col("gcw") - F.col("vw")).alias("g_prefix"),
        F.sum("vw").alias("tw"),
    )
    return (
        cum.join(bounds, "event_type")  # O(#types) rows — AQE broadcasts
        .where(2 * (F.col("gcw") - F.col("g_prefix")) >= F.col("tw"))
        .groupBy("event_type")
        .agg(F.min("value").alias("wmedian_value"))
        .orderBy("event_type")
    )
