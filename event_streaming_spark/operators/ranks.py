"""Distributed global ordering primitives: row numbers and running sums
under a TOTAL order, without a single-partition window.

The anti-pattern these replace: ``Window.orderBy(...)`` with no
partitionBy collapses the whole input onto ONE task ("WindowExec: No
Partition Defined") — the slowest task in any catalog at scale.

The scalable plan (same skeleton for both primitives):

1. ``repartitionByRange`` on the order columns — parallel range buckets
   whose ids follow the global order;
2. pin the bucketed frame (``operators/materialize.py``) so the two
   consumers below see the SAME sampled bucket boundaries;
3. one tiny aggregate per bucket (count / sum) — O(#partitions) rows,
   bounded by cluster config, never by data — collected and prefix-summed
   on the driver;
4. a bucket-partitioned window for the local part + the bucket's offset
   folded back in as a literal array lookup.

Used by ``events_user_value_deciles`` (global ntile/percent_rank) and
``docs_pack_into_contexts`` (global token-offset packing).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from event_streaming_spark.operators.materialize import materialize

_PID = "__pid"


def _bucketize(df: DataFrame, order_cols: list[Column], name: str) -> DataFrame:
    n_buckets = df.sparkSession.sparkContext.defaultParallelism
    return materialize(
        df.repartitionByRange(n_buckets, *order_cols).withColumn(
            _PID, F.spark_partition_id()
        ),
        name,
    )


def _offsets_array(bucketed: DataFrame, agg: Column) -> tuple[Column, int]:
    """Per-bucket prefix offsets as a literal array + the global total."""
    rows = bucketed.groupBy(_PID).agg(agg.alias("v")).collect()
    per_bucket = {r[_PID]: r["v"] or 0 for r in rows}
    offsets, running = [], 0
    for pid in range(max(per_bucket, default=-1) + 1):
        offsets.append(running)
        running += per_bucket.get(pid, 0)
    arr = F.array(*[F.lit(o) for o in offsets]) if offsets else F.array(F.lit(0))
    return arr, running


def with_global_row_number(
    df: DataFrame, order_cols: list[Column], out_col: str = "rn"
) -> tuple[DataFrame, int]:
    """``row_number() OVER (ORDER BY order_cols)`` semantics, distributed.

    ``order_cols`` must be a total order (include a unique tiebreak).
    Returns ``(df + out_col, total_row_count)`` — the count rides along
    free from the offsets pass.
    """
    bucketed = _bucketize(df, order_cols, "global-rn-buckets")
    arr, total = _offsets_array(bucketed, F.count(F.lit(1)))
    w = Window.partitionBy(_PID).orderBy(*order_cols)
    rn = (F.element_at(arr, F.col(_PID) + 1) + F.row_number().over(w)).cast("long")
    return bucketed.withColumn(out_col, rn).drop(_PID), total


def with_global_cumsum(
    df: DataFrame,
    order_cols: list[Column],
    value_col: str,
    out_col: str = "cumsum",
) -> tuple[DataFrame, int]:
    """``sum(value) OVER (ORDER BY order_cols ROWS UNBOUNDED PRECEDING)``,
    distributed.  ``value_col`` must be integral (exact offsets).
    Returns ``(df + out_col, global_total)``."""
    bucketed = _bucketize(df, order_cols, "global-cumsum-buckets")
    arr, total = _offsets_array(bucketed, F.sum(F.col(value_col).cast("long")))
    w = (
        Window.partitionBy(_PID)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cs = (F.element_at(arr, F.col(_PID) + 1) + F.sum(F.col(value_col).cast("long")).over(w)).cast(
        "long"
    )
    return bucketed.withColumn(out_col, cs).drop(_PID), int(total)
