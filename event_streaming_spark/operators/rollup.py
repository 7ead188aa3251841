"""Incremental rollup (materialized-view maintenance over partials).

The 100 TB pattern behind "hypertable rollups": never re-aggregate raw
history.  Maintain PARTIAL aggregates per (time-bucket, key) — counts,
exact scaled sums, min/max — refresh them per ingest batch, and answer
any coarser grain by MERGING partials.  Partials must form a commutative
monoid (merge(a, b) associative + commutative); counts and scaled-long
sums are exact integers, so any refresh order, batch split, or partition
layout produces bit-identical finals — the property the oracle gate
checks cross-engine.

At scale: the partials table is ~|keys × buckets| rows (millions), not
|events| (trillions); a refresh touches only the buckets present in the
new batch; reads scan partials with partition pruning on the bucket
column.  Storage side lives in sources/store.py (date-partitioned
parquet); these transforms are the algebra.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: partial-column suffixes → (per-row partial, partial-merge) builders
_SCALE = 1_000_000


def partial_rollup(df: DataFrame, keys: list[str], value_col: str) -> DataFrame:
    """One ingest batch → partial rows per key group: exact count +
    scaled-long sum + min/max of ``value_col``."""
    c = F.col(value_col)
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("p_count"),
        F.sum(F.round(c * _SCALE).cast("long")).alias("p_sum_scaled"),
        F.min(c).alias("p_min"),
        F.max(c).alias("p_max"),
    )


def merge_partials(partials: DataFrame, keys: list[str]) -> DataFrame:
    """Merge partial rows (any number of refreshes, any order) down to one
    row per key group — same schema, still a partial (mergeable again)."""
    return partials.groupBy(*keys).agg(
        F.sum("p_count").alias("p_count"),
        F.sum("p_sum_scaled").alias("p_sum_scaled"),
        F.min("p_min").alias("p_min"),
        F.max("p_max").alias("p_max"),
    )


def finalize(partials: DataFrame, keys: list[str], round_to: int = 2) -> DataFrame:
    """Partial rows → user-facing aggregates (count / sum / avg / min / max)."""
    merged = merge_partials(partials, keys)
    total: Column = F.col("p_sum_scaled").cast("double") / _SCALE
    return merged.select(
        *keys,
        F.col("p_count").alias("n_rows"),
        F.round(total, round_to).alias("total_value"),
        F.round(total / F.col("p_count"), 6).alias("avg_value"),
        F.col("p_min").alias("min_value"),
        F.col("p_max").alias("max_value"),
    )
