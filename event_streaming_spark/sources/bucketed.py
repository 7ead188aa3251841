"""Bucketed tables — co-located joins with zero shuffle (SURVEY §4 /
pyspark guide "Partitioning & shuffle").

At 100 TB the dominant cost of a repeated big⋈big join (e.g. orders ⋈
lineitem on orderkey, every night) is re-shuffling both sides every run.
Bucketing pays the shuffle ONCE at write time: both tables are hash-
partitioned into the same number of buckets on the join key and sorted
within buckets, so the join plan is a zipped SortMergeJoin with **no
Exchange on either side** (verified in tests).

Spark bucketing requires the table catalog (saveAsTable) — the default
in-memory/derby catalog works locally; on a cluster this is the
metastore.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    n_buckets: int = 16,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist df as a bucketed (and bucket-sorted) managed table.

    ``mode="append"`` adds new files into the SAME bucket layout (the
    bucket hash is deterministic), which is how an incremental index
    grows: each delta pays its own bucket shuffle at write time and the
    accumulated history never reshuffles at probe time.  Note Spark only
    honors the within-bucket sort when a bucket has a single file, so
    appended tables keep the shuffle-free property but re-sort per probe.
    """
    keys = [key] if isinstance(key, str) else list(key)
    writer = df.write.mode(mode).bucketBy(n_buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    writer.format("parquet").saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — Catalyst plans
    this without any Exchange (the write-time shuffle is reused)."""
    return spark.table(left_table).join(spark.table(right_table), key, how)
