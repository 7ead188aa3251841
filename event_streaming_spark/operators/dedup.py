"""Keyed dedup / keep-latest operators.

Reference parity:
  - O23 dedup-set insert with policy (discard-first vs replace-latest):
    /root/reference/utils/email-sender.c:109-135, policy enum
    utils/email-sender.h:88-92.
  - O27 header-map upsert, ALWAYS keep latest:
    /root/reference/utils/email-sender.c:195-216.

Spark-first design: both policies are one `row_number` window over the
key, ordered by an explicit, caller-supplied deterministic ordering
(the reference's insertion order becomes an ordering column — Kafka
offset, event ts, or a sequence id).  Single shuffle on the key; at
100 TB the window is the same shuffle an aggregation would need, and
AQE splits skewed keys.

`dropDuplicates` is deliberately NOT used: its kept row is
partition-order dependent, i.e. non-reproducible across runs — fine
for sets, wrong for an engine that must replay deterministically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _ranked(df: DataFrame, keys: list[str], order: list[Column]) -> DataFrame:
    w = Window.partitionBy(*keys).orderBy(*order)
    return df.withColumn("__rn", F.row_number().over(w))


def dedup_keep_first(df: DataFrame, keys: list[str], order: list[Column]) -> DataFrame:
    """Keep the first row per key in `order` (reference discard-duplicate
    policy, email-sender.c:122-124)."""
    return _ranked(df, keys, order).filter(F.col("__rn") == 1).drop("__rn")


def dedup_keep_latest(df: DataFrame, keys: list[str], order: list[Column]) -> DataFrame:
    """Keep the last row per key in `order` (reference replace-with-latest
    policy, email-sender.c:125-128; header-map semantics :208-212)."""
    w = Window.partitionBy(*keys).orderBy(*[c.desc() for c in order])
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")
