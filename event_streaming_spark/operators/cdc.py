"""CDC apply / SCD2 history — MERGE-style table maintenance without Delta.

Reference parity: the event store's intended keyed upsert/delete surface
(SURVEY D4/O11: BDB main store; O16 delete; O27 keep-latest upsert).
Without a transactional table format in this environment, MERGE is
emulated with the standard anti-join + union plan (pyspark guide,
"CDC / SCD2" row):

- :func:`apply_cdc` — one batch of changes (upserts + deletes) onto a
  snapshot: keep latest change per key, drop deletes, anti-join the
  snapshot against touched keys, union.
- :func:`scd2_apply` — slowly-changing-dimension type 2: close current
  versions of changed keys (valid_to = change ts), append new open
  versions; full history preserved.

Scale: both plans are two shuffles on the key (dedup-latest window +
join), independent of history size for apply_cdc; with a date/key
partitioned snapshot the anti-join prunes to touched partitions.  On a
deployment with Delta/Iceberg these become MERGE INTO — same semantics,
one API call (connector jars are not in this environment; SURVEY §7.2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from event_streaming_spark.operators.dedup import dedup_keep_latest

#: end-of-time marker for open SCD2 versions
OPEN_END = "9999-12-31 23:59:59"


def apply_cdc(
    snapshot: DataFrame,
    changes: DataFrame,
    keys: list[str],
    order: list[Column],
    op_col: str = "op",  # 'upsert' | 'delete'
) -> DataFrame:
    """Apply a CDC batch to a keyed snapshot (last change per key wins)."""
    latest = dedup_keep_latest(changes, keys, order)
    # align to the snapshot schema (drops op + ordering columns)
    upserts = latest.filter(F.col(op_col) != "delete").select(*snapshot.columns)
    touched = latest.select(*keys)
    untouched = snapshot.join(touched, keys, "left_anti")
    return untouched.unionByName(upserts)


def scd2_apply(
    history: DataFrame,
    changes: DataFrame,
    keys: list[str],
    ts_col: str = "change_ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """SCD2: close current rows of changed keys, append new open versions.

    `history` carries (keys..., attributes..., valid_from, valid_to);
    current rows have valid_to == OPEN_END.  `changes` carries
    (keys..., attributes..., change_ts).  One change per key per batch
    (pre-dedup with dedup_keep_latest if needed).
    """
    change_times = changes.select(
        *keys, F.col(ts_col).alias("__new_from")
    )
    closed = (
        history.join(change_times, keys, "inner")
        .filter(F.col(valid_to) == OPEN_END)
        .withColumn(valid_to, F.col("__new_from"))
        .drop("__new_from")
    )
    unchanged = history.join(change_times, keys, "left_anti").unionByName(
        history.join(change_times, keys, "inner")
        .filter(F.col(valid_to) != OPEN_END)
        .drop("__new_from")
    )
    fresh = (
        changes.withColumnRenamed(ts_col, valid_from)
        .withColumn(valid_to, F.lit(OPEN_END).cast("timestamp"))
    )
    return unchanged.unionByName(closed).unionByName(fresh)
