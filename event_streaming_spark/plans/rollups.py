"""Incremental-rollup queries: prove the partial-aggregate algebra
(operators/rollup.py) against a direct full aggregation, cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_streaming_spark.operators.rollup import finalize, partial_rollup
from event_streaming_spark.plans.catalog import load, register

# ---------------------------------------------------------------------------
# Two-batch incremental refresh: split events into two ingest batches (by
# event_id parity — any split works, that's the point), build partials
# per batch, merge, finalize at (day, type) grain.  The oracle is the
# DIRECT aggregation over all raw events: if partial-merge is exact, the
# two are bit-identical.  Scale: each refresh aggregates only its batch;
# the merge handles |keys × days| rows, never raw history.
# ---------------------------------------------------------------------------

_INC_ORACLE = """
SELECT cast(ts AS DATE) AS event_date, event_type,
       count(*) AS n_rows,
       round(cast(sum(cast(round(value * 1e6) as bigint)) as double) / 1e6, 2) AS total_value,
       round(cast(sum(cast(round(value * 1e6) as bigint)) as double) / 1e6 / count(*), 6) AS avg_value,
       min(value) AS min_value,
       max(value) AS max_value
FROM events
GROUP BY event_date, event_type
"""


@register("rollup_incremental_two_batch_merge", _INC_ORACLE, tags=("events", "agg", "rollup"))
def rollup_incremental_two_batch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        F.col("ts").cast("date").alias("event_date"), "event_type", "value", "event_id"
    )
    keys = ["event_date", "event_type"]
    batch1 = partial_rollup(ev.filter(F.col("event_id") % 2 == 0), keys, "value")
    batch2 = partial_rollup(ev.filter(F.col("event_id") % 2 == 1), keys, "value")
    return finalize(batch1.unionByName(batch2), keys)


# ---------------------------------------------------------------------------
# Grain coarsening from the SAME partials: weekly totals derived by
# re-merging the daily partials (no second pass over raw events) — the
# hypertable "rollup of a rollup".  Oracle aggregates raw directly at the
# weekly grain; equality proves partials lose nothing across grains.
# ---------------------------------------------------------------------------

_WEEKLY_ORACLE = """
SELECT cast(date_trunc('week', ts) AS DATE) AS week_start, event_type,
       count(*) AS n_rows,
       round(cast(sum(cast(round(value * 1e6) as bigint)) as double) / 1e6, 2) AS total_value,
       round(cast(sum(cast(round(value * 1e6) as bigint)) as double) / 1e6 / count(*), 6) AS avg_value,
       min(value) AS min_value,
       max(value) AS max_value
FROM events
GROUP BY week_start, event_type
"""


@register("rollup_weekly_from_daily_partials", _WEEKLY_ORACLE, tags=("events", "agg", "rollup"))
def rollup_weekly_from_daily_partials(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        F.col("ts").cast("date").alias("event_date"),
        F.date_trunc("week", F.col("ts")).cast("date").alias("week_start"),
        "event_type",
        "value",
    )
    daily = partial_rollup(ev, ["week_start", "event_date", "event_type"], "value")
    return finalize(daily, ["week_start", "event_type"])
