"""Oracle-paired STREAMING queries — the publish → log → window → drain
path graded by the driver's correctness harness, not just pytest.

The engine's headline capability (reference: the events-agency pub/sub
loop, /root/reference/src/events-agency.c:142-243 + the consumer callback
contract include/events-agency.h:29-52) is a streaming pipeline:
``publish(events)`` appends to a durable topic log; ``consume`` drains it
through Structured Streaming with a windowed aggregation and hands each
micro-batch to the subscriber callback.

``streaming_drain_equals_batch`` runs that WHOLE pipeline batch-callably:
it publishes the events table to a fresh parquet topic log, drains it
with an availableNow trigger through a watermarked 1-day window
aggregate, keeps the LAST update per (window, event_type) key — update
mode emits the running aggregate per key per micro-batch, so the final
emission per key equals the batch aggregate — and returns the drained
result as a DataFrame.  The oracle is the same daily aggregate in ANSI
SQL over the raw parquet: stream ≡ batch, verified by the driver's
value-hash, not only by tests/test_streaming.py.

Scale notes: everything data-sized happens inside Structured Streaming
(the published log is drained by executors; state lives in the state
store sized to state cardinality).  The only driver-side collection is
the AGGREGATE rows (windows × event_types — ~150 at any SF; state-sized,
not data-sized), which is exactly what a subscriber callback receives.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from event_streaming_spark.functions.numeric import sql_exact_sum
from event_streaming_spark.plans.catalog import load, register

_DRAIN_ORACLE = f"""
SELECT CAST(ts AS DATE) AS event_date,
       event_type,
       count(*) AS n_events,
       {sql_exact_sum('value')} AS total_value
FROM events
GROUP BY CAST(ts AS DATE), event_type
"""

_RESULT_SCHEMA = T.StructType(
    [
        T.StructField("event_date", T.DateType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)


@register(
    "streaming_drain_equals_batch",
    _DRAIN_ORACLE,
    tags=("streaming", "window", "agg"),
)
def streaming_drain_equals_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Publish events → parquet topic log → availableNow windowed drain;
    the drained per-key FINAL updates must hash-equal the batch oracle."""
    from event_streaming_spark.streaming.agency import EventsAgency

    root = tempfile.mkdtemp(prefix="est-drain-")
    batches: list = []
    try:
        agency = EventsAgency(spark, root=root, log_format="parquet")
        ctx = agency._get_or_create("driver-gate", "events")
        ev = load(spark, sf_dir, "events")
        ctx.publish(ev)

        def windowed(df: DataFrame) -> DataFrame:
            # Scaled-long sum inside the streaming agg: order-independent
            # (exact integer addition), so the drained value is bitwise
            # reproducible run-to-run — same contract as exact_sum.
            return (
                df.withWatermark("ts", "1 hour")
                .groupBy(F.window("ts", "1 day"), "event_type")
                .agg(
                    F.count(F.lit(1)).alias("n_events"),
                    F.sum(F.round(F.col("value") * 1e6).cast("long")).alias("sv"),
                )
            )

        def on_notify(c, batch_df: DataFrame, batch_id: int) -> None:
            # The subscriber callback (O3 contract): receives the per-batch
            # UPDATED aggregate rows — state-sized, safe to localize.
            pdf = batch_df.select(
                F.to_date(F.col("window.start")).alias("event_date"),
                "event_type",
                "n_events",
                "sv",
            ).toPandas()
            pdf["batch_id"] = batch_id
            batches.append(pdf)

        ctx.consume(
            on_notify,
            once=True,
            transform=windowed,
            output_mode="update",
            # state cardinality = days × event_types (~150 rows at any SF);
            # see TopicContext.consume docstring for the store-count rule.
            state_partitions=8,
        )
        agency.close(remove_logs=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)

    import pandas as pd

    if not batches:
        return spark.createDataFrame([], _RESULT_SCHEMA)
    all_updates = pd.concat(batches, ignore_index=True)
    # update mode: each micro-batch emits the RUNNING aggregate for keys it
    # touched; the last emission per key is the final (batch-equal) value.
    last = (
        all_updates.sort_values("batch_id", kind="stable")
        .groupby(["event_date", "event_type"], as_index=False)
        .last()
    )
    last["total_value"] = (last["sv"] / 1e6).round(2)
    out = last[["event_date", "event_type", "n_events", "total_value"]]
    return spark.createDataFrame(out, _RESULT_SCHEMA)
