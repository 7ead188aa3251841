"""Versioned-storage queries: exercise snapshot isolation / time travel /
MERGE under the differential oracle, not just pytest.

The query builds a real ``VersionedStore`` (manifest-based, snapshot-
isolated — sources/versioned.py) from the sf events table, runs a
keep-latest MERGE on top, then reads BOTH the pre-merge snapshot (time
travel) and the head state.  Because every commit is a deterministic
function of the input table, the oracle can reconstruct both states in
pure SQL over the raw parquet — equality proves the storage layer loses
nothing and the old snapshot stays byte-stable after the merge.

Reference parity: the reference's event store keeps an append log and a
keyed latest-state view (see sources/store.py citations); the versioned
form is the durable MERGE/time-travel shape a 100 TB deployment needs
(Delta/Iceberg transaction pattern, implemented manifest-first here).

Scale: the store write is a parquet append partitioned by the session's
shuffle parallelism; MERGE rewrites only the base files (copy-on-write)
after an anti-join on the merge key; time travel reads the old manifest's
file list — no extra shuffle beyond the final aggregate.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_streaming_spark.plans.catalog import load, register
from event_streaming_spark.sources.versioned import VersionedStore

# Fixed-point cents keep both engines exact-integer; the outer CAST to
# BIGINT stops DuckDB widening sum() to int128 (lint: no HUGEINT outputs).
_VER_ORACLE = """
WITH v1 AS (
  SELECT event_type, value FROM events
), head AS (
  SELECT event_type,
         CASE WHEN event_type = 'click' THEN value * 2 ELSE value END AS value
  FROM events
), a AS (
  SELECT event_type, count(*) AS n_v1,
         cast(sum(cast(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents_v1
  FROM v1 GROUP BY event_type
), b AS (
  SELECT event_type,
         cast(sum(cast(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents_head
  FROM head GROUP BY event_type
)
SELECT a.event_type, a.n_v1, a.sum_cents_v1, b.sum_cents_head
FROM a JOIN b ON a.event_type = b.event_type
"""


def _cents(col: str):
    return F.sum(F.round(F.col(col) * 100).cast("bigint")).cast("bigint")


@register(
    "versioned_time_travel_merge",
    _VER_ORACLE,
    tags=("storage", "versioned", "cdc", "merge"),
)
def versioned_time_travel_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("event_id", "event_type", "value")
    root = tempfile.mkdtemp(prefix="est-versioned-q-")
    store = VersionedStore(spark, root)
    v1 = store.append(ev)
    # Keep-latest MERGE: every click row is replaced by a doubled-value
    # update keyed on event_id; non-click rows are untouched base rows.
    updates = ev.filter(F.col("event_type") == "click").withColumn(
        "value", F.col("value") * 2
    )
    store.merge(updates, key="event_id")
    old = (
        store.read(v1)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_v1"),
            _cents("value").alias("sum_cents_v1"),
        )
    )
    head = (
        store.read()
        .groupBy("event_type")
        .agg(_cents("value").alias("sum_cents_head"))
    )
    return old.join(head, "event_type").select(
        "event_type", "n_v1", "sum_cents_v1", "sum_cents_head"
    )
