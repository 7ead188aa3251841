"""Query registry: one place where every named query + its ANSI oracle live.

Each registered function takes ``(spark, sf_dir)`` and returns a
DataFrame; its ``oracle`` is the equivalent DuckDB SQL over the same
parquet tables (pre-registered views).  Column names are aliased
identically on both sides — the driver sorts columns by name before
value-hashing.

Queries whose semantics are not ANSI-SQL-expressible (streaming state,
approximate sketches) register ``oracle=None`` → the driver records a
weaker rows-only check.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from event_streaming_spark.session import tune_session

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@dataclass(frozen=True)
class CatalogQuery:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    tags: tuple[str, ...] = field(default=())
    bench: bool = False  # include in bench.py headline set


REGISTRY: dict[str, CatalogQuery] = {}

#: When tools/dump_plans.py sets this to a dict, queries that LOCALIZE
#: their result (streaming drains, tempdir-backed index searches — whose
#: returned DataFrame is just a createDataFrame of the collected rows)
#: deposit their scale-relevant INTERNAL plans here via capture_plan().
#: None in the graded path — capture_plan is then a no-op.
PLAN_SINK: dict[str, str] | None = None


def capture_plan(label: str, df: DataFrame) -> None:
    """Record ``df``'s formatted physical plan under ``label`` when a plan
    dump is in progress (PLAN_SINK set).  Zero-cost no-op otherwise."""
    if PLAN_SINK is None:
        return
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    PLAN_SINK[label] = buf.getvalue().strip()


def register(name: str, oracle: str | None, tags: tuple[str, ...] = (), bench: bool = False):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        def wrapped(spark: SparkSession, sf_dir: str, **kw) -> DataFrame:
            # Defensive: the driver hands us its own session; pin the SQL
            # confs our semantics rely on (UTC, AQE). Runtime-settable only.
            # **kw passes through optional measurement hooks (e.g. the
            # session drain's metrics list) — the driver never sets any.
            tune_session(spark)
            return fn(spark, sf_dir, **kw)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        wrapped.__wrapped__ = fn
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = CatalogQuery(name, wrapped, oracle, tuple(tags), bench)
        return wrapped

    return deco


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Parquet scan for one of the test tables (columnar, pushdown-capable).

    ``events.ts`` is TIMESTAMP(NANOS) on disk; with ``nanosAsLong`` it scans
    as epoch-nanos LONG and we rebuild a (µs) timestamp via integer
    division — the same floor-truncation DuckDB applies on its ns→µs cast.
    """
    from pyspark.sql import functions as F

    df = spark.read.parquet(os.path.join(sf_dir, f"{table}.parquet"))
    if table == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":  # TIMESTAMP(NANOS) read via nanosAsLong
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":  # µs parquet from other writers
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def spread(df: DataFrame) -> DataFrame:
    """Round-robin repartition to full parallelism before a compute-heavy
    narrow stage (hashing, regex, per-row text work) — but ONLY when the
    scan is parallelism-deficient.

    The driver fixtures are single-file/single-row-group parquet, so a
    bare scan is ONE task no matter the cluster size — there the shuffle
    moves raw rows once and buys a 2-4× measured win (per-row CPU ≫ row
    transfer cost).  On a real deployment the scan has natural file
    parallelism; repartitioning 100 TB for no reason would be the
    engine's biggest shuffle, so a scan already at ≥half the cluster's
    parallelism passes through untouched."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= max(2, target // 2):
        return df
    return df.repartition(target)
