"""SQL front door: register the dataset as views and run plain SQL.

"A user of the reference could switch" includes SQL users: this exposes
the same tables the oracle sees as Spark temp views, so ANSI-portable
queries run verbatim on the engine (`spark.sql`), with Catalyst doing
the planning.  (DuckDB-dialect list/lambda functions in some oracles are
deliberately not papered over — the portable subset is the contract.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from event_streaming_spark.plans.catalog import TABLES, load
from event_streaming_spark.session import tune_session


def open_catalog(spark: SparkSession, sf_dir: str, prefix: str = "") -> list[str]:
    """Register every dataset table as a temp view; returns view names."""
    tune_session(spark)
    names = []
    for t in TABLES:
        name = f"{prefix}{t}"
        load(spark, sf_dir, t).createOrReplaceTempView(name)
        names.append(name)
    return names


def sql(spark: SparkSession, query: str) -> DataFrame:
    """Run SQL against the opened catalog (thin, explicit pass-through)."""
    return spark.sql(query)
