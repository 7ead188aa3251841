"""SparkSession factory and JSON config loading.

Reference parity: ``main()`` loads ``conf/config.json`` into a json-c DOM
and hands it to ``events_agency_load_config``
(/root/reference/src/main.c:64-73, src/events-agency.c:178-181).  Here the
config JSON becomes SparkSession ``.config(...)`` entries plus engine
options; the GLib main loop becomes ``query.awaitTermination()``.

Scale notes: settings below are tuned for correctness on local[N] but are
chosen to be the right defaults on a large cluster too — AQE on (runtime
re-plan, skew-join splitting, partition coalescing), broadcast threshold
left to Spark, shuffle partitions sized to cores locally (on a real
cluster AQE coalesces from a higher initial number).
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql import SparkSession

#: Conservative defaults applied to every session we build.  All of these
#: are also safe to set at runtime on an externally-provided session.
RUNTIME_SQL_CONF: dict[str, str] = {
    # DuckDB (the correctness oracle) is UTC-naive; pin Spark to UTC so
    # timestamp semantics line up (see tests/conftest.py).
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for every pandas_udf / applyInPandas / toPandas hop.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # The events table carries TIMESTAMP(NANOS) parquet, which Spark 4
    # rejects by default; read as epoch-nanos LONG and convert in the
    # loader (plans/catalog.py::load) with integer division — identical
    # truncation to DuckDB's ns→µs cast (verified in tests).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8)))


def load_config(path: str | None) -> dict[str, Any]:
    """Load a JSON config file (reference: json_object_from_file,
    /root/reference/src/main.c:69-73). Missing file → empty config, which
    matches the reference's committed ``conf/config.json`` (``{}``)."""
    if not path or not os.path.isfile(path):
        return {}
    with open(path, encoding="utf-8") as fh:
        out = json.load(fh)
    if not isinstance(out, dict):
        raise ValueError(f"config root must be a JSON object: {path}")
    return out


def tune_session(spark: SparkSession, shuffle_partitions: int | None = None) -> SparkSession:
    """Apply runtime-settable SQL confs to an existing session.

    Used defensively at query-entry points: the driver hands us ITS
    session, which may not be UTC-pinned or AQE-enabled.
    """
    for k, v in RUNTIME_SQL_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # pragma: no cover - conf may be static
            pass
    if shuffle_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    return spark


def get_spark(
    app_name: str = "event-streaming-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    config_file: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession."""
    cores = default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cores))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "zstd")
    )
    for k, v in RUNTIME_SQL_CONF.items():
        builder = builder.config(k, v)
    for k, v in load_config(config_file).items():
        if isinstance(v, (str, int, float, bool)):
            builder = builder.config(k, str(v).lower() if isinstance(v, bool) else str(v))
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    return tune_session(spark, shuffle_partitions)
