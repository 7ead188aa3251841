"""Kafka wire contract as PURE DataFrame shaping functions.

The broker I/O itself needs the spark-sql-kafka connector (absent in this
container — see agency.py for the actionable error), but everything the
engine *decides* about the wire format lives here, connector-free and
fully testable:

- produce side: arbitrary typed rows → the ``value`` JSON envelope the
  kafka sink expects (one ``to_json(struct(*))`` string per row);
- consume side: the kafka source's raw frame (binary key/value +
  topic/partition/offset/timestamp) → typed rows via ``from_json``;
- the option dicts both sides pass to the connector.

Reference parity: the reference links librdkafka for the same
produce/consume boundary (/root/reference/Makefile:38-41); its payloads
are JSON event objects, so the envelope is a faithful translation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


#: Spark's default JSON timestamp format keeps only milliseconds; event
#: times are µs — force full precision so envelope → parse is lossless.
_TS_FORMAT = {"timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"}


def to_kafka_envelope(df: DataFrame, key_col: str | None = None) -> DataFrame:
    """Serialize typed rows into the kafka-sink frame: ``value`` is the
    row as a JSON object; optional ``key`` (for log-compaction /
    partition routing — e.g. the user id for per-key ordering)."""
    value = F.to_json(
        F.struct(*[c for c in df.columns if c != "__kafka_key"]), _TS_FORMAT
    )
    cols = [value.alias("value")]
    if key_col is not None:
        cols.insert(0, F.col(key_col).cast("string").alias("key"))
    return df.select(*cols)


def from_kafka_envelope(raw: DataFrame, schema: T.StructType) -> DataFrame:
    """Parse the kafka-source frame back into typed rows.

    ``raw`` has the connector's fixed shape (key/value BINARY, topic,
    partition, offset, ...).  Malformed payloads become all-null rows
    (from_json's PERMISSIVE default) rather than failing the stream —
    filter on a required column to drop them."""
    return raw.select(
        F.from_json(F.col("value").cast("string"), schema, _TS_FORMAT).alias("e")
    ).select("e.*")


def kafka_source_options(
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    fail_on_data_loss: bool = False,
) -> dict[str, str]:
    """Options for ``readStream.format("kafka")``.  failOnDataLoss=false:
    at 100 TB scale, retention-expired offsets on a lagging consumer
    should gap, not kill the query."""
    return {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
        "failOnDataLoss": "true" if fail_on_data_loss else "false",
    }


def kafka_sink_options(bootstrap_servers: str, topic: str) -> dict[str, str]:
    """Options for ``write/writeStream.format("kafka")``."""
    return {
        "kafka.bootstrap.servers": bootstrap_servers,
        "topic": topic,
    }


def simulate_kafka_source_frame(enveloped: DataFrame, topic: str) -> DataFrame:
    """Shape an enveloped frame the way the kafka SOURCE would deliver it
    (binary key/value + metadata columns) — the contract-test harness for
    environments without a broker."""
    has_key = "key" in enveloped.columns
    key = (
        F.col("key").cast("binary")
        if has_key
        else F.lit(None).cast("binary")
    )
    return enveloped.select(
        key.alias("key"),
        F.col("value").cast("binary").alias("value"),
        F.lit(topic).alias("topic"),
        F.spark_partition_id().alias("partition"),
        (F.monotonically_increasing_id()).alias("offset"),
        F.current_timestamp().alias("timestamp"),
        F.lit(0).alias("timestampType"),
    )
