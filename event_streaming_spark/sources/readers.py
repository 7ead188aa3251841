"""File-system sources (SURVEY O9/O10) + JSON event ingestion.

Reference parity:
  - O9 whole-file scan with stat probe (utils/utils.c:67-136) →
    ``binaryFile`` source: (path, modificationTime, length, content) —
    the same fields the reference's stat+read returns.  A stat-only probe
    is the same scan with `content` pruned (never read — column pruning).
  - O10 recursive directory listing, BFS queue, skip hidden files
    (utils/utils.c:138-232) → recursiveFileLookup; hidden-file skipping
    is the source's default (`_`/`.` prefixes are excluded by Spark's
    file index, as the reference skips dotfiles).

Multimodal note (SURVEY §2.5): image/audio/video ride through
``binaryFile`` as opaque BinaryType + typed metadata; decode/transform
operators live in operators/multimodal.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_streaming_spark.streaming.agency import EVENT_SCHEMA


def load_file(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    recursive: bool = True,
    stat_only: bool = False,
) -> DataFrame:
    """Whole-file read (O9).  stat_only=True returns metadata without the
    bytes — the `p_data == NULL` probe of utils/utils.c:112-115; Spark
    prunes the `content` column so file bodies are never fetched."""
    reader = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", str(recursive).lower())
    )
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    if stat_only:
        return df.select("path", "modificationTime", "length")
    return df


def list_folder(spark: SparkSession, path: str, recursive: bool = True) -> DataFrame:
    """Directory listing (O10): names only, distributed file index —
    never a hand-rolled BFS."""
    return (
        load_file(spark, path, recursive=recursive, stat_only=True)
        .select(F.col("path"), F.col("length"))
        .orderBy("path")
    )


def read_events_json(spark: SparkSession, path: str) -> DataFrame:
    """Batch-read a JSON-lines topic log with the canonical event schema
    (schema supplied explicitly — no inference pass over the data)."""
    return spark.read.schema(EVENT_SCHEMA).json(path)
