"""Per-file Bloom-filter index: file skipping for EQUALITY point lookups
on high-cardinality keys — the complement of zone maps (operators/
zonemap.py), which prune range predicates but are useless for a point
probe on a key the layout is NOT sorted by (every file's [min, max]
spans the probe).

This is the Delta/Iceberg "bloom filter index" shape, made an explicit
testable operator:

1. ``bloom_index`` builds one bitmap per FILE from a single columnar
   scan of the key (+ the hidden ``_metadata.file_path``): k=5 salted
   ``xxhash64`` positions per value, OR-ed into an m-bit bitmap packed
   as ``binary`` by an Arrow-batched ``applyInPandas`` group map.  The
   manifest is one (file, bitmap) row per file — at 100 TB / 1 GiB
   files with m=2¹⁷ bits that is ~10⁵ rows × 16 KiB ≈ metadata-scale,
   exactly what production table formats store in their manifests.
2. ``pruned_read_eq`` answers ``col = v``: compute v's k positions (the
   SAME Spark hash expression — one 1-row job), test each file's bitmap
   driver-side (O(#files · k) bit probes), read ONLY candidate files,
   and re-apply the equality as the residual filter.  Bloom membership
   is necessary, not sufficient (false positives possible, false
   negatives impossible), so correctness never depends on the index —
   a saturated bitmap degrades to a full scan, never a wrong answer.

Sizing: m/n ≈ 9 bits per distinct key per file with k=5 gives ~2%
false-positive rate; callers size n_files so per-file key counts keep
that ratio (the same rows-per-file discipline file compaction already
enforces).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BLOOM_BITS = 1 << 17  #: bits per file bitmap (16 KiB packed)
BLOOM_HASHES = 5  #: salted xxhash64 probes per value


def _position_cols(col: F.Column) -> list[F.Column]:
    """The k salted hash positions of a value — shared by index build
    and probe so membership can never false-negative."""
    return [
        F.pmod(F.xxhash64(col, F.lit(s)), F.lit(BLOOM_BITS)).alias(f"p{s}")
        for s in range(BLOOM_HASHES)
    ]


def bloom_index(spark: SparkSession, path: str, col: str) -> DataFrame:
    """Per-file Bloom manifest ``(file, bitmap: binary)`` for ``col``.

    One scan of (file_path, col); the bitmap pack is a grouped Arrow
    batch per file (bounded by the file's distinct positions, ≤ m)."""
    import numpy as np

    positions = (
        spark.read.parquet(path)
        .select(F.col("_metadata.file_path").alias("file"), F.col(col).alias("v"))
        .select("file", F.explode(F.array(*_position_cols(F.col("v")))).alias("pos"))
        .dropDuplicates(["file", "pos"])
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        bits = np.zeros(BLOOM_BITS // 8, dtype=np.uint8)
        pos = pdf["pos"].to_numpy()
        np.bitwise_or.at(bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
        return pd.DataFrame({"file": [pdf["file"].iloc[0]], "bitmap": [bits.tobytes()]})

    return positions.groupBy("file").applyInPandas(pack, "file string, bitmap binary")


def probe_positions(spark: SparkSession, value, value_type: str) -> list[int]:
    """The k bit positions of a probe value — computed with the SAME
    Spark hash expression AND the same column type the index build used
    (one 1-row job).  xxhash64 is type-sensitive (hash(42 as int) ≠
    hash(42 as long)), so the type must come from the indexed table's
    schema, never from a caller guess — a mismatch silently skips every
    file containing the value (a Bloom FALSE NEGATIVE, r6 review)."""
    row = (
        spark.range(1)
        .select(*_position_cols(F.lit(value).cast(value_type)))
        .first()
    )
    return [int(x) for x in row]


def _bit_set(bitmap: bytes, pos: int) -> bool:
    return bool(bitmap[pos >> 3] & (1 << (pos & 7)))


def pruned_read_eq(
    spark: SparkSession,
    path: str,
    manifest: DataFrame,
    col: str,
    value,
) -> tuple[DataFrame, int, int]:
    """Read only the files whose Bloom bitmap contains ALL k positions
    of ``value``, with the equality re-applied as the residual filter.

    The probe type is DERIVED from the table's own schema (a one-file
    footer read): callers used to pass it, and a wrong guess made every
    probe hash differ from the build hashes — the query silently
    returned zero rows (r6 review).

    Returns ``(df, files_read, files_total)`` so callers and tests can
    assert the skipping actually happened.  The manifest collect is
    O(#files) driver metadata, same bound as the zone-map manifest."""
    table_schema = spark.read.parquet(path).schema
    value_type = table_schema[col].dataType.simpleString()
    entries = manifest.select("file", "bitmap").collect()  # O(#files), metadata-scale
    pos = probe_positions(spark, value, value_type)
    survivors = [
        r["file"] for r in entries if all(_bit_set(bytes(r["bitmap"]), p) for p in pos)
    ]
    total = len(entries)
    base = (
        # basePath keeps hive-partition columns when reading leaf files
        # (zonemap.pruned_read sets it for the same reason)
        spark.read.option("basePath", path).parquet(*survivors)
        if survivors
        else spark.read.parquet(path).limit(0)
    )
    return base.filter(F.col(col) == F.lit(value).cast(value_type)), len(survivors), total
