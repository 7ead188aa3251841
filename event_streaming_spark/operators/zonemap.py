"""Zone maps (min/max file skipping) over range-clustered parquet.

The single biggest lever for selective scans at 100 TB is never opening
most files.  Parquet footers already carry per-column min/max; engines
like the reference prune at their index layer (the ts secondary index,
/root/reference/src/event-store.c — see sources/store.py citations).
This module makes the same capability an explicit, testable operator:

1. ``write_clustered`` lays the table out range-clustered on the skip
   column (``repartitionByRange`` → each output file owns a tight,
   nearly disjoint value range — the precondition for zone maps to have
   selectivity; an unclustered layout gives every file the full range
   and prunes nothing).
2. ``zone_map`` builds the manifest ``(file, min, max, n_rows)``.  Here
   it derives from one columnar scan of the skip column via
   ``_metadata.file_path`` (Spark's hidden file metadata column); on a
   production deployment the identical manifest comes for free from the
   parquet footers / table-format manifests, so building it costs a
   metadata read, not a data scan.  The manifest has one row per FILE —
   at 100 TB / 1 GiB files that is ~10⁵ rows, a driver-trivial table.
3. ``pruned_read`` answers a range predicate by intersecting it with
   the manifest (driver-side, O(#files)), reading ONLY surviving files,
   and re-applying the predicate as the residual filter (zone overlap
   is necessary, not sufficient).  Correctness never depends on the
   layout: a worst-case layout degrades to reading everything, exactly
   like a full scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_clustered(df: DataFrame, path: str, cluster_col: str, n_files: int) -> None:
    """Write ``df`` as ``n_files`` parquet files range-clustered on
    ``cluster_col`` (file i owns the i-th value range, so min/max zones
    are tight and nearly disjoint)."""
    df.repartitionByRange(n_files, F.col(cluster_col)).write.mode("overwrite").parquet(
        path
    )


def zone_map(spark: SparkSession, path: str, col: str) -> DataFrame:
    """Per-file zone manifest ``(file, zmin, zmax, n_rows)`` for ``col``.

    One row per file — metadata-scale, safe to collect."""
    return (
        spark.read.parquet(path)
        .select(F.col("_metadata.file_path").alias("file"), F.col(col).alias("v"))
        .groupBy("file")
        .agg(
            F.min("v").alias("zmin"),
            F.max("v").alias("zmax"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


def pruned_read(
    spark: SparkSession,
    path: str,
    zm: DataFrame,
    col: str,
    lo,
    hi,
) -> tuple[DataFrame, int, int]:
    """Read only the files whose ``[zmin, zmax]`` zone intersects
    ``[lo, hi]``, with the residual filter re-applied.

    Returns ``(df, files_read, files_total)`` so callers (and tests) can
    assert that skipping actually happened.  The manifest collect is
    O(#files) driver work; the data read touches surviving files only.
    """
    zones = zm.select("file", "zmin", "zmax").collect()
    keep = [r["file"] for r in zones if r["zmax"] >= lo and r["zmin"] <= hi]
    if not keep:
        # Empty selection: preserve schema via an always-false filter on
        # one file's footer schema (no data read — parquet skips row
        # groups under a false predicate).
        df = spark.read.parquet(path).where(F.lit(False))
    else:
        # Re-anchoring on explicit file paths keeps partition discovery
        # out of the picture; basePath preserves any partition columns.
        df = spark.read.option("basePath", path).parquet(*keep)
    out = df.where((F.col(col) >= lo) & (F.col(col) <= hi))
    return out, len(keep), len(zones)


def clustered_copy(
    spark: SparkSession, src: DataFrame, root: str, cluster_col: str, n_files: int
) -> str:
    """Materialize a range-clustered copy under ``root`` (idempotent per
    path) and return its path."""
    path = os.path.join(root, f"clustered_{cluster_col}_{n_files}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        write_clustered(src, path, cluster_col, n_files)
    return path
