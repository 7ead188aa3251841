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
    # A file whose skip column is entirely NULL has NULL zmin/zmax; its
    # rows can never satisfy the residual range filter, so dropping the
    # file is semantically exact (and comparing None would TypeError).
    keep = [
        r["file"]
        for r in zones
        if r["zmin"] is not None and r["zmax"] >= lo and r["zmin"] <= hi
    ]
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


class IncrementalZoneMap:
    """Zone maps maintained INCREMENTALLY over a VersionedStore.

    The store's data files are immutable, so a file's (min, max, count)
    never changes once computed — exactly why table formats keep stats
    in their manifests.  ``refresh()`` scans ONLY files the cache has
    not seen (new appends, merge/compact rewrites); files dropped by a
    version (COW delete, compaction) simply fall out of the manifest
    intersection at query time.  At 100 TB this is the difference
    between a stats refresh that reads the new day's partition and one
    that rescans the table.

    ``pruned_read(lo, hi, version=)`` works against ANY retained
    snapshot: time travel composes with data skipping because the cache
    is keyed by immutable file, not by version.
    """

    def __init__(self, store, col: str | None = None, cols: list[str] | None = None) -> None:
        if cols is None:
            if col is None:
                raise ValueError("pass col or cols")
            cols = [col]
        self.store = store
        self.cols = list(cols)
        self.col = self.cols[0]
        # file -> {col: (zmin, zmax)} for every tracked col (+ "__n" rows)
        self._zones: dict[str, dict] = {}

    def refresh(self, version: int | None = None) -> int:
        """Compute zones for files of ``version`` (default head) not yet
        cached.  Returns how many files were NEWLY scanned."""
        files = self.store.files(version)
        missing = [f for f in files if f not in self._zones]
        if not missing:
            return 0
        spark = self.store.spark
        aggs = []
        for c in self.cols:
            aggs += [F.min(c).alias(f"{c}__min"), F.max(c).alias(f"{c}__max")]
        aggs.append(F.count(F.lit(1)).alias("__n"))
        # mergeSchema: under schema evolution some files may predate the
        # skip column entirely; they surface as all-NULL → (None, None)
        # zones, which pruned_read treats as prunable (their rows could
        # never pass the residual filter).  When EVERY missing file
        # predates a tracked column the merged schema doesn't contain it
        # at all and the select would raise UNRESOLVED_COLUMN — inject an
        # explicit NULL so pre-evolution snapshots keep the documented
        # (None, None) behavior (r6 review).
        base = spark.read.option("mergeSchema", "true").parquet(*missing)
        have = set(base.columns)
        sel = [
            F.col(c) if c in have else F.lit(None).alias(c) for c in self.cols
        ]
        rows = (
            base.select(F.col("_metadata.file_path").alias("file"), *sel)
            .groupBy("file")
            .agg(*aggs)
            .collect()
        )
        # _metadata.file_path is a URI; key the cache by the same local
        # path the manifest hands out.
        by_tail = {os.path.basename(r["file"]): r for r in rows}
        for f in missing:
            r = by_tail.get(os.path.basename(f))
            if r is not None:
                self._zones[f] = {
                    c: (r[f"{c}__min"], r[f"{c}__max"]) for c in self.cols
                }
                self._zones[f]["__n"] = r["__n"]
            else:  # zero-row file: parquet scan emits no group for it
                self._zones[f] = {c: (None, None) for c in self.cols}
                self._zones[f]["__n"] = 0
        return len(missing)

    def pruned_read(self, lo, hi, version: int | None = None):
        """``(df, files_read, files_total)`` for the snapshot, reading
        only files whose zone intersects [lo, hi].

        The kept-file read goes through ``store.read_files`` — the same
        manifest-schema projection and equality-tombstone anti-join as a
        full ``store.read`` — so pruning composes with merge-on-read
        deletes and schema evolution instead of bypassing them (a raw
        ``spark.read.parquet(*keep)`` would resurrect tombstoned rows)."""
        return self.pruned_read_box({self.col: (lo, hi)}, version=version)

    def pruned_read_box(self, box: dict, version: int | None = None):
        """Conjunctive multi-column skipping against the snapshot: keep
        only files whose zones intersect EVERY ``col: (lo, hi)`` in
        ``box`` (cols must be tracked by this map), then re-apply the box
        as the residual filter.  Pairs with
        ``VersionedStore.compact(zorder_by=...)``, whose layout makes
        every tracked dimension's per-file envelope tight at once."""
        untracked = [c for c in box if c not in self.cols]
        if untracked:
            raise ValueError(f"columns not tracked by this zone map: {untracked}")
        self.refresh(version)
        files = self.store.files(version)
        keep = [
            f
            for f in files
            if all(
                self._zones[f][c][0] is not None
                and self._zones[f][c][1] >= lo
                and self._zones[f][c][0] <= hi
                for c, (lo, hi) in box.items()
            )
        ]
        df = self.store.read_files(keep, version)
        for c, (lo, hi) in box.items():
            df = df.where((F.col(c) >= lo) & (F.col(c) <= hi))
        return df, len(keep), len(files)


def zone_map_multi(spark: SparkSession, path: str, cols: list[str]) -> DataFrame:
    """Per-file zone manifest with min/max for SEVERAL columns:
    ``(file, <c>_min, <c>_max ..., n_rows)`` — the multi-dimensional
    form that pairs with a Z-order layout (operators/layout.py): one
    interleaved sort key makes EVERY interleaved dimension's per-file
    envelope tight, so a box predicate prunes on all of them at once."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"{c}_min"), F.max(c).alias(f"{c}_max")]
    aggs.append(F.count(F.lit(1)).alias("n_rows"))
    return (
        spark.read.parquet(path)
        .select(F.col("_metadata.file_path").alias("file"), *cols)
        .groupBy("file")
        .agg(*aggs)
    )


def pruned_read_multi(
    spark: SparkSession,
    path: str,
    zm: DataFrame,
    box: dict,
) -> tuple[DataFrame, int, int]:
    """Read only files whose zones intersect EVERY ``col: (lo, hi)`` in
    ``box`` — conjunctive file skipping — then re-apply the residual
    box filter.  Returns ``(df, files_read, files_total)``."""
    zones = zm.collect()
    keep = []
    for r in zones:
        # NULL min/max (all-NULL column in that file) → rows can't pass
        # the residual box filter on that dimension; skip the file.
        ok = all(
            r[f"{c}_min"] is not None
            and r[f"{c}_max"] >= lo
            and r[f"{c}_min"] <= hi
            for c, (lo, hi) in box.items()
        )
        if ok:
            keep.append(r["file"])
    if not keep:
        df = spark.read.parquet(path).where(F.lit(False))
    else:
        df = spark.read.option("basePath", path).parquet(*keep)
    for c, (lo, hi) in box.items():
        df = df.where((F.col(c) >= lo) & (F.col(c) <= hi))
    return df, len(keep), len(zones)
