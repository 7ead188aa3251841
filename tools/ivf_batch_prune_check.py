"""BATCH-mode pruning measurement for the persisted IVF index at a
production-shaped cell count (VERDICT r6 #4).

The r6 BASELINE row measured the ONLINE case (1 query, nprobe/k = 30 %)
and recorded the honest caveat that the sf fixture's k=10 quantizer makes
a 10-query batch union its probes to every cell.  This script builds the
same 200k-vector index with k=256 cells — the production regime — and
serves a 10-query batch at nprobe=3: |∪probes| ≤ 30 ≪ 256, so the batch
read is partition-pruned to ≲ 12 % of files.  Prints the measured row for
BASELINE.md; the plan property itself is pinned by
tests/test_plan_regressions.py::test_ivf_batch_mode_prunes_at_production_cell_count.

Usage:  python tools/ivf_batch_prune_check.py [--cells 256] [--per-cell 800]
"""

from __future__ import annotations

import argparse
import glob
import math
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells", type=int, default=256)
    ap.add_argument("--per-cell", type=int, default=800)
    ap.add_argument("--nprobe", type=int, default=3)
    ap.add_argument("--queries", type=int, default=10)
    args = ap.parse_args()

    from pyspark.sql import SparkSession, Window
    from pyspark.sql import functions as F

    from event_streaming_spark.operators.ivfindex import (
        build_ivf_index,
        probe_cells,
        read_centroids,
    )
    from event_streaming_spark.session import tune_session

    spark = tune_session(
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )

    K, per_cell = args.cells, args.per_cell
    # deterministic unit-circle geometry: cell c's centroid at angle
    # 2πc/K; members = the centroid (the pruning measurement is about the
    # storage layout, not recall — recall is audited elsewhere)
    cent = spark.range(K).select(
        F.col("id").cast("int").alias("label"),
        F.array(
            F.cos(F.col("id") * 2 * math.pi / K),
            F.sin(F.col("id") * 2 * math.pi / K),
        ).alias("centroid"),
    )
    emb = spark.range(K * per_cell).select(
        F.col("id").alias("vec_id"),
        (F.col("id") % K).cast("int").alias("cell"),
        F.array(
            F.cos((F.col("id") % K) * 2 * math.pi / K),
            F.sin((F.col("id") % K) * 2 * math.pi / K),
        ).alias("embedding"),
    )

    idx_dir = tempfile.mkdtemp(prefix="est-ivfbatch-")
    try:
        t0 = time.monotonic()
        build_ivf_index(emb, idx_dir, centroids=cent)
        t_build = time.monotonic() - t0
        total_files = len(glob.glob(f"{idx_dir}/cell=*/*.parquet"))
        total_rows = K * per_cell

        t0 = time.monotonic()
        qs = spark.range(args.queries).select(
            F.col("id").alias("qid"),
            F.array(
                F.cos(F.col("id") * 25 * 2 * math.pi / K),
                F.sin(F.col("id") * 25 * 2 * math.pi / K),
            ).alias("qv"),
        )
        dot = F.aggregate(
            F.zip_with("qv", "centroid", lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        scored = qs.crossJoin(F.broadcast(read_centroids(idx_dir, spark))).select(
            "qid", "label", dot.alias("csim")
        )
        w = Window.partitionBy("qid").orderBy(F.desc("csim"), F.asc("label"))
        probe = (
            scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= args.nprobe)
            .select("qid", "label")
        )
        cells = sorted({r["label"] for r in probe.select("label").distinct().collect()})
        pruned = probe_cells(idx_dir, spark, cells)
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan, "IN predicate missed PartitionFilters"
        opened = {
            r["f"]
            for r in pruned.select(F.input_file_name().alias("f")).distinct().collect()
        }
        rows_read = pruned.count()
        t_search = time.monotonic() - t0

        print(
            f"index: {total_rows} vectors, k={K} cells, {total_files} files "
            f"(build {t_build:.1f}s)"
        )
        print(
            f"batch: {args.queries} queries x nprobe={args.nprobe} -> "
            f"|probes|={len(cells)} cells"
        )
        print(
            f"read:  {len(opened)}/{total_files} files = "
            f"{len(opened) / total_files:.1%}, {rows_read}/{total_rows} rows = "
            f"{rows_read / total_rows:.1%}, search leg {t_search:.1f}s, "
            f"PartitionFilters asserted"
        )
    finally:
        shutil.rmtree(idx_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
