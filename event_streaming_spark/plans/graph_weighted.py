"""Weighted shortest paths over the near-dup graph — the weighted
upgrade of the BFS blast radius, oracle-paired.

Edges are the MinHash-LSH near-dup pairs with integer weights
``1000 − round(est_jaccard·1000)`` (strong matches are cheap hops), so
the sweep ranks documents by CONTAMINATION PROXIMITY to the flagged
seed set rather than raw hop count.  The operator is bounded
Bellman-Ford (operators/graph.py::sssp_bounded): after R rounds the
distance is exactly the minimum weight over paths of ≤ R edges, which a
hop-bounded recursive CTE reproduces verbatim — the same
fixed-recurrence discipline as integer PageRank and the BFS layers.

Scale: per round, one equi-join + one min-aggregate on key-partitioned
shuffles bounded by the (candidate-pair-sized) edge list; rounds pin
through the materializer with an O(1) convergence probe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_streaming_spark.plans.catalog import load, register
from event_streaming_spark.plans.llm_similarity import (
    _LSH_ORACLE,
    minhash_lsh_near_dup_pairs,
)

_SSSP_ROUNDS = 4
_SSSP_SEED_MOD = 50


def _sssp_oracle() -> str:
    return f"""
WITH RECURSIVE raw AS ({_LSH_ORACLE}),
e AS (
  SELECT src, dst, w FROM (
    SELECT doc_a AS src, doc_b AS dst,
           1000 - cast(round(est_jaccard * 1000) AS BIGINT) AS w
    FROM raw
    UNION
    SELECT doc_b AS src, doc_a AS dst,
           1000 - cast(round(est_jaccard * 1000) AS BIGINT) AS w
    FROM raw
  )
),
paths(node, dist, hops) AS (
  SELECT doc_id, cast(0 AS BIGINT), 0
  FROM documents WHERE doc_id % {_SSSP_SEED_MOD} = 0
  UNION
  SELECT e.dst, paths.dist + e.w, paths.hops + 1
  FROM paths JOIN e ON e.src = paths.node
  WHERE paths.hops < {_SSSP_ROUNDS}
)
SELECT node AS doc_id, cast(min(dist) AS BIGINT) AS dist
FROM paths
GROUP BY node
ORDER BY doc_id
"""


@register(
    "graph_weighted_blast_radius",
    _sssp_oracle(),
    tags=("graph", "iterative", "llm", "dedup", "weighted"),
)
def graph_weighted_blast_radius(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min similarity-weighted path cost from every 50th doc over ≤4
    near-dup hops; hash-equal to the hop-bounded recursive CTE."""
    from event_streaming_spark.operators.graph import sssp_bounded

    seeds = (
        load(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") % _SSSP_SEED_MOD == 0)
    )
    edges = minhash_lsh_near_dup_pairs(spark, sf_dir).select(
        "doc_a",
        "doc_b",
        (F.lit(1000) - F.round(F.col("est_jaccard") * 1000).cast("long")).alias("w"),
    )
    reached = sssp_bounded(seeds, edges, rounds=_SSSP_ROUNDS)
    return reached.select(F.col("node").alias("doc_id"), "dist").orderBy("doc_id")
