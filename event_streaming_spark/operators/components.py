"""Distributed connected components (min-label propagation).

The dedup story needs more than pairs: near-dup PAIRS (MinHash-LSH,
embedding-cosine) must be folded into CLUSTERS so one canonical document
per cluster survives.  Transitive closure is inherently iterative — not
expressible as a fixed DataFrame plan — so this is one of the few places
the engine runs a driver-side loop over distributed steps.

Algorithm: label propagation toward the minimum node id.  Every node
starts labeled with itself; each round, a node's label becomes the min of
its own and its neighbors' labels.  Converges in O(component diameter)
rounds; near-dup clusters are shallow (dozens of docs, diameter ≲ 5), so
3-4 rounds in practice.  Per round: one shuffle join (edges ⋈ labels on
src) + one shuffle agg (min per node) — both partition on the same key,
so AQE coalesces.  Each round is pinned via the pluggable materializer
(operators/materialize.py) to truncate lineage (without it the plan
doubles per iteration and the job dies at scale); the ``table`` strategy
makes the rounds fault-tolerant on a real cluster.

Convergence detection is O(1) driver-side: labels only ever decrease, so
the global SUM(label) is strictly decreasing until fixpoint; an unchanged
sum ⇒ no label moved ⇒ done.  For graphs with pathological diameters
(long chains — not a dedup shape) the literature fix is the
large-star/small-star contraction (Kiveris et al., "Connected Components
in MapReduce and Beyond"), which converges in O(log²n); the loop below
accepts the same edge input, so swapping the step is local.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from event_streaming_spark.operators.materialize import materialize


def connected_components(
    nodes: DataFrame, edges: DataFrame, max_iters: int = 30
) -> DataFrame:
    """Components of an undirected graph.

    ``nodes``: single-column DataFrame of node ids (any orderable type).
    ``edges``: two-column DataFrame of endpoints (same type).
    Returns ``(node, component)`` where component = min node id reachable.
    """
    n_col = nodes.columns[0]
    s_col, d_col = edges.columns[0], edges.columns[1]
    fwd = edges.select(F.col(s_col).alias("src"), F.col(d_col).alias("dst"))
    bidir = materialize(
        fwd.union(fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))).distinct(),
        "cc-edges",
    )
    labels = materialize(
        nodes.select(F.col(n_col).alias("node"), F.col(n_col).alias("component")),
        "cc-labels",
    )

    prev_sum = None
    for _ in range(max_iters):
        nbr = bidir.join(labels, bidir.src == labels.node).select(
            F.col("dst").alias("node"), "component"
        )
        new_labels = materialize(
            labels.union(nbr)
            .groupBy("node")
            .agg(F.min("component").alias("component")),
            "cc-labels",
        )
        cur_sum = new_labels.agg(F.sum("component")).collect()[0][0]
        labels = new_labels
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels
