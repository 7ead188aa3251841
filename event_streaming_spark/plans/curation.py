"""Curation tranche: near-dup cluster canonicalization (connected
components over MinHash-LSH pairs) and deterministic hash-based sampling
/ source mixing — the steps between "found near-dup pairs" and "emitted
a training corpus".

The sampling queries use the cross-engine stable_hash32 (md5-derived, see
functions/hashing.py) so the SAME documents are selected by Spark and the
oracle — and, more importantly for production, by any two runs over any
partitioning.  Random() sampling is neither reproducible nor
oracle-checkable; hash-gate sampling is both, and it is the standard
technique for train/eval splits that must never drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_streaming_spark.functions.hashing import sql_stable_hash32, stable_hash32
from event_streaming_spark.operators.components import connected_components
from event_streaming_spark.plans.catalog import load, register
from event_streaming_spark.plans.llm_similarity import (
    _LSH_ORACLE,
    minhash_lsh_near_dup_pairs,
)

# ---------------------------------------------------------------------------
# Near-dup clusters: transitive closure of the MinHash-LSH pair list, every
# document labeled with the min doc_id of its cluster (singletons label
# themselves).  Downstream dedup keeps rows where doc_id == cluster_id.
#
# Spark side: iterative min-label propagation (operators/components.py) —
# a driver loop of join+agg rounds, O(cluster diameter) of them.  Oracle
# side: the same fixpoint as a recursive CTE (min reachable id).  This is
# inherently iterative, so it is the one catalog query whose Spark plan is
# a loop — the oracle still pins its exact output.
# ---------------------------------------------------------------------------

_CC_ORACLE = f"""
WITH RECURSIVE edges AS (
  SELECT doc_a, doc_b FROM ({_LSH_ORACLE})
), bidir AS (
  SELECT doc_a AS src, doc_b AS dst FROM edges
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM edges
), reach(node, origin) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT b.dst AS node, r.origin FROM reach r JOIN bidir b ON b.src = r.node
)
SELECT node AS doc_id, min(origin) AS cluster_id FROM reach GROUP BY node
"""


@register("dedup_near_dup_clusters", _CC_ORACLE, tags=("llm", "dedup", "iterative"))
def dedup_near_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id")
    edges = minhash_lsh_near_dup_pairs(spark, sf_dir).select("doc_a", "doc_b")
    labels = connected_components(docs, edges)
    return labels.select(
        F.col("node").alias("doc_id"), F.col("component").alias("cluster_id")
    )


# ---------------------------------------------------------------------------
# Stratified sample: per-language keep rates via a hash gate on doc_id.
# stable_hash32("smpl|" + doc_id) is uniform on [0, 2³²); comparing its
# value mod 1000 against rate·1000 keeps each stratum at its target rate,
# deterministically.  Scale: stateless filter — pipelines into the scan,
# zero shuffles; changing rates re-selects a superset/subset (nested
# samples), which random() cannot do.
# ---------------------------------------------------------------------------

_LANG_RATES = {"en": 800, "de": 500, "es": 500, "fr": 500, "zh": 300}  # ‰
_DEFAULT_RATE = 200

_SQL_RATE = (
    "CASE lang "
    + " ".join(f"WHEN '{k}' THEN {v}" for k, v in _LANG_RATES.items())
    + f" ELSE {_DEFAULT_RATE} END"
)

_STRAT_ORACLE = f"""
SELECT doc_id, lang, source
FROM documents
WHERE {sql_stable_hash32("'smpl|' || cast(doc_id AS VARCHAR)")} % 1000 < {_SQL_RATE}
"""


@register("sample_stratified_by_lang", _STRAT_ORACLE, tags=("llm", "sample"))
def sample_stratified_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    gate = stable_hash32(F.concat(F.lit("smpl|"), F.col("doc_id").cast("string"))) % 1000
    rate = F.lit(_DEFAULT_RATE)
    for k, v in _LANG_RATES.items():
        rate = F.when(F.col("lang") == k, F.lit(v)).otherwise(rate)
    return docs.filter(gate < rate).select("doc_id", "lang", "source")


# ---------------------------------------------------------------------------
# Weighted source mix: per-source keep rates (up-/down-weighting corpora
# is how training mixtures are tuned), reported as an audit summary —
# kept vs total per source, with the realized rate.  Exact integers only.
# ---------------------------------------------------------------------------

_SRC_RATE = "CASE WHEN source IN ('src0','src1','src2','src3') THEN 900 " \
            "WHEN source IN ('src4','src5','src6') THEN 400 ELSE 150 END"

_MIX_ORACLE = f"""
SELECT source,
       count(*) AS n_total,
       count(*) FILTER (
         WHERE {sql_stable_hash32("'mix|' || cast(doc_id AS VARCHAR)")} % 1000 < {_SRC_RATE}
       ) AS n_kept
FROM documents
GROUP BY source
"""


@register("sample_weighted_mix_by_source", _MIX_ORACLE, tags=("llm", "sample", "agg"))
def sample_weighted_mix_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    gate = stable_hash32(F.concat(F.lit("mix|"), F.col("doc_id").cast("string"))) % 1000
    rate = (
        F.when(F.col("source").isin("src0", "src1", "src2", "src3"), 900)
        .when(F.col("source").isin("src4", "src5", "src6"), 400)
        .otherwise(150)
    )
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count(F.when(gate < rate, 1)).alias("n_kept"),
    )
