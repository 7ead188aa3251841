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
from event_streaming_spark.operators.materialize import materialize
from event_streaming_spark.operators.text import (
    quality_features as _quality_features,
    simhash_wide as _simhash_wide,
    sql_quality_features as _sql_quality_features,
    sql_simhash_over as _sql_simhash_over,
    sql_token_hashes_wide as _sql_token_hashes_wide,
)
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


@register("dedup_near_dup_clusters", _CC_ORACLE, tags=("llm", "dedup", "iterative"), bench=True)
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


# ---------------------------------------------------------------------------
# SimHash near-dup audit: a 48-bit simhash banded into 4 × 12-bit bands;
# any pair differing in ≤3 bits MUST share an intact band (pigeonhole), so
# the band equi-join has full recall at hamming ≤ 3 with zero O(n²) work.
# Verification is bit_count(xor) — pure int ops, identical both engines.
#
# Width is the scale knob: 8-bit bands (32-bit hash) go DENSE as the
# corpus grows — measured 126 s at a 10× corpus (50 k docs) because every
# 256-value band bucket held ~200 docs → ~20 M candidate pairs.  12-bit
# bands cut bucket occupancy 16× and candidates ~256×; at larger corpora
# still, widen again (the 100 TB setting is 64-bit simhash, 4×16-bit
# bands).  Output is the hamming histogram (the dedup-audit number), not
# the (dense) pair list — pairs would stream into the CC operator.
# ---------------------------------------------------------------------------

_SH_BITS = 48
_BAND_BITS = 12  # 4 bands × 12 bits = 48
_BAND_MASK = (1 << _BAND_BITS) - 1

_SIMHASH_ORACLE = f"""
WITH hs AS (
  SELECT doc_id, {_sql_token_hashes_wide('text', _SH_BITS)} AS hs FROM documents
), sh AS (
  SELECT doc_id, {_sql_simhash_over('hs', _SH_BITS)} AS sh FROM hs
), bands AS (
  SELECT doc_id, sh, j AS band_idx, (sh >> ({_BAND_BITS} * j)) & {_BAND_MASK} AS bv
  FROM sh, (SELECT unnest(range(4)) AS j)
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.sh AS sha, b.sh AS shb
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.bv = b.bv AND a.doc_id < b.doc_id
)
SELECT cast(bit_count(xor(sha, shb)) AS INT) AS hamming, count(*) AS n_pairs
FROM cand
WHERE bit_count(xor(sha, shb)) <= 3
GROUP BY hamming
"""


@register("simhash_near_dup_histogram", _SIMHASH_ORACLE, tags=("llm", "dedup", "hash"), bench=True)
def simhash_near_dup_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from event_streaming_spark.plans.catalog import spread

    docs = spread(load(spark, sf_dir, "documents"))
    sh = materialize(
        docs.select("doc_id", _simhash_wide(F.col("text"), _SH_BITS).alias("sh")),
        "simhash",
    )  # simhash is the expensive stage — compute once, both join sides reuse
    bands = sh.select(
        "doc_id",
        "sh",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("sh"), _BAND_BITS * j).bitwiseAND(F.lit(_BAND_MASK))
                    for j in range(4)
                ]
            )
        ).alias("band_idx", "bv"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    # hamming filter BEFORE the pair-dedup shuffle: the filter commutes
    # with DISTINCT, is map-side cheap, and cuts the shuffled candidate
    # volume ~10× (measured 126s → sub-linear at a 10× corpus, where
    # 8-bit bands go dense and candidates grow quadratically).
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh"))).cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= 3)
        .dropDuplicates(["doc_a", "doc_b"])
        .groupBy("hamming")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


# ---------------------------------------------------------------------------
# End-to-end corpus curation — the flagship composite: near-dup clusters →
# keep only each cluster's canonical doc → quality gate (alpha ratio +
# token-count band) → deterministic sample gate → per-language audit
# (docs kept, tokens kept).  Every stage is one of the operators above,
# composed; at 100 TB each stage is either a stateless filter (quality,
# sample) or the CC join — the expensive parts (signatures, clusters) are
# computed once and reused, exactly as a production pipeline would
# materialize them between stages.
# ---------------------------------------------------------------------------

_CUR_QF = _sql_quality_features("text")

_CURATION_ORACLE = f"""
WITH kept AS (
  SELECT d.lang, {_CUR_QF['n_tokens']} AS n_tokens
  FROM documents d JOIN ({_CC_ORACLE}) l ON d.doc_id = l.doc_id
  WHERE l.cluster_id = d.doc_id
    AND {_CUR_QF['alpha_ratio']} >= 0.6
    AND {_CUR_QF['n_tokens']} BETWEEN 5 AND 5000
    AND {sql_stable_hash32("'cur|' || cast(d.doc_id AS VARCHAR)")} % 1000 < 900
)
SELECT lang, count(*) AS n_docs, sum(n_tokens) AS total_tokens
FROM kept GROUP BY lang
"""


@register("corpus_curation_end_to_end", _CURATION_ORACLE, tags=("llm", "dedup", "sample", "pipeline"), bench=True)
def corpus_curation_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    canonical = dedup_near_dup_clusters(spark, sf_dir).filter(
        F.col("doc_id") == F.col("cluster_id")
    ).select("doc_id")
    feats = _quality_features(F.col("text"))
    gate = stable_hash32(F.concat(F.lit("cur|"), F.col("doc_id").cast("string"))) % 1000
    return (
        docs.join(canonical, "doc_id", "left_semi")
        .filter(
            (feats["alpha_ratio"] >= 0.6)
            & feats["n_tokens"].between(5, 5000)
            & (gate < 900)
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(feats["n_tokens"]).alias("total_tokens"),
        )
    )
