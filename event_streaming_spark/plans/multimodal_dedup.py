"""Round-8 tranche 15: multimodal near-dup CLUSTERING — banded-LSH over
perceptual hashes from the REAL image pipeline, Hamming-verified, closed
into clusters.  This completes the multimodal dedup story: the catalog
had per-image hashing (`multimodal_phash_roundtrip`) and within-video
frame dedup; this adds the corpus-level "find all near-duplicate images
and label each with its cluster" operator — the image twin of
`dedup_near_dup_clusters`.

Pipeline (Spark side): deterministic BMP bytes per doc → raster decode →
integer luma → 8×8 box filter → 64-bit average hash (all the real
operators/phash.py kernels, Arrow-batched) → 4×16-bit band split →
band-bucket equi-join for candidates → popcount(xor) ≤ threshold verify
→ min-label connected components.  The oracle computes the hash
ARITHMETICALLY from the same MinHash-derived cell values (the synthetic
images are exactly invertible — scale_ops3.py's roundtrip construction),
then runs the identical band/Hamming/closure relational algebra with a
recursive CTE: one flipped bit anywhere in the decode chain, band math,
or closure changes cluster labels and fails the hash gate.

Scale: banding bounds the candidate join (equi-join on (band, value) —
never all-pairs); the Hamming verify is a per-candidate O(1) popcount;
components is the pointer-doubled kernel (O(log diameter) rounds over an
edge-sized frame).  At 100 TB of images the hash pass is the only
corpus-sized stage and it is embarrassingly parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_streaming_spark.plans.catalog import capture_plan, load, register
from event_streaming_spark.plans.scale_ops3 import (
    _PH_N_DOCS,
    _PHASH_RT_BODY,
    multimodal_phash_roundtrip,
)

_HAM_MAX = 16  # Hamming radius for "near-duplicate" on the 64-bit hash

_BANDS_SQL = " UNION ALL ".join(
    f"SELECT doc_id, phash, {i} AS band, (phash >> {16 * i}) & 65535 AS bv FROM ph"
    for i in range(4)
)

_PHC_ORACLE = f"""
WITH RECURSIVE ph AS ({_PHASH_RT_BODY}),
bands AS ({_BANDS_SQL}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, a.phash AS ph_a,
                  b.doc_id AS doc_b, b.phash AS ph_b
  FROM bands a JOIN bands b
    ON b.band = a.band AND b.bv = a.bv AND b.doc_id > a.doc_id
), pairs AS (
  SELECT doc_a, doc_b FROM cand
  WHERE bit_count(xor(ph_a, ph_b)) <= {_HAM_MAX}
), bidir AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM pairs
), reach(node, origin) AS (
  SELECT doc_id, doc_id FROM ph
  UNION
  SELECT b.dst AS node, r.origin FROM reach r JOIN bidir b ON b.src = r.node
)
SELECT node AS doc_id, min(origin) AS cluster_id FROM reach
GROUP BY node ORDER BY doc_id
"""


@register(
    "multimodal_phash_band_clusters",
    _PHC_ORACLE,
    tags=("multimodal", "dedup", "hash", "iterative"),
)
def multimodal_phash_band_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate image clusters: real decode→phash pipeline, 4×16
    band LSH candidates, Hamming ≤ {_HAM_MAX} verify, min-label closure.

    Candidates come from an equi-join on (band, band_value) — the
    all-pairs comparison never happens; the verify is popcount(xor) per
    candidate; clusters use the pointer-doubled CC kernel.
    """
    from event_streaming_spark.operators.components import connected_components
    from event_streaming_spark.operators.materialize import materialize

    ph = materialize(
        multimodal_phash_roundtrip(spark, sf_dir), "phash-band-clusters"
    )  # (doc_id, phash) via the REAL decode pipeline; pinned — the band
    # explode, both candidate sides, and the node list all read it.
    bands = ph.select(
        "doc_id",
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright(F.col("phash"), 16 * i)
                        .bitwiseAND(F.lit(65535))
                        .alias("bv"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "phash", F.col("bb.band").alias("band"), F.col("bb.bv").alias("bv"))
    a = bands.select(
        F.col("doc_id").alias("doc_a"),
        F.col("phash").alias("ph_a"),
        "band",
        "bv",
    )
    b = bands.select(
        F.col("doc_id").alias("doc_b"),
        F.col("phash").alias("ph_b"),
        "band",
        "bv",
    )
    cand = (
        a.join(b, ["band", "bv"])
        .where(F.col("doc_b") > F.col("doc_a"))
        .select("doc_a", "ph_a", "doc_b", "ph_b")
        .distinct()
    )
    pairs = cand.where(
        F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b"))) <= _HAM_MAX
    ).select("doc_a", "doc_b")
    capture_plan("multimodal_phash_band_clusters/candidate_verify", pairs)
    cc = connected_components(ph.select("doc_id"), pairs)
    return cc.select(
        F.col("node").alias("doc_id"), F.col("component").alias("cluster_id")
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Hamming-radius tuning curve for the image near-dup pipeline — the
# multimodal twin of docs_near_dup_threshold_sensitivity: the band-LSH
# candidate set is generated ONCE; the Hamming verify is swept over
# radii so the "how aggressive should image dedup be" knob is tuned
# from measured pair/doc attrition, not asserted.
# ---------------------------------------------------------------------------

_HTC_RADII = (4, 8, 12, 16, 20)


def _htc_oracle() -> str:
    vals = ", ".join(f"({t})" for t in _HTC_RADII)
    return f"""
WITH ph AS ({_PHASH_RT_BODY}),
bands AS ({_BANDS_SQL}),
cand AS MATERIALIZED (
  SELECT DISTINCT a.doc_id AS doc_a, a.phash AS ph_a,
                  b.doc_id AS doc_b, b.phash AS ph_b
  FROM bands a JOIN bands b
    ON b.band = a.band AND b.bv = a.bv AND b.doc_id > a.doc_id
), ham AS MATERIALIZED (
  SELECT doc_a, doc_b,
         cast(bit_count(xor(ph_a, ph_b)) AS BIGINT) AS hd
  FROM cand
)
SELECT cast(t.r AS BIGINT) AS hamming_radius,
       cast(count(*) FILTER (WHERE hd <= cast(t.r AS BIGINT)) AS BIGINT)
         AS n_pairs,
       cast(count(DISTINCT CASE WHEN hd <= cast(t.r AS BIGINT)
                                THEN doc_a END)
            + count(DISTINCT CASE WHEN hd <= cast(t.r AS BIGINT)
                                  THEN doc_b END) AS BIGINT) AS n_doc_slots
FROM ham, (VALUES {vals}) t(r)
GROUP BY t.r
ORDER BY hamming_radius
"""


@register(
    "multimodal_phash_hamming_threshold_curve",
    _htc_oracle(),
    tags=("multimodal", "dedup", "hash", "tuning"),
)
def multimodal_phash_hamming_threshold_curve(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Pair/doc attrition per Hamming radius over the band-LSH
    candidates.

    Scale design: candidates come from the SAME (band, band_value)
    equi-join as the cluster query (never all-pairs) and the popcount
    distance is computed ONCE per candidate; the five radii are
    conditional counts over the candidate-sized frame — no re-verify
    per radius.  ``n_doc_slots`` counts distinct left + distinct right
    endpoints (the dedup workload estimate, same contract as the text
    sensitivity curve).
    """
    from event_streaming_spark.operators.materialize import materialize

    ph = materialize(
        multimodal_phash_roundtrip(spark, sf_dir), "phash-ham-curve"
    )
    bands = ph.select(
        "doc_id",
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright(F.col("phash"), 16 * i)
                        .bitwiseAND(F.lit(65535))
                        .alias("bv"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("bb"),
    ).select(
        "doc_id", "phash", F.col("bb.band").alias("band"), F.col("bb.bv").alias("bv")
    )
    a = bands.select(
        F.col("doc_id").alias("doc_a"), F.col("phash").alias("ph_a"), "band", "bv"
    )
    b = bands.select(
        F.col("doc_id").alias("doc_b"), F.col("phash").alias("ph_b"), "band", "bv"
    )
    ham = (
        a.join(b, ["band", "bv"])
        .where(F.col("doc_b") > F.col("doc_a"))
        .select("doc_a", "ph_a", "doc_b", "ph_b")
        .distinct()
        .select(
            "doc_a",
            "doc_b",
            F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b")))
            .cast("long")
            .alias("hd"),
        )
    )
    fanned = ham.select(
        "*",
        F.explode(F.array(*[F.lit(t).cast("long") for t in _HTC_RADII])).alias(
            "r"
        ),
    )
    keep = F.col("hd") <= F.col("r")
    return (
        fanned.groupBy("r")
        .agg(
            F.sum(F.when(keep, 1).otherwise(0)).cast("long").alias("n_pairs"),
            (
                F.countDistinct(F.when(keep, F.col("doc_a")))
                + F.countDistinct(F.when(keep, F.col("doc_b")))
            )
            .cast("long")
            .alias("n_doc_slots"),
        )
        .select(F.col("r").alias("hamming_radius"), "n_pairs", "n_doc_slots")
        .orderBy("hamming_radius")
    )
