"""MLlib-backed near-dup / ANN variants (SURVEY §2.5 table: MinHashLSH,
BucketedRandomProjectionLSH).

These are the off-the-shelf alternates to the explicit constructions in
operators/similarity.py.  Trade-off, stated plainly:

- MLlib seeds its hash families inside the JVM → a cross-engine SQL
  oracle cannot replay them, so catalog entries using these are
  rows-only-checkable.  The explicit md5-derived constructions exist
  precisely to make the semantics oracle-checkable.
- In exchange, MLlib gives `approxSimilarityJoin` / `approxNearestNeighbors`
  with tuned internals and a stable public API.

Both paths shuffle identically (hash-bucket equi-joins); use whichever
the deployment standardizes on.
"""

from __future__ import annotations

from pyspark.ml.feature import BucketedRandomProjectionLSH, HashingTF, MinHashLSH
from pyspark.ml.linalg import Vectors, VectorUDT
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from event_streaming_spark.functions.hashing import shingles


def _shingle_vectors(docs: DataFrame, text_col: str = "text", dim: int = 1 << 18) -> DataFrame:
    """documents → sparse term-frequency vectors over 3-token shingles.
    Empty shingle sets are dropped up front (MinHashLSH requires ≥1 nonzero)."""
    with_sh = docs.withColumn("__shingles", shingles(F.col(text_col))).filter(
        F.size("__shingles") > 0
    )
    tf = HashingTF(inputCol="__shingles", outputCol="features", numFeatures=dim)
    return tf.transform(with_sh).drop("__shingles")


def minhash_lsh_pairs_mllib(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    jaccard_distance_threshold: float = 0.7,
    num_hash_tables: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Near-dup candidate pairs via MLlib MinHashLSH approxSimilarityJoin.

    Returns (doc_a, doc_b, jaccard_dist), doc_a < doc_b.
    """
    feats = _shingle_vectors(docs, text_col)
    model = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=num_hash_tables, seed=seed
    ).fit(feats)
    joined = model.approxSimilarityJoin(
        feats, feats, jaccard_distance_threshold, distCol="jaccard_dist"
    )
    return (
        joined.select(
            F.col(f"datasetA.{id_col}").alias("doc_a"),
            F.col(f"datasetB.{id_col}").alias("doc_b"),
            F.round("jaccard_dist", 6).alias("jaccard_dist"),
        )
        .filter(F.col("doc_a") < F.col("doc_b"))
        .distinct()
    )


def ann_mllib(
    emb: DataFrame,
    query_vec,
    k: int = 5,
    id_col: str = "vec_id",
    bucket_length: float = 2.0,
    num_hash_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Euclidean ANN via BucketedRandomProjectionLSH approxNearestNeighbors."""
    to_vec = F.udf(lambda a: Vectors.dense([float(x) for x in a]), VectorUDT())
    feats = emb.withColumn("features", to_vec(F.col("embedding")))
    model = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=seed,
    ).fit(feats)
    q = Vectors.dense([float(x) for x in query_vec])
    return model.approxNearestNeighbors(feats, q, k).select(
        id_col, F.round("distCol", 6).alias("dist")
    )
