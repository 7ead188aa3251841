"""Perceptual image dedup: average-hash + banded hamming join.

Composes the two halves this engine already has — REAL raster decode
(operators/multimodal.py: PPM/BMP/PNG/GIF/baseline-JPEG, stdlib+numpy)
and banded candidate joins (the SimHash/MinHash pattern) — into the
standard image near-dup pipeline:

    bytes → decode → grayscale → 8×8 box-filter → 64-bit average hash
          → 8×8-bit bands → equi-join on (band, value) → hamming verify

Determinism: every step is integer arithmetic (ITU-R 601 luma with
integer weights, exact box-filter means, strict > threshold), so any
run, any partitioning, any engine with the same kernels produces the
same 64-bit hash.

Exactness of the banded join: with 8 bands of 8 bits, two hashes
within hamming distance ≤ 7 differ in ≤ 7 bands, so at least one band
matches (pigeonhole) — the candidate join finds EVERY qualifying pair;
the hamming verify (xor + bit_count, JVM-side) removes band-collision
false positives.  Same guarantee structure as the prefix filter join.

Scale shape: hashing is an Arrow-batched pandas UDF (one pass over the
binary column, 8 bytes out per image — the only Python in the
pipeline, on data that built-ins cannot decode); everything after the
hash is hash-sized: the band join shuffles 8 rows of 16 bytes per
image, never pixels.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from event_streaming_spark.operators.multimodal import decode_pixels, resize_box

HASH_BITS = 64
N_BANDS = 8
BAND_BITS = HASH_BITS // N_BANDS


def average_hash_bytes(content: bytes, hash_size: int = 8) -> int | None:
    """64-bit average hash of an encoded image, or None if undecodable.

    Integer end-to-end: luma = (299R + 587G + 114B) // 1000; 8×8 exact
    box means; bit i set iff cell i's luma is STRICTLY above the
    integer mean of the 64 cells (strict > makes flat images hash to
    exactly 0 instead of threshold-noise)."""
    import numpy as np

    try:
        px = decode_pixels(content)
    except Exception:
        return None
    luma = (
        px[:, :, 0].astype(np.int64) * 299
        + px[:, :, 1].astype(np.int64) * 587
        + px[:, :, 2].astype(np.int64) * 114
    ) // 1000
    small = resize_box(
        luma.astype(np.uint8)[:, :, None], hash_size, hash_size
    )[:, :, 0].astype(np.int64)
    mean = int(small.sum()) // (hash_size * hash_size)
    bits = (small > mean).flatten()
    h = 0
    for b in bits:
        h = (h << 1) | int(b)
    # keep the sign bit clear is NOT required — Spark longs are signed
    # and the xor/bit_count verify is sign-agnostic; but a stable
    # two's-complement fold keeps the Python int in int64 range:
    if h >= 1 << 63:
        h -= 1 << 64
    return h


def with_average_hash(df: DataFrame, bin_col: str, out_col: str = "phash") -> DataFrame:
    """Add the 64-bit average hash of ``bin_col`` (NULL = undecodable)."""

    @pandas_udf("long")
    def _ph(s: pd.Series) -> pd.Series:
        return s.map(lambda b: average_hash_bytes(bytes(b)) if b is not None else None)

    return df.withColumn(out_col, _ph(F.col(bin_col)))


def phash_near_dup_pairs(
    hashed: DataFrame, id_col: str, hash_col: str = "phash", max_hamming: int = 7
) -> DataFrame:
    """``(id_a, id_b, hamming)`` for every pair within ``max_hamming``
    bits — exact, via the banded candidate join (module doc).

    ``max_hamming`` must stay < N_BANDS for the pigeonhole guarantee."""
    if max_hamming >= N_BANDS:
        raise ValueError(
            f"max_hamming={max_hamming} breaks the pigeonhole guarantee "
            f"(needs < {N_BANDS} bands)"
        )
    base = hashed.where(F.col(hash_col).isNotNull()).select(
        F.col(id_col).alias("id"), F.col(hash_col).alias("h")
    )
    mask = (1 << BAND_BITS) - 1
    bands = base.select(
        "id",
        "h",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("bi"),
                        F.expr(f"(h >> {BAND_BITS * i}) & {mask}").alias("bv"),
                    )
                    for i in range(N_BANDS)
                ]
            )
        ).alias("b"),
    ).select("id", "h", F.col("b.bi").alias("bi"), F.col("b.bv").alias("bv"))
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.bi") == F.col("b.bi"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.h").alias("ha"),
            F.col("b.h").alias("hb"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (
        cand.select("id_a", "id_b", ham.alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
        .orderBy("id_a", "id_b")
    )
