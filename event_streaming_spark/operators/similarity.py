"""Near-duplicate detection and similarity search (SURVEY §2.5).

Operators
  - MinHash signatures + LSH banding (Jaccard near-dup at scale):
    shingle→hash→k permutations→band→bucket-join.  The band join is the
    100 TB path: candidate generation is an equi-join on (band, band_hash)
    — never an O(n²) cross join.
  - Exact n-gram Jaccard verification for candidate pairs.
  - Brute-force cosine top-k (the correctness baseline) with the query
    side broadcast so the big side streams through one scan.
  - Random-hyperplane (SimHash-style) LSH bucketing for embeddings — the
    approximate scale path.

Determinism contract: every hash/permutation/hyperplane constant is
derived from md5 in Python at import time and embedded as literals into
BOTH the Spark plan and the generated oracle SQL, so engine and oracle
share one definition.  All floating reductions are either exact-decimal
or rounded at 6dp after a deterministic fold (see functions/numeric.py).

MLlib's MinHashLSH/BucketedRandomProjectionLSH offer the same surface but
seed their hash families JVM-side, which a cross-engine oracle can't
replay — hence this explicit, equally-shuffled formulation.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from event_streaming_spark.functions.hashing import (
    shingles,
    sql_stable_hash32,
    stable_hash32,
)

#: Mersenne prime 2^31-1: keeps a*h+b within int64 for h,a < 2^31.
MINHASH_P = 2147483647
MINHASH_K = 16          #: permutations
LSH_BANDS = 4           #: bands of MINHASH_K // LSH_BANDS rows each
HYPERPLANES = 8         #: random-projection planes → 2^8 buckets
EMBED_DIM = 64


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


MINHASH_A = [(_h32(f"minhash-a{i}") % (MINHASH_P - 2)) + 1 for i in range(MINHASH_K)]
MINHASH_B = [_h32(f"minhash-b{i}") % MINHASH_P for i in range(MINHASH_K)]

#: hyperplane components in [-1, 1), row-major [plane][dim]
HYPERPLANE = [
    [(_h32(f"hp{j}:{d}") / 2**31) - 1.0 for d in range(EMBED_DIM)]
    for j in range(HYPERPLANES)
]


# -- MinHash ------------------------------------------------------------------

def shingle_hashes(text: Column, k: int = 3) -> Column:
    """array<long> of stable 32-bit hashes of distinct k-token shingles."""
    return F.transform(shingles(text, k), stable_hash32)


def sql_shingle_hashes(expr: str, k: int = 3) -> str:
    """DuckDB twin of :func:`shingle_hashes` (1-indexed inclusive slices)."""
    from event_streaming_spark.functions.hashing import sql_normalize_text

    toks = f"string_split({sql_normalize_text(expr)}, ' ')"
    sh = (
        f"list_distinct(list_transform(generate_series(1, greatest(len({toks}) - {k - 1}, 0)),"
        f" i -> array_to_string(({toks})[i:i+{k - 1}], ' ')))"
    )
    return f"list_transform({sh}, s -> {sql_stable_hash32('s')})"


def _permute(a: int, b: int):
    # closure (not default-args) — PySpark reads lambda arity via signature
    return lambda h: (F.lit(a) * (h % MINHASH_P) + F.lit(b)) % MINHASH_P


def minhash_cols(hashes: Column) -> list[Column]:
    """MINHASH_K min-under-permutation values for one shingle-hash array."""
    return [
        F.array_min(F.transform(hashes, _permute(MINHASH_A[i], MINHASH_B[i]))).alias(f"mh{i:02d}")
        for i in range(MINHASH_K)
    ]


def sql_minhash_exprs(hs_col: str) -> list[str]:
    return [
        f"list_min(list_transform({hs_col},"
        f" h -> ({MINHASH_A[i]} * (h % {MINHASH_P}) + {MINHASH_B[i]}) % {MINHASH_P}))"
        f" AS mh{i:02d}"
        for i in range(MINHASH_K)
    ]


def band_hashes_over(sig: Column) -> list[Column]:
    """LSH band hashes over a signature ARRAY column (md5 of the band's
    comma-joined members — same definition as :func:`sql_band_hash_exprs`).

    NULL-STRICT like the SQL twin: a NULL signature component (a doc too
    short to shingle) makes the band hash NULL, which never equi-joins —
    so shingle-less docs are never LSH candidates on either engine.  The
    old ``concat_ws`` SKIPPED NULLs, hashing every short doc into one
    shared bucket while DuckDB's ``||`` propagated NULL: divergent
    candidate sets (r6 review)."""
    rows = MINHASH_K // LSH_BANDS
    out = []
    for j in range(LSH_BANDS):
        parts: list[Column] = []
        for i in range(j * rows, (j + 1) * rows):
            if parts:
                parts.append(F.lit(","))
            parts.append(sig[i].cast("string"))
        out.append(F.md5(F.concat(*parts)))  # concat is NULL-strict
    return out


def minhash_est_jaccard_arrays(sig_a: Column, sig_b: Column) -> Column:
    """Fraction of equal components between two signature arrays."""
    eq = F.filter(F.zip_with(sig_a, sig_b, lambda x, y: x == y), lambda b: b)
    return F.round(F.size(eq).cast("double") / MINHASH_K, 6)


def sql_band_hash_exprs() -> list[str]:
    rows = MINHASH_K // LSH_BANDS
    out = []
    for j in range(LSH_BANDS):
        members = " || ',' || ".join(
            f"cast(mh{i:02d} as varchar)" for i in range(j * rows, (j + 1) * rows)
        )
        out.append(f"md5({members}) AS band{j}")
    return out


# -- embeddings ---------------------------------------------------------------

def hyperplane_bucket(vec: Column) -> Column:
    """Random-projection LSH bucket id in [0, 2^HYPERPLANES): bit j set iff
    dot(vec, plane_j) >= 0.  Deterministic left-to-right double fold."""
    bucket = F.lit(0)
    for j in range(HYPERPLANES):
        plane = F.array(*[F.lit(v) for v in HYPERPLANE[j]])
        d = F.aggregate(
            F.zip_with(vec, plane, lambda x, p: x.cast("double") * p),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(d >= 0, F.lit(1 << j)).otherwise(F.lit(0))
    return bucket


def sql_hyperplane_bucket(vec_expr: str) -> str:
    terms = []
    for j in range(HYPERPLANES):
        plane = "[" + ", ".join(repr(v) for v in HYPERPLANE[j]) + "]"
        d = f"list_dot_product({vec_expr}::DOUBLE[], {plane}::DOUBLE[])"
        terms.append(f"(CASE WHEN {d} >= 0 THEN {1 << j} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"
