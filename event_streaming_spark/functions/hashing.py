"""Deterministic, cross-engine string hashing + shingling.

The LLM-pipeline dedup operators (MinHash/SimHash/Jaccard) need a hash
that (a) runs JVM-side in Spark, (b) is reproducible by the ANSI-SQL
oracle, and (c) is stable across runs/engines.  Spark's ``hash()`` is
Murmur3 with engine-specific seeds; DuckDB's ``hash()`` is different
again.  Both engines agree on ``md5`` hex, so we define:

    stable_hash32(s) = int(md5(s)[0:8], 16)        # uniform in [0, 2^32)

Spark:  ``conv(substring(md5(s),1,8),16,10)::long``
DuckDB: ``('0x' || substr(md5(s),1,8))::bigint``

md5-per-token is ~100ns/op JVM-side — fine even at 100 TB scale where the
shingle hash is a map-side projection that pipelines into the scan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def stable_hash32(c: Column) -> Column:
    """First 8 hex digits of md5 as a non-negative bigint (see module doc)."""
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")


def sql_stable_hash32(expr: str) -> str:
    """DuckDB fragment identical to :func:`stable_hash32`."""
    return f"cast(('0x' || substr(md5({expr}), 1, 8)) as bigint)"


def normalize_text(c: Column) -> Column:
    """Canonical text form for fingerprinting: lowercase, collapse runs of
    whitespace, trim (reference trim macros: /root/reference/utils/utils.h:44-53)."""
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def sql_normalize_text(expr: str) -> str:
    return f"trim(regexp_replace(lower({expr}), '\\s+', ' ', 'g'))"


def tokens(c: Column) -> Column:
    """Whitespace tokens of normalized text → array<string>."""
    return F.split(normalize_text(c), " ")


def shingles(c: Column, k: int = 3) -> Column:
    """Distinct k-token shingles of a text column → array<string>.

    Built from JVM-side array functions only: tokenize, then for each
    position i emit tokens[i..i+k) joined by a space; drop the ragged
    tail; dedupe.  ``transform`` + ``slice`` keeps this inside codegen.

    Documents with fewer than k tokens yield an EMPTY array — the same
    semantics as the DuckDB twin's ``generate_series(1, 0) = []``.  (The
    old ``sequence(1, greatest(n-k+1, 0))`` relied on Spark's implicit
    step, which is -1 for a descending range: it produced [1, 0] and the
    ``slice(toks, 0, k)`` call crashed the whole job on the first short
    document — r6 review.)
    """
    toks = tokens(c)
    n = F.size(toks)
    idx = F.sequence(F.lit(1), n - (k - 1), F.lit(1))
    sh = F.array_distinct(
        F.transform(idx, lambda i: F.array_join(F.slice(toks, i, k), " "))
    )
    # NULL text propagates NULL (not []) — the DuckDB twin's
    # string_split(NULL) → generate_series(1, NULL) yields NULL, and
    # size(NULL) = -1 would otherwise fall into the empty-array branch,
    # silently diverging for any consumer of the raw shingle array
    # (r6 review).  Band hashes were already NULL on both engines.
    return (
        F.when(c.isNull(), F.lit(None).cast("array<string>"))
        .when(n >= k, sh)
        .otherwise(F.array().cast("array<string>"))
    )


def stable_hash_bits(c: Column, bits: int) -> Column:
    """First ``bits/4`` hex digits of md5 as a non-negative bigint —
    uniform on [0, 2^bits).  ``bits`` must be a multiple of 4 and ≤ 60
    (signed-long headroom)."""
    assert bits % 4 == 0 and bits <= 60
    return F.conv(F.substring(F.md5(c), 1, bits // 4), 16, 10).cast("long")


def sql_stable_hash_bits(expr: str, bits: int) -> str:
    """DuckDB fragment identical to :func:`stable_hash_bits`."""
    assert bits % 4 == 0 and bits <= 60
    return f"cast(('0x' || substr(md5({expr}), 1, {bits // 4})) as bigint)"
