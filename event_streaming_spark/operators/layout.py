"""Data-layout operators: Z-order (Morton) clustering keys.

Why: parquet pruning is only as good as the correlation between file/
row-group boundaries and the query's predicate columns.  Sorting 100 TB
by ONE column gives perfect min/max stats on that column and useless
stats on every other; a Z-order key interleaves the bits of several
columns so a range-partitioned sort on the single key yields files whose
min/max envelopes are TIGHT on all interleaved dimensions at once —
multi-dimensional pruning from one linear sort (the technique behind
Delta/Iceberg OPTIMIZE ZORDER BY).

The interleave is pure integer bit arithmetic (`<<`, `>>`, `&`, `|`),
which Spark SQL (4.x operators) and DuckDB share verbatim — so ONE
generated SQL fragment drives both the engine plan and the oracle, the
same one-definition-two-engines discipline as functions/hashing.py.

Scale shape: the key itself is a stateless per-row projection (codegen,
zero shuffle).  Clustering a table is `repartitionByRange(zkey)` +
`sortWithinPartitions(zkey)` — exactly one range shuffle, the same cost
as any global sort, paid once at write time and amortized over every
pruned read after.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sql_zorder_key(cols: list[str], bits_per_col: int = 16) -> str:
    """SQL fragment interleaving ``bits_per_col`` low bits of each column.

    Round-robin bit interleave: output bit ``i*ncols + j`` is bit ``i``
    of ``cols[ncols-1-j]`` — column 0 holds the most significant bit of
    each round, so it is the primary sort dimension among equals.
    Columns must already be non-negative integers in [0, 2^bits_per_col);
    callers clamp/scale (e.g. ``user_id % 65536``).  Total bits must fit
    a signed 64-bit int: ``ncols * bits_per_col <= 62``.
    """
    n = len(cols)
    if n * bits_per_col > 62:
        raise ValueError(f"{n} cols × {bits_per_col} bits exceeds int64")
    terms = []
    for i in range(bits_per_col):
        for j, c in enumerate(cols):
            out_bit = i * n + (n - 1 - j)
            terms.append(f"((({c} >> {i}) & 1) << {out_bit})")
    return "(" + " | ".join(terms) + ")"


def zorder_key(cols: list[str], bits_per_col: int = 16) -> Column:
    """The same interleave as a Spark Column (via the shared fragment)."""
    return F.expr(sql_zorder_key(cols, bits_per_col))


def cluster_by_zorder(
    df: DataFrame,
    cols: list[str],
    bits_per_col: int = 16,
    num_files: int | None = None,
) -> DataFrame:
    """Return ``df`` range-clustered on the Z-order key of ``cols``.

    Write the result with ``.write.parquet(...)`` to get files whose
    per-file min/max stats are tight on EVERY column in ``cols`` —
    verified by tests/test_scale_ops.py, which reads the parquet footers
    and shows the per-file bounding boxes shrink vs an unclustered
    write.  ``num_files`` overrides the range partition count (defaults
    to the session's shuffle partitions).
    """
    key = zorder_key(cols, bits_per_col).alias("__zkey")
    out = df.withColumn("__zkey", key)
    parts = num_files or out.sparkSession.conf.get("spark.sql.shuffle.partitions")
    out = out.repartitionByRange(int(parts), "__zkey").sortWithinPartitions("__zkey")
    return out.drop("__zkey")
