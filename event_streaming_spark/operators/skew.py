"""Skew-handling operators: salted aggregation and salted join.

At 100 TB a handful of hot keys (one celebrity user, one default
event_type) can put an entire shuffle partition on one executor.  Two
mitigations, composable with everything else in the engine:

1. AQE skew-join splitting — enabled session-wide
   (session.py: spark.sql.adaptive.skewJoin.enabled) — handles join-side
   skew transparently by splitting oversized partitions.
2. Explicit salting (this module) — for aggregations (AQE does not split
   skewed AGG partitions) and for deterministic two-stage rollups:
   - `salted_agg`: groupBy(key, salt) partial → groupBy(key) final.
     Works for any algebraic aggregate expressed as (partial, final)
     column pairs.
   - `salted_broadcast_left`: replicate the small side per salt so a hot
     build key spreads across `n_salts` reducers.

Salting preserves exact results: the decomposition sum∘sum, count∘sum,
min∘min, max∘max is exact, and the engine's fixed-point sums
(functions/numeric.py) make even double sums order-independent.

Measured honesty note (local[32], 1M rows, 90% on one key): for
ALGEBRAIC aggregates, plain groupBy beat salted_agg (0.54s vs 0.98s) —
Spark's map-side partial aggregation already collapses the hot key to
one row per mapper, so the extra salt shuffle is pure overhead.  Salting
earns its cost only where partial aggregation cannot compress:
collect_list/collect_set state, exact distinct over high-cardinality
values at extreme per-key volume, and skewed JOINS beyond what AQE's
skew-split handles.  Reach for (in order): partial agg (free) → AQE skew
join (on by default here) → explicit salting (this module).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int = 16, col_name: str = "__salt") -> DataFrame:
    """Uniform per-row salt in [0, n_salts): ``monotonically_increasing_id()
    % n_salts`` — consecutive ids within each partition round-robin the
    salt values, which is exactly the load-spreading property needed (the
    salt needs uniformity, not hash-mixing or cross-run reproducibility)."""
    return df.withColumn(
        col_name, (F.monotonically_increasing_id() % n_salts).cast("int")
    )


def salted_agg(
    df: DataFrame,
    keys: list[str],
    partials: dict[str, tuple[Column, Column]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage skew-safe aggregation.

    ``partials`` maps output column name → (stage1_agg_expr,
    stage2_agg_expr-over-stage1).  Example::

        salted_agg(events, ["event_type"], {
            "n":     (F.count(F.lit(1)),               F.sum("n")),
            "total": (exact-partial-sum-col,           F.sum("total")),
        })

    Stage 1 shuffles on (key, salt) — a hot key spreads over n_salts
    reducers; stage 2 shuffles n_salts rows per key.
    """
    salted = with_salt(df, n_salts)
    stage1 = salted.groupBy(*keys, "__salt").agg(
        *[expr.alias(name) for name, (expr, _) in partials.items()]
    )
    stage2 = stage1.groupBy(*keys).agg(
        *[final.alias(name) for name, (_, final) in partials.items()]
    )
    return stage2


def salted_broadcast_left(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the big side, replicate the small side
    once per salt value, join on (key, salt).  The hot key's rows land on
    n_salts different reducers instead of one.

    (When `small` is broadcastable this is moot — Spark broadcasts and no
    shuffle exists; this operator is for the medium-small side that does
    not fit the broadcast threshold.)

    Only joins that never EMIT unmatched small-side rows are supported:
    the small side is replicated once per salt, so a right/full outer
    join would emit each unmatched small-side key n_salts times (r6
    review)."""
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti"):
        raise ValueError(
            f"salted_broadcast_left: how={how!r} would duplicate unmatched "
            "small-side rows once per salt; use inner/left/semi/anti"
        )
    big_s = with_salt(big, n_salts)
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("__salt")
    small_r = small.select("*", salts)
    out = big_s.join(small_r, [on, "__salt"], how)
    return out.drop("__salt")
