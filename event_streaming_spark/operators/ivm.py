"""Incremental view maintenance from a change feed.

A 100 TB base table with a small daily delta should never recompute its
aggregates from scratch: for any monoid-with-inverse aggregate (count,
sum — the "abelian group" aggregates), the new view is

    view' = view ⊕ agg(inserts) ⊖ agg(deletes)

computed from the CHANGE FEED alone — cost scales with the delta, not
the base.  Pairs with ``sources/versioned.py::table_changes`` (the feed)
and complements ``operators/rollup.py`` (partial-aggregate monoids for
append-only rollups): this handles the DELETE/UPDATE case rollups
can't.

Min/max are NOT invertible (a deleted max needs a rescan of its group);
``apply_group_delta`` therefore handles the group-sum/count family and
callers needing min/max fall back to recompute for affected groups —
the same boundary Materialize/DBSP draw.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def count_sum_view(base: DataFrame, keys: list[str], sum_col: str | None = None) -> DataFrame:
    """The maintained view: per-key count (and optional long-sum)."""
    aggs = [F.count(F.lit(1)).alias("n")]
    if sum_col is not None:
        aggs.append(F.sum(F.col(sum_col).cast("long")).alias("s"))
    return base.groupBy(*keys).agg(*aggs)


def apply_group_delta(
    view: DataFrame,
    changes: DataFrame,
    keys: list[str],
    sum_col: str | None = None,
    sign_col: str | None = None,
) -> DataFrame:
    """``view' = view + Δ`` where Δ comes from a ``_change``-tagged feed
    (``insert`` rows add, ``delete`` rows subtract).  One aggregate over
    the DELTA plus one outer join on the view's own keys; groups whose
    count reaches zero drop out.  Never touches the base table.

    ``sign_col`` names an INTEGER signed-multiplicity column carried on
    ``changes`` — the general bag-algebra form (DBSP-style Z-sets): a row
    contributes ``sign × 1`` to the count and ``sign × value`` to the
    sum.  Join-delta terms (ΔE ⋈ ΔC) produce their sign as the PRODUCT
    of the two feeds' signs; carrying that product as a multiplicity —
    instead of collapsing it back to an insert/delete label — keeps the
    algebra explicit, so same-key updates on BOTH sides of a join in one
    epoch net out by arithmetic, not by fixture disjointness."""
    sign = (
        F.col(sign_col).cast("long")
        if sign_col is not None
        else F.when(F.col("_change") == "insert", F.lit(1)).otherwise(F.lit(-1))
    )
    aggs = [F.sum(sign).alias("dn")]
    if sum_col is not None:
        aggs.append(F.sum(sign * F.col(sum_col).cast("long")).alias("ds"))
    delta = changes.groupBy(*keys).agg(*aggs)
    joined = view.join(delta, keys, "full_outer")
    out_cols = [*keys, (F.coalesce("n", F.lit(0)) + F.coalesce("dn", F.lit(0))).alias("n")]
    if sum_col is not None:
        out_cols.append(
            (F.coalesce("s", F.lit(0)) + F.coalesce("ds", F.lit(0))).alias("s")
        )
    return joined.select(*out_cols).where(F.col("n") > 0)
