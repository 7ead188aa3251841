"""Join operators Spark lacks natively: as-of join and big-big range join.

As-of join (SURVEY §2.4 "as-of / interval join"): for each left row, the
most recent right row with ``right.on <= left.on`` within the same ``by``
key (backward direction; e.g. events ↔ latest dimension version, trade ↔
last quote).

Two implementations, chosen by shape:

- :func:`asof_join` — the UNION-AND-CARRY plan: tag both sides, union,
  one window pass per ``by`` key carrying the last right payload forward,
  keep left rows.  ONE shuffle on the by-key, no range explosion, fully
  JVM-side.  This is the 100 TB path: cost ≈ sort-within-partitions of
  (|L|+|R|), the same as any keyed window.
- :func:`asof_join_pandas` — per-key ``pd.merge_asof`` via applyInPandas,
  for when a `tolerance` bound is needed.  Arrow-batched; use when
  tolerance semantics matter more than raw throughput.

Big-big range join: :func:`bucketed_range_join` — bucketize the range key
to a coarse granule, equi-join on (by, granule), residual-filter the
exact predicate.  Turns BroadcastNestedLoop into a hash join when BOTH
sides are large; granule size trades duplication factor vs selectivity.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str],
    value_cols: list[str],
    strict: bool = False,
    tie_cols: list[str] | None = None,
) -> DataFrame:
    """Backward as-of join, union-and-carry plan (see module doc).

    strict=False: right rows at the same ``on`` instant are visible
    (<=); strict=True: only strictly earlier rows (<).

    When several right rows share the same ``on`` value within a key, the
    carried winner is the greatest by ``tie_cols`` (default: all
    ``value_cols``, ascending, nulls first) — a total, deterministic
    order, so the result is stable across runs and partitionings instead
    of depending on physical row order.  ``tie_cols`` must be a subset of
    ``value_cols``.
    """
    tie_cols = value_cols if tie_cols is None else tie_cols
    unknown = set(tie_cols) - set(value_cols)
    if unknown:
        raise ValueError(f"tie_cols must be a subset of value_cols; unknown: {sorted(unknown)}")
    # side ordering at equal `on`: right first (inclusive) or left first
    right_side, left_side = (0, 1) if not strict else (1, 0)
    lcols = [c for c in left.columns]
    rv_type = "struct<" + ", ".join(
        f"{c}: {dict(right.dtypes)[c]}" for c in value_cols
    ) + ">"
    l_tagged = left.select(
        *by,
        F.col(on).alias("__on"),
        F.lit(left_side).alias("__side"),
        F.struct(*lcols).alias("__left"),
        F.lit(None).cast(rv_type).alias("__rv"),
    )
    # Right rows with a NULL `on` are DROPPED: NULL would sort before
    # every timestamp and match every left row as if infinitely old
    # (pd.merge_asof rejects null merge keys outright) — r6 review.
    r_tagged = right.filter(F.col(on).isNotNull()).select(
        *by,
        F.col(on).alias("__on"),
        F.lit(right_side).alias("__side"),
        F.lit(None).cast(l_tagged.schema["__left"].dataType).alias("__left"),
        F.struct(*[F.col(c) for c in value_cols]).alias("__rv"),
    )
    unioned = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy(*by)
        .orderBy(
            "__on",
            "__side",
            *[F.asc_nulls_first(F.col(f"__rv.{c}")) for c in tie_cols],
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # ONE struct carry: the matched right row's values travel together,
    # exactly like pd.merge_asof.  (Per-column last(ignorenulls) carried
    # each value independently, so a NULL in the latest right row
    # resurrected a stale value from an OLDER row — a mixed-row result no
    # single right row ever contained; r6 review.)  Left rows carry a
    # NULL struct, so ignorenulls skips them while a right row whose
    # FIELDS are null still registers as the latest match.
    carried = unioned.select(
        "__side",
        "__left",
        F.last("__rv", ignorenulls=True).over(w).alias("__carried"),
    )
    out = carried.filter(F.col("__side") == left_side).select(
        *[F.col(f"__left.{c}").alias(c) for c in lcols],
        *[F.col(f"__carried.{c}").alias(c) for c in value_cols],
    )
    return out


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str],
    value_cols: list[str],
    tolerance: pd.Timedelta | None = None,
) -> DataFrame:
    """Per-key ``pd.merge_asof`` (backward, inclusive) with optional
    tolerance — Arrow-batched cogroup, one shuffle per side on the key."""
    out_schema = T.StructType(
        list(left.schema.fields) + [right.schema[c] for c in value_cols]
    )

    def merge(l_pdf: pd.DataFrame, r_pdf: pd.DataFrame) -> pd.DataFrame:
        l_pdf = l_pdf.sort_values(on, kind="stable")
        r_pdf = r_pdf.sort_values(on, kind="stable")[[on, *value_cols]]
        merged = pd.merge_asof(
            l_pdf, r_pdf, on=on, direction="backward", tolerance=tolerance,
            suffixes=("", "__r"),
        )
        # merge_asof suffixes collisions; realign to expected output names
        for c in value_cols:
            if f"{c}__r" in merged.columns:
                merged[c] = merged[f"{c}__r"]
                merged = merged.drop(columns=[f"{c}__r"])
        return merged[[f.name for f in out_schema.fields]]

    return (
        left.groupBy(*by)
        .cogroup(right.groupBy(*by))
        .applyInPandas(lambda lk, rk: merge(lk, rk), out_schema)
    )


_GRANULE_SECONDS = {"second": 1, "minute": 60, "hour": 3600, "day": 86400, "week": 604800}


def _granule_seconds(granule: str) -> int:
    """Parse "N unit" (e.g. "1 day", "6 hours", "90 seconds") to seconds."""
    parts = granule.strip().lower().split()
    if len(parts) == 1:
        count, unit = 1, parts[0]
    elif len(parts) == 2:
        count, unit = int(parts[0]), parts[1]
    else:
        raise ValueError(f"bad granule: {granule!r}")
    unit = unit.rstrip("s")
    if unit not in _GRANULE_SECONDS or count <= 0:
        raise ValueError(f"bad granule: {granule!r} (units: {sorted(_GRANULE_SECONDS)})")
    return count * _GRANULE_SECONDS[unit]


def bucketed_range_join(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_start: str,
    right_end: str,
    granule: str = "1 day",
    by: list[str] | None = None,
) -> DataFrame:
    """Big-big interval join: explode each right interval into the coarse
    granules it covers, equi-join left points to their granule, then apply
    the exact residual predicate.  Shuffle is hash on (by, granule) —
    no nested loop.  Duplication factor = avg interval length / granule,
    so the granule is the scale knob: pick it near the typical interval
    length (``"N seconds|minutes|hours|days|weeks"``)."""
    by = by or []
    g = F.lit(_granule_seconds(granule))
    lg = left.withColumn("__g", (F.unix_timestamp(F.col(left_point)) / g).cast("long"))
    rg = right.withColumn(
        "__gs",
        F.sequence(
            (F.unix_timestamp(F.col(right_start)) / g).cast("long"),
            (F.unix_timestamp(F.col(right_end)) / g).cast("long"),
        ),
    ).withColumn("__g", F.explode("__gs")).drop("__gs")
    cond = [lg["__g"] == rg["__g"]] + [lg[c] == rg[c] for c in by]
    joined = lg.join(rg, cond).filter(
        (lg[left_point] >= rg[right_start]) & (lg[left_point] < rg[right_end])
    )
    return joined.drop("__g")


def triangle_self_pair_join(
    df: DataFrame,
    id_col: str,
    block_cols: list[str] | None = None,
    n_buckets: int = 8,
) -> DataFrame:
    """All unordered within-block pairs of a table, with parallelism
    INSIDE each block — the scalable form of the quadratic self-join.

    The naive ``a JOIN b ON a.block = b.block AND a.id < b.id`` shuffles
    on the block key alone, so a block's entire (n/blocks)² pair space
    lands on ONE task; with few blocks (10 labels, 20 sources) the whole
    cluster idles behind a handful of straggler tasks.  Measured here: at
    a 10× corpus the label-blocked cosine pair join pinned one core for
    >10 minutes while 31 sat idle.

    Triangle bucketing fixes the shape: hash each row into one of B
    buckets, replicate the left side to cells (ba, bb) for bb ∈ [ba, B)
    and the right side to cells (ba, bb) for ba ∈ [0, bb], and equi-join
    on (block, ba, bb).  Every unordered pair meets in exactly one cell —
    off-diagonal cells via the orientation whose buckets are ordered,
    diagonal cells deduplicated by the id order — so each block's pair
    space splits into B(B+1)/2 independently-scheduled cells for a ~B/2×
    row-replication cost.  B is the scale knob: pick B ≈ sqrt(desired
    tasks per block); replication stays linear while parallelism grows
    quadratically.

    Returns the join of ``df`` aliased ``a`` × ``b``; select through the
    aliases, and emit ids as least/greatest — off-diagonal orientation
    does NOT guarantee ``a.id < b.id``.  Only symmetric pair measures
    (cosine, jaccard, hamming) should be computed from the two sides.
    """
    from event_streaming_spark.plans.catalog import spread

    block_cols = block_cols or []
    bkt = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_buckets)).cast("int")
    # Both replicated sides shuffle into the (block, cell) equi-join —
    # ~B/2× the input volume through the exchange (the comment used to
    # claim a broadcast that was never hinted; r6 review).  The cell
    # split's value is PARALLELISM, not shuffle avoidance: each block's
    # pair space becomes B(B+1)/2 independently-scheduled cells.  A
    # parallelism-deficient scan (single-file fixture) must be rebalanced
    # here or every cell still executes in the scan's one task; on a
    # real deployment the scan is already parallel and spread() is a
    # pass-through.
    a = (
        spread(df.withColumn("__ba", bkt))
        .withColumn("__bb", F.explode(F.sequence(F.col("__ba"), F.lit(n_buckets - 1))))
        .alias("a")
    )
    b = (
        df.withColumn("__bb", bkt)
        .withColumn("__ba", F.explode(F.sequence(F.lit(0), F.col("__bb"))))
        .alias("b")
    )
    cond = (F.col("a.__ba") == F.col("b.__ba")) & (F.col("a.__bb") == F.col("b.__bb"))
    for c in block_cols:
        cond &= F.col(f"a.{c}") == F.col(f"b.{c}")
    cond &= (F.col("a.__ba") < F.col("a.__bb")) | (
        F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    )
    return a.join(b, cond)


def bloom_semi_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
    exact: bool = True,
) -> DataFrame:
    """Semi join with a Bloom-filter pre-filter on the probe side.

    The scale problem: ``probe SEMI JOIN build`` shuffles the ENTIRE
    probe side on the key even when only a sliver of it survives.  At
    100 TB the shuffle of the 99% that will be discarded dominates the
    job.  A Bloom filter of the build keys, applied map-side before the
    exchange, drops non-matching rows at scan speed, so only candidate
    rows (matches + the false-positive sliver) ever reach the shuffle —
    the same idea as Spark's runtime bloom-filter injection
    (spark.sql.optimizer.runtime.bloomFilter.*), but as an explicit
    operator with a chosen size.

    Build: the distinct build keys fan out to ``num_hashes`` bit
    positions (xxhash64 seeded by the probe index), folded into
    ``num_bits/64`` words with bit_or — a bounded aggregate whose result
    (128 KiB at the 2²⁰ default) collects to the driver and re-enters
    the plan as ONE array<long> literal, independent of build-side row
    count.  Probe: each row tests its k bits with element_at + bitwise
    AND — pure JVM expressions inside whole-stage codegen, evaluated at
    the scan before any exchange.

    ``exact=True`` (default) follows with the real semi join over the
    thinned probe side, so false positives are removed and the result is
    EXACTLY the semi join (the oracle is the plain SQL semi join).
    ``exact=False`` returns the filtered superset (sized by the false
    positive rate ≈ (1-e^{-kn/m})^k) for pipelines that tolerate it.

    Sizing: for n build keys, m = num_bits ≥ 10n gives fpp < 1% at k=5.
    The driver collect is O(m) — size m for the key cardinality, never
    for probe volume.
    """
    if num_bits % 64:
        # a ragged final word would map positions past the array end
        # (NULL under ANSI element_at → silent false negatives)
        raise ValueError(f"num_bits must be a multiple of 64, got {num_bits}")
    words = num_bits // 64
    keyc = F.col(key)

    # xxhash64 is type-sensitive (int 5, bigint 5 and '5' all hash
    # differently), so a probe/build dtype mismatch would set one bit
    # pattern and test another — silent false NEGATIVES that the exact
    # backstop cannot recover (the rows were filtered before it).
    # Integral keys canonicalize to long on BOTH sides; any other
    # mismatch is refused rather than silently dropping matches.
    from pyspark.sql import types as T

    integral = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    pt = probe.schema[key].dataType
    bt = build.schema[key].dataType
    if isinstance(pt, integral) and isinstance(bt, integral):
        def canon(c):
            return c.cast("long")
    elif pt == bt:
        def canon(c):
            return c
    else:
        raise ValueError(
            f"bloom_semi_join key dtype mismatch: probe {pt} vs build {bt}; "
            "cast the key to a common type before calling"
        )

    def positions(c):
        return [
            F.pmod(F.xxhash64(F.lit(i), canon(c)), F.lit(num_bits))
            for i in range(num_hashes)
        ]

    keys = build.select(keyc.alias("__k")).distinct()
    bits = (
        keys.select(
            F.explode(F.array(*positions(F.col("__k")))).alias("__pos")
        )
        .select(
            (F.col("__pos") / 64).cast("int").alias("__w"),
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), (F.col("__pos") % 64).cast("int")
            ).alias("__b"),
        )
        .groupBy("__w")
        .agg(F.bit_or("__b").alias("__bits"))
        .collect()
    )
    dense = [0] * words
    for row in bits:
        dense[row["__w"]] = row["__bits"]
    # The bitmap re-enters the plan as ONE array VALUE via a broadcast
    # single-row cross join — not as F.lit(list), which PySpark expands
    # into a per-element literal tree (16k expression nodes at the 2²⁰
    # default: measured 10s+ of analyzer/codegen time).
    from pyspark.sql import types as T

    from event_streaming_spark.functions.localframe import local_frame

    # local_frame (Arrow→JVM): the bitmap row re-evaluates with every
    # probe-side consumer; the pickle path would add a Python worker
    # round-trip per evaluation (guide §4).
    bitmap = local_frame(
        probe.sparkSession,
        [(dense,)],
        T.StructType([T.StructField("__bloom", T.ArrayType(T.LongType()))]),
    )
    arr = F.col("__bloom")

    cond = F.lit(True)
    for pos in positions(keyc):
        word = F.element_at(arr, (pos / 64).cast("int") + 1)
        bit = F.call_function("shiftleft", F.lit(1).cast("long"), (pos % 64).cast("int"))
        cond = cond & (word.bitwiseAND(bit) != 0)
    thinned = probe.crossJoin(F.broadcast(bitmap)).where(cond).drop("__bloom")
    if not exact:
        return thinned
    return thinned.join(keys.withColumnRenamed("__k", key), key, "left_semi")


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str],
    value_cols: list[str],
    tie_cols: list[str] | None = None,
    gap_col: str = "asof_gap",
) -> DataFrame:
    """NEAREST as-of join (pandas ``merge_asof(direction='nearest')``):
    match each left row to the right row whose ``on`` is closest in
    absolute distance, inclusive in both directions; an exact distance
    tie between an earlier and a later right row resolves BACKWARD (the
    earlier row).

    ``on`` must be NUMERIC (convert timestamps with ``unix_micros``
    first) — the gap arithmetic and the output ``gap_col``
    (``matched_on − left_on``: negative = matched earlier) need a
    subtractable key.

    Same union-and-carry shape as :func:`asof_join`, run in BOTH
    directions: one backward pass (right rows sort before left at equal
    ``on``; ``last`` carries the latest right struct) and one forward
    pass (right rows sort after left; ``first`` grabs the next right
    struct), then a per-row choice by absolute gap.  Among several
    right rows at the SAME matched instant the backward leg picks the
    GREATEST ``tie_cols`` and the forward leg the LEAST (each leg's
    deterministic carry order) — a total order either way.
    Cost: two keyed window sorts of left+right — no range join, no
    per-row probe.
    """
    tie_cols = value_cols if tie_cols is None else tie_cols
    unknown = set(tie_cols) - set(value_cols)
    if unknown:
        raise ValueError(f"tie_cols must be a subset of value_cols; unknown: {sorted(unknown)}")
    lcols = [c for c in left.columns]
    rtypes = dict(right.dtypes)
    # __ron is filled from RIGHT's `on`; the left rows' NULL struct must
    # cast to that same type or the union fails on mixed key widths.
    rv_type = (
        "struct<__ron: " + rtypes[on] + ", "
        + ", ".join(f"{c}: {rtypes[c]}" for c in value_cols) + ">"
    )
    l_tagged = left.select(
        *by,
        F.col(on).alias("__on"),
        F.lit(1).alias("__side"),  # backward: right(0) first at equal on
        F.struct(*lcols).alias("__left"),
        F.lit(None).cast(rv_type).alias("__rv"),
    )
    r_tagged = right.filter(F.col(on).isNotNull()).select(
        *by,
        F.col(on).alias("__on"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(l_tagged.schema["__left"].dataType).alias("__left"),
        F.struct(F.col(on).alias("__ron"), *[F.col(c) for c in value_cols]).alias("__rv"),
    )
    unioned = l_tagged.unionByName(r_tagged)
    ties_asc = [F.asc_nulls_first(F.col(f"__rv.{c}")) for c in tie_cols]
    wb = (
        Window.partitionBy(*by)
        .orderBy("__on", "__side", *ties_asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # forward: left (__side=1) must sort BEFORE right (0) at equal __on
    # so the frame starting at the left row still sees the equal-instant
    # right row → order __side DESCENDING in the forward pass.
    wf = (
        Window.partitionBy(*by)
        .orderBy("__on", F.desc("__side"), *ties_asc)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    carried = unioned.select(
        "__side",
        "__on",
        "__left",
        F.last("__rv", ignorenulls=True).over(wb).alias("__b"),
        F.first("__rv", ignorenulls=True).over(wf).alias("__f"),
    ).filter(F.col("__side") == 1)
    b, f = F.col("__b"), F.col("__f")
    bgap = F.col("__on") - b["__ron"]          # ≥ 0
    fgap = f["__ron"] - F.col("__on")          # ≥ 0
    take_b = b.isNotNull() & (f.isNull() | (bgap <= fgap))
    chosen = F.when(take_b, b).otherwise(f)
    return carried.select(
        *[F.col(f"__left.{c}").alias(c) for c in lcols],
        *[chosen[c].alias(c) for c in value_cols],
        (chosen["__ron"] - F.col("__on")).cast("long").alias(gap_col),
    )
