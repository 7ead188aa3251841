"""As-of join operators: union-and-carry vs merge_asof vs the oracle query;
bucketed big-big range join vs broadcast nested-loop reference."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from event_streaming_spark.operators.joins import (
    asof_join,
    asof_join_pandas,
    bucketed_range_join,
)
from event_streaming_spark.plans.catalog import load
from tests.conftest import SF_SMALL


def _expected_last_click(spark):
    """Reference result computed the slow, obvious way (per-row max)."""
    ev = load(spark, SF_SMALL, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("cts"), F.col("event_id").alias("cid")
    )
    buys = ev.filter(F.col("event_type") == "purchase")
    j = buys.join(clicks, "user_id", "left").filter(F.col("cts") <= F.col("ts"))
    best = j.groupBy("event_id").agg(F.max("cts").alias("last_click_ts"))
    return {r["event_id"]: r["last_click_ts"] for r in best.collect()}


def test_asof_join_union_carry_matches_reference(spark):
    ev = load(spark, SF_SMALL, "events")
    buys = ev.filter(F.col("event_type") == "purchase")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("ts").alias("click_ts")
    )
    out = asof_join(buys, clicks, on="ts", by=["user_id"], value_cols=["click_ts"])
    got = {r["event_id"]: r["click_ts"] for r in out.collect()}
    expected = _expected_last_click(spark)
    assert len(got) == buys.count()
    for eid, cts in expected.items():
        assert got[eid] == cts
    # purchases with no prior click → null carried value
    for eid, cts in got.items():
        if eid not in expected:
            assert cts is None


def test_asof_join_pandas_with_tolerance(spark):
    ev = load(spark, SF_SMALL, "events")
    buys = ev.filter(F.col("event_type") == "purchase")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("value").alias("click_value")
    )
    out = asof_join_pandas(
        buys, clicks, on="ts", by=["user_id"], value_cols=["click_value"]
    )
    base = asof_join(buys, clicks, on="ts", by=["user_id"], value_cols=["click_value"])
    got = {r["event_id"]: r["click_value"] for r in out.collect()}
    want = {r["event_id"]: r["click_value"] for r in base.collect()}
    assert got == want

    # with a tight tolerance, strictly fewer (or equal) matches survive
    tight = asof_join_pandas(
        buys, clicks, on="ts", by=["user_id"], value_cols=["click_value"],
        tolerance=pd.Timedelta("5 minutes"),
    )
    n_tight = sum(r["click_value"] is not None for r in tight.collect())
    n_base = sum(v is not None for v in want.values())
    assert n_tight <= n_base


def test_bucketed_range_join_matches_nested_loop(spark):
    orders = load(spark, SF_SMALL, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    # intervals: per-customer activity windows derived from events
    ev = load(spark, SF_SMALL, "events")
    windows = (
        ev.groupBy("user_id")
        .agg(F.min("ts").alias("w_start"), F.max("ts").alias("w_end"))
        .withColumnRenamed("user_id", "o_custkey")
    )
    bucketed = bucketed_range_join(
        orders, windows.drop("o_custkey"), "o_orderdate", "w_start", "w_end"
    )
    reference = orders.crossJoin(windows.drop("o_custkey")).filter(
        (F.col("o_orderdate") >= F.col("w_start")) & (F.col("o_orderdate") < F.col("w_end"))
    )
    key = lambda r: (r["o_orderkey"], r["w_start"], r["w_end"])  # noqa: E731
    expected = sorted(map(key, reference.collect()))
    assert sorted(map(key, bucketed.collect())) == expected

    # granule is a tuning knob, not a semantics knob: any width agrees
    for granule in ("1 hour", "6 hours", "2 days", "1 week"):
        again = bucketed_range_join(
            orders, windows.drop("o_custkey"), "o_orderdate", "w_start", "w_end",
            granule=granule,
        )
        assert sorted(map(key, again.collect())) == expected, granule

    import pytest

    with pytest.raises(ValueError):
        bucketed_range_join(
            orders, windows.drop("o_custkey"), "o_orderdate", "w_start", "w_end",
            granule="3 fortnights",
        )


def test_triangle_self_pair_join_matches_naive(spark):
    # Exactly the naive blocked pair set — every unordered within-block
    # pair once, none across blocks — at any bucket count (B=1 degenerates
    # to the naive diagonal-only join; B > block size leaves empty cells).
    from event_streaming_spark.operators.joins import triangle_self_pair_join

    rows = [(i, f"blk{i % 3}", float(i) * 1.5) for i in range(40)]
    df = spark.createDataFrame(rows, "id int, blk string, val double")
    naive = {
        (a, b)
        for (a, ab) in [(r["id"], r["blk"]) for r in df.collect()]
        for (b, bb) in [(r["id"], r["blk"]) for r in df.collect()]
        if ab == bb and a < b
    }
    for buckets in (1, 4, 64):
        got = (
            triangle_self_pair_join(df, id_col="id", block_cols=["blk"], n_buckets=buckets)
            .select(
                F.least(F.col("a.id"), F.col("b.id")).alias("lo"),
                F.greatest(F.col("a.id"), F.col("b.id")).alias("hi"),
            )
            .collect()
        )
        pairs = [(r["lo"], r["hi"]) for r in got]
        assert len(pairs) == len(set(pairs)), f"duplicate pairs at B={buckets}"
        assert set(pairs) == naive, f"pair set mismatch at B={buckets}"


def test_asof_join_null_on_and_null_value_semantics(spark):
    """r6 review: (a) right rows with NULL `on` sorted before everything
    and matched every left row; (b) per-column carry resurrected stale
    values when the latest right row had a NULL field — a mixed-row
    result no single right row contained.  Contract now = pd.merge_asof:
    null-on rows never match; the matched row's values travel together."""
    import datetime as dt

    from event_streaming_spark.operators.joins import asof_join

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    right = spark.createDataFrame(
        [(1, t(10), 100.0, 5.0), (1, t(20), 200.0, None), (2, None, 999.0, 9.0)],
        "k INT, ts TIMESTAMP, price DOUBLE, qty DOUBLE",
    )
    left = spark.createDataFrame(
        [(1, t(30), "a"), (2, t(5), "b")], "k INT, ts TIMESTAMP, tag STRING"
    )
    got = {
        r["tag"]: (r["price"], r["qty"])
        for r in asof_join(left, right, on="ts", by=["k"], value_cols=["price", "qty"]).collect()
    }
    # latest right row for k=1 is (200, NULL): qty must be NULL, not the
    # stale 5.0 from the older row
    assert got["a"] == (200.0, None)
    # the NULL-ts right row must NOT match k=2's left row
    assert got["b"] == (None, None)
