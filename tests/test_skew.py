"""Salted aggregation/join must be exactly result-equivalent to unsalted."""

from __future__ import annotations

from pyspark.sql import functions as F

from event_streaming_spark.operators.skew import salted_agg, salted_broadcast_left
from event_streaming_spark.plans.catalog import load
from tests.conftest import SF_SMALL


def test_salted_agg_equals_plain(spark):
    ev = load(spark, SF_SMALL, "events")
    plain = {
        (r["event_type"],): (r["n"], r["total"])
        for r in ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 1e6).cast("long")).alias("total"),
        )
        .collect()
    }
    salted = {
        (r["event_type"],): (r["n"], r["total"])
        for r in salted_agg(
            ev,
            ["event_type"],
            {
                "n": (F.count(F.lit(1)), F.sum("n")),
                "total": (
                    F.sum(F.round(F.col("value") * 1e6).cast("long")),
                    F.sum("total"),
                ),
            },
            n_salts=8,
        ).collect()
    }
    assert salted == plain


def test_salted_join_equals_plain(spark):
    ev = load(spark, SF_SMALL, "events").select(
        F.col("user_id").alias("k"), "event_id", "value"
    )
    dim = (
        load(spark, SF_SMALL, "customer")
        .select(F.col("c_custkey").alias("k"), "c_mktsegment")
        .filter(F.col("k") < 200)
    )
    plain = ev.join(dim, "k").select("event_id", "c_mktsegment")
    salted = salted_broadcast_left(ev, dim, "k", n_salts=4).select(
        "event_id", "c_mktsegment"
    )
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))
