"""End-to-end pipeline: HTTP ingest → topic log → streaming window agg →
date-partitioned event store → batch analytics + alert sink.

The full reference deployment story (gateway :8088 → events agency →
consumers → BDB store → SMTP alerts) on this engine in one test.
"""

from __future__ import annotations

import datetime as dt
import json
import urllib.request

from pyspark.sql import functions as F

from event_streaming_spark.functions.auth import mint_hs256
from event_streaming_spark.sources.store import EventStore
from event_streaming_spark.streaming.agency import EventsAgency
from event_streaming_spark.streaming.gateway import ApiGateway
from event_streaming_spark.streaming.sinks import EmailAlertSink, compose_alert_payload


def test_full_pipeline(spark, tmp_path):
    agency = EventsAgency(spark, root=str(tmp_path / "agency"))
    gw = ApiGateway(agency, port=0, jwt_secret="e2e").start()
    store = EventStore(spark, str(tmp_path / "store"))
    try:
        # 1. ingest over HTTP (two batches, two days, one error event)
        tok = mint_hs256({"iss": "e2e", "sub": "ingester"}, "e2e")
        host, port = gw.address

        def post(events):
            req = urllib.request.Request(
                f"http://{host}:{port}/topics/prod/events",
                data=json.dumps(events).encode(),
                headers={"Content-Type": "application/json",
                         "Authorization": f"Bearer {tok}"},
                method="POST",
            )
            with urllib.request.urlopen(req) as r:
                assert r.status == 202

        mk = lambda i, ts, et, v: {  # noqa: E731
            "event_id": i, "ts": ts, "user_id": i % 3, "event_type": et,
            "value": v, "props": json.dumps({"k": i}),
        }
        post([mk(1, "2024-03-01T10:00:00", "click", 1.0),
              mk(2, "2024-03-01T10:05:00", "purchase", 99.0)])
        post([mk(3, "2024-03-02T11:00:00", "error", -1.0),
              mk(4, "2024-03-02T11:30:00", "click", 2.0)])

        # 2. consume: windowed agg to driver + raw append to the store +
        #    error alerts through the (inert-transport) email sink
        windows = []
        alerts = EmailAlertSink(
            predicate=F.col("event_type") == "error",
            make_alerts=lambda df: compose_alert_payload(
                df.select(
                    F.lit("oncall@example.com").alias("to_addr"),
                    F.concat(F.lit("error "), F.col("event_id").cast("string")).alias("subject"),
                    F.lit("event body.").alias("body"),
                )
            ),
            ledger_dir=str(tmp_path / "ledger"),
        )

        def on_batch(ctx, batch_df, batch_id):
            batch_df.persist()
            store.append(batch_df)
            alerts(batch_df, batch_id)
            agg = (
                batch_df.groupBy(F.window("ts", "1 hour"), "event_type")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            )
            windows.extend(agg)
            batch_df.unpersist()

        ctx = agency.find_topic("prod", "events")
        ctx.consume(on_batch, once=True)

        # 3. verify every stage
        win_counts = sorted((r["event_type"], r["n"]) for r in windows)
        assert win_counts == [("click", 1), ("click", 1), ("error", 1), ("purchase", 1)]
        assert len(alerts.sent) == 1 and "Subject: error 3" in alerts.sent[0][2]

        stored = store.read()
        assert stored.count() == 4
        day2 = store.read_range(dt.datetime(2024, 3, 2), dt.datetime(2024, 3, 3))
        assert sorted(r["event_id"] for r in day2.collect()) == [3, 4]

        # 4. batch analytics over the store: daily rollup equals ingest truth
        daily = (
            stored.groupBy(F.col("event_date"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        got = {(str(r["event_date"]), r["event_type"]): r["n"] for r in daily}
        assert got[("2024-03-01", "click")] == 1
        assert got[("2024-03-01", "purchase")] == 1
        assert got[("2024-03-02", "error")] == 1
        assert got[("2024-03-02", "click")] == 1
    finally:
        gw.stop()
        agency.close()
