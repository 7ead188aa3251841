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


def test_mixed_media_asset_catalog(spark, tmp_path):
    """Multimodal end to end: one directory of real mixed media (PNG,
    JPEG, GIF, BMP, MJPEG AVI, PCM + µ-law WAV, junk) → the three
    metadata extractors → one joined asset catalog.  Every decodable
    asset reports true dimensions/signal features from the stdlib
    kernels; junk degrades to sentinels; nothing throws."""
    import math
    import struct as st
    import zlib

    import numpy as np
    from pyspark.sql import functions as F

    from event_streaming_spark.operators.avidemux import build_mjpeg_avi, extract_video_meta
    from event_streaming_spark.operators.jpegcodec import encode_jpeg
    from event_streaming_spark.operators.multimodal import (
        extract_audio_features,
        extract_image_meta,
    )
    from event_streaming_spark.sources.readers import load_file

    d = tmp_path / "media"
    d.mkdir()

    img = np.clip(
        128 + 90 * np.sin(np.mgrid[0:16, 0:24][1] / 5.0)[..., None] * np.ones(3), 0, 255
    ).astype(np.uint8)
    # PNG (filter 0 rows, RGB)
    raw = b"".join(b"\x00" + img[r].tobytes() for r in range(16))
    ihdr = st.pack(">IIBBBBB", 24, 16, 8, 2, 0, 0, 0)

    def chunk(t, p):
        return st.pack(">I", len(p)) + t + p + st.pack(">I", zlib.crc32(t + p))

    png = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
    (d / "a.png").write_bytes(png)
    (d / "b.jpg").write_bytes(encode_jpeg(img))
    (d / "c.ppm").write_bytes(b"P6\n24 16\n255\n" + img.tobytes())
    avi, _ = build_mjpeg_avi([encode_jpeg(img) for _ in range(3)], width=24, height=16), None
    (d / "clip.avi").write_bytes(avi)
    # PCM WAV, 200 Hz sine at 8 kHz
    pcm = b"".join(
        st.pack("<h", int(0.4 * 32767 * math.sin(2 * math.pi * 200 * i / 8000)))
        for i in range(4000)
    )
    fmt = st.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    wav = (
        b"RIFF" + st.pack("<I", 20 + len(fmt) + len(pcm)) + b"WAVE"
        + b"fmt " + st.pack("<I", len(fmt)) + fmt
        + b"data" + st.pack("<I", len(pcm)) + pcm
    )
    (d / "tone.wav").write_bytes(wav)
    (d / "junk.bin").write_bytes(b"\x00\x01\x02\x03")

    files = load_file(spark, str(d))
    images = extract_image_meta(files).select(
        "path", F.lit("image").alias("kind"), "format", "width", "height"
    )
    audio = extract_audio_features(files.filter(F.col("path").endswith(".wav"))).select(
        "path", F.lit("audio").alias("kind"), "format",
        F.lit(-1).alias("width"), F.lit(-1).alias("height"),
    )
    video = extract_video_meta(files.filter(F.col("path").endswith(".avi"))).select(
        "path", F.lit("video").alias("kind"),
        F.col("video_codec").alias("format"), "width", "height",
    )
    catalog = {
        r["path"].rsplit("/", 1)[-1]: r
        for r in images.unionByName(audio).unionByName(video).collect()
    }
    for name, fmt_ in (("a.png", "png"), ("b.jpg", "jpeg"), ("c.ppm", "ppm")):
        assert catalog[name]["format"] == fmt_
        assert (catalog[name]["width"], catalog[name]["height"]) == (24, 16)
    assert catalog["clip.avi"]["format"] == "mjpg"
    assert (catalog["clip.avi"]["width"], catalog["clip.avi"]["height"]) == (24, 16)
    assert catalog["tone.wav"]["format"] == "wav"
    assert catalog["junk.bin"]["format"] == "unknown"
