"""Perceptual-hash image dedup: determinism, banding exactness, and
end-to-end near-dup detection over real encoded images."""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F

from event_streaming_spark.operators.phash import (
    N_BANDS,
    average_hash_bytes,
    phash_near_dup_pairs,
    with_average_hash,
)


def _bmp(pixels) -> bytes:
    """24-bit BMP from a row-major [[(r,g,b), ...], ...] pixel grid
    (written bottom-up, as BMP wants)."""
    h = len(pixels)
    w = len(pixels[0])
    rows = []
    for r in reversed(pixels):
        row = b"".join(bytes([b_, g, r_]) for (r_, g, b_) in r)  # BGR
        rows.append(row + b"\x00" * ((-len(row)) % 4))
    raster = b"".join(rows)
    header = b"BM" + struct.pack("<IHHI", 54 + len(raster), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster), 0, 0, 0, 0)
    return header + info + raster


def _checker(w=16, h=16, a=200, b=30, flip=()):
    """Checkerboard image; ``flip`` = set of (y, x) cells to invert —
    small perturbations with a small hamming effect."""
    px = []
    for y in range(h):
        row = []
        for x in range(w):
            v = a if (x // 2 + y // 2) % 2 == 0 else b
            if (y, x) in flip:
                v = a + b - v
            row.append((v, v, v))
        px.append(row)
    return _bmp(px)


def test_average_hash_deterministic_and_distinct():
    img1 = _checker()
    img2 = _checker(a=30, b=200)  # inverted board → different hash
    h1 = average_hash_bytes(img1)
    assert h1 == average_hash_bytes(img1)
    assert h1 != average_hash_bytes(img2)
    assert average_hash_bytes(b"not an image") is None


def test_flat_image_hashes_to_zero():
    # strict > threshold: every cell equals the mean → all bits clear
    assert average_hash_bytes(_checker(a=77, b=77)) == 0


def test_near_dup_small_perturbation_found(spark):
    base = _checker()
    # flip two 2x2 cells → 2 of 64 hash cells move → hamming ~2
    near = _checker(flip={(0, 0), (0, 1), (1, 0), (1, 1), (8, 8), (8, 9), (9, 8), (9, 9)})
    far = _checker(a=30, b=200)
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far), (4, b"junk-not-an-image")],
        "img_id long, content binary",
    )
    hashed = with_average_hash(df, "content")
    pairs = phash_near_dup_pairs(hashed, "img_id").collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (1, 2) in got
    assert all(3 not in p for p in got)  # the inverted board pairs with nobody
    assert all(4 not in p for p in got)  # undecodable rows drop out
    ham = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs}[(1, 2)]
    assert 0 < ham <= 7


def test_banding_is_exact_vs_bruteforce(spark):
    # 20 random-ish images: the banded join must equal the all-pairs
    # hamming computation exactly (pigeonhole guarantee).
    import random

    rng = random.Random(7)
    imgs = []
    for i in range(20):
        flips = {
            (rng.randrange(16), rng.randrange(16)) for _ in range(rng.randrange(0, 20))
        }
        imgs.append((i, _checker(flip=flips)))
    df = spark.createDataFrame(imgs, "img_id long, content binary")
    hashed = with_average_hash(df, "content")
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in phash_near_dup_pairs(hashed, "img_id").collect()
    }
    hs = {r["img_id"]: r["phash"] for r in hashed.select("img_id", "phash").collect()}
    want = set()
    for i in sorted(hs):
        for j in sorted(hs):
            if i < j:
                d = bin((hs[i] ^ hs[j]) & ((1 << 64) - 1)).count("1")
                if d <= 7:
                    want.add((i, j, d))
    assert got == want


def test_max_hamming_guardrail(spark):
    df = spark.createDataFrame([(1, _checker())], "img_id long, content binary")
    hashed = with_average_hash(df, "content")
    with pytest.raises(ValueError, match="pigeonhole"):
        phash_near_dup_pairs(hashed, "img_id", max_hamming=N_BANDS)


def test_phash_works_on_png_and_jpeg_codecs(spark):
    # the SAME picture through two different REAL codecs should produce
    # near-identical hashes (JPEG is lossy → allow a small distance)
    import numpy as np

    from event_streaming_spark.operators.jpegcodec import encode_jpeg

    arr = np.zeros((16, 16, 3), dtype=np.uint8)
    for y in range(16):
        for x in range(16):
            v = 200 if (x // 2 + y // 2) % 2 == 0 else 30
            arr[y, x] = v
    bmp = _checker()
    jpg = encode_jpeg(arr)
    h_bmp = average_hash_bytes(bmp)
    h_jpg = average_hash_bytes(jpg)
    assert h_jpg is not None
    d = bin((h_bmp ^ h_jpg) & ((1 << 64) - 1)).count("1")
    assert d <= 7  # lossy-codec wobble stays inside the near-dup radius


def test_phash_stable_across_baseline_and_progressive_jpeg():
    # r4: the SAME picture as baseline vs progressive (SOF2) JPEG must
    # hash IDENTICALLY — both encoders share the quantization front
    # half, so the decoded pixels (and thus the hash) are bit-equal.
    import numpy as np

    from event_streaming_spark.operators.jpegcodec import (
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(11)
    arr = np.clip(
        rng.integers(0, 255, (24, 32, 3)).astype(np.int64), 0, 255
    ).astype(np.uint8)
    for sub in ("444", "420"):
        h_base = average_hash_bytes(encode_jpeg(arr, subsampling=sub))
        h_prog = average_hash_bytes(encode_jpeg_progressive(arr, subsampling=sub))
        assert h_base == h_prog


def test_corrupt_media_yields_sentinel_rows_not_dead_tasks(spark):
    """r6 review: corrupt PNG (zlib.error) / corrupt WAV chunk sizes
    escaped the NotImplementedError-only catches and killed the task —
    'one bad file must never kill the batch'."""
    import struct
    import zlib

    from event_streaming_spark.operators.multimodal import (
        decode_audio_stub,
        extract_audio_features,
        extract_image_meta,
    )

    # a PNG with valid IHDR but garbage (non-zlib) IDAT payload
    def chunk(typ, payload):
        c = struct.pack(">I", len(payload)) + typ + payload
        return c + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)
    bad_png = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + chunk(b"IDAT", b"notzlib") + chunk(b"IEND", b"")
    bdf = spark.createDataFrame([("p.png", len(bad_png), bytearray(bad_png))],
                                "path STRING, length LONG, content BINARY")
    rows = extract_image_meta(bdf).collect()
    assert len(rows) == 1 and rows[0]["format"] == "png"  # degraded, not dead

    # a WAV whose fmt chunk is preceded by a LIST chunk (real-world
    # metadata layout) must parse correct rates via the chunk walk
    fmtp = struct.pack("<HHIIHH", 1, 2, 22050, 88200, 4, 16)
    wav = (b"RIFF" + struct.pack("<I", 0) + b"WAVE"
           + b"LIST" + struct.pack("<I", 4) + b"INFO"
           + b"fmt " + struct.pack("<I", len(fmtp)) + fmtp
           + b"data" + struct.pack("<I", 8) + b"\x00" * 8)
    f, sr, ch, dur = decode_audio_stub(wav)
    assert (f, sr, ch) == ("wav", 22050, 2)

    # a corrupt RIFF with a lying chunk size: sentinel row, not a crash
    bad_wav = b"RIFF" + struct.pack("<I", 0) + b"WAVE" + b"fmt " + struct.pack("<I", 64) + b"\x01"
    adf = spark.createDataFrame([("a.wav", bytearray(bad_wav))], "path STRING, content BINARY")
    arows = extract_audio_features(adf).collect()
    assert len(arows) == 1 and arows[0]["sample_rate"] in (-2, -3)
