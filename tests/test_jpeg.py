"""Baseline JPEG codec (operators/jpegcodec.py): encode/decode roundtrip,
marker handling, subsampling, capability gates, and the Spark-side
multimodal wiring."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from event_streaming_spark.operators.jpegcodec import (
    decode_jpeg,
    encode_jpeg,
    jpeg_dimensions,
)
from event_streaming_spark.operators.multimodal import (
    decode_image_stdlib,
    decode_pixels,
    sniff_format,
)


def _smooth(h, w, seed=0):
    yy, xx = np.mgrid[0:h, 0:w]
    r = 128 + 100 * np.sin(xx / w * 3.1 + seed) * np.cos(yy / h * 2.1)
    g = 128 + 80 * np.cos(xx / w * 2.3 + seed)
    b = 128 + 60 * np.sin((xx + yy) / (h + w) * 4.0)
    return np.clip(np.stack([r, g, b], axis=2), 0, 255).astype(np.uint8)


def _psnr(a, b):
    mse = ((a.astype(float) - b.astype(float)) ** 2).mean()
    return 10 * np.log10(255**2 / max(mse, 1e-9))


@pytest.mark.parametrize("shape", [(16, 24), (14, 20), (9, 9), (33, 41)])
@pytest.mark.parametrize("sub", ["444", "420"])
def test_roundtrip_shapes_and_subsampling(shape, sub):
    h, w = shape
    img = _smooth(h, w)
    data = encode_jpeg(img, subsampling=sub)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    assert sniff_format(data) == "jpeg"
    assert jpeg_dimensions(data) == (w, h)
    out = decode_jpeg(data)
    assert out.shape == (h, w, 3) and out.dtype == np.uint8
    # Annex-K Q50 tables: smooth content round-trips well above 27 dB
    assert _psnr(out, img) > 27, _psnr(out, img)


def test_constant_color_near_exact():
    img = np.full((32, 48, 3), [200, 64, 130], dtype=np.uint8)
    for sub in ("444", "420"):
        out = decode_jpeg(encode_jpeg(img, subsampling=sub))
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 2


def test_byte_stuffing_and_gray_expansion():
    # high-amplitude noise maximizes entropy-coded 0xFF bytes → exercises
    # the stuffing path on both sides
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(24, 24, 3), dtype=np.uint8)
    data = encode_jpeg(img)
    out = decode_jpeg(data)
    assert out.shape == (24, 24, 3)  # decodes cleanly, content is lossy


def test_progressive_gate_and_lenient_dimensions():
    # hand-build a SOF2 (progressive) header: dims must still parse,
    # pixel decode must gate with NotImplementedError
    sof2 = (
        b"\xff\xd8"
        + b"\xff\xc2"
        + struct.pack(">H", 11)
        + bytes([8])
        + struct.pack(">HH", 10, 20)
        + bytes([1, 1, 0x11, 0])
    )
    assert jpeg_dimensions(sof2) == (20, 10)
    with pytest.raises(NotImplementedError, match="baseline"):
        decode_jpeg(sof2 + b"\xff\xd9")


def test_corrupt_stream_rejected():
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xe0" + b"\x00" * 32)  # no SOF/SOS
    with pytest.raises(ValueError):
        jpeg_dimensions(b"not a jpeg")


def test_multimodal_kernel_wiring():
    img = _smooth(16, 16)
    data = encode_jpeg(img)
    # decode_pixels returns the full raster
    px = decode_pixels(data)
    assert px.shape == (16, 16, 3) and _psnr(px, img) > 27
    # the stdlib metadata kernel reports true dims + pixel-sum feature
    fmt, w, h, ck = decode_image_stdlib(data)
    assert (fmt, w, h) == ("jpeg", 16, 16)
    assert ck == int(px.astype(np.int64).sum())
    # corrupt jpeg degrades through the stub (dims unparseable → gate)
    with pytest.raises(NotImplementedError):
        decode_image_stdlib(b"\xff\xd8\xff\xe0" + b"\x00" * 8)


def test_extract_image_meta_decodes_jpeg_in_spark(spark, tmp_path):
    from event_streaming_spark.operators.multimodal import extract_image_meta
    from event_streaming_spark.sources.readers import load_file

    d = tmp_path / "imgs"
    d.mkdir()
    img = _smooth(12, 18)
    (d / "x.jpg").write_bytes(encode_jpeg(img))
    rows = {r["format"]: r for r in extract_image_meta(load_file(spark, str(d))).collect()}
    assert rows["jpeg"]["width"] == 18 and rows["jpeg"]["height"] == 12
    assert rows["jpeg"]["checksum64"] > 0  # real pixel sum, not a byte checksum


@pytest.mark.parametrize("sub", ["444", "420"])
def test_uniform_even_blocks_dc_exact(sub):
    """The arithmetic-oracle hook multimodal_jpeg_decode_stats relies on:
    gray images of uniform EVEN-valued 8x8 blocks aligned to the DCT grid
    are DC-only under the Annex-K tables (q00=16), and (v-128)/2 integral
    makes quantize→dequantize the identity — the decoded raster equals
    the input bit-exactly, at every grid size (MCU padding included)."""
    for seed in (0, 5, 123456789, 2**31 - 7):
        for wb in (1, 2, 3):
            for hb in (1, 2, 3):
                img = np.zeros((8 * hb, 8 * wb, 3), np.uint8)
                for k in range(wb * hb):
                    by, bx = divmod(k, wb)
                    img[by * 8 : (by + 1) * 8, bx * 8 : (bx + 1) * 8, :] = 2 * (
                        (seed + 37 * k) % 128
                    )
                out = decode_jpeg(encode_jpeg(img, subsampling=sub))
                assert (out == img).all(), (sub, seed, wb, hb)
