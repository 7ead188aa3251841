"""AVI demuxer + MJPEG frame sampling (operators/avidemux.py)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from event_streaming_spark.operators.avidemux import (
    avi_info,
    build_mjpeg_avi,
    extract_video_meta,
    iter_video_frames,
    sample_mjpeg_frames,
)
from event_streaming_spark.operators.jpegcodec import decode_jpeg, encode_jpeg


def _frame(h, w, phase):
    yy, xx = np.mgrid[0:h, 0:w]
    r = 128 + 100 * np.sin(xx / w * 3.0 + phase)
    g = 128 + 80 * np.cos(yy / h * 2.0 + phase)
    b = np.full((h, w), 90.0 + 10 * phase)
    return np.clip(np.stack([r, g, b], axis=2), 0, 255).astype(np.uint8)


def _avi(n_frames=5, h=16, w=24, fps=10):
    frames = [encode_jpeg(_frame(h, w, i)) for i in range(n_frames)]
    return build_mjpeg_avi(frames, width=w, height=h, fps=fps), frames


def test_avi_info_header_fields():
    data, _ = _avi(n_frames=4, h=16, w=24, fps=5)
    info = avi_info(data)
    assert (info["width"], info["height"]) == (24, 16)
    assert info["total_frames"] == 4
    assert info["video_codec"] == "mjpg"
    assert info["fps"] == 5.0


def test_frame_iteration_payloads_are_the_jpegs():
    data, frames = _avi(n_frames=3)
    got = list(iter_video_frames(data))
    assert [i for i, _, _ in got] == [0, 1, 2]
    for (idx, off, size), f in zip(got, frames):
        assert data[off : off + size] == f


def test_sample_mjpeg_frames_decodes_every_nth():
    data, frames = _avi(n_frames=6, h=16, w=16)
    got = sample_mjpeg_frames(data, every_n=2)
    assert [g[0] for g in got] == [0, 2, 4]
    for idx, w, h, ck in got:
        px = decode_jpeg(frames[idx])
        assert (w, h) == (16, 16)
        assert ck == int(px.astype(np.int64).sum())


def test_non_mjpeg_codec_gates():
    data, _ = _avi(n_frames=2)
    h264 = data.replace(b"vidsMJPG", b"vidsH264")
    assert avi_info(h264)["video_codec"] == "h264"
    with pytest.raises(NotImplementedError, match="codec"):
        sample_mjpeg_frames(h264)


def test_corrupt_rejected():
    with pytest.raises(ValueError):
        avi_info(b"RIFF\x00\x00\x00\x00WAVE")  # a WAV is not an AVI
    with pytest.raises(ValueError):
        list(iter_video_frames(b"garbage"))


def test_extract_video_meta_spark_op(spark, tmp_path):
    from event_streaming_spark.sources.readers import load_file

    d = tmp_path / "vids"
    d.mkdir()
    data, _ = _avi(n_frames=4, h=12, w=18)
    (d / "clip.avi").write_bytes(data)
    (d / "h264.avi").write_bytes(data.replace(b"vidsMJPG", b"vidsH264"))
    (d / "noise.bin").write_bytes(b"\x01\x02\x03")
    rows = {r["path"].rsplit("/", 1)[-1]: r for r in extract_video_meta(
        load_file(spark, str(d)), every_n=2
    ).collect()}
    ok = rows["clip.avi"]
    assert (ok["video_codec"], ok["width"], ok["height"]) == ("mjpg", 18, 12)
    assert ok["total_frames"] == 4 and ok["n_sampled"] == 2
    assert ok["sampled_checksum64"] > 0
    assert rows["h264.avi"]["n_sampled"] == -2  # metadata yes, decode gated
    assert rows["noise.bin"]["container"] == "unknown"


def test_decode_pixels_avi_first_frame_and_thumbnail():
    from event_streaming_spark.operators.multimodal import decode_pixels, resize_box

    data, frames = _avi(n_frames=3, h=16, w=24)
    px = decode_pixels(data)
    assert np.array_equal(px, decode_jpeg(frames[0]))  # first frame exactly
    th = resize_box(px, 6, 4)
    assert th.shape == (4, 6, 3)
    h264 = data.replace(b"vidsMJPG", b"vidsH264")
    with pytest.raises(NotImplementedError):
        decode_pixels(h264)
