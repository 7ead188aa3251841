"""AVI (RIFF) demuxer + MJPEG frame decode — stdlib + numpy.

An AVI file is a RIFF tree: ``LIST hdrl`` holds the main header
(``avih``) and one ``LIST strl`` per stream (``strh``/``strf``);
``LIST movi`` holds the frame chunks (``##dc``/``##db``, optionally
nested in ``LIST rec``).  This module walks that structure without any
codec library and, for Motion-JPEG video streams (every frame its own
baseline JPEG), decodes sampled frames via operators/jpegcodec.py —
so the video frame-sampling path of the multimodal pipeline is REAL
end to end for MJPEG, and gracefully metadata-only for codecs that
genuinely need a library (H.264 et al.), matching the capability-gate
contract of the other kernels (operators/multimodal.py).

Scale: demux + per-frame decode is per-file CPU work inside
Arrow-batched mapInPandas — embarrassingly parallel; the sampling
stride bounds per-file cost.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator


def _le32(b: bytes, off: int) -> int:
    return int.from_bytes(b[off : off + 4], "little")


def _iter_chunks(content: bytes, pos: int, end: int) -> Iterator[tuple[bytes, int, int]]:
    """(fourcc, payload offset, payload size) for each chunk in a span."""
    while pos + 8 <= end:
        cid = content[pos : pos + 4]
        size = _le32(content, pos + 4)
        yield cid, pos + 8, min(size, end - pos - 8)
        pos += 8 + size + (size & 1)  # chunks are word-aligned


def avi_info(content: bytes) -> dict:
    """Container metadata from the header tree — no frame decode.

    Returns {width, height, total_frames, us_per_frame, fps,
    video_codec} where video_codec is the first video stream's
    fccHandler (e.g. 'MJPG', 'H264') lowercased."""
    if content[:4] != b"RIFF" or content[8:12] != b"AVI ":
        raise ValueError("not an AVI (RIFF/'AVI ' header missing)")
    info = {
        "width": -1,
        "height": -1,
        "total_frames": -1,
        "us_per_frame": -1,
        "video_codec": "unknown",
    }
    for cid, off, size in _iter_chunks(content, 12, len(content)):
        if cid != b"LIST" or content[off : off + 4] != b"hdrl":
            continue
        for hcid, hoff, hsize in _iter_chunks(content, off + 4, off + size):
            if hcid == b"avih" and hsize >= 40:
                info["us_per_frame"] = _le32(content, hoff)
                info["total_frames"] = _le32(content, hoff + 16)
                info["width"] = _le32(content, hoff + 32)
                info["height"] = _le32(content, hoff + 36)
            elif hcid == b"LIST" and content[hoff : hoff + 4] == b"strl":
                fcc_type = handler = None
                for scid, soff, _ssize in _iter_chunks(content, hoff + 4, hoff + hsize):
                    if scid == b"strh":
                        fcc_type = content[soff : soff + 4]
                        handler = content[soff + 4 : soff + 8]
                if fcc_type == b"vids" and info["video_codec"] == "unknown":
                    info["video_codec"] = (
                        handler.decode("latin-1").strip("\x00 ").lower() or "unknown"
                    )
        break
    info["fps"] = round(1e6 / info["us_per_frame"], 3) if info["us_per_frame"] > 0 else -1.0
    return info


def iter_video_frames(content: bytes) -> Iterator[tuple[int, int, int]]:
    """(frame_idx, payload offset, payload size) for every video frame
    chunk (``##dc``/``##db``) in ``LIST movi``, recursing into
    ``LIST rec`` groupings."""
    if content[:4] != b"RIFF" or content[8:12] != b"AVI ":
        raise ValueError("not an AVI (RIFF/'AVI ' header missing)")

    idx = 0

    def walk(pos: int, end: int) -> Iterator[tuple[int, int, int]]:
        nonlocal idx
        for cid, off, size in _iter_chunks(content, pos, end):
            if cid == b"LIST" and content[off : off + 4] == b"rec ":
                yield from walk(off + 4, off + size)
            elif len(cid) == 4 and cid[2:4] in (b"dc", b"db") and cid[:2].isdigit():
                yield idx, off, size
                idx += 1

    for cid, off, size in _iter_chunks(content, 12, len(content)):
        if cid == b"LIST" and content[off : off + 4] == b"movi":
            yield from walk(off + 4, off + size)


def sample_mjpeg_frames(
    content: bytes, every_n: int = 2
) -> list[tuple[int, int, int, int]]:
    """Every n-th MJPEG frame fully decoded → (frame_idx, w, h,
    checksum64 of RGB pixels) — the same feature contract as the PPM
    stream sampler (operators/multimodal.py:sample_frames).

    Raises NotImplementedError when the video stream's codec is not
    MJPEG (that genuinely needs a codec library)."""
    import numpy as np

    from event_streaming_spark.operators.jpegcodec import decode_jpeg

    codec = avi_info(content)["video_codec"]
    if codec not in ("mjpg", "mjpeg"):
        raise NotImplementedError(
            f"AVI video codec {codec!r} needs a codec library; only MJPEG "
            "decodes stdlib-side"
        )
    out = []
    for idx, off, size in iter_video_frames(content):
        if idx % every_n:
            continue
        px = decode_jpeg(content[off : off + size])
        out.append((idx, px.shape[1], px.shape[0], int(px.astype(np.int64).sum())))
    return out


VIDEO_META_COLUMNS = [
    "path",
    "container",
    "video_codec",
    "width",
    "height",
    "total_frames",
    "fps",
    "n_sampled",
    "sampled_checksum64",
]


def extract_video_meta(binary_df, every_n: int = 2):
    """binaryFile rows → container metadata + sampled-frame features via
    Arrow-batched mapInPandas.  MJPEG streams get REAL decoded-frame
    checksums; other codecs report metadata with n_sampled = -2 (the
    capability-gate sentinel, same convention as the image kernels)."""
    import pandas as pd

    schema = (
        "path string, container string, video_codec string, width int, "
        "height int, total_frames int, fps double, n_sampled int, "
        "sampled_checksum64 long"
    )

    def run(batches):
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                b = bytes(content)
                try:
                    info = avi_info(b)
                except ValueError:
                    rows.append((path, "unknown", "unknown", -1, -1, -1, -1.0, -1, -1))
                    continue
                try:
                    frames = sample_mjpeg_frames(b, every_n=every_n)
                    n_sampled = len(frames)
                    ck = sum(f[3] for f in frames)
                except NotImplementedError:
                    n_sampled, ck = -2, -2
                rows.append(
                    (
                        path,
                        "avi",
                        info["video_codec"],
                        info["width"],
                        info["height"],
                        info["total_frames"],
                        info["fps"],
                        n_sampled,
                        ck,
                    )
                )
            yield pd.DataFrame(rows, columns=VIDEO_META_COLUMNS)

    return binary_df.select("path", "content").mapInPandas(run, schema)


def build_mjpeg_avi(jpeg_frames: list[bytes], width: int, height: int, fps: int = 10) -> bytes:
    """Assemble baseline-JPEG frames into a standard MJPEG AVI.

    The write half of the demuxer: fixture generation for tests (no
    Pillow/ffmpeg in this container) and the re-mux stage of a
    frame-level video pipeline."""
    n = len(jpeg_frames)

    def chunk(cid: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) & 1 else b""
        return cid + struct.pack("<I", len(payload)) + payload + pad

    def list_chunk(subtype: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", subtype + payload)

    avih = struct.pack(
        "<10I",
        1_000_000 // fps,  # us per frame
        0, 0, 0x10,        # max bytes/s, padding, flags (HASINDEX)
        n, 0, 1, 0,        # total frames, init frames, streams, sugg buf
        width, height,
    ) + b"\x00" * 16
    strh = (
        b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, n, 0, 0xFFFFFFFF, 0)
        + struct.pack("<4H", 0, 0, width, height)
    )
    strf = struct.pack("<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG", width * height * 3, 0, 0, 0, 0)
    hdrl = list_chunk(
        b"hdrl",
        chunk(b"avih", avih) + list_chunk(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = list_chunk(b"movi", b"".join(chunk(b"00dc", f) for f in jpeg_frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body
