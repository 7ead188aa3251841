"""Multimodal (image/audio/video) column operators — SURVEY §2.5.

Design: media rides through the engine as an opaque ``content: BINARY``
column plus typed metadata (the ``binaryFile`` source shape —
sources/readers.py).  Per-item decode / feature-extraction runs as
Arrow-batched ``mapInPandas`` so bytes stay in columnar batches end to
end; at 100 TB the decode stage is embarrassingly parallel and pipelines
into the scan with no shuffle.

The actual codecs (Pillow/librosa/ffmpeg) are NOT in this container, so
the decode kernel is stubbed (`decode_image_stub`): a deterministic fake
that parses only what the real kernel would parse cheaply (magic bytes +
declared dims for uncompressed formats) and raises NotImplementedError
for real codec work.  The Spark-side plumbing — schema, batch iteration,
partitioning — is real and tested; swapping in a real kernel is a
one-function change.
"""

from __future__ import annotations

import struct
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("length", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("checksum64", T.LongType()),
    ]
)

_MAGIC = {
    b"\x89PNG\r\n\x1a\n": "png",
    b"\xff\xd8\xff": "jpeg",
    b"RIFF": "riff",
    b"GIF8": "gif",
    b"P6": "ppm",
    b"BM": "bmp",
}


def sniff_format(content: bytes) -> str:
    for magic, name in _MAGIC.items():
        if content[: len(magic)] == magic:
            return name
    return "unknown"


def decode_image_uncompressed(content: bytes) -> tuple[str, int, int, int]:
    """REAL pixel decode for uncompressed formats, numpy only.

    - PPM (P6, maxval ≤255): full raster decode; checksum64 = exact sum of
      all pixel bytes (a stand-in pixel feature: replace with any
      vectorized stat).
    - BMP (24bpp uncompressed BI_RGB): raster rows are bottom-up and
      4-byte padded; decode honors both.

    Raises NotImplementedError for anything needing a codec library.
    """
    import numpy as np

    if content[:2] == b"P6":
        # header: "P6" <ws> width <ws> height <ws> maxval <single-ws> raster
        parts, idx = [], 2
        while len(parts) < 3:
            while idx < len(content) and content[idx : idx + 1].isspace():
                idx += 1
            if content[idx : idx + 1] == b"#":  # comment line
                idx = content.index(b"\n", idx) + 1
                continue
            start = idx
            while idx < len(content) and not content[idx : idx + 1].isspace():
                idx += 1
            parts.append(int(content[start:idx]))
        idx += 1  # the single whitespace before the raster
        w, h, maxval = parts
        if maxval > 255:
            raise NotImplementedError("16-bit PPM not supported")
        raster = np.frombuffer(content, dtype=np.uint8, count=w * h * 3, offset=idx)
        return "ppm", w, h, int(raster.sum())
    if content[:2] == b"BM" and len(content) >= 54:
        data_off = struct.unpack("<I", content[10:14])[0]
        w, h = struct.unpack("<ii", content[18:26])
        bpp = struct.unpack("<H", content[28:30])[0]
        compression = struct.unpack("<I", content[30:34])[0]
        if bpp != 24 or compression != 0:
            raise NotImplementedError(f"BMP bpp={bpp} compression={compression} needs a codec")
        row_bytes = (w * 3 + 3) & ~3  # rows padded to 4 bytes
        rows = np.frombuffer(
            content, dtype=np.uint8, count=row_bytes * abs(h), offset=data_off
        ).reshape(abs(h), row_bytes)[:, : w * 3]
        return "bmp", int(w), abs(int(h)), int(rows.sum())
    raise NotImplementedError("not an uncompressed format this kernel decodes")


def decode_image_stub(content: bytes) -> tuple[str, int, int, int]:
    """Deterministic fallback kernel: REAL decode for uncompressed formats
    (PPM/BMP, above), real header parse for PNG dims, and a byte checksum
    standing in for pixel features elsewhere.

    Compressed pixel decode (jpeg/gif/riff payloads) requires a codec
    library — raise NotImplementedError past the header; see
    ``select_image_kernel`` for the Pillow auto-upgrade.
    """
    fmt = sniff_format(content)
    if fmt in ("ppm", "bmp"):
        return decode_image_uncompressed(content)
    checksum = sum(content[:4096]) + len(content)
    if fmt == "png" and len(content) >= 24:
        # IHDR immediately follows the 8-byte signature: width/height at 16..24
        w, h = struct.unpack(">II", content[16:24])
        return fmt, int(w), int(h), checksum
    if fmt in ("jpeg", "gif", "riff"):
        raise NotImplementedError(
            f"{fmt} pixel decode needs a codec library (Pillow/ffmpeg) — "
            "not available in this environment; plug a real kernel here"
        )
    return fmt, -1, -1, checksum


def decode_image_pillow(content: bytes) -> tuple[str, int, int, int]:
    """Full decode via Pillow (only reachable when PIL imports): true
    format/dims plus a grayscale pixel-sum feature."""
    import io

    from PIL import Image

    with Image.open(io.BytesIO(content)) as im:
        fmt = (im.format or "unknown").lower()
        w, h = im.size
        pixels = im.convert("L").tobytes()
        return fmt, int(w), int(h), int(sum(pixels))


def select_image_kernel() -> tuple[str, Callable[[bytes], tuple[str, int, int, int]]]:
    """Capability gate: the best image kernel this environment supports.

    Pillow present → full codec decode; otherwise the stub (which still
    REALLY decodes uncompressed PPM/BMP and PNG headers)."""
    try:
        import PIL.Image  # noqa: F401

        return "pillow", decode_image_pillow
    except ImportError:
        return "stub", decode_image_stub


def extract_image_meta(
    binary_df: DataFrame,
    kernel: Callable[[bytes], tuple[str, int, int, int]] | None = None,
) -> DataFrame:
    """binaryFile rows → typed metadata via Arrow-batched mapInPandas.

    ``kernel=None`` auto-selects the best available decoder
    (``select_image_kernel``)."""
    if kernel is None:
        _, kernel = select_image_kernel()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for path, length, content in zip(pdf["path"], pdf["length"], pdf["content"]):
                try:
                    fmt, w, h, ck = kernel(bytes(content))
                except NotImplementedError:
                    fmt, w, h, ck = sniff_format(bytes(content)), -2, -2, -2
                out.append((path, int(length), fmt, w, h, ck))
            yield pd.DataFrame(
                out, columns=["path", "length", "format", "width", "height", "checksum64"]
            )

    return binary_df.select("path", "length", "content").mapInPandas(
        run, IMAGE_META_SCHEMA
    )


AUDIO_META_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("format", T.StringType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)


def decode_audio_stub(content: bytes) -> tuple[str, int, int, int]:
    """WAV header parse (fmt chunk: sample rate, channels, data length →
    duration); real codec decode (mp3/ogg) raises NotImplementedError."""
    if content[:4] == b"RIFF" and content[8:12] == b"WAVE" and len(content) >= 44:
        n_channels = int.from_bytes(content[22:24], "little")
        sample_rate = int.from_bytes(content[24:28], "little")
        byte_rate = int.from_bytes(content[28:32], "little")
        data_len = max(len(content) - 44, 0)
        duration_ms = (data_len * 1000) // byte_rate if byte_rate else 0
        return "wav", sample_rate, n_channels, duration_ms
    if content[:3] == b"ID3" or content[:2] == b"\xff\xfb":
        raise NotImplementedError("mp3 decode needs a codec library — plug a real kernel")
    return "unknown", -1, -1, -1


def extract_audio_meta(
    binary_df: DataFrame,
    kernel: Callable[[bytes], tuple[str, int, int, int]] = decode_audio_stub,
) -> DataFrame:
    """binaryFile rows → audio metadata via Arrow-batched mapInPandas."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for path, content in zip(pdf["path"], pdf["content"]):
                try:
                    fmt, sr, ch, dur = kernel(bytes(content))
                except NotImplementedError:
                    fmt, sr, ch, dur = "undecodable", -2, -2, -2
                out.append((path, fmt, sr, ch, dur))
            yield pd.DataFrame(
                out, columns=["path", "format", "sample_rate", "n_channels", "duration_ms"]
            )

    return binary_df.select("path", "content").mapInPandas(run, AUDIO_META_SCHEMA)


def sample_frame_offsets(
    binary_df: DataFrame,
    frame_size: int,
    every_n: int,
    length_col: str = "length",
) -> DataFrame:
    """Video frame-sampling plumbing: for fixed-size-frame media, emit the
    byte offsets of every Nth frame — pure relational (sequence+explode),
    no Python.  A real demuxer would replace the offset arithmetic; the
    partitioning/explode shape is identical."""
    from pyspark.sql import functions as F

    n_frames = (F.col(length_col) / frame_size).cast("long")
    idx = F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n))
    return binary_df.select(
        "path",
        F.explode(idx).alias("frame_no"),
    ).select("path", "frame_no", (F.col("frame_no") * frame_size).alias("byte_offset"))
