"""GIF decoder — pure stdlib + numpy, no codec library.

Decodes GIF87a/GIF89a: logical screen descriptor, global/local color
tables, LZW-compressed image data (variable code width, clear/EOI
codes), interlaced and non-interlaced rows, transparency via the
graphic-control extension.  ``decode_gif`` returns the FIRST frame
composited onto the logical screen (the still-image semantics every
thumbnailer uses); ``gif_frame_count`` walks the block structure
without LZW-decoding to count frames of an animation.

Reference parity: none — the reference repo has no image codecs; this
extends the multimodal-column kernels (operators/multimodal.py) so
that every common raster format a web crawl carries (PNG, JPEG, GIF,
BMP, PPM) decodes without external libraries.

Scale: per-row CPU work inside Arrow-batched mapInPandas, like the
other kernels.  LZW here is a straightforward table decoder — clarity
over micro-optimization; the per-image cost is bounded by pixel count.
"""

from __future__ import annotations

import struct


def _color_table(data: bytes, offset: int, flags: int) -> tuple[object, int]:
    """(palette ndarray (n,3) | None, next offset) for a descriptor's
    color-table flags byte."""
    import numpy as np

    if not flags & 0x80:
        return None, offset
    n = 2 << (flags & 0x07)
    table = np.frombuffer(data, dtype=np.uint8, count=3 * n, offset=offset).reshape(n, 3)
    return table, offset + 3 * n


def _sub_blocks(data: bytes, offset: int) -> tuple[bytes, int]:
    """Concatenate data sub-blocks starting at ``offset``; return
    (payload, offset past the 0x00 terminator)."""
    out = bytearray()
    while True:
        n = data[offset]
        offset += 1
        if n == 0:
            return bytes(out), offset
        out.extend(data[offset : offset + n])
        offset += n


def _skip_sub_blocks(data: bytes, offset: int) -> int:
    while True:
        n = data[offset]
        offset += 1
        if n == 0:
            return offset
        offset += n


def _lzw_decode(min_code_size: int, data: bytes, expected: int) -> bytearray:
    """GIF-variant LZW → index stream of ``expected`` pixels."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()

    # bit reader: LSB-first within bytes (GIF convention)
    buf = nbits = 0
    pos = 0

    def read_code(width):
        nonlocal buf, nbits, pos
        while nbits < width:
            if pos >= len(data):
                return eoi  # truncated stream: stop cleanly
            buf |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = buf & ((1 << width) - 1)
        buf >>= width
        nbits -= width
        return code

    def reset_table():
        return {i: bytes([i]) for i in range(clear)}

    table = reset_table()
    width = min_code_size + 1
    prev: bytes | None = None
    next_code = eoi + 1
    while len(out) < expected:
        code = read_code(width)
        if code == clear:
            table = reset_table()
            width = min_code_size + 1
            next_code = eoi + 1
            prev = None
            continue
        if code == eoi:
            break
        if code in table:
            entry = table[code]
        elif code == next_code and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError("corrupt LZW stream: code out of range")
        out.extend(entry)
        if prev is not None and next_code < 4096:
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry
    return out


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(content: bytes):
    """First frame → uint8 RGB ndarray (screen_h, screen_w, 3).

    The frame composites onto the logical screen at its (left, top);
    uncovered screen area takes the background color (or black without
    a global table); transparent pixels keep the background."""
    import numpy as np

    if content[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    sw, sh = struct.unpack("<HH", content[6:10])
    flags, bg_idx = content[10], content[11]
    off = 13
    gct, off = _color_table(content, off, flags)

    if gct is not None and bg_idx < len(gct):
        canvas = np.tile(gct[bg_idx], (sh, sw, 1)).astype(np.uint8)
    else:
        canvas = np.zeros((sh, sw, 3), dtype=np.uint8)

    transparent_idx = None
    while off < len(content):
        block = content[off]
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = content[off + 1]
            if label == 0xF9:  # graphic control: transparency flag + index
                size = content[off + 2]
                gc = content[off + 3 : off + 3 + size]
                if gc[0] & 0x01:
                    transparent_idx = gc[3]
                off = _skip_sub_blocks(content, off + 3 + size)
            else:
                off = _skip_sub_blocks(content, off + 2)
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        # image descriptor
        left, top, iw, ih = struct.unpack("<HHHH", content[off + 1 : off + 9])
        iflags = content[off + 9]
        off = 10 + off
        lct, off = _color_table(content, off, iflags)
        pal = lct if lct is not None else gct
        if pal is None:
            raise ValueError("GIF frame without any color table")
        min_code = content[off]
        payload, off = _sub_blocks(content, off + 1)
        idx = np.frombuffer(
            bytes(_lzw_decode(min_code, payload, iw * ih)), dtype=np.uint8
        )
        if len(idx) < iw * ih:  # truncated: pad with background
            idx = np.concatenate([idx, np.zeros(iw * ih - len(idx), dtype=np.uint8)])
        grid = np.empty((ih, iw), dtype=np.uint8)
        if iflags & 0x40:  # interlaced: 4-pass row order
            rows = [r for start, step in _INTERLACE_PASSES for r in range(start, ih, step)]
            grid[np.array(rows)] = idx.reshape(ih, iw)
        else:
            grid[:] = idx.reshape(ih, iw)
        rgb = pal[np.minimum(grid, len(pal) - 1)]
        target = canvas[top : top + ih, left : left + iw]
        if transparent_idx is not None:
            mask = (grid != transparent_idx)[:, :, None]
            target[...] = np.where(mask, rgb, target)
        else:
            target[...] = rgb
        return canvas  # first frame only
    raise ValueError("GIF contains no image data")


def gif_dimensions(content: bytes) -> tuple[int, int]:
    """(width, height) of the logical screen — header only."""
    if content[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    sw, sh = struct.unpack("<HH", content[6:10])
    return int(sw), int(sh)


def gif_frame_count(content: bytes) -> int:
    """Number of image frames, by walking blocks (no LZW decode)."""
    if content[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    flags = content[10]
    off = 13
    if flags & 0x80:
        off += 3 * (2 << (flags & 0x07))
    frames = 0
    while off < len(content):
        block = content[off]
        if block == 0x3B:
            break
        if block == 0x21:
            # every extension is label + sub-blocks; the first length
            # byte doubles as the fixed-part size, so the generic
            # sub-block walk skips any extension uniformly
            off = _skip_sub_blocks(content, off + 2)
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        iflags = content[off + 9]
        off += 10
        if iflags & 0x80:
            off += 3 * (2 << (iflags & 0x07))
        off = _skip_sub_blocks(content, off + 1)
        frames += 1
    return frames
