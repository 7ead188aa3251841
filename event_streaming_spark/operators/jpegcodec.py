"""JPEG codec — stdlib + numpy, no codec library.

Decoder: baseline sequential (SOF0/1) AND progressive (SOF2) DCT JPEG —
8-bit samples, Huffman entropy coding, optional restart markers, 4:4:4
/ 4:2:2 / 4:2:0 chroma subsampling, 1- or 3-component; for progressive,
all four scan procedures (DC/AC first + DC/AC successive-approximation
refinement, EOB runs, non-interleaved component block order) per ITU
T.81 G.1.2, with per-scan Huffman-table snapshots.  Baseline +
progressive covers essentially all real-world .jpg payloads in a
web-scale crawl; arithmetic coding, 12-bit and lossless/hierarchical
modes remain capability-gated with explicit NotImplementedError — the
same honesty contract as the PNG/BMP/PPM kernels in
operators/multimodal.py.

Encoders: a baseline encoder with the JPEG Annex K example quantization
and Huffman tables, and a progressive (SOF2) encoder with a
libjpeg-style scan script and per-scan OPTIMIZED Huffman tables (the
Annex K example tables carry no EOBn symbols, so progressive streams
must ship their own — the same reason cjpeg forces optimization in
progressive mode).  Both exist so the decoder is testable in this
container (no Pillow to produce fixtures); both emit fully standard
interchange-format streams, and both quantize through the same shared
front half, so progressive-decode ≡ baseline-decode BIT-EXACTLY for the
same input — the differential contract the tests pin.

Reference parity: the reference repo has no image codecs — this is part
of the multimodal-column story (SURVEY §2.5 / the LLM-pipeline brief),
where image bytes ride as opaque binary columns and decode runs inside
Arrow-batched Pandas UDFs (operators/multimodal.py plumbing).

Scale: pure per-row CPU work with no cross-row state — embarrassingly
parallel under mapInPandas; the only knobs that matter at 100 TB are
batch size (Arrow flight) and partition count.

Implementation notes:
- IDCT/FDCT are the orthonormal 8×8 DCT-II basis applied as two
  matmuls, vectorized over ALL blocks of a plane with one einsum.
- The entropy decoder splits the scan on restart markers and decodes
  each interval with fresh DC predictors (that IS the semantics of
  RSTn).
- Huffman tables decode through a (length → first-code/offset) table,
  the canonical-code trick, not a per-bit tree walk.
"""

from __future__ import annotations

import struct

# ---------------------------------------------------------------------------
# Constants: zig-zag order and the JPEG Annex K example tables.
# ---------------------------------------------------------------------------

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

#: Annex K.1 luminance / K.2 chrominance quantization tables (natural order
#: is obtained by de-zigzagging these, which are listed in zig-zag order).
QT_LUM = [
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
]
QT_CHROM = [
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
]

# Annex K.3: (BITS counts for lengths 1..16, HUFFVAL symbol list)
HUFF_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_DC_CHROM = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
        0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
        0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
        0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
        0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
HUFF_AC_CHROM = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
        0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
        0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
        0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
        0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
        0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _dct_basis():
    """Orthonormal 8×8 DCT-II basis matrix C: dct2(B) = C @ B @ C.T."""
    import math

    import numpy as np

    c = np.zeros((8, 8))
    for k in range(8):
        a = math.sqrt(0.125) if k == 0 else 0.5
        for n in range(8):
            c[k, n] = a * math.cos(math.pi * (2 * n + 1) * k / 16.0)
    return c


def _dezigzag64(vals):
    import numpy as np

    out = np.zeros(64, dtype=np.float64)
    out[ZIGZAG] = vals
    return out.reshape(8, 8)


# ---------------------------------------------------------------------------
# Canonical Huffman code construction (shared by encode and decode).
# ---------------------------------------------------------------------------


def _canonical_codes(bits, vals):
    """(BITS, HUFFVAL) → {symbol: (code, length)} per JPEG C.2."""
    codes, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _HuffDecoder:
    """Canonical-code decode tables: per length, the first code value and
    the index of its first symbol — O(#lengths) per symbol, no tree."""

    def __init__(self, bits, vals):
        self.vals = vals
        self.mincode, self.maxcode, self.valptr = {}, {}, {}
        code, k = 0, 0
        for length in range(1, 17):
            n = bits[length - 1]
            if n:
                self.valptr[length] = k
                self.mincode[length] = code
                code += n
                k += n
                self.maxcode[length] = code - 1
            else:
                self.maxcode[length] = -1
            code <<= 1

    def decode(self, reader):
        code = 0
        for length in range(1, 17):
            code = (code << 1) | reader.read_bit()
            if self.maxcode[length] >= 0 and code <= self.maxcode[length]:
                return self.vals[self.valptr[length] + code - self.mincode[length]]
        raise ValueError("invalid Huffman code in entropy stream")


class _BitReader:
    """MSB-first bit reader over a de-stuffed entropy interval."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.buf = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                # past the end: JPEG pads with 1-bits
                return 1
            self.buf = self.data[self.pos]
            self.pos += 1
            self.nbits = 8
        self.nbits -= 1
        return (self.buf >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _extend(v: int, t: int) -> int:
    """JPEG F.2.2.1 sign extension of a t-bit magnitude."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def _parse_stream(content: bytes):
    """Full marker walk: every scan in the stream, each carrying its own
    snapshot of the Huffman tables and restart interval in force at its
    SOS (tables may be redefined between progressive scans).  Returns
    ``(qt, sof, mode, scans)`` with ``mode`` in {"baseline",
    "progressive"}; each scan dict holds the raw (stuffed) entropy bytes
    for that scan only."""
    if content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qt, huff_dc, huff_ac = {}, {}, {}
    sof = None
    mode = None
    dri = 0
    scans = []
    i, n = 2, len(content)
    while i < n - 1:
        if content[i] != 0xFF:
            i += 1
            continue
        marker = content[i + 1]
        if marker == 0xFF:  # fill byte
            i += 1
            continue
        if marker in (0x01,) or 0xD0 <= marker <= 0xD8:
            i += 2
            continue
        if marker == 0xD9:  # EOI
            break
        ln = struct.unpack(">H", content[i + 2 : i + 4])[0]
        seg = content[i + 4 : i + 2 + ln]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quantization tables")
                qt[tq] = list(seg[j + 1 : j + 65])
                j += 65
        elif marker in (0xC0, 0xC1, 0xC2):  # baseline / extended / progressive
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise NotImplementedError("only 8-bit precision")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            sof = {"h": h, "w": w, "comps": comps}
            mode = "progressive" if marker == 0xC2 else "baseline"
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"SOF{marker - 0xC0}: only baseline-sequential and "
                "progressive (SOF2) JPEG are decoded"
            )
        elif marker == 0xC4:  # DHT
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 0x0F
                bits = list(seg[j + 1 : j + 17])
                nv = sum(bits)
                vals = list(seg[j + 17 : j + 17 + nv])
                (huff_dc if tc == 0 else huff_ac)[th] = _HuffDecoder(bits, vals)
                j += 17 + nv
        elif marker == 0xDD:  # DRI
            dri = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            sel = {}
            order = []
            for s in range(ns):
                cs, tt = seg[1 + 2 * s : 3 + 2 * s]
                sel[cs] = {"dc": tt >> 4, "ac": tt & 0x0F}
                order.append(cs)
            ss, se, a = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            data_at = i + 2 + ln
            # skip the entropy-coded data: stuffed 0xFF00, fill bytes and
            # RSTn stay inside the scan; any other marker ends it
            j = data_at
            while j < n - 1:
                if content[j] != 0xFF:
                    j += 1
                    continue
                nb = content[j + 1]
                if nb == 0x00:
                    j += 2
                elif nb == 0xFF:
                    j += 1
                elif 0xD0 <= nb <= 0xD7:
                    j += 2
                else:
                    break
            scans.append(
                {
                    "sel": sel,
                    "order": order,
                    "ss": ss,
                    "se": se,
                    "ah": a >> 4,
                    "al": a & 0x0F,
                    "dri": dri,
                    "dc": dict(huff_dc),
                    "ac": dict(huff_ac),
                    "data": content[data_at:j],
                }
            )
            i = j
            continue
        i += 2 + ln
    if sof is None or not scans:
        raise ValueError("truncated JPEG: missing SOF/SOS")
    return qt, sof, mode, scans


def _split_intervals(data: bytes):
    """De-stuff the entropy stream and split it on restart markers.
    Returns the list of de-stuffed intervals (DC predictors and EOB runs
    reset at each boundary)."""
    intervals, cur = [], bytearray()
    i, n = 0, len(data)
    while i < n:
        b = data[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        nxt = data[i + 1] if i + 1 < n else 0xD9
        if nxt == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= nxt <= 0xD7:
            intervals.append(bytes(cur))
            cur = bytearray()
            i += 2
        elif nxt == 0xFF:
            # fill byte before a marker (T.81 §B.1.1.2) — hardware
            # encoders pad restart boundaries with 0xFF runs.  Treating
            # this as end-of-scan silently dropped every remaining
            # restart interval (r6 review; _parse_stream already keeps
            # fill bytes inside scan data).
            i += 1
        else:  # EOI or the next real marker: scan is over
            break
    intervals.append(bytes(cur))
    return intervals


def _ac_first(reader, dec_ac, blk, k0, se, al, eobrun):
    """One block of an AC first scan (G.1.2.2); with ``al=0, k0=1,
    se=63`` this IS the baseline AC procedure (EOB == an EOB-run of 1).
    Returns the remaining EOB run."""
    if eobrun > 0:
        return eobrun - 1
    k = k0
    while k <= se:
        rs = dec_ac.decode(reader)
        r, s = rs >> 4, rs & 0x0F
        if s:
            k += r
            if k > se:
                raise ValueError("AC run past end of band")
            blk[k] = _extend(reader.receive(s), s) << al
            k += 1
        else:
            if r != 15:  # EOBn: run of 2^r + receive(r) blocks ending here
                eobrun = (1 << r) - 1
                if r:
                    eobrun += reader.receive(r)
                break
            k += 16  # ZRL
    return eobrun


def _ac_refine(reader, dec_ac, blk, k0, se, al, eobrun):
    """One block of an AC successive-approximation refinement scan
    (G.1.2.3): newly-nonzero coefficients arrive as ±1<<al; every
    already-nonzero coefficient crossed on the way appends one
    correction bit.  Returns the remaining EOB run."""
    p1 = 1 << al
    m1 = -p1
    k = k0
    if eobrun == 0:
        while k <= se:
            rs = dec_ac.decode(reader)
            r, s = rs >> 4, rs & 0x0F
            newval = 0
            if s:
                if s != 1:
                    raise ValueError("invalid symbol in AC refinement scan")
                newval = p1 if reader.read_bit() else m1
            else:
                if r != 15:  # EOBn: refine the rest of this block below
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.receive(r)
                    break
                # ZRL: pass over 16 zero-history coefficients
            # advance over r zero-history coefficients, refining the
            # nonzero-history ones crossed on the way
            while k <= se:
                if blk[k] != 0:
                    if reader.read_bit():
                        if (int(blk[k]) & p1) == 0:
                            blk[k] += p1 if blk[k] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval and k <= se:
                blk[k] = newval
            k += 1
    if eobrun > 0:
        while k <= se:
            if blk[k] != 0:
                if reader.read_bit():
                    if (int(blk[k]) & p1) == 0:
                        blk[k] += p1 if blk[k] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _decode_scan(scan, sof, coefs, mcux, mcuy):
    """Decode one scan's entropy data into the per-component zig-zag
    coefficient arrays.  Handles interleaved (multi-component) and
    non-interleaved (single-component) scans, restart intervals, and all
    four progressive procedures; a baseline scan is the ss=0/se=63/
    ah=al=0 case of the same code path."""
    w, h = sof["w"], sof["h"]
    hmax = max(c["h"] for c in sof["comps"])
    vmax = max(c["v"] for c in sof["comps"])
    in_scan = [c for c in sof["comps"] if c["id"] in scan["sel"]]
    ss, se, ah, al = scan["ss"], scan["se"], scan["ah"], scan["al"]
    interleaved = len(in_scan) > 1
    if interleaved:
        units = mcux * mcuy
    else:
        c0 = in_scan[0]
        # non-interleaved scans cover the component's OWN block grid
        # (ceil of its scaled dimensions), not the padded MCU grid
        bw = -(-w * c0["h"] // (8 * hmax))
        bh = -(-h * c0["v"] // (8 * vmax))
        units = bw * bh

    intervals = _split_intervals(scan["data"])
    per = scan["dri"] if scan["dri"] else units
    unit = 0
    for data in intervals:
        if unit >= units:
            break
        reader = _BitReader(data)
        pred = {c["id"]: 0 for c in in_scan}
        eobrun = 0
        for _ in range(min(per, units - unit)):
            if interleaved:
                my, mx = divmod(unit, mcux)
                blocks = []
                for c in in_scan:
                    stride = mcux * c["h"]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            idx = (my * c["v"] + by) * stride + (mx * c["h"] + bx)
                            blocks.append((c, coefs[c["id"]][idx]))
            else:
                r_, col = divmod(unit, bw)
                blocks = [(c0, coefs[c0["id"]][r_ * (mcux * c0["h"]) + col])]
            for c, blk in blocks:
                sel = scan["sel"][c["id"]]
                if ss == 0:
                    dec_dc = scan["dc"][sel["dc"]]
                    if ah == 0:  # DC first (baseline DC when al == 0)
                        t = dec_dc.decode(reader)
                        pred[c["id"]] += _extend(reader.receive(t), t)
                        blk[0] = pred[c["id"]] << al
                    else:  # DC refinement: one bit per block
                        if reader.read_bit():
                            blk[0] |= 1 << al
                if se >= 1 and se >= ss:
                    dec_ac = scan["ac"][sel["ac"]]
                    k0 = max(ss, 1)
                    if ah == 0:
                        eobrun = _ac_first(reader, dec_ac, blk, k0, se, al, eobrun)
                    else:
                        eobrun = _ac_refine(reader, dec_ac, blk, k0, se, al, eobrun)
            unit += 1


def _reconstruct(qt, sof, coefs, mcux, mcuy):
    """Shared back half of decode: dequantize + de-zigzag (vectorized per
    plane), IDCT every block in one einsum, upsample, color-convert."""
    import numpy as np

    h, w, comps = sof["h"], sof["w"], sof["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    cmat = _dct_basis()
    rasters = {}
    for c in comps:
        bw, bh = mcux * c["h"], mcuy * c["v"]
        q = np.asarray(qt[c["tq"]], dtype=np.float64)
        zz = coefs[c["id"]].astype(np.float64) * q
        nat = np.zeros_like(zz)
        nat[:, ZIGZAG] = zz
        blocks = nat.reshape(-1, 8, 8)
        px = np.einsum("ki,nkl,lj->nij", cmat, blocks, cmat) + 128.0
        px = px.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        # upsample to full MCU grid by sample-factor replication, crop
        px = np.repeat(np.repeat(px, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        rasters[c["id"]] = px[:h, :w]

    if len(comps) == 1:
        y = np.clip(np.rint(rasters[comps[0]["id"]]), 0, 255).astype(np.uint8)
        return np.repeat(y[:, :, None], 3, axis=2)
    if len(comps) != 3:
        raise NotImplementedError(f"{len(comps)}-component JPEG")
    y, cb, cr = (rasters[c["id"]] for c in comps)
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.rint(np.stack([r, g, b], axis=2)), 0, 255).astype(np.uint8)


def decode_jpeg(content: bytes):
    """Baseline-sequential or progressive (SOF2) JPEG → uint8 RGB
    ndarray (h, w, 3).

    Entropy decoding accumulates integer coefficients per component
    across however many scans the stream carries (one for baseline; DC/
    AC spectral-selection and successive-approximation scans for
    progressive), then a shared vectorized dequantize+IDCT reconstructs
    pixels.  Grayscale expands to 3 channels; chroma planes upsample by
    pixel replication (the nearest-neighbor inverse of subsampled
    encode)."""
    import numpy as np

    qt, sof, _mode, scans = _parse_stream(content)
    h, w, comps = sof["h"], sof["w"], sof["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    coefs = {
        c["id"]: np.zeros((mcuy * c["v"] * mcux * c["h"], 64), dtype=np.int32)
        for c in comps
    }
    for scan in scans:
        _decode_scan(scan, sof, coefs, mcux, mcuy)
    return _reconstruct(qt, sof, coefs, mcux, mcuy)


def jpeg_dimensions(content: bytes) -> tuple[int, int]:
    """(width, height) from any SOFn header — no entropy decode, and
    deliberately lenient: works for progressive/arithmetic streams whose
    pixel decode this codec gates."""
    if content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    i, n = 2, len(content)
    while i + 3 < n:
        if content[i] != 0xFF:
            i += 1
            continue
        marker = content[i + 1]
        if marker in (0x01,) or 0xD0 <= marker <= 0xD9:
            i += 2
            continue
        ln = struct.unpack(">H", content[i + 2 : i + 4])[0]
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            h, w = struct.unpack(">HH", content[i + 5 : i + 9])
            return int(w), int(h)
        i += 2 + ln
    raise ValueError("truncated JPEG: no SOF marker")


# ---------------------------------------------------------------------------
# Encoder (baseline, Annex K tables; 4:4:4 or 4:2:0)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.buf = (self.buf << 1) | ((code >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.buf)
                if self.buf == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.buf = 0
                self.nbits = 0

    def flush(self) -> None:
        while self.nbits:  # pad with 1-bits per the standard
            self.write(1, 1)


def _magnitude(v: int) -> tuple[int, int]:
    """(category t, t-bit code) for a coefficient value (F.1.2.1)."""
    t, a = 0, abs(v)
    while a:
        t += 1
        a >>= 1
    code = v if v >= 0 else v + (1 << t) - 1
    return t, code & ((1 << t) - 1)


def _quantize_planes(px, subsampling: str):
    """Shared front half of both encoders: RGB → YCbCr → (optional 4:2:0
    / 4:2:2 chroma box-average) → pad to the MCU grid → FDCT → Annex-K
    quantize.  Returns ``(h, w, sampling, quantized, mcux, mcuy)`` where
    ``quantized[ci]`` is an int64 (n_blocks, 8, 8) natural-order grid."""
    import numpy as np

    if subsampling not in ("444", "422", "420"):
        raise ValueError("subsampling must be '444', '422' or '420'")
    px = np.asarray(px, dtype=np.float64)
    h, w = px.shape[:2]
    r, g, b = px[:, :, 0], px[:, :, 1], px[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b

    if subsampling == "420":
        sampling = [(2, 2), (1, 1), (1, 1)]
        # box-average 2×2 before encoding chroma at half resolution
        def half(p):
            hh, ww = (p.shape[0] + 1) & ~1, (p.shape[1] + 1) & ~1
            pp = _pad_edge(p, hh, ww)
            return (pp[0::2, 0::2] + pp[0::2, 1::2] + pp[1::2, 0::2] + pp[1::2, 1::2]) / 4.0

        planes = [y, half(cb), half(cr)]
    elif subsampling == "422":
        sampling = [(2, 1), (1, 1), (1, 1)]
        # horizontal-only pair average: chroma at half width, full height
        def half_h(p):
            ww = (p.shape[1] + 1) & ~1
            pp = _pad_edge(p, p.shape[0], ww)
            return (pp[:, 0::2] + pp[:, 1::2]) / 2.0

        planes = [y, half_h(cb), half_h(cr)]
    else:
        sampling = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]

    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    qlum = _dezigzag64(np.array(QT_LUM, dtype=np.float64))
    qchrom = _dezigzag64(np.array(QT_CHROM, dtype=np.float64))
    cmat = _dct_basis()

    # per-component quantized block grids (natural order)
    quantized = []
    for ci, (plane, (sh, sv)) in enumerate(zip(planes, sampling)):
        ph, pw = mcuy * sv * 8, mcux * sh * 8
        p = _pad_edge(plane, ph, pw) - 128.0
        blocks = (
            p.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
        )
        coeffs = np.einsum("ik,nkl,jl->nij", cmat, blocks, cmat)
        q = qlum if ci == 0 else qchrom
        quantized.append(np.rint(coeffs / q).astype(np.int64))
    return h, w, sampling, quantized, mcux, mcuy


def encode_jpeg(px, subsampling: str = "444") -> bytes:
    """uint8 RGB (h, w, 3) → baseline JFIF-style JPEG bytes.

    Annex K quantization/Huffman tables as-is (≈ libjpeg quality 50);
    ``subsampling`` is "444", "422" or "420".
    """
    import numpy as np

    h, w, sampling, quantized, mcux, mcuy = _quantize_planes(px, subsampling)

    dc_tables = [_canonical_codes(*HUFF_DC_LUM), _canonical_codes(*HUFF_DC_CHROM)]
    ac_tables = [_canonical_codes(*HUFF_AC_LUM), _canonical_codes(*HUFF_AC_CHROM)]

    writer = _BitWriter()
    pred = [0, 0, 0]
    zzidx = np.array(ZIGZAG)  # hoisted: rebuilt per block was pure waste
    for mcu in range(mcux * mcuy):
        my, mx = divmod(mcu, mcux)
        for ci, (sh, sv) in enumerate(sampling):
            dc_codes = dc_tables[0 if ci == 0 else 1]
            ac_codes = ac_tables[0 if ci == 0 else 1]
            bw_blocks = mcux * sh
            for by in range(sv):
                for bx in range(sh):
                    row, col = my * sv + by, mx * sh + bx
                    blk = quantized[ci][row * bw_blocks + col]
                    zz = blk.reshape(64)[zzidx]
                    diff = int(zz[0]) - pred[ci]
                    pred[ci] = int(zz[0])
                    t, code = _magnitude(diff)
                    hc, hl = dc_codes[t]
                    writer.write(hc, hl)
                    if t:
                        writer.write(code, t)
                    run = 0
                    last_nz = max(np.nonzero(zz)[0]) if np.any(zz) else 0
                    for k in range(1, 64):
                        v = int(zz[k])
                        if v == 0:
                            if k > last_nz:
                                hc, hl = ac_codes[0x00]  # EOB
                                writer.write(hc, hl)
                                break
                            run += 1
                            if run == 16:
                                hc, hl = ac_codes[0xF0]  # ZRL
                                writer.write(hc, hl)
                                run = 0
                            continue
                        t, code = _magnitude(v)
                        hc, hl = ac_codes[(run << 4) | t]
                        writer.write(hc, hl)
                        writer.write(code, t)
                        run = 0
    writer.flush()

    out = bytearray(b"\xff\xd8")  # SOI

    def seg(marker, payload):
        out.extend(bytes([0xFF, marker]))
        out.extend(struct.pack(">H", len(payload) + 2))
        out.extend(payload)

    seg(0xDB, bytes([0x00]) + bytes(QT_LUM))
    seg(0xDB, bytes([0x01]) + bytes(QT_CHROM))
    sof = bytearray([8])
    sof.extend(struct.pack(">HH", h, w))
    sof.append(3)
    for ci, (sh, sv) in enumerate(sampling):
        sof.extend([ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1])
    seg(0xC0, bytes(sof))
    for tc, th, (bits, vals) in (
        (0, 0, HUFF_DC_LUM),
        (0, 1, HUFF_DC_CHROM),
        (1, 0, HUFF_AC_LUM),
        (1, 1, HUFF_AC_CHROM),
    ):
        seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))
    sos = bytearray([3])
    for ci in range(3):
        sos.extend([ci + 1, 0x00 if ci == 0 else 0x11])
    sos.extend([0, 63, 0])
    seg(0xDA, bytes(sos))
    out.extend(writer.out)
    out.extend(b"\xff\xd9")  # EOI
    return bytes(out)


def _pad_edge(p, ph: int, pw: int):
    """Edge-replicate pad a 2-D plane to (ph, pw)."""
    import numpy as np

    h, w = p.shape
    if h == ph and w == pw:
        return p
    out = np.empty((ph, pw), dtype=p.dtype)
    out[:h, :w] = p
    if pw > w:
        out[:h, w:] = p[:, w - 1 : w]
    if ph > h:
        out[h:, :] = out[h - 1 : h, :]
    return out


# ---------------------------------------------------------------------------
# Progressive encoder (SOF2): spectral selection + successive
# approximation, per-scan optimized Huffman tables.
# ---------------------------------------------------------------------------


def _optimal_huffman(freq: dict):
    """Symbol frequencies → (BITS, HUFFVAL) per JPEG Annex K.2.

    The classic two-smallest-merge with code-length tracking, the 16-bit
    limit adjustment, and a reserved pseudo-symbol 256 so the all-ones
    code is never assigned.  Progressive AC scans NEED this: the Annex K
    example tables carry no EOBn symbols (0x10..0xE0), so a progressive
    encoder must ship its own tables — the same reason cjpeg forces
    Huffman optimization in progressive mode."""
    f = [0] * 257
    for sym, n in freq.items():
        f[sym] = n
    f[256] = 1  # reserved: guarantees no real symbol gets all-ones
    codesize = [0] * 257
    others = [-1] * 257
    while True:
        v1 = v2 = -1
        for i in range(257):
            if f[i] > 0 and (v1 < 0 or f[i] < f[v1] or (f[i] == f[v1] and i > v1)):
                v1 = i
        for i in range(257):
            if i != v1 and f[i] > 0 and (
                v2 < 0 or f[i] < f[v2] or (f[i] == f[v2] and i > v2)
            ):
                v2 = i
        if v2 < 0:
            break
        f[v1] += f[v2]
        f[v2] = 0
        codesize[v1] += 1
        while others[v1] >= 0:
            v1 = others[v1]
            codesize[v1] += 1
        others[v1] = v2
        codesize[v2] += 1
        while others[v2] >= 0:
            v2 = others[v2]
            codesize[v2] += 1
    bits = [0] * 33
    for i in range(257):
        if codesize[i]:
            bits[codesize[i]] += 1
    # limit code lengths to 16 (Annex K.3 adjustment)
    for i in range(32, 16, -1):
        while bits[i] > 0:
            j = i - 2
            while bits[j] == 0:
                j -= 1
            bits[i] -= 2
            bits[i - 1] += 1
            bits[j + 1] += 2
            bits[j] -= 1
    i = 16
    while i > 0 and bits[i] == 0:
        i -= 1
    if i > 0:
        bits[i] -= 1  # drop the reserved pseudo-symbol's slot
    huffval = [
        s
        for _, s in sorted(
            (codesize[s], s) for s in range(256) if codesize[s] > 0
        )
    ]
    return bits[1:17], huffval


class _ScanOps:
    """Two-pass entropy writer for one progressive scan: pass 1 records
    (symbol | raw-bit) ops and symbol frequencies; pass 2 replays them
    through a _BitWriter once the optimal table is known."""

    def __init__(self):
        self.ops = []
        self.freq = {}

    def sym(self, s: int) -> None:
        self.ops.append((True, s, 0))
        self.freq[s] = self.freq.get(s, 0) + 1

    def bits(self, v: int, n: int) -> None:
        if n:
            self.ops.append((False, v, n))

    def rst(self) -> None:
        """Restart-marker boundary: pad to a byte and emit RSTn."""
        self.ops.append((None, 0, 0))

    def replay(self, writer: "_BitWriter", codes: dict) -> None:
        n_rst = 0
        for is_sym, v, n in self.ops:
            if is_sym is None:
                writer.flush()
                writer.out.extend((0xFF, 0xD0 + n_rst % 8))
                n_rst += 1
            elif is_sym:
                c, ln = codes[v]
                writer.write(c, ln)
            else:
                writer.write(v, n)


#: Default progressive scan script (libjpeg-style): interleaved coarse
#: DC, luma AC in two spectral bands at Al=2, chroma AC at Al=1, then
#: the three successive-approximation refinement passes and the DC
#: refinement.  (comps, Ss, Se, Ah, Al) — Ah=0 marks a first pass.
_PROGRESSIVE_SCRIPT = [
    ((0, 1, 2), 0, 0, 0, 1),
    ((0,), 1, 5, 0, 2),
    ((1,), 1, 63, 0, 1),
    ((2,), 1, 63, 0, 1),
    ((0,), 6, 63, 0, 2),
    ((0,), 1, 63, 2, 1),
    ((0, 1, 2), 0, 0, 1, 0),
    ((1,), 1, 63, 1, 0),
    ((2,), 1, 63, 1, 0),
    ((0,), 1, 63, 1, 0),
]


def _scan_blocks(ci, sampling, w, h, mcux, mcuy):
    """Raster order of a component's OWN blocks (non-interleaved scan)
    as storage indices into the padded MCU-grid block array."""
    sh, sv = sampling[ci]
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    bw = -(-w * sh // (8 * hmax))
    bh = -(-h * sv // (8 * vmax))
    stride = mcux * sh
    return [r * stride + c for r in range(bh) for c in range(bw)]


def _encode_ac_first(ops, zz, block_idx, ss, se, al, dri=0):
    """AC first pass (G.1.2.2 encoder): values |coef|>>Al with sign,
    zero runs, ZRL, and accumulated EOB runs.  ``dri`` > 0 inserts a
    restart boundary every ``dri`` blocks (EOB runs never span one)."""
    eobrun = 0

    def emit_eobrun():
        nonlocal eobrun
        if eobrun > 0:
            nbits = eobrun.bit_length() - 1
            ops.sym(nbits << 4)
            ops.bits(eobrun & ((1 << nbits) - 1), nbits)
            eobrun = 0

    for i, idx in enumerate(block_idx):
        if dri and i and i % dri == 0:
            emit_eobrun()
            ops.rst()
        row = zz[idx]
        r = 0
        wrote = False
        for k in range(ss, se + 1):
            v = int(row[k])
            t = (abs(v) >> al) * (1 if v >= 0 else -1)
            if t == 0:
                r += 1
                continue
            emit_eobrun()
            while r > 15:
                ops.sym(0xF0)
                r -= 16
            nb, code = _magnitude(t)
            ops.sym((r << 4) | nb)
            ops.bits(code, nb)
            r = 0
            wrote = True
        if r > 0 or not wrote:
            eobrun += 1
            if eobrun == 0x7FFF:
                emit_eobrun()
    emit_eobrun()


def _encode_ac_refine(ops, zz, block_idx, ss, se, al, dri=0):
    """AC refinement pass (G.1.2.3 encoder): newly-nonzero coefficients
    as run+sign, correction bits for history-nonzero ones buffered and
    emitted after the symbol (or EOB run) they trail.  ``dri`` > 0
    inserts a restart boundary every ``dri`` blocks (pending EOB runs
    and correction bits flush first — nothing spans a restart)."""
    eobrun = 0
    corr: list = []  # correction bits pending behind an EOB run

    def emit_eobrun():
        nonlocal eobrun, corr
        if eobrun > 0:
            nbits = eobrun.bit_length() - 1
            ops.sym(nbits << 4)
            ops.bits(eobrun & ((1 << nbits) - 1), nbits)
            eobrun = 0
            for b in corr:
                ops.bits(b, 1)
            corr = []

    for i, idx in enumerate(block_idx):
        if dri and i and i % dri == 0:
            emit_eobrun()
            ops.rst()
        row = zz[idx]
        t = [abs(int(row[k])) >> al for k in range(ss, se + 1)]
        # index (into the band) of the last NEWLY-nonzero coefficient:
        # trailing zeros after it fold into the EOB run
        eob_at = -1
        for j, v in enumerate(t):
            if v == 1:
                eob_at = j
        r = 0
        br: list = []  # correction bits pending behind the next symbol
        for j, v in enumerate(t):
            if v == 0:
                r += 1
                continue
            # ZRLs are forced at ANY nonzero once r exceeds 15 (but fold
            # into the EOB run past the last newly-nonzero coefficient):
            # the decoder consumes buffered correction bits while walking
            # the 16 zero-history slots, so the flush must happen HERE,
            # not deferred to the next newly-nonzero symbol
            while r > 15 and j <= eob_at:
                emit_eobrun()
                ops.sym(0xF0)
                r -= 16
                for b in br:
                    ops.bits(b, 1)
                br = []
            if v > 1:  # history-nonzero: one correction bit, no run entry
                br.append(v & 1)
                continue
            # newly-nonzero (|coef|>>Al == 1)
            emit_eobrun()
            ops.sym((r << 4) | 1)
            r = 0
            ops.bits(1 if int(row[ss + j]) >= 0 else 0, 1)
            for b in br:
                ops.bits(b, 1)
            br = []
        if r > 0 or br:
            eobrun += 1
            corr.extend(br)
            if eobrun == 0x7FFF or len(corr) > 900:
                emit_eobrun()
    emit_eobrun()


def encode_jpeg_progressive(
    px, subsampling: str = "444", script=None, dri: int = 0
) -> bytes:
    """uint8 RGB (h, w, 3) → progressive (SOF2) JPEG bytes.

    Identical quantized coefficients to :func:`encode_jpeg` (shared
    front half), delivered as a libjpeg-style scan script: spectral
    selection plus successive approximation.  DC scans use the Annex K
    DC tables; every AC scan ships its own optimized Huffman table
    (DHT emitted immediately before its SOS) because the Annex K
    example tables have no EOBn symbols.  Decoding this stream yields
    BIT-IDENTICAL pixels to decoding the baseline stream for the same
    input — the coefficient path is exact.  ``dri`` > 0 emits a DRI
    segment and restart markers every ``dri`` MCUs in every scan (an
    MCU is one block in the non-interleaved AC scans), with DC
    predictors and EOB runs reset at each boundary — real progressive
    crawl payloads use restart intervals routinely."""
    h, w, sampling, quantized, mcux, mcuy = _quantize_planes(px, subsampling)
    zzs = [q.reshape(-1, 64)[:, ZIGZAG] for q in quantized]
    script = list(_PROGRESSIVE_SCRIPT if script is None else script)

    out = bytearray(b"\xff\xd8")  # SOI

    def seg(marker, payload):
        out.extend(bytes([0xFF, marker]))
        out.extend(struct.pack(">H", len(payload) + 2))
        out.extend(payload)

    seg(0xDB, bytes([0x00]) + bytes(QT_LUM))
    seg(0xDB, bytes([0x01]) + bytes(QT_CHROM))
    sof = bytearray([8])
    sof.extend(struct.pack(">HH", h, w))
    sof.append(3)
    for ci, (sh, sv) in enumerate(sampling):
        sof.extend([ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1])
    seg(0xC2, bytes(sof))  # SOF2: progressive DCT
    for tc, th, (bits, vals) in ((0, 0, HUFF_DC_LUM), (0, 1, HUFF_DC_CHROM)):
        seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))
    if dri:
        seg(0xDD, struct.pack(">H", dri))
    dc_codes = [_canonical_codes(*HUFF_DC_LUM), _canonical_codes(*HUFF_DC_CHROM)]

    for comps, ss, se, ah, al in script:
        writer = _BitWriter()
        if ss == 0:  # DC scan (interleaved when several components)
            pred = {ci: 0 for ci in comps}
            n_rst = 0
            for mcu in range(mcux * mcuy):
                if dri and mcu and mcu % dri == 0:
                    writer.flush()
                    writer.out.extend((0xFF, 0xD0 + n_rst % 8))
                    n_rst += 1
                    pred = {ci: 0 for ci in comps}
                my, mx = divmod(mcu, mcux)
                for ci in comps:
                    sh, sv = sampling[ci]
                    stride = mcux * sh
                    for by in range(sv):
                        for bx in range(sh):
                            idx = (my * sv + by) * stride + (mx * sh + bx)
                            v = int(zzs[ci][idx, 0])
                            if ah == 0:
                                s = v >> al
                                diff = s - pred[ci]
                                pred[ci] = s
                                t, code = _magnitude(diff)
                                hc, hl = dc_codes[0 if ci == 0 else 1][t]
                                writer.write(hc, hl)
                                if t:
                                    writer.write(code, t)
                            else:
                                writer.write((v >> al) & 1, 1)
        else:  # AC scan: single component, two-pass optimal table
            (ci,) = comps
            ops = _ScanOps()
            block_idx = _scan_blocks(ci, sampling, w, h, mcux, mcuy)
            if ah == 0:
                _encode_ac_first(ops, zzs[ci], block_idx, ss, se, al, dri=dri)
            else:
                _encode_ac_refine(ops, zzs[ci], block_idx, ss, se, al, dri=dri)
            bits, vals = _optimal_huffman(ops.freq or {0x00: 1})
            th = 0 if ci == 0 else 1
            seg(0xC4, bytes([(1 << 4) | th]) + bytes(bits) + bytes(vals))
            ops.replay(writer, _canonical_codes(bits, vals))
        writer.flush()
        sos = bytearray([len(comps)])
        for ci in comps:
            th = 0 if ci == 0 else 1
            # T.81 scan-header rule (and libjpeg's emit_sos): a DC scan
            # must write Ta=0 and an AC scan Td=0 — the unused selector
            # may reference a table that is never defined at this point
            # in the stream, and strict decoders reject that (r6 review;
            # the in-repo decoder ignores unused selectors, which is why
            # round-trips couldn't catch it).
            td = th if ss == 0 else 0
            ta = th if ss > 0 else 0
            sos.extend([ci + 1, (td << 4) | ta])
        sos.extend([ss, se, (ah << 4) | al])
        seg(0xDA, bytes(sos))
        out.extend(writer.out)
    out.extend(b"\xff\xd9")  # EOI
    return bytes(out)
