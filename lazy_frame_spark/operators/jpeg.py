"""Baseline JPEG codec — pure numpy + stdlib, no codec libraries.

Implements the sequential-DCT baseline process of ITU-T T.81 (the
public JPEG standard): 8x8 block DCT, quantization with the Annex K
example tables (libjpeg-style quality scaling), zigzag ordering, DC
differential + AC run-length coding, and canonical Huffman entropy
coding with the Annex K example tables.

- ``encode_jpeg``: 8-bit grayscale or RGB (JFIF YCbCr, 4:4:4 — no
  subsampling) at a given quality. Emits SOI/APP0/DQT/SOF0/DHT/SOS/EOI.
- ``decode_jpeg``: any baseline (SOF0/SOF1) JFIF stream — arbitrary
  sampling factors (4:2:0 chroma upsampled nearest), restart intervals,
  multiple DQT/DHT segments. Progressive (SOF2) and the other
  non-baseline processes raise NotImplementedError, which
  ``decode_image_features`` surfaces per-payload (dead-letter routing),
  mirroring the PNG codec's 16-bit/interlaced behavior.

Fidelity contract (pinned by tests): a constant-valued block at
quality 75 round-trips EXACTLY (luminance quantizer 8 divides the DC
scale 8, so dequantization is the identity on the DC path) — that
closed form is what the ``multimodal_jpeg_roundtrip`` parity oracle
states. Smooth images round-trip within normal DCT quantization error.

Like the PNG codec, per-image work is sequential; parallelism comes
from Arrow batches across partitions (operators/multimodal.py), which
is the right shape for 100 TB of small media files.

Reference parity note: the reference (bwlewis/lazy.frame) treats cell
bytes as uninterpreted payloads (src/lazy.frame.c) — codecs are
north-star scope beyond it.
"""

from __future__ import annotations

import struct

import numpy as np

# ------------------------------------------------------------------- #
# tables (ITU-T T.81 Annex K — the public example tables)
# ------------------------------------------------------------------- #

_QUANT_LUM = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)

_QUANT_CHROM = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int32,
)

# (bits-per-length[1..16], symbol values) — canonical Huffman specs
_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROM = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_AC_CHROM = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _zigzag_flat() -> np.ndarray:
    """Flat (row*8+col) indices of the 64 coefficients in zigzag order:
    diagonal s = r+c, odd diagonals walked top→bottom, even bottom→top."""
    order = []
    for s in range(15):
        rng = range(min(s, 7), max(0, s - 7) - 1, -1) if s % 2 == 0 else \
            range(max(0, s - 7), min(s, 7) + 1)
        order.extend(r * 8 + (s - r) for r in rng)
    return np.array(order, dtype=np.int64)


_ZZ = _zigzag_flat()

# orthonormal 8-point DCT-II matrix: dct2d(B) = C @ B @ C.T
_C = np.array(
    [
        [
            (1.0 / np.sqrt(8.0)) if k == 0
            else 0.5 * np.cos((2 * n + 1) * k * np.pi / 16.0)
            for n in range(8)
        ]
        for k in range(8)
    ]
)


def _scale_quant(table: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg-style quality scaling of a quant table (public formula:
    scale 5000/Q below 50, 200-2Q above; entries clamped to [1, 255])."""
    quality = max(1, min(100, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((table * scale + 50) // 100, 1, 255).astype(np.int32)


def _build_codes(bits, vals) -> dict:
    """Canonical Huffman assignment (T.81 C.2): symbol → (code, length)."""
    codes, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_decode(bits, vals) -> dict:
    """(length, code) → symbol, the decode-side view of the same codes."""
    return {(ln, c): s for s, (c, ln) in _build_codes(bits, vals).items()}


class _BitWriter:
    """MSB-first bit accumulator with JPEG 0xFF byte stuffing."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # pad with 1-bits (T.81 F.1.2.3)


def _magnitude(v: int) -> tuple[int, int]:
    """(size, low-order bits) encoding of a DC diff / AC value."""
    if v == 0:
        return 0, 0
    s = abs(v).bit_length()
    return s, v if v > 0 else v + (1 << s) - 1


def _quantize_planes(px, quality: int):
    """Shared encoder front half: color-convert, pad to 8x8 tiles by edge
    replication, DCT, quantize. Returns ``(quantized, quants, gray, h, w)``
    with ``quantized[ci]`` a (bh, bw, 64) int64 array in NATURAL (row-major
    frequency) order — index with ``[..., _ZZ]`` for zigzag."""
    px = np.asarray(px, dtype=np.uint8)
    if px.ndim == 3 and px.shape[2] == 1:
        px = px[:, :, 0]
    gray = px.ndim == 2
    h, w = px.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    qlum = _scale_quant(_QUANT_LUM, quality)
    qchr = _scale_quant(_QUANT_CHROM, quality)

    if gray:
        planes, quants = [px.astype(np.float64)], [qlum]
    else:
        r, g, b = (px[..., i].astype(np.float64) for i in range(3))
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
        quants = [qlum, qchr, qchr]

    hh, ww = -(-h // 8) * 8, -(-w // 8) * 8
    quantized = []
    for p, q in zip(planes, quants):
        pad = np.empty((hh, ww))
        pad[:h, :w] = p
        pad[h:, :w] = p[-1:, :]
        pad[:, w:] = pad[:, w - 1:w]
        blocks = pad.reshape(hh // 8, 8, ww // 8, 8).transpose(0, 2, 1, 3) - 128.0
        coefs = _C @ blocks @ _C.T  # batched over (by, bx)
        qz = np.round(coefs / q).astype(np.int64)
        quantized.append(qz.reshape(hh // 8, ww // 8, 64))
    return quantized, quants, gray, h, w


def encode_jpeg(px, quality: int = 75) -> bytes:
    """Encode an HxW (grayscale) or HxWx3 (RGB) uint8 array as a
    baseline JFIF JPEG at the given quality. 4:4:4 — every component at
    full resolution, one MCU per 8x8 tile."""
    quantized, quants, gray, h, w = _quantize_planes(px, quality)
    qlum, qchr = quants[0], (quants[1] if not gray else None)
    ncomp = len(quantized)
    hh, ww = quantized[0].shape[0] * 8, quantized[0].shape[1] * 8

    out = bytearray(b"\xff\xd8")  # SOI
    out += (  # APP0 / JFIF 1.1, no thumbnail
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
        + struct.pack(">HHBB", 1, 1, 0, 0)
    )
    for tid, q in [(0, qlum)] + ([(1, qchr)] if not gray else []):
        out += (
            b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid])
            + bytes(int(v) for v in q.reshape(-1)[_ZZ])
        )
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    tables = [(0, 0, _DC_LUM), (1, 0, _AC_LUM)]
    if not gray:
        tables += [(0, 1, _DC_CHROM), (1, 1, _AC_CHROM)]
    for tc, th, (bits, vals) in tables:
        body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    dc_codes = [_build_codes(*_DC_LUM), _build_codes(*_DC_CHROM)]
    ac_codes = [_build_codes(*_AC_LUM), _build_codes(*_AC_CHROM)]
    bw = _BitWriter()
    pred = [0] * ncomp
    zz_blocks = [qz[..., _ZZ] for qz in quantized]
    for by in range(hh // 8):
        for bx in range(ww // 8):
            for ci in range(ncomp):
                tid = 0 if ci == 0 else 1
                zz = zz_blocks[ci][by, bx]
                dc = int(zz[0])
                s, lo = _magnitude(dc - pred[ci])
                pred[ci] = dc
                code, ln = dc_codes[tid][s]
                bw.write(code, ln)
                bw.write(lo, s)
                run = 0
                for k in range(1, 64):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = ac_codes[tid][0xF0]  # ZRL
                        bw.write(code, ln)
                        run -= 16
                    s, lo = _magnitude(v)
                    code, ln = ac_codes[tid][(run << 4) | s]
                    bw.write(code, ln)
                    bw.write(lo, s)
                    run = 0
                if run:
                    code, ln = ac_codes[tid][0x00]  # EOB
                    bw.write(code, ln)
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _ac_table_with_eobn(base) -> tuple[list[int], list[int]]:
    """AC Huffman table for progressive scans: the Annex K symbol set
    plus EOB1..EOB14 (T.81 G.1.2.2 end-of-band runs). Annex K's own
    canonical code space has exactly ONE free 16-bit slot, so the extra
    symbols cannot be appended there; a flat 8-bit canonical table
    (176 symbols <= 256, Kraft sum < 1) is valid and trivially decodable
    — compactness is not the point of this encoder."""
    vals = list(base[1])
    for sym in range(0x10, 0xF0, 0x10):  # EOB1..EOB14
        if sym not in vals:
            vals.append(sym)
    bits = [0] * 16
    bits[7] = len(vals)
    return bits, vals


def _ac_point_transform(v: int, al: int) -> int:
    """AC point transform: sign(v) * (|v| >> Al) (T.81 G.1.2.1)."""
    return (abs(v) >> al) * (1 if v >= 0 else -1)


def _prog_dc_first(zz_list, al: int) -> bytes:
    """DC first scan (interleaved over components), successive
    approximation Al: encode diffs of (DC >> Al) — arithmetic shift,
    which Python's ``>>`` on ints already is."""
    codes = [
        _build_codes(*(_DC_LUM if ci == 0 else _DC_CHROM))
        for ci in range(len(zz_list))
    ]
    bw = _BitWriter()
    preds = [0] * len(zz_list)
    bh, bwid = zz_list[0].shape[:2]
    for by in range(bh):
        for bx in range(bwid):
            for ci, zz in enumerate(zz_list):
                v = int(zz[by, bx, 0]) >> al
                s, lo = _magnitude(v - preds[ci])
                preds[ci] = v
                c, ln = codes[ci][s]
                bw.write(c, ln)
                bw.write(lo, s)
    bw.flush()
    return bw.out


def _prog_dc_refine(zz_list, al: int) -> bytes:
    """DC refinement scan: one raw bit per block per component."""
    bw = _BitWriter()
    bh, bwid = zz_list[0].shape[:2]
    for by in range(bh):
        for bx in range(bwid):
            for zz in zz_list:
                bw.write((int(zz[by, bx, 0]) >> al) & 1, 1)
    bw.flush()
    return bw.out


def _prog_ac_first(zz, ss: int, se: int, al: int, table) -> bytes:
    """AC first scan for one component's band [Ss, Se] at approximation
    Al (T.81 G.1.2.2): run/size coding of the point-transformed band
    with EOBn run accumulation across all-zero bands."""
    codes = _build_codes(*table)
    bw = _BitWriter()
    eobs = 0  # bands (incl. the one carrying the symbol) ended by EOB

    def flush_eob():
        nonlocal eobs
        run = eobs.bit_length() - 1
        c, ln = codes[run << 4]
        bw.write(c, ln)
        if run:
            bw.write(eobs - (1 << run), run)
        eobs = 0

    bh, bwid = zz.shape[:2]
    for by in range(bh):
        for bx in range(bwid):
            band = [_ac_point_transform(int(v), al) for v in zz[by, bx, ss:se + 1]]
            nz = [(i, v) for i, v in enumerate(band) if v]
            if not nz:
                eobs += 1
                if eobs == 0x7FFF:  # EOB14 ceiling (T.81 G.1.2.2)
                    flush_eob()
                continue
            if eobs:
                flush_eob()
            prev = -1
            for i, v in nz:
                r = i - prev - 1
                while r > 15:
                    c, ln = codes[0xF0]  # ZRL
                    bw.write(c, ln)
                    r -= 16
                s, lo = _magnitude(v)
                c, ln = codes[(r << 4) | s]
                bw.write(c, ln)
                bw.write(lo, s)
                prev = i
            if prev < se - ss:
                eobs = 1  # trailing zeros: EOB owed in this band
    if eobs:
        flush_eob()
    bw.flush()
    return bw.out


def _prog_ac_refine(zz, ss: int, se: int, al: int, table) -> bytes:
    """AC refinement scan (T.81 G.1.2.3, the structure of libjpeg's
    encode_mcu_AC_refine): newly-nonzero coefficients emit
    (zero-history-run, 1) + a sign bit; history coefficients contribute
    buffered correction bits flushed after the next symbol; bands with
    no new nonzeros fold into EOB runs with their corrections pending."""
    codes = _build_codes(*table)
    bw = _BitWriter()
    eobs = 0
    pend: list[int] = []  # correction bits owed to the pending EOB run

    def flush_eob():
        nonlocal eobs, pend
        run = eobs.bit_length() - 1
        c, ln = codes[run << 4]
        bw.write(c, ln)
        if run:
            bw.write(eobs - (1 << run), run)
        for b in pend:
            bw.write(b, 1)
        eobs, pend = 0, []

    bh, bwid = zz.shape[:2]
    for by in range(bh):
        for bx in range(bwid):
            band = [int(v) for v in zz[by, bx, ss:se + 1]]
            temp = [abs(v) >> al for v in band]
            news = [i for i, t in enumerate(temp) if t == 1]
            if not news:  # correction-only band → EOB run
                eobs += 1
                pend += [t & 1 for t in temp if t > 1]
                if eobs == 0x7FFF:
                    flush_eob()
                continue
            if eobs:
                flush_eob()
            last_new = news[-1]
            corr: list[int] = []
            r = 0
            for i, t in enumerate(temp):
                if t == 0:
                    r += 1
                    continue
                while r > 15 and i <= last_new:
                    c, ln = codes[0xF0]
                    bw.write(c, ln)
                    r -= 16
                    for b in corr:
                        bw.write(b, 1)
                    corr = []
                if t > 1:  # nonzero history → buffer correction bit
                    corr.append(t & 1)
                    continue
                c, ln = codes[(r << 4) | 1]
                bw.write(c, ln)
                bw.write(1 if band[i] >= 0 else 0, 1)
                for b in corr:
                    bw.write(b, 1)
                corr, r = [], 0
            if r or corr:  # trailing zero-history / corrections → EOB run
                eobs = 1
                pend = corr
    if eobs:
        flush_eob()
    bw.flush()
    return bw.out


def encode_jpeg_progressive(px, quality: int = 75) -> bytes:
    """Encode an HxW (grayscale) or HxWx3 (RGB) uint8 array as a
    PROGRESSIVE (SOF2) JPEG carrying the same quantized coefficients as
    ``encode_jpeg``'s baseline stream — by construction the two decode
    to identical pixels (progressive scans re-order the entropy layer,
    they do not change the image; pinned in tests).

    Scan script (a successive-approximation spectral script in the
    shape of libjpeg's default simple progression):

    1. DC first, all components interleaved, Al=1
    2. per component: AC 1..5 first at Al=1, then AC 6..63 first at Al=1
    3. DC refinement to Al=0
    4. per component: AC refinements of both bands to Al=0
    """
    quantized, quants, gray, h, w = _quantize_planes(px, quality)
    zz_list = [qz[..., _ZZ] for qz in quantized]
    ncomp = len(zz_list)
    ac_tabs = [_ac_table_with_eobn(_AC_LUM)]
    if not gray:
        ac_tabs.append(_ac_table_with_eobn(_AC_CHROM))

    out = bytearray(b"\xff\xd8")  # SOI
    for tid, q in [(0, quants[0])] + ([(1, quants[1])] if not gray else []):
        out += (
            b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid])
            + bytes(int(v) for v in q.reshape(-1)[_ZZ])
        )
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof  # SOF2
    tables = [(0, 0, _DC_LUM), (1, 0, ac_tabs[0])]
    if not gray:
        tables += [(0, 1, _DC_CHROM), (1, 1, ac_tabs[1])]
    for tc, th, (bits, vals) in tables:
        body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body

    def sos(spec, ss, se, ah, al):
        body = bytes([len(spec)])
        for cs, td, ta in spec:
            body += bytes([cs, (td << 4) | ta])
        body += bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + struct.pack(">H", 2 + len(body)) + body

    all_comps = [
        (ci + 1, 0 if ci == 0 else 1, 0 if ci == 0 else 1) for ci in range(ncomp)
    ]
    bands = ((1, 5), (6, 63))

    out += sos(all_comps, 0, 0, 0, 1) + _prog_dc_first(zz_list, 1)
    for ci in range(ncomp):
        tab = ac_tabs[0] if ci == 0 else ac_tabs[1]
        ta = 0 if ci == 0 else 1
        for ss, se in bands:
            out += sos([(ci + 1, 0, ta)], ss, se, 0, 1)
            out += _prog_ac_first(zz_list[ci], ss, se, 1, tab)
    out += sos(all_comps, 0, 0, 1, 0) + _prog_dc_refine(zz_list, 0)
    for ci in range(ncomp):
        tab = ac_tabs[0] if ci == 0 else ac_tabs[1]
        ta = 0 if ci == 0 else 1
        for ss, se in bands:
            out += sos([(ci + 1, 0, ta)], ss, se, 1, 0)
            out += _prog_ac_refine(zz_list[ci], ss, se, 0, tab)
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def probe_jpeg_mode(blob: bytes) -> str:
    """Marker-walk a JPEG header (no entropy decode) and report its
    coding process: 'baseline' (SOF0/1), 'progressive' (SOF2), or the
    numeric SOFn for anything else. Raises ValueError on non-JPEG."""
    if not blob.startswith(b"\xff\xd8"):
        raise ValueError("not a JPEG")
    pos = 2
    while pos + 4 <= len(blob):
        if blob[pos] != 0xFF:
            pos += 1
            continue
        marker = blob[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker in (0xC0, 0xC1):
            return "baseline"
        if marker == 0xC2:
            return "progressive"
        if 0xC3 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            return f"sof{marker - 0xC0}"
        seg = struct.unpack(">H", blob[pos + 2:pos + 4])[0]
        if marker == 0xDA:  # SOS before any SOF: malformed
            raise ValueError("SOS before SOF")
        pos += 2 + seg
    raise ValueError("no SOF marker found")


class _BitReader:
    """MSB-first bit reader over entropy-coded data: un-stuffs 0xFF00,
    stops (feeding zero bits) at any other marker."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.d = data
        self.p = pos
        self.acc = 0
        self.n = 0
        self.eof = False

    def bit(self) -> int:
        if self.n == 0:
            if self.eof or self.p >= len(self.d):
                return 0
            b = self.d[self.p]
            self.p += 1
            if b == 0xFF:
                nxt = self.d[self.p] if self.p < len(self.d) else 0xD9
                if nxt == 0x00:
                    self.p += 1
                else:  # a real marker terminates the entropy segment
                    self.p -= 1
                    self.eof = True
                    return 0
            self.acc, self.n = b, 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, count: int) -> int:
        v = 0
        for _ in range(count):
            v = (v << 1) | self.bit()
        return v

    def decode(self, table: dict) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | self.bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in scan")

    def restart(self) -> None:
        """Byte-align and consume an RSTn marker (T.81 E.2.4)."""
        self.n = 0
        self.eof = False
        while self.p + 1 < len(self.d):
            if self.d[self.p] == 0xFF and 0xD0 <= self.d[self.p + 1] <= 0xD7:
                self.p += 2
                return
            self.p += 1
        raise ValueError("missing restart marker")


def _extend(v: int, s: int) -> int:
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg(blob: bytes):
    """Decode a baseline (SOF0/SOF1) or progressive (SOF2) JPEG to an
    HxWxC uint8 array (C=1 grayscale, C=3 RGB). Supports arbitrary
    sampling factors (chroma planes upsampled nearest-neighbor),
    restart intervals, multi-table DQT/DHT segments, multi-scan
    baseline files, and full progressive refinement (spectral selection
    AND successive approximation, T.81 G.2). Lossless/hierarchical/
    arithmetic-coded processes raise NotImplementedError.

    Every scan Huffman-decodes into per-component ZIGZAG-indexed
    coefficient arrays; dequantization + batched IDCT happen once at
    the end — the architecture progressive decoding forces, which the
    single-scan baseline path shares for free."""
    if not blob.startswith(b"\xff\xd8"):
        raise ValueError("not a JPEG payload")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    comps: list[dict] | None = None
    state: list[np.ndarray] | None = None
    h = w = hmax = vmax = 0
    progressive = False
    restart_interval = 0
    saw_scan = False
    while pos + 2 <= len(blob):
        if blob[pos] != 0xFF:
            raise ValueError("bad marker segment")
        marker = blob[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD8:
            pos += 2
            continue
        seg = struct.unpack(">H", blob[pos + 2:pos + 4])[0]
        body = blob[pos + 4:pos + 2 + seg]
        if marker == 0xDB:  # DQT (possibly several tables)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 15
                if pq:
                    raw = np.frombuffer(body[i + 1:i + 129], ">u2").astype(np.int64)
                    i += 129
                else:
                    raw = np.frombuffer(body[i + 1:i + 65], "u1").astype(np.int64)
                    i += 65
                tbl = np.zeros(64, np.int64)
                tbl[_ZZ] = raw
                qt[tq] = tbl.reshape(8, 8)
        elif marker == 0xC4:  # DHT (possibly several tables)
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 15
                bits = list(body[i + 1:i + 17])
                n = sum(bits)
                vals = list(body[i + 17:i + 17 + n])
                huff[(tc, th)] = _build_decode(bits, vals)
                i += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            progressive = marker == 0xC2
            h, w = struct.unpack(">HH", body[1:5])
            comps = []
            for ci in range(body[5]):
                cid, sf, tq = body[6 + 3 * ci:9 + 3 * ci]
                comps.append({"id": cid, "h": sf >> 4, "v": sf & 15, "tq": tq})
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            state = [
                np.zeros((mcuy * c["v"], mcux * c["h"], 64), np.int64)
                for c in comps
            ]
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(f"unsupported JPEG process (SOF{marker - 0xC0})")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS — entropy-coded data follows the header
            if comps is None or state is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            spec = []
            for i in range(ns):
                cs, tt = body[1 + 2 * i], body[2 + 2 * i]
                spec.append((cs, tt >> 4, tt & 15))
            ss, se, ahal = body[1 + 2 * ns:4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 15
            if progressive:
                if (ss == 0) != (se == 0) or se > 63:
                    raise ValueError("invalid progressive spectral band")
                if ss > 0 and ns != 1:
                    raise ValueError("progressive AC scan must be single-component")
            else:
                ss, se, ah, al = 0, 63, 0, 0
            pos = _decode_scan(
                blob, pos + 2 + seg, comps, spec, huff, state,
                hmax, vmax, w, h, restart_interval,
                ss, se, ah, al, progressive,
            )
            saw_scan = True
            continue
        pos += 2 + seg
    if not saw_scan:
        raise ValueError("no SOS marker found")
    return _reconstruct(comps, state, qt, hmax, vmax, w, h)


def _decode_scan(blob, start, comps, spec, huff, state,
                 hmax, vmax, w, h, restart_interval,
                 ss, se, ah, al, progressive):
    """Huffman-decode ONE scan into the coefficient state; returns the
    stream position of the marker that terminated the scan. Interleaved
    scans walk the MCU grid; single-component scans (progressive AC
    bands, multi-scan baseline) walk that component's own block grid in
    raster order (T.81 A.2.2)."""
    by_id = {c["id"]: i for i, c in enumerate(comps)}
    order = [(by_id[cs], td, ta) for cs, td, ta in spec]
    pred = {ci: 0 for ci, _, _ in order}
    eobrun = [0]
    br = _BitReader(blob, start)

    def block(ci, td, ta, by, bx):
        blk = state[ci][by, bx]
        if not progressive:
            _block_baseline(br, huff[(0, td)], huff[(1, ta)], blk, pred, ci)
        elif ss == 0:
            if ah == 0:
                s = br.decode(huff[(0, td)])
                pred[ci] += _extend(br.bits(s), s)
                blk[0] = pred[ci] << al
            elif br.bit():  # DC refinement: one bit per block
                blk[0] = int(blk[0]) | (1 << al)
        elif ah == 0:
            _ac_first(br, huff[(1, ta)], blk, ss, se, al, eobrun)
        else:
            _ac_refine(br, huff[(1, ta)], blk, ss, se, al, eobrun)

    def restart():
        br.restart()
        for k in pred:
            pred[k] = 0
        eobrun[0] = 0

    if len(order) == 1:
        ci, td, ta = order[0]
        comp = comps[ci]
        bw = -(-(-(-w * comp["h"] // hmax)) // 8)
        bh = -(-(-(-h * comp["v"] // vmax)) // 8)
        for n, (by, bx) in enumerate((y, x) for y in range(bh) for x in range(bw)):
            if restart_interval and n and n % restart_interval == 0:
                restart()
            block(ci, td, ta, by, bx)
    else:
        mcux = -(-w // (8 * hmax))
        mcuy = -(-h // (8 * vmax))
        for mcu in range(mcuy * mcux):
            if restart_interval and mcu and mcu % restart_interval == 0:
                restart()
            my, mx = divmod(mcu, mcux)
            for ci, td, ta in order:
                comp = comps[ci]
                for v in range(comp["v"]):
                    for hz in range(comp["h"]):
                        block(ci, td, ta, my * comp["v"] + v, mx * comp["h"] + hz)
    # the reader stops ON the terminating marker; re-sync to its 0xFF
    p = br.p
    while p < len(blob) and blob[p] != 0xFF:
        p += 1
    return p


def _block_baseline(br, dc_table, ac_table, blk, pred, ci):
    s = br.decode(dc_table)
    pred[ci] += _extend(br.bits(s), s)
    blk[0] = pred[ci]
    k = 1
    while k < 64:
        rs = br.decode(ac_table)
        run, size = rs >> 4, rs & 15
        if size == 0:
            if run == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += run
        if k > 63:
            raise ValueError("AC index overrun")
        blk[k] = _extend(br.bits(size), size)
        k += 1


def _ac_first(br, table, blk, ss, se, al, eobrun):
    """Progressive AC, first pass for this band (Ah=0): values arrive at
    precision Al; EOB symbols carry run lengths of all-zero bands."""
    if eobrun[0] > 0:
        eobrun[0] -= 1
        return
    k = ss
    while k <= se:
        rs = br.decode(table)
        run, size = rs >> 4, rs & 15
        if size == 0:
            if run < 15:  # EOBn: 2^run - 1 more all-zero bands
                eobrun[0] = (1 << run) - 1
                if run:
                    eobrun[0] += br.bits(run)
                return
            k += 16  # ZRL
            continue
        k += run
        if k > se:
            raise ValueError("AC band overrun")
        blk[k] = _extend(br.bits(size), size) << al
        k += 1


def _ac_refine(br, table, blk, ss, se, al, eobrun):
    """Progressive AC refinement (Ah>0, T.81 G.1.2.3): each
    already-nonzero coefficient passed receives a correction bit; new
    coefficients arrive as ±1<<Al after a run of zero-HISTORY positions;
    EOB runs still carry correction bits for nonzero history."""
    p1 = 1 << al

    def correct(k):
        c = int(blk[k])
        if c and br.bit() and not (abs(c) & p1):
            blk[k] = c + (p1 if c > 0 else -p1)

    k = ss
    if eobrun[0] == 0:
        while k <= se:
            rs = br.decode(table)
            run, size = rs >> 4, rs & 15
            newval = 0
            if size == 0:
                if run < 15:  # EOBn — includes the rest of this band
                    eobrun[0] = 1 << run
                    if run:
                        eobrun[0] += br.bits(run)
                    break
                # ZRL: advance 16 zero-history positions, no insertion
            else:
                newval = p1 if br.bit() else -p1
            while k <= se:
                if int(blk[k]) != 0:
                    correct(k)
                else:
                    if run == 0:
                        break
                    run -= 1
                k += 1
            if newval and k <= se:
                blk[k] = newval
            k += 1
    if eobrun[0] > 0:
        while k <= se:
            if int(blk[k]) != 0:
                correct(k)
            k += 1
        eobrun[0] -= 1


def _reconstruct(comps, state, qt, hmax, vmax, w, h):
    """Dequantize + batched IDCT every component plane, upsample
    subsampled chroma, convert to RGB/grayscale uint8."""
    full = []
    for comp, coefs in zip(comps, state):
        dqzz = qt[comp["tq"]].reshape(-1)[_ZZ].astype(np.float64)
        bh, bw = coefs.shape[:2]
        nat = np.zeros((bh, bw, 64))
        nat[:, :, _ZZ] = coefs * dqzz
        px = _C.T @ nat.reshape(bh, bw, 8, 8) @ _C + 128.0
        plane = px.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        if comp["h"] < hmax or comp["v"] < vmax:
            plane = np.repeat(
                np.repeat(plane, vmax // comp["v"], 0), hmax // comp["h"], 1
            )
        full.append(plane[:h, :w])
    if len(full) == 1:
        return np.clip(np.round(full[0]), 0, 255).astype(np.uint8)[:, :, None]
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
