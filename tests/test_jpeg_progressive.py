"""Progressive (SOF2) JPEG decode tests.

No codec library exists in this container to produce progressive
streams, so these tests hand-build them with a minimal progressive
ENCODER implementing T.81 G.1.2 (spectral selection, successive
approximation, EOB-run accumulation) on top of the library's own
quantization pipeline. The pinned property: a progressive stream
carrying the same quantized coefficients as `encode_jpeg`'s baseline
stream must decode to EXACTLY the same pixels — progressive scans are
a re-ordering of the entropy layer, not a different image.
"""

import struct as st

import numpy as np

from lazy_frame_spark.operators import jpeg as J


def _trunc(v: int, al: int) -> int:
    """AC point transform: sign(v) * (|v| >> al) (T.81 G.1.2.1)."""
    return (abs(v) >> al) * (1 if v >= 0 else -1)


def _ac_table_with_eobn(base):
    """Annex K AC tables lack the EOBn (n>0) symbols progressive scans
    need — and their canonical code space has exactly ONE free 16-bit
    slot, so appending 14 symbols there is impossible. Build a flat
    8-bit canonical table over the same symbol set plus EOB1..EOB14
    (176 symbols <= 256, Kraft sum 176/256 < 1 — valid, just not
    compact; compression ratio is irrelevant to a round-trip test)."""
    vals = list(base[1])
    for sym in range(0x10, 0xF0, 0x10):  # EOB1..EOB14
        if sym not in vals:
            vals.append(sym)
    bits = [0] * 16
    bits[7] = len(vals)
    codes = J._build_codes(bits, vals)
    assert len(codes) == len(vals)
    assert all(code < (1 << ln) for code, ln in codes.values())
    return bits, vals


def _quantized(px, quality):
    """Mirror encode_jpeg's transform: per-component (bh, bw, 64)
    zigzag-indexed quantized coefficients + quant tables."""
    px = np.asarray(px, dtype=np.uint8)
    gray = px.ndim == 2
    h, w = px.shape[:2]
    qlum = J._scale_quant(J._QUANT_LUM, quality)
    qchr = J._scale_quant(J._QUANT_CHROM, quality)
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
    out = []
    for p, q in zip(planes, quants):
        pad = np.empty((hh, ww))
        pad[:h, :w] = p
        pad[h:, :w] = p[-1:, :]
        pad[:, w:] = pad[:, w - 1:w]
        blocks = pad.reshape(hh // 8, 8, ww // 8, 8).transpose(0, 2, 1, 3) - 128.0
        qz = np.round((J._C @ blocks @ J._C.T) / q).astype(np.int64)
        out.append(qz.reshape(hh // 8, ww // 8, 64)[..., J._ZZ])
    return out, quants, gray, h, w


def _headers(h, w, quants, gray, ac_tables):
    out = bytearray(b"\xff\xd8")
    qlist = [(0, quants[0])] + ([] if gray else [(1, quants[1])])
    for tid, q in qlist:
        out += (b"\xff\xdb" + st.pack(">H", 67) + bytes([tid])
                + bytes(int(x) for x in q.reshape(-1)[J._ZZ]))
    n = 1 if gray else 3
    sof = st.pack(">BHHB", 8, h, w, n)
    for ci in range(n):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out += b"\xff\xc2" + st.pack(">H", 2 + len(sof)) + sof  # SOF2
    tables = [(0, 0, J._DC_LUM), (1, 0, ac_tables[0])]
    if not gray:
        tables += [(0, 1, J._DC_CHROM), (1, 1, ac_tables[1])]
    for tc, th, (bits, vals) in tables:
        body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + st.pack(">H", 2 + len(body)) + body
    return out


def _sos(spec, ss, se, ah, al):
    body = bytes([len(spec)])
    for cs, td, ta in spec:
        body += bytes([cs, (td << 4) | ta])
    body += bytes([ss, se, (ah << 4) | al])
    return b"\xff\xda" + st.pack(">H", 2 + len(body)) + body


def _dc_first(blocks_list, al):
    codes = [
        J._build_codes(*(J._DC_LUM if i == 0 else J._DC_CHROM))
        for i in range(len(blocks_list))
    ]
    bw = J._BitWriter()
    preds = [0] * len(blocks_list)
    bh, bwid = blocks_list[0].shape[:2]
    for by in range(bh):
        for bx in range(bwid):
            for ci, blocks in enumerate(blocks_list):
                v = int(blocks[by, bx, 0]) >> al  # DC: arithmetic shift
                s, lo = J._magnitude(v - preds[ci])
                preds[ci] = v
                c, ln = codes[ci][s]
                bw.write(c, ln)
                bw.write(lo, s)
    bw.flush()
    return bw.out


def _dc_refine(blocks_list, al):
    bw = J._BitWriter()
    bh, bwid = blocks_list[0].shape[:2]
    for by in range(bh):
        for bx in range(bwid):
            for blocks in blocks_list:
                bw.write((int(blocks[by, bx, 0]) >> al) & 1, 1)
    bw.flush()
    return bw.out


def _ac_first(blocks, ss, se, al, table):
    codes = J._build_codes(*table)
    bw = J._BitWriter()
    eobs = 0  # bands (incl. the one carrying the symbol) ended by EOB

    def flush_eob():
        nonlocal eobs
        run = eobs.bit_length() - 1
        c, ln = codes[run << 4]
        bw.write(c, ln)
        if run:
            bw.write(eobs - (1 << run), run)
        eobs = 0

    bh, bwid = blocks.shape[:2]
    for by in range(bh):
        for bx in range(bwid):
            band = [_trunc(int(v), al) for v in blocks[by, bx, ss:se + 1]]
            nz = [(i, v) for i, v in enumerate(band) if v]
            if not nz:
                eobs += 1
                continue
            if eobs:
                flush_eob()
            prev = -1
            for i, v in nz:
                r = i - prev - 1
                while r > 15:
                    c, ln = codes[0xF0]
                    bw.write(c, ln)
                    r -= 16
                s, lo = J._magnitude(v)
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


def _ac_refine(blocks, ss, se, al, table):
    """T.81 G.1.2.3 refinement emitter (mirrors libjpeg's
    encode_mcu_AC_refine structure): newly-nonzero coefficients as
    (run-of-zero-history, 1) + sign bit; correction bits for
    nonzero-history coefficients buffered and flushed after the next
    symbol; correction-only bands join EOB runs."""
    codes = J._build_codes(*table)
    bw = J._BitWriter()
    eobs = 0
    pend = []  # correction bits owed to the pending EOB run

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

    bh, bwid = blocks.shape[:2]
    for by in range(bh):
        for bx in range(bwid):
            band = [int(v) for v in blocks[by, bx, ss:se + 1]]
            temp = [abs(v) >> al for v in band]
            news = [i for i, t in enumerate(temp) if t == 1]
            if not news:  # correction-only band → EOB run
                eobs += 1
                pend += [t & 1 for t in temp if t > 1]
                continue
            if eobs:
                flush_eob()
            last_new = news[-1]
            corr, r = [], 0
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


def _rst_free(entropy: bytes) -> bytes:
    return bytes(entropy)


def _assemble(px, quality, scan_builder):
    blocks, quants, gray, h, w = _quantized(px, quality)
    ac_tabs = (_ac_table_with_eobn(J._AC_LUM), _ac_table_with_eobn(J._AC_CHROM))
    out = _headers(h, w, quants, gray, ac_tabs)
    for sos_hdr, entropy in scan_builder(blocks, gray, ac_tabs):
        out += sos_hdr + _rst_free(entropy)
    out += b"\xff\xd9"
    return bytes(out), blocks


def _baseline_pixels(px, quality):
    return J.decode_jpeg(J.encode_jpeg(px, quality=quality))


def _smooth_gray(h, w, seed):
    rng = np.random.RandomState(seed)
    y, x = np.mgrid[0:h, 0:w]
    img = 128 + 60 * np.sin(x / 5.0) + 40 * np.cos(y / 7.0)
    img += rng.randint(-8, 9, size=(h, w))
    return np.clip(img, 0, 255).astype(np.uint8)


def _smooth_rgb(h, w, seed):
    g = _smooth_gray(h, w, seed)
    r = np.roll(g, 3, axis=1)
    b = np.roll(g, 5, axis=0)
    return np.stack([r, g, b], axis=2)


def test_progressive_spectral_selection_gray():
    px = _smooth_gray(24, 17, 1)

    def scans(blocks, gray, ac_tabs):
        yield _sos([(1, 0, 0)], 0, 0, 0, 0), _dc_first(blocks, 0)
        for ss, se in ((1, 5), (6, 20), (21, 63)):
            yield _sos([(1, 0, 0)], ss, se, 0, 0), _ac_first(
                blocks[0], ss, se, 0, ac_tabs[0]
            )

    blob, _ = _assemble(px, 85, scans)
    got = J.decode_jpeg(blob)
    want = _baseline_pixels(px, 85)
    assert np.array_equal(got, want)


def test_progressive_spectral_selection_rgb():
    px = _smooth_rgb(16, 24, 2)

    def scans(blocks, gray, ac_tabs):
        yield _sos([(1, 0, 0), (2, 1, 1), (3, 1, 1)], 0, 0, 0, 0), _dc_first(blocks, 0)
        for ci in range(3):
            tab = ac_tabs[0] if ci == 0 else ac_tabs[1]
            ta = 0 if ci == 0 else 1
            for ss, se in ((1, 9), (10, 63)):
                yield _sos([(ci + 1, 0, ta)], ss, se, 0, 0), _ac_first(
                    blocks[ci], ss, se, 0, tab
                )

    blob, _ = _assemble(px, 85, scans)
    got = J.decode_jpeg(blob)
    want = _baseline_pixels(px, 85)
    assert np.array_equal(got, want)


def test_progressive_successive_approximation_gray():
    """DC at Al=1 + refinement, AC band at Al=1 + refinement — the full
    successive-approximation path, still byte-equal to baseline."""
    px = _smooth_gray(24, 24, 3)

    def scans(blocks, gray, ac_tabs):
        yield _sos([(1, 0, 0)], 0, 0, 0, 1), _dc_first(blocks, 1)
        yield _sos([(1, 0, 0)], 1, 63, 0, 1), _ac_first(blocks[0], 1, 63, 1, ac_tabs[0])
        yield _sos([(1, 0, 0)], 0, 0, 1, 0), _dc_refine(blocks, 0)
        yield _sos([(1, 0, 0)], 1, 63, 1, 0), _ac_refine(
            blocks[0], 1, 63, 0, ac_tabs[0]
        )

    blob, _ = _assemble(px, 85, scans)
    got = J.decode_jpeg(blob)
    want = _baseline_pixels(px, 85)
    assert np.array_equal(got, want)


def test_progressive_successive_approximation_rgb_split_bands():
    px = _smooth_rgb(19, 21, 4)

    def scans(blocks, gray, ac_tabs):
        yield _sos([(1, 0, 0), (2, 1, 1), (3, 1, 1)], 0, 0, 0, 2), _dc_first(blocks, 2)
        for ci in range(3):
            tab = ac_tabs[0] if ci == 0 else ac_tabs[1]
            ta = 0 if ci == 0 else 1
            yield _sos([(ci + 1, 0, ta)], 1, 63, 0, 1), _ac_first(
                blocks[ci], 1, 63, 1, tab
            )
        yield _sos([(1, 0, 0), (2, 0, 0), (3, 0, 0)], 0, 0, 2, 1), _dc_refine(blocks, 1)
        yield _sos([(1, 0, 0), (2, 0, 0), (3, 0, 0)], 0, 0, 1, 0), _dc_refine(blocks, 0)
        for ci in range(3):
            tab = ac_tabs[0] if ci == 0 else ac_tabs[1]
            ta = 0 if ci == 0 else 1
            for ss, se in ((1, 12), (13, 63)):
                yield _sos([(ci + 1, 0, ta)], ss, se, 1, 0), _ac_refine(
                    blocks[ci], ss, se, 0, tab
                )

    blob, _ = _assemble(px, 80, scans)
    got = J.decode_jpeg(blob)
    want = _baseline_pixels(px, 80)
    assert np.array_equal(got, want)


def test_progressive_eob_runs_across_blocks():
    """A mostly-flat image makes long EOB runs (many consecutive
    all-zero AC bands) — the EOBn > EOB0 decode path."""
    px = np.full((48, 48), 120, np.uint8)
    px[20:24, 20:24] = 200  # one busy patch so not every band is empty

    def scans(blocks, gray, ac_tabs):
        yield _sos([(1, 0, 0)], 0, 0, 0, 0), _dc_first(blocks, 0)
        yield _sos([(1, 0, 0)], 1, 63, 0, 0), _ac_first(blocks[0], 1, 63, 0, ac_tabs[0])

    blob, blocks = _assemble(px, 75, scans)
    # the stream must actually contain an EOBn with n>0 for this test to
    # mean anything: >=3 consecutive all-zero bands exist
    zero_bands = sum(
        1 for by in range(blocks[0].shape[0]) for bx in range(blocks[0].shape[1])
        if not blocks[0][by, bx, 1:].any()
    )
    assert zero_bands >= 3
    got = J.decode_jpeg(blob)
    want = _baseline_pixels(px, 75)
    assert np.array_equal(got, want)


def test_encode_jpeg_progressive_matches_baseline():
    """The library's own progressive ENCODER (scan script: banded AC
    first at Al=1 + DC/AC refinement) must agree with the hand-built
    streams above: same quantized coefficients → same pixels as the
    baseline stream, across shapes, parities, and qualities."""
    cases = [
        _smooth_gray(24, 17, 11),
        _smooth_rgb(16, 24, 12),
        _smooth_gray(1, 1, 13),
        _smooth_rgb(19, 21, 14),
    ]
    for px in cases:
        for q in (50, 75, 95):
            prog = J.encode_jpeg_progressive(px, quality=q)
            assert J.probe_jpeg_mode(prog) == "progressive"
            got = J.decode_jpeg(prog)
            want = _baseline_pixels(px, q)
            assert np.array_equal(got, want), (px.shape, q)


def test_probe_jpeg_mode():
    px = _smooth_gray(8, 8, 15)
    assert J.probe_jpeg_mode(J.encode_jpeg(px)) == "baseline"
    assert J.probe_jpeg_mode(J.encode_jpeg_progressive(px)) == "progressive"
    import pytest

    with pytest.raises(ValueError):
        J.probe_jpeg_mode(b"\x89PNG\r\n\x1a\nnot a jpeg")
    with pytest.raises(ValueError):
        J.probe_jpeg_mode(b"\xff\xd8\xff\xd9")  # SOI+EOI, no SOF


def test_progressive_encoder_long_eob_runs():
    """A flat image through the package encoder: EOBn accumulation across
    many all-zero bands, including the banded (1,5)/(6,63) split."""
    px = np.full((64, 64), 200, np.uint8)
    px[30:34, 30:34] = 60
    prog = J.encode_jpeg_progressive(px, quality=75)
    assert np.array_equal(J.decode_jpeg(prog), _baseline_pixels(px, 75))


def test_progressive_decode_pixels_dispatch():
    """decode_pixels routes progressive payloads through decode_jpeg."""
    from lazy_frame_spark.operators import multimodal as mm

    px = _smooth_gray(8, 8, 5)

    def scans(blocks, gray, ac_tabs):
        yield _sos([(1, 0, 0)], 0, 0, 0, 0), _dc_first(blocks, 0)
        yield _sos([(1, 0, 0)], 1, 63, 0, 0), _ac_first(blocks[0], 1, 63, 0, ac_tabs[0])

    blob, _ = _assemble(px, 85, scans)
    assert mm.probe_media(blob)[0] == "image/jpeg"
    got = mm.decode_pixels(blob)
    assert np.array_equal(got, _baseline_pixels(px, 85))
