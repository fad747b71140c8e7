"""GIF codec — real LZW, pure stdlib+numpy (no codec libraries).

Completes the image family next to the PNG and JPEG codecs
(operators/multimodal.py, operators/jpeg.py): GIF is the palette+LZW
member — variable-width codes (LSB-first bit packing), a growing string
table with the classic one-entry decoder lag, sub-block framing, and
four-pass row interlacing.

Decoder: GIF87a/89a, global and local color tables, 89a extension
blocks skipped by sub-block framing, interlaced and non-interlaced
images, deferred-clear streams. Returns the FIRST image frame as an
HxWx3 uint8 array (animation frames beyond the first are out of scope —
a training pipeline fingerprints the poster frame).

Encoder: real LZW compression (string table, width growth at
``next_code == (1 << width) + 1``, table reset at 4096), global color
table built from the image's unique colors (≤256 — the format's own
limit), non-interlaced output.

The encoder/decoder pair is pinned by random-image round-trip tests —
the only honest check of LZW width synchronization, where the decoder
runs one table entry behind the encoder by construction.
"""

from __future__ import annotations

import struct

_HDR87 = b"GIF87a"
_HDR89 = b"GIF89a"


# --------------------------------------------------------------------- #
# LZW core
# --------------------------------------------------------------------- #

def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> list[int]:
    """Variable-width LSB-first LZW decode (GIF flavor)."""
    clear = 1 << min_code_size
    end = clear + 1
    out: list[int] = []

    # bit reader state
    acc = 0
    nbits = 0
    pos = 0

    def reset_table():
        return {i: (i,) for i in range(clear)}, end + 1, min_code_size + 1

    table, next_code, width = reset_table()
    prev: tuple[int, ...] | None = None

    while len(out) < n_pixels:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("truncated LZW stream")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width

        if code == clear:
            table, next_code, width = reset_table()
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            entry = table[code]
        elif code in table:
            entry = table[code]
            table[next_code] = prev + (entry[0],)
            next_code += 1
        elif code == next_code:
            entry = prev + (prev[0],)
            table[next_code] = entry
            next_code += 1
        else:
            raise ValueError(f"invalid LZW code {code}")
        out.extend(entry)
        if next_code == (1 << width) and width < 12:
            width += 1
        prev = entry
    return out[:n_pixels]


def _lzw_encode(indices, min_code_size: int) -> bytes:
    """Real LZW compression, the exact mirror of ``_lzw_decode``'s
    growth rules (encoder is one table entry AHEAD, hence the +1 in the
    width bump)."""
    clear = 1 << min_code_size
    end = clear + 1

    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def reset_table():
        return {(i,): i for i in range(clear)}, end + 1, min_code_size + 1

    table, next_code, width = reset_table()
    emit(clear, width)
    w: tuple[int, ...] = ()
    for k in indices:
        wk = w + (int(k),)
        if wk in table:
            w = wk
            continue
        emit(table[w], width)
        table[wk] = next_code
        next_code += 1
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        if next_code > 4095:
            emit(clear, width)
            table, next_code, width = reset_table()
        w = (int(k),)
    if w:
        emit(table[w], width)
    emit(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# --------------------------------------------------------------------- #
# container
# --------------------------------------------------------------------- #

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace_order(h: int) -> list[int]:
    order = []
    for start, step in _INTERLACE_PASSES:
        order.extend(range(start, h, step))
    return order


def decode_gif(blob: bytes):
    """First frame of a GIF → HxWx3 uint8 RGB array (the poster-frame
    fingerprint path). Delegates to the multi-frame walker with
    ``limit=1`` so the container walk exists exactly once."""
    return decode_gif_frames(blob, limit=1)[0]


def encode_gif(px) -> bytes:
    """HxWx3 uint8 array → non-interlaced single-frame GIF89a. Shares
    ``_frame_block`` with the animation encoder (one palette/LZW/
    sub-block emission path), so the frame carries a LOCAL color table
    and the logical screen declares none."""
    import numpy as np

    px = np.asarray(px, dtype=np.uint8)
    if px.ndim == 2:
        px = np.stack([px] * 3, axis=-1)
    h, w, _ = px.shape
    out = bytearray()
    out += _HDR89
    out += struct.pack("<HH", w, h)
    out += bytes([0x00, 0, 0])  # no global color table
    out += _frame_block(px)
    out += b"\x3B"
    return bytes(out)


# --------------------------------------------------------------------- #
# animation: multi-frame GIF89a — the stdlib-only "video" container
# --------------------------------------------------------------------- #

def decode_gif_frames(blob: bytes, limit: int | None = None):
    """ALL frames of a GIF (or the first ``limit``) → list of HxWx3
    uint8 RGB arrays.

    Frames are decoded independently (each image block with its own —
    or the global — color table); disposal/compositing is out of scope:
    the encoder below always writes full-size replacement frames, which
    is also how training pipelines treat sampled video frames. Shares
    the single-frame decoder's LZW core, interlace handling, and
    sub-block framing."""
    import numpy as np

    if blob[:6] not in (_HDR87, _HDR89):
        raise ValueError("not a GIF payload")
    pos = 13
    packed = blob[10]
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(blob[pos:pos + 3 * n], "u1").reshape(-1, 3)
        pos += 3 * n

    frames = []
    while pos < len(blob):
        b = blob[pos]
        if b == 0x21:
            pos += 2
            while blob[pos]:
                pos += blob[pos] + 1
            pos += 1
        elif b == 0x2C:
            _left, _top, iw, ih = struct.unpack("<HHHH", blob[pos + 1:pos + 9])
            ipacked = blob[pos + 9]
            pos += 10
            ct = gct
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                ct = np.frombuffer(blob[pos:pos + 3 * n], "u1").reshape(-1, 3)
                pos += 3 * n
            if ct is None:
                raise ValueError("GIF image without a color table")
            min_code_size = blob[pos]
            pos += 1
            data = bytearray()
            while blob[pos]:
                ln = blob[pos]
                data += blob[pos + 1:pos + 1 + ln]
                pos += ln + 1
            pos += 1
            idx = np.array(
                _lzw_decode(bytes(data), min_code_size, iw * ih), dtype=np.int64
            ).reshape(ih, iw)
            if ipacked & 0x40:
                order = _deinterlace_order(ih)
                rows = np.empty_like(idx)
                rows[order] = idx
                idx = rows
            frames.append(ct[idx])
            if limit is not None and len(frames) >= limit:
                return frames
        elif b == 0x3B:
            break
        else:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
    if not frames:
        raise ValueError("GIF contains no image data")
    return frames


def _frame_block(px) -> bytes:
    """One full-size image block (descriptor + LOCAL color table + LZW
    data) for an animation frame."""
    import numpy as np

    px = np.asarray(px, dtype=np.uint8)
    h, w, _ = px.shape
    flat = px.reshape(-1, 3)
    palette, idx = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(f"{len(palette)} colors exceed GIF's 256-color limit")
    bits = max(1, int(len(palette) - 1).bit_length())
    table_n = 1 << bits
    pad = np.zeros((table_n - len(palette), 3), dtype=np.uint8)
    ct = np.concatenate([palette, pad])

    out = bytearray()
    # local color table flag + size in the image descriptor's packed byte
    out += b"\x2C" + struct.pack("<HHHH", 0, 0, w, h)
    out += bytes([0x80 | ((bits - 1) & 0x07)])
    out += ct.tobytes()
    min_code_size = max(2, bits)
    out += bytes([min_code_size])
    data = _lzw_encode(idx.tolist(), min_code_size)
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00"
    return bytes(out)


def encode_gif_animation(frames, delay_cs: int = 10) -> bytes:
    """List of same-shape HxWx3 uint8 arrays → animated GIF89a: NETSCAPE
    loop extension, then per frame a graphic-control extension (the
    ``delay_cs`` centisecond delay) + a full-size image block with its
    own LOCAL color table — no global palette to build, every frame
    palettes independently (and the decoder composites nothing)."""
    import numpy as np

    if not frames:
        raise ValueError("no frames")
    shaped = []
    for f in frames:
        f = np.asarray(f, dtype=np.uint8)
        if f.ndim == 2:
            f = np.stack([f] * 3, axis=-1)
        shaped.append(f)
    h, w, _ = shaped[0].shape
    if any(f.shape != (h, w, 3) for f in shaped):
        raise ValueError("all frames must share one shape")

    out = bytearray()
    out += _HDR89
    out += struct.pack("<HH", w, h)
    out += bytes([0x00, 0, 0])  # no global color table
    # NETSCAPE 2.0 loop-forever extension
    out += b"\x21\xFF\x0BNETSCAPE2.0\x03\x01\x00\x00\x00"
    for f in shaped:
        out += b"\x21\xF9\x04\x00" + struct.pack("<H", delay_cs) + b"\x00\x00"
        out += _frame_block(f)
    out += b"\x3B"
    return bytes(out)
