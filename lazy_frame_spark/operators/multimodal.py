"""Multimodal column support: images/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched Pandas UDFs.

Decode is REAL for every container format parseable with stdlib+numpy:
- WAV (RIFF PCM 8/16/32-bit + float): sample-accurate numpy decode —
  rate, channels, duration, RMS, peak (``decode_audio_features``).
- netpbm P5/P6 (8- and 16-bit), uncompressed 24/32-bit BMP, and
  RLE8/RLE4-compressed palette BMP: full pixel decode
  (``decode_pixels``).
- PNG: full inflate + unfilter decode AND a matching encoder, stdlib
  zlib + numpy only (``decode_png`` / ``encode_png``) — every color
  type, all five scanline filters, 8- and 16-bit depths, sequential
  and Adam7-interlaced layouts.
- JPEG: full DCT codec — encoder (4:4:4 baseline) and decoder for
  baseline (SOF0/SOF1, any sampling factors, restart intervals) AND
  progressive (SOF2: spectral selection, successive approximation,
  EOB runs) with the T.81 Annex K tables, numpy + stdlib only
  (``operators/jpeg.py``).
- PNG / JPEG / GIF / WEBP(VP8X) / WAV: container sniffing + dimensions
  from headers without decompressing (``probe_media``) — the cheap path
  a 100 TB triage pass should take before any pixel work.
Remaining compressed formats (arithmetic-coded JPEG, bitfield BMP)
go through PIL when importable; in containers without
codecs they raise NotImplementedError with the plumbing unchanged (the
deterministic fake featureizer still exercises schema/batching
end-to-end).

Design for 100 TB of media:
- payloads stay ``BinaryType`` end-to-end (Arrow zero-copy into the UDF);
- metadata is a typed struct column, filterable without touching bytes
  (Catalyst prunes the binary column away when only metadata is read);
- ``mapInPandas`` processes whole Arrow batches — decode cost amortizes,
  and ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds memory.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: schema of the extracted features (what a real image decoder would emit)
IMAGE_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("sha1_8", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def attach_binary_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Demo payload builder: treats each document's UTF-8 bytes as an
    opaque media blob + typed metadata struct (what an ingest job would
    produce for real images)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    meta = F.struct(
        F.octet_length(payload).alias("n_bytes"),
        F.lit("application/octet-stream").alias("mime"),
        F.md5(F.hex(payload)).alias("checksum"),
    )
    return df.select(F.col(id_col), payload.alias("payload"), meta.alias("meta"))


# ------------------------------------------------------------------- #
# real container parsing (stdlib only — no codec libraries)
# ------------------------------------------------------------------- #

def probe_media(blob: bytes) -> tuple[str, int | None, int | None]:
    """Sniff (mime, width, height) from container headers WITHOUT
    decompressing the payload. Real parsing, not a fake: PNG IHDR, JPEG
    SOFn markers, GIF logical screen, BMP BITMAPINFOHEADER, netpbm P5/P6,
    WEBP VP8X, and RIFF/WAVE (dims None for audio). Unknown containers
    return ``application/octet-stream``."""
    if blob.startswith(b"\x89PNG\r\n\x1a\n") and len(blob) >= 24:
        w, h = struct.unpack(">II", blob[16:24])
        return "image/png", w, h
    if blob.startswith(b"\xff\xd8"):
        i = 2
        while i + 9 < len(blob):
            if blob[i] != 0xFF:
                i += 1
                continue
            marker = blob[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            seg = struct.unpack(">H", blob[i + 2:i + 4])[0]
            # SOF0-15 except DHT(C4)/JPG(C8)/DAC(CC) carry dimensions
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", blob[i + 5:i + 9])
                return "image/jpeg", w, h
            i += 2 + seg
        return "image/jpeg", None, None
    if blob[:6] in (b"GIF87a", b"GIF89a") and len(blob) >= 10:
        w, h = struct.unpack("<HH", blob[6:10])
        return "image/gif", w, h
    if blob.startswith(b"BM") and len(blob) >= 26:
        w, h = struct.unpack("<ii", blob[18:26])
        return "image/bmp", w, abs(h)
    if blob[:2] in (b"P5", b"P6"):
        try:
            fields = blob[2:64].split()
            return (
                "image/x-portable-pixmap" if blob[:2] == b"P6"
                else "image/x-portable-graymap",
                int(fields[0]), int(fields[1]),
            )
        except (ValueError, IndexError):
            pass
    if blob.startswith(b"RIFF") and blob[8:12] == b"WEBP":
        if blob[12:16] == b"VP8X" and len(blob) >= 30:
            w = int.from_bytes(blob[24:27], "little") + 1
            h = int.from_bytes(blob[27:30], "little") + 1
            return "image/webp", w, h
        return "image/webp", None, None
    if blob.startswith(b"RIFF") and blob[8:12] == b"WAVE":
        return "audio/wav", None, None
    return "application/octet-stream", None, None


def decode_wav(blob: bytes):
    """Sample-accurate PCM decode of a RIFF/WAVE payload with numpy —
    returns ``(samples ndarray [n, channels] float32 in [-1, 1], rate)``.
    Supports PCM 8/16/32-bit and IEEE float chunks; compressed WAV
    raises ValueError."""
    import numpy as np

    if not (blob.startswith(b"RIFF") and blob[8:12] == b"WAVE"):
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(blob):
        cid, size = blob[pos:pos + 4], struct.unpack("<I", blob[pos + 4:pos + 8])[0]
        body = blob[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, channels, rate, _, _, bits = fmt
    if audio_fmt == 1 and bits == 16:
        x = np.frombuffer(data, "<i2").astype("float32") / 32768.0
    elif audio_fmt == 1 and bits == 8:
        x = (np.frombuffer(data, "u1").astype("float32") - 128.0) / 128.0
    elif audio_fmt == 1 and bits == 32:
        x = np.frombuffer(data, "<i4").astype("float32") / 2147483648.0
    elif audio_fmt == 3 and bits == 32:
        x = np.frombuffer(data, "<f4").astype("float32")
    else:
        raise ValueError(f"unsupported WAV format {audio_fmt}/{bits}-bit")
    n = (len(x) // channels) * channels
    return x[:n].reshape(-1, channels), rate


def encode_png(px, cycle_filters: bool = True) -> bytes:
    """Real PNG encoder (stdlib zlib, no codec libs): gray / gray+alpha
    / RGB / RGBA from an HxW[xC] ndarray — 8-bit from uint8 input,
    16-bit (big-endian samples, per the spec) from uint16 input.
    ``cycle_filters`` applies filter type ``y % 5`` to scanline ``y``
    (exercising None/Sub/Up/Average/Paeth on every image taller than 4
    rows); otherwise filter 0 throughout. PNG filters operate on BYTES
    with bpp = channels x bytes-per-sample, so the 16-bit path filters
    each row's big-endian byte expansion with the identical filter
    code. Used as the media-sink half of the PNG round-trip."""
    import zlib

    import numpy as np

    px = np.asarray(px)
    depth = 16 if px.dtype == np.uint16 else 8
    px = px.astype(np.uint16 if depth == 16 else np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, channels = px.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    bpp = channels * (depth // 8)
    raw = bytearray()
    prev = np.zeros(w * bpp, dtype=np.int32)
    for y in range(h):
        if depth == 16:
            row = np.frombuffer(
                px[y].reshape(-1).astype(">u2").tobytes(), "u1"
            ).astype(np.int32)
        else:
            row = px[y].reshape(-1).astype(np.int32)
        ft = (y % 5) if cycle_filters else 0
        left = np.concatenate([np.zeros(bpp, np.int32), row[:-bpp]])
        up_left = np.concatenate([np.zeros(bpp, np.int32), prev[:-bpp]])
        if ft == 0:
            filt = row
        elif ft == 1:
            filt = row - left
        elif ft == 2:
            filt = row - prev
        elif ft == 3:
            filt = row - ((left + prev) >> 1)
        else:  # Paeth predictor, vectorized (inputs are fully known here)
            p = left + prev - up_left
            pa, pb, pc = abs(p - left), abs(p - prev), abs(p - up_left)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, up_left)
            )
            filt = row - pred
        raw.append(ft)
        raw.extend((filt & 0xFF).astype(np.uint8).tobytes())
        prev = row

    def chunk(ctype: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def decode_png(blob: bytes):
    """Real PNG pixel decode with stdlib zlib + numpy — no codec libs.

    Supports non-interlaced 8-bit-per-sample images in every PNG color
    type (gray, RGB, palette, gray+alpha, RGBA) and all five scanline
    filters. Filters None/Sub/Up are vectorized (Sub via per-lane
    cumulative sum mod 256); Average/Paeth carry a true left-and-above
    data dependence, so those scanlines reconstruct byte-sequentially —
    the cost is per-image and parallelism comes from Arrow batches
    across partitions, not from inside one image. 16-bit images decode
    to uint16 (filters run on the byte expansion with doubled bpp, per
    the spec); 1/2/4-bit grayscale and palette images unpack their
    MSB-first packed samples after a bpp=1 unfilter (gray scales to
    the full 8-bit range, palette indexes PLTE); Adam7 interlaced
    images decode via seven independently unfiltered passes scattered
    onto the full grid — at every depth. Only the spec-illegal 16-bit
    palette remains a dead-letter."""
    import zlib

    import numpy as np

    if not blob.startswith(b"\x89PNG\r\n\x1a\n"):
        raise ValueError("not a PNG payload")
    pos, ihdr, plte, idat = 8, None, None, []
    while pos + 8 <= len(blob):
        size = struct.unpack(">I", blob[pos:pos + 4])[0]
        ctype = blob[pos + 4:pos + 8]
        body = blob[pos + 8:pos + 8 + size]
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body[:13])
        elif ctype == b"PLTE":
            plte = np.frombuffer(body, "u1").reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + size
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT chunk")
    w, h, depth, color, _comp, _filt, interlace = ihdr
    if depth not in (1, 2, 4, 8, 16) or interlace not in (0, 1) or (
        depth == 16 and color == 3
    ):
        raise NotImplementedError(f"{depth}-bit/interlace={interlace} PNG")
    if depth < 8 and color not in (0, 3):
        raise ValueError(
            f"sub-byte depth {depth} is only legal for grayscale/palette PNG"
        )
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color]
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), "u1")

    if depth < 8:
        # 1/2/4-bit grayscale or palette: one channel, samples packed
        # MSB-first; filters operate on the PACKED bytes with bpp=1
        # (per the spec), so the unfilter core is unchanged — unpack
        # to per-pixel samples afterwards
        if interlace == 0:
            stride = (w * depth + 7) // 8
            if raw.size != h * (stride + 1):
                raise ValueError("IDAT size does not match dimensions")
            samples = _png_unpack_subbyte(
                _png_unfilter(raw.reshape(h, stride + 1), 1), w, depth
            )
        else:
            samples = np.zeros((h, w), dtype=np.uint8)
            pos = 0
            for xs, ys, xstep, ystep in _ADAM7:
                pw = (w - xs + xstep - 1) // xstep
                ph = (h - ys + ystep - 1) // ystep
                if pw <= 0 or ph <= 0:
                    continue
                pstride = (pw * depth + 7) // 8
                need = ph * (pstride + 1)
                sub = _png_unfilter(raw[pos:pos + need].reshape(ph, pstride + 1), 1)
                pos += need
                samples[ys::ystep][:ph][:, xs::xstep][:, :pw] = (
                    _png_unpack_subbyte(sub, pw, depth)
                )
            if pos != raw.size:
                raise ValueError("IDAT size does not match Adam7 pass layout")
        if color == 3:
            if plte is None:
                raise ValueError("palette image without PLTE chunk")
            return plte[samples]
        # gray: scale to full 8-bit range (255 / (2^depth - 1) is exact)
        return (samples * (255 // ((1 << depth) - 1))).astype(np.uint8)[:, :, None]

    bps = depth // 8
    bpp = channels * bps

    if interlace == 0:
        stride = w * bpp
        if raw.size != h * (stride + 1):
            raise ValueError("IDAT size does not match dimensions")
        out = _png_unfilter(raw.reshape(h, stride + 1), bpp)
    else:
        # Adam7: seven independently-filtered sub-images, scattered back
        # onto the full grid by per-pass (origin, step) lattices
        out = np.zeros((h, w * bpp), dtype=np.uint8)
        pos = 0
        for xs, ys, xstep, ystep in _ADAM7:
            pw = (w - xs + xstep - 1) // xstep
            ph = (h - ys + ystep - 1) // ystep
            if pw <= 0 or ph <= 0:
                continue
            pstride = pw * bpp
            need = ph * (pstride + 1)
            sub = _png_unfilter(raw[pos:pos + need].reshape(ph, pstride + 1), bpp)
            pos += need
            cols = np.arange(pw) * xstep + xs
            byte_cols = (cols[:, None] * bpp + np.arange(bpp)).reshape(-1)
            out[ys::ystep][:ph][:, byte_cols] = sub
        if pos != raw.size:
            raise ValueError("IDAT size does not match Adam7 pass layout")

    if depth == 16:
        px = (
            np.frombuffer(out.tobytes(), dtype=">u2")
            .reshape(h, w, channels)
            .astype(np.uint16)
        )
    else:
        px = out.reshape(h, w, channels)
    if color == 3:
        if plte is None:
            raise ValueError("palette image without PLTE chunk")
        px = plte[px[:, :, 0]]
    return px


#: Adam7 pass lattice: (x-origin, y-origin, x-step, y-step)
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _png_unpack_subbyte(rows, w: int, depth: int):
    """Unpack (h, stride)-byte scanlines of ``depth``-bit samples
    (MSB-first per the PNG spec) into an (h, w) uint8 sample grid,
    dropping the zero-padding bits at each row's end."""
    import numpy as np

    bits = np.unpackbits(rows, axis=1)[:, : w * depth]
    if depth == 1:
        return bits
    grouped = bits.reshape(rows.shape[0], w, depth).astype(np.uint8)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    return (grouped * weights).sum(axis=2).astype(np.uint8)


def _png_unfilter(raw, bpp: int):
    """Reconstruct filtered scanlines (filter byte + row bytes per
    line) into raw bytes — the shared core of the sequential and Adam7
    paths. None/Sub/Up vectorized; Average/Paeth byte-sequential (true
    left-and-above data dependence)."""
    import numpy as np

    h, stride1 = raw.shape
    stride = stride1 - 1
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        ft = raw[y, 0]
        row = raw[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if ft == 0:
            rec = row
        elif ft == 1:  # Sub: recon[x] = filt[x] + recon[x-bpp] ≡ lane cumsum
            rec = row.copy()
            for c in range(bpp):
                np.cumsum(rec[c::bpp], out=rec[c::bpp])
        elif ft == 2:
            rec = row + prev
        elif ft == 3:
            rec = np.empty(stride, np.int32)
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                rec[x] = (row[x] + ((a + prev[x]) >> 1)) & 0xFF
        elif ft == 4:
            rec = np.empty(stride, np.int32)
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[x] = (row[x] + pred) & 0xFF
        else:
            raise ValueError(f"invalid PNG filter type {ft}")
        out[y] = rec & 0xFF
    return out


def decode_pixels(blob: bytes):
    """Real pixel decode → HxWxC ndarray — uint8 for 8-bit sources,
    uint16 for 16-bit PNG and 16-bit (maxval > 255) netpbm. Pure
    numpy+stdlib for
    netpbm P5/P6, uncompressed, RLE8/RLE4 and BITFIELDS (16/32bpp
    masked, incl. 565/555 and alpha) BMP, PNG (all color types,
    all five filters, 8/16-bit, Adam7 — ``decode_png``), and JPEG —
    baseline AND progressive (``decode_jpeg``); PIL (when importable)
    for the remaining compressed formats; NotImplementedError when
    neither applies — callers see exactly where a codec container
    would plug in."""
    import numpy as np

    if blob.startswith(b"\x89PNG\r\n\x1a\n"):
        return decode_png(blob)
    if blob.startswith(b"\xff\xd8"):
        from lazy_frame_spark.operators.jpeg import decode_jpeg

        return decode_jpeg(blob)
    if blob[:6] in (b"GIF87a", b"GIF89a"):
        from lazy_frame_spark.operators.gif import decode_gif

        return decode_gif(blob)

    if blob[:2] in (b"P5", b"P6"):
        depth = 3 if blob[:2] == b"P6" else 1
        # header = magic, width, height, maxval as whitespace-separated
        # ASCII tokens (comments unsupported — synthetic corpora don't
        # emit them); pixel data starts after the single byte following
        # the maxval token
        tokens, i, tok = [], 2, b""
        while len(tokens) < 3 and i < len(blob):
            c = blob[i:i + 1]
            if c.isspace():
                if tok:
                    tokens.append(int(tok))
                    tok = b""
            else:
                tok += c
            i += 1
        w, h, maxval = tokens
        if maxval > 255:  # 16-bit netpbm: big-endian two-byte samples
            px = np.frombuffer(blob, ">u2", count=w * h * depth, offset=i)
            return px.reshape(h, w, depth).astype(np.uint16)
        px = np.frombuffer(blob, "u1", count=w * h * depth, offset=i)
        return px.reshape(h, w, depth)
    if blob.startswith(b"BM"):
        off = struct.unpack("<I", blob[10:14])[0]
        hdr_size = struct.unpack("<I", blob[14:18])[0]
        w, h = struct.unpack("<ii", blob[18:26])
        planes, bits = struct.unpack("<HH", blob[26:30])
        comp = struct.unpack("<I", blob[30:34])[0]
        if (comp == 1 and bits == 8) or (comp == 2 and bits == 4):
            # BI_RLE8 / BI_RLE4: palette run-length coding
            n_colors = struct.unpack("<I", blob[46:50])[0] or (1 << bits)
            pal_off = 14 + hdr_size
            pal = np.frombuffer(
                blob, "u1", count=n_colors * 4, offset=pal_off
            ).reshape(-1, 4)[:, [2, 1, 0]]  # BGRX -> RGB
            decode = _bmp_rle8_indices if comp == 1 else _bmp_rle4_indices
            idx = decode(blob[off:], w, abs(h))
            px = pal[idx]
            return px[::-1] if h > 0 else px
        if (comp == 3 and bits in (16, 32)) or (comp == 0 and bits == 16):
            # BI_BITFIELDS (or the 16bpp default XRGB555): per-channel
            # masks select contiguous bit runs of each little-endian
            # pixel word; channels scale to 8 bits by round-half-up
            # (identical to bit replication for the common 5/6-bit
            # widths). Masks for BITMAPINFOHEADER follow the header;
            # V4/V5 embed them at the SAME file offset (54), alpha at
            # 66 when the header carries one.
            if comp == 3:
                rm, gm, bm = struct.unpack("<III", blob[54:66])
                am = (
                    struct.unpack("<I", blob[66:70])[0]
                    if hdr_size >= 56 else 0
                )
            else:
                rm, gm, bm, am = 0x7C00, 0x03E0, 0x001F, 0
            bpp = bits // 8
            stride = (w * bpp + 3) & ~3
            raw = np.frombuffer(
                blob, "u1", count=stride * abs(h), offset=off
            ).reshape(abs(h), stride)
            vals = (
                raw[:, : w * bpp].copy()
                .view("<u2" if bits == 16 else "<u4")
                .reshape(abs(h), w)
                .astype(np.int64)
            )
            chans = [rm, gm, bm] + ([am] if am else [])
            out = np.zeros((abs(h), w, len(chans)), dtype=np.uint8)
            for ci, mask in enumerate(chans):
                if mask == 0:
                    continue
                shift = (mask & -mask).bit_length() - 1
                maxv = mask >> shift
                if maxv & (maxv + 1):
                    raise ValueError(
                        f"non-contiguous BMP channel mask {mask:#x}"
                    )
                v = (vals & mask) >> shift
                out[..., ci] = ((v * 255 + maxv // 2) // maxv).astype(np.uint8)
            return out[::-1] if h > 0 else out
        if comp != 0 or bits not in (24, 32):
            raise NotImplementedError(f"compressed/{bits}-bit BMP not supported")
        c = bits // 8
        stride = (w * c + 3) & ~3
        rows = np.frombuffer(blob, "u1", count=stride * abs(h), offset=off)
        rows = rows.reshape(abs(h), stride)[:, : w * c].reshape(abs(h), w, c)
        if h > 0:  # positive height = bottom-up storage
            rows = rows[::-1]
        return rows[..., [2, 1, 0]] if c == 3 else rows[..., [2, 1, 0, 3]]
    try:
        import io

        from PIL import Image  # noqa: F401 — absent in this container
    except ImportError as exc:
        raise NotImplementedError(
            "compressed image decode requires PIL, not present here; "
            "netpbm/BMP/WAV payloads decode natively"
        ) from exc
    return np.asarray(Image.open(io.BytesIO(blob)).convert("RGB"))


def resize_nearest(px, out_h: int, out_w: int):
    """Nearest-neighbor resize with pure numpy index arithmetic — the
    thumbnail/normalize step of a media pipeline, vectorized per image."""
    import numpy as np

    h, w = px.shape[:2]
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return px[ys][:, xs]


AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("rate", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("rms_bp", T.LongType()),
        T.StructField("peak_bp", T.LongType()),
    ]
)


def decode_audio_features(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Real WAV decode over ``mapInPandas``: rate/channels/duration plus
    RMS and peak amplitude in integer basis points (deterministic across
    engines — the same portability rule as operators/text.py)."""

    def extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                x, rate = decode_wav(bytes(payload))
                mono = x.mean(axis=1)
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "rate": rate,
                        "channels": x.shape[1],
                        "n_samples": x.shape[0],
                        "duration_ms": int(x.shape[0] * 1000 // rate),
                        "rms_bp": int(round(float(np.sqrt((mono ** 2).mean())) * 1e4)),
                        "peak_bp": int(round(float(np.abs(x).max()) * 1e4)),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in AUDIO_FEATURE_SCHEMA])

    from lazy_frame_spark.plans.parallel import fan_out

    return fan_out(df.select(id_col, payload_col)).mapInPandas(
        extract, AUDIO_FEATURE_SCHEMA
    )


def _fake_decode(payload: bytes) -> tuple[int, int, list[float]]:
    """Deterministic stand-in for image decoding: derives a fake (width,
    height) and an 8-dim feature from the payload digest."""
    d = hashlib.sha1(payload).digest()
    width = 64 + d[0] % 192
    height = 64 + d[1] % 192
    feature = [round(b / 255.0, 6) for b in d[2:10]]
    return width, height, feature


def decode_image_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    real_decoder: bool = False,
) -> DataFrame:
    """Extract per-image features with a partition-parallel Pandas UDF.

    ``real_decoder=True`` decodes pixels for real: netpbm/uncompressed
    BMP natively (numpy), compressed formats via PIL when importable
    (NotImplementedError per-payload otherwise — raised at task time,
    where a production job would route to a dead-letter sink). The
    feature is 8-dim: per-channel means + a 2×2 grayscale grid, each in
    [0, 1]. The default fake path keeps the plumbing testable on
    arbitrary payloads."""

    def real_decode(blob: bytes) -> tuple[int, int, list[float]]:
        import numpy as np

        px = decode_pixels(blob)
        h, w = px.shape[:2]
        chans = [round(float(px[..., c].mean()) / 255.0, 6) for c in range(px.shape[2])]
        chans = (chans + [0.0] * 4)[:4]
        gray = px.mean(axis=2) if px.shape[2] > 1 else px[..., 0].astype("float64")
        h2, w2 = max(1, h // 2), max(1, w // 2)
        quads = [
            round(float(seg.mean()) / 255.0, 6) if seg.size else 0.0
            for seg in (
                gray[:h2, :w2], gray[:h2, w2:], gray[h2:, :w2], gray[h2:, w2:]
            )
        ]
        return w, h, chans + quads

    decode = real_decode if real_decoder else _fake_decode

    def extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                blob = bytes(payload)
                width, height, feature = decode(blob)
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "n_bytes": len(blob),
                        "sha1_8": hashlib.sha1(blob).hexdigest()[:8],
                        "width": width,
                        "height": height,
                        "feature": feature,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_FEATURE_SCHEMA])

    from lazy_frame_spark.plans.parallel import fan_out

    return fan_out(df.select(id_col, payload_col)).mapInPandas(
        extract, IMAGE_FEATURE_SCHEMA
    )


def frame_sample_plan(
    df: DataFrame,
    every_n: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """Video-frame-sampling plumbing: deterministic every-nth selection by
    id (a real pipeline samples frames inside the decode UDF; the
    *selection* logic stays a pushdown-friendly JVM predicate)."""
    return df.filter(F.pmod(F.col(id_col), F.lit(every_n)) == 0)


SPECTRAL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("rate", T.LongType()),
        T.StructField("dominant_hz", T.LongType()),
        T.StructField("centroid_hz10", T.LongType()),
    ]
)


def audio_spectral_features(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """FFT feature extraction over decoded WAV payloads: the dominant
    frequency (argmax rFFT bin, exact for bin-aligned tones) and the
    spectral centroid rounded to 10 Hz (the magnitude-weighted mean
    frequency — the standard audio-quality / content feature). DC is
    excluded from both so constant offsets don't masquerade as signal.

    numpy's rfft inside ``mapInPandas`` — compute-bound per payload,
    parallel across Arrow batches, no shuffle."""

    def extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                x, rate = decode_wav(bytes(payload))
                mono = x.mean(axis=1)
                mag = np.abs(np.fft.rfft(mono))
                mag[0] = 0.0  # drop DC
                freqs = np.fft.rfftfreq(len(mono), d=1.0 / rate)
                dom = int(round(freqs[int(mag.argmax())]))
                total = float(mag.sum())
                cen = float((freqs * mag).sum() / total) if total > 0 else 0.0
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "rate": int(rate),
                        "dominant_hz": dom,
                        "centroid_hz10": int((cen + 5.0) // 10.0) * 10,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in SPECTRAL_SCHEMA])

    return df.mapInPandas(extract, SPECTRAL_SCHEMA)


def _video_frame_schema(id_col: str) -> "T.StructType":
    return T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("frame_idx", T.LongType()),
            T.StructField("mean_r", T.LongType()),
            T.StructField("mean_g", T.LongType()),
            T.StructField("mean_b", T.LongType()),
        ]
    )


#: the default-id-column instance, kept for callers that reference it
VIDEO_FRAME_SCHEMA = _video_frame_schema("doc_id")


def video_frame_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    stride: int = 2,
) -> DataFrame:
    """Frame-sampled features from multi-frame (animated-GIF) video
    payloads: decode ALL frames (operators/gif.decode_gif_frames — real
    variable-width LZW), keep every ``stride``-th frame, emit integer
    per-channel means per kept frame. One Arrow mapInPandas stage; the
    binary payload stays BinaryType into the batch (zero-copy), frames
    never leave the worker — only the (id, frame_idx, means) rows come
    back. The same shape holds for real video: swap the decoder, keep
    the sampling + feature emission."""
    from collections.abc import Iterator

    from lazy_frame_spark.operators.gif import decode_gif_frames
    from lazy_frame_spark.plans.parallel import fan_out

    def extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf[id_col], pdf[payload_col]):
                frames = decode_gif_frames(bytes(blob))
                for fi in range(0, len(frames), stride):
                    m = frames[fi].reshape(-1, 3).mean(axis=0)
                    rows.append(
                        (int(doc_id), fi, int(m[0]), int(m[1]), int(m[2]))
                    )
            yield pd.DataFrame(
                rows, columns=[id_col, "frame_idx", "mean_r", "mean_g", "mean_b"]
            )

    return fan_out(df.select(id_col, payload_col)).mapInPandas(
        extract, schema=_video_frame_schema(id_col)
    )


def _bmp_rle8_indices(data: bytes, w: int, h: int):
    """Decode a BI_RLE8 stream into an (h, w) palette-index grid (rows
    in stored bottom-up order; caller flips). Implements the full
    escape set: (0,0) end-of-line, (0,1) end-of-bitmap, (0,2,dx,dy)
    position delta, (0,n>=3) absolute mode (n literal indices, padded
    to a word boundary); any other (count, value) pair is a run of
    ``count`` copies of ``value``. Skipped cells stay 0 per the
    format's convention."""
    import numpy as np

    out = np.zeros((h, w), dtype=np.uint8)
    x = y = i = 0
    n = len(data)
    while i + 1 < n and y < h:
        cnt, val = data[i], data[i + 1]
        i += 2
        if cnt:
            e = min(x + cnt, w)
            out[y, x:e] = val
            x = e
        elif val == 0:   # end of line
            x, y = 0, y + 1
        elif val == 1:   # end of bitmap
            break
        elif val == 2:   # delta
            if i + 1 >= n:
                raise ValueError("truncated RLE8 stream: delta escape cut short")
            x = min(x + data[i], w)
            y += data[i + 1]
            i += 2
        else:            # absolute mode: val literal indices, word-aligned
            e = min(x + val, w)
            out[y, x:e] = np.frombuffer(data, "u1", count=e - x, offset=i)
            x = e
            i += val + (val & 1)
    return out


def _bmp_rle4_indices(data: bytes, w: int, h: int):
    """BI_RLE4 twin of ``_bmp_rle8_indices``: runs alternate the
    byte's high/low nibbles; absolute mode packs two 4-bit indices per
    byte, padded so each absolute record occupies a whole word."""
    import numpy as np

    out = np.zeros((h, w), dtype=np.uint8)
    x = y = i = 0
    n = len(data)
    while i + 1 < n and y < h:
        cnt, val = data[i], data[i + 1]
        i += 2
        if cnt:
            hi, lo = val >> 4, val & 0xF
            e = min(x + cnt, w)
            span = e - x
            out[y, x:e] = np.where(np.arange(span) % 2 == 0, hi, lo)
            x = e
        elif val == 0:   # end of line
            x, y = 0, y + 1
        elif val == 1:   # end of bitmap
            break
        elif val == 2:   # delta
            if i + 1 >= n:
                raise ValueError("truncated RLE4 stream: delta escape cut short")
            x = min(x + data[i], w)
            y += data[i + 1]
            i += 2
        else:            # absolute mode: val nibbles, word-aligned bytes
            nbytes = (val + 1) // 2
            packed = np.frombuffer(data, "u1", count=nbytes, offset=i)
            nibbles = np.empty(nbytes * 2, dtype=np.uint8)
            nibbles[0::2] = packed >> 4
            nibbles[1::2] = packed & 0xF
            e = min(x + val, w)
            out[y, x:e] = nibbles[: e - x]
            x = e
            i += (nbytes + 1) & ~1  # pad the record to a word boundary
    return out
