"""GIF codec (operators/gif.py): LZW round-trips, width growth, table
reset, interlacing, extension skipping, format limits."""

import struct

import numpy as np
import pytest

from lazy_frame_spark.operators.gif import (
    _deinterlace_order,
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
)
from lazy_frame_spark.operators.multimodal import decode_pixels


def _rand_img(rng, h, w, ncol):
    pal = rng.integers(0, 256, (ncol, 3), dtype=np.uint8)
    pal = np.unique(pal, axis=0)
    return pal[rng.integers(0, len(pal), (h, w))]


def test_gif_roundtrip_random_images():
    rng = np.random.default_rng(11)
    for _ in range(15):
        h, w = (int(x) for x in rng.integers(1, 48, 2))
        img = _rand_img(rng, h, w, int(rng.integers(1, 17)))
        assert (decode_gif(encode_gif(img)) == img).all()


def test_gif_roundtrip_width_growth_and_reset():
    """A 200x300 random image pushes the string table through several
    width bumps; >4095 entries forces the mid-stream clear+reset path."""
    rng = np.random.default_rng(3)
    img = _rand_img(rng, 200, 300, 16)
    assert (decode_gif(encode_gif(img)) == img).all()


def test_gif_roundtrip_256_colors_and_gray():
    rng = np.random.default_rng(5)
    img = _rand_img(rng, 64, 64, 256)
    assert (decode_gif(encode_gif(img)) == img).all()
    gray = rng.integers(0, 4, (10, 10), dtype=np.uint8) * 80
    back = decode_gif(encode_gif(gray))
    assert (back[:, :, 0] == gray).all() and (back[:, :, 1] == gray).all()


def test_gif_too_many_colors_rejected():
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)  # ~1024 colors
    with pytest.raises(ValueError, match="256-color limit"):
        encode_gif(img)


def test_gif_interlaced_decode():
    """Hand-build an interlaced variant: encode the ROW-PERMUTED image,
    set the interlace flag — the decoder must undo the 4-pass order."""
    rng = np.random.default_rng(13)
    img = _rand_img(rng, 13, 7, 8)  # odd height exercises pass boundaries
    order = _deinterlace_order(13)
    blob = bytearray(encode_gif(img[order]))
    # encode_gif writes no GCT: the image descriptor starts right after
    # the 6+7 header/LSD bytes (the frame carries a LOCAL color table)
    idesc = 13
    assert blob[idesc] == 0x2C
    blob[idesc + 9] |= 0x40  # interlace flag
    assert (decode_gif(bytes(blob)) == img).all()


def test_gif_89a_extensions_skipped():
    """Insert a Graphic Control Extension + comment before the image."""
    rng = np.random.default_rng(17)
    img = _rand_img(rng, 9, 9, 4)
    blob = bytearray(encode_gif(img))
    idesc = 13  # no GCT: descriptor immediately follows header/LSD
    assert blob[idesc] == 0x2C
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    comment = b"\x21\xfe\x05hello\x00"
    patched = bytes(blob[:idesc]) + gce + comment + bytes(blob[idesc:])
    assert (decode_gif(patched) == img).all()


def test_gif_deferred_clear_stream():
    """A CLEAR before every literal (valid, never-growing stream) must
    decode: pins the reset path independently of the encoder."""
    min_cs = 2
    clear, end = 4, 5
    codes = []
    pixels = [0, 1, 2, 3, 2, 1, 0]
    for p in pixels:
        codes.extend([clear, p])
    codes.append(end)
    acc = bytearray()
    bit, nbits, width = 0, 0, min_cs + 1
    for c in codes:
        bit |= c << nbits
        nbits += width
        while nbits >= 8:
            acc.append(bit & 0xFF)
            bit >>= 8
            nbits -= 8
    if nbits:
        acc.append(bit & 0xFF)
    assert _lzw_decode(bytes(acc), min_cs, len(pixels)) == pixels


def test_gif_lzw_mirror_encode_decode():
    rng = np.random.default_rng(23)
    for n in (1, 5, 100, 5000):
        seq = rng.integers(0, 4, n).tolist()
        assert _lzw_decode(_lzw_encode(seq, 2), 2, n) == seq


def test_decode_pixels_routes_gif():
    rng = np.random.default_rng(29)
    img = _rand_img(rng, 6, 6, 3)
    assert (decode_pixels(encode_gif(img)) == img).all()


def test_gif_truncated_rejected():
    rng = np.random.default_rng(31)
    blob = encode_gif(_rand_img(rng, 8, 8, 4))
    with pytest.raises(ValueError):
        decode_gif(b"NOTAGIF" + blob[7:])
    with pytest.raises(Exception):
        decode_gif(blob[: len(blob) // 3])


def test_animation_round_trip_multiframe():
    """Animated GIF: per-frame local palettes, full-size replacement
    frames — every frame must round-trip pixel-exactly, and the
    single-frame decoder must still return frame 0."""
    import numpy as np

    from lazy_frame_spark.operators.gif import (
        decode_gif,
        decode_gif_frames,
        encode_gif_animation,
    )

    rng = np.random.RandomState(11)
    frames = [rng.randint(0, 256, (12, 9, 3)).astype("uint8") for _ in range(5)]
    blob = encode_gif_animation(frames, delay_cs=3)
    back = decode_gif_frames(blob)
    assert len(back) == 5
    for a, b in zip(frames, back):
        assert (a == b).all()
    assert (decode_gif(blob) == frames[0]).all()


def test_animation_rejects_mixed_shapes():
    import numpy as np
    import pytest

    from lazy_frame_spark.operators.gif import encode_gif_animation

    with pytest.raises(ValueError, match="share one shape"):
        encode_gif_animation(
            [np.zeros((4, 4, 3), "uint8"), np.zeros((5, 4, 3), "uint8")]
        )


def test_video_frame_features_stride(spark):
    """Stride-3 sampling over a 7-frame animation keeps frames 0, 3, 6
    with exact constant-frame means."""
    import numpy as np

    from lazy_frame_spark.operators.gif import encode_gif_animation
    from lazy_frame_spark.operators.multimodal import video_frame_features

    frames = [np.full((4, 4, 3), 10 * (f + 1), dtype=np.uint8) for f in range(7)]
    blob = encode_gif_animation(frames)
    df = spark.createDataFrame([(1, bytearray(blob))], "doc_id long, payload binary")
    got = {
        r["frame_idx"]: (r["mean_r"], r["mean_g"], r["mean_b"])
        for r in video_frame_features(df, stride=3).collect()
    }
    assert got == {0: (10, 10, 10), 3: (40, 40, 40), 6: (70, 70, 70)}


def test_video_frame_features_honors_id_col(spark):
    import numpy as np

    from lazy_frame_spark.operators.gif import encode_gif_animation
    from lazy_frame_spark.operators.multimodal import video_frame_features

    blob = encode_gif_animation([np.full((2, 2, 3), 9, dtype=np.uint8)])
    df = spark.createDataFrame([(7, bytearray(blob))], "image_id long, payload binary")
    out = video_frame_features(df, id_col="image_id", stride=1)
    assert out.columns[0] == "image_id"
    assert out.first()["image_id"] == 7
