"""Real PNG pixel decode (functions/multimodal.py decode_png_pixels).

The test encodes PNGs from known pixel arrays with a tiny independent
FORWARD filterer (RFC 2083 filters are invertible, so checking the decoder
inverts this encoder is an independent correctness check — no image
library involved), covering every filter type and color type the decoder
claims, plus the honest gates for what it does not."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from bayard_spark.functions.multimodal import (
    MediaDecodeUnavailable,
    decode_png_pixels,
    png_pixel_features,
)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
    return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)


def _forward_filter(px: np.ndarray, ftypes: list[int]) -> bytes:
    """RFC 2083 §6: encode scanlines with the given per-row filter types."""
    h, w, ch = px.shape
    flat = px.reshape(h, w * ch).astype(np.int32)
    out = bytearray()
    prev = np.zeros(w * ch, dtype=np.int32)
    for y in range(h):
        cur = flat[y]
        ft = ftypes[y % len(ftypes)]
        out.append(ft)
        for i in range(w * ch):
            a = int(cur[i - ch]) if i >= ch else 0
            b = int(prev[i])
            c = int(prev[i - ch]) if i >= ch else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) >> 1
            else:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out.append((int(cur[i]) - pred) & 0xFF)
        prev = cur
    return bytes(out)


def _encode_png(px: np.ndarray, color: int, ftypes: list[int],
                plte: np.ndarray | None = None, depth: int = 8) -> bytes:
    h, w, ch = px.shape
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, 0)
    body = _chunk(b"IHDR", ihdr)
    if plte is not None:
        body += _chunk(b"PLTE", plte.astype(np.uint8).tobytes())
    body += _chunk(b"IDAT", zlib.compress(_forward_filter(px, ftypes)))
    body += _chunk(b"IEND", b"")
    return b"\x89PNG\r\n\x1a\n" + body


RNG = np.random.default_rng(42)


@pytest.mark.parametrize("ftypes", [[0], [1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_rgb_roundtrip_every_filter(ftypes):
    px = RNG.integers(0, 256, size=(7, 5, 3), dtype=np.uint8)
    got = decode_png_pixels(_encode_png(px, color=2, ftypes=ftypes))
    np.testing.assert_array_equal(got, px)


def test_grayscale_and_alpha_color_types():
    g = RNG.integers(0, 256, size=(4, 6, 1), dtype=np.uint8)
    np.testing.assert_array_equal(
        decode_png_pixels(_encode_png(g, color=0, ftypes=[4])), g
    )
    ga = RNG.integers(0, 256, size=(3, 3, 2), dtype=np.uint8)
    np.testing.assert_array_equal(
        decode_png_pixels(_encode_png(ga, color=4, ftypes=[3])), ga
    )
    rgba = RNG.integers(0, 256, size=(5, 2, 4), dtype=np.uint8)
    np.testing.assert_array_equal(
        decode_png_pixels(_encode_png(rgba, color=6, ftypes=[1, 2])), rgba
    )


def test_palette_expansion():
    plte = np.array([[250, 0, 0], [0, 250, 0], [0, 0, 250], [7, 8, 9]])
    idx = RNG.integers(0, 4, size=(6, 4, 1), dtype=np.uint8)
    got = decode_png_pixels(_encode_png(idx, color=3, ftypes=[2], plte=plte))
    np.testing.assert_array_equal(got, plte[idx[:, :, 0]])


def test_honest_gates():
    px = np.zeros((2, 2, 3), dtype=np.uint8)
    with pytest.raises(MediaDecodeUnavailable):
        decode_png_pixels(b"GIF89a not a png")
    with pytest.raises(MediaDecodeUnavailable):
        decode_png_pixels(_encode_png(px, color=2, ftypes=[0], depth=16))


def test_pixel_features_reflect_real_pixels():
    dark = np.zeros((8, 8, 3), dtype=np.uint8)
    light = np.full((8, 8, 3), 255, dtype=np.uint8)
    fd = png_pixel_features(dark)
    fl = png_pixel_features(light)
    assert fd[0] > 0.9  # darkest luminance histogram bin dominated
    assert fl[31] > 0.9  # brightest bin
    assert not np.allclose(fd, fl)


def test_image_features_real_decode_in_spark(spark):
    from bayard_spark.functions.multimodal import image_features

    pngs = []
    for i in range(6):
        px = RNG.integers(0, 256, size=(6, 6, 3), dtype=np.uint8)
        pngs.append((i, bytearray(_encode_png(px, color=2, ftypes=[i % 5]))))
    df = spark.createDataFrame(pngs, "asset_id long, media binary")
    out = image_features(df, real_decode=True).collect()
    assert len(out) == 6
    for r in out:
        v = np.array(r["feature"])
        assert v.shape == (64,) and np.isfinite(v).all()
        assert abs(v[:32].sum() - 1.0) < 1e-5  # histogram normalized
