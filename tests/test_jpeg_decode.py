"""Real baseline-JPEG decode (functions/jpeg.decode_jpeg_pixels) —
validated by inverting an INDEPENDENT forward encoder written here
(direct-double-sum FDCT, its own canonical Huffman tables, its own bit
packer with 0xFF stuffing and restart markers), the same strategy as
test_png_decode.py. A decoder bug cannot cancel an encoder bug: the two
sides share no code, only the T.81 spec.

The encoder uses simple VALID tables rather than Annex K's: 12 DC
symbols at 4 bits, all 256 AC symbols at 9 bits (canonical, prefix-free,
all-ones never assigned) and a uniform quantizer — any spec-conforming
decoder accepts them, and they make the roundtrip error bound tight.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from bayard_spark.functions.jpeg import decode_jpeg_pixels

# ---------------------------------------------------------------- encoder

ZZ = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

DC_BITS = 4   # 12 symbols, 4-bit codes
AC_BITS = 9   # 256 symbols, 9-bit codes (code == symbol)


class BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int):
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def pad(self):
        while self.nbits:
            self.write(1, 1)  # spec pads with 1 bits


def fdct(block: np.ndarray) -> np.ndarray:
    """Direct double-sum forward DCT (independent of the decoder's
    matrix formulation)."""
    out = np.zeros((8, 8))
    for u in range(8):
        for v in range(8):
            cu = 1 / np.sqrt(2) if u == 0 else 1.0
            cv = 1 / np.sqrt(2) if v == 0 else 1.0
            s = 0.0
            for x in range(8):
                for y in range(8):
                    s += block[x, y] * np.cos(
                        (2 * x + 1) * u * np.pi / 16
                    ) * np.cos((2 * y + 1) * v * np.pi / 16)
            out[u, v] = cu * cv * s / 4
    return out


def _mag(v: int) -> tuple[int, int]:
    """signed value → (category t, t-bit code) per T.81 F.1.2.1.1."""
    t = int(abs(v)).bit_length()
    code = v if v >= 0 else v + (1 << t) - 1
    return t, code


def _encode_block(bw: BitWriter, block: np.ndarray, q: int,
                  pred: list[int]) -> None:
    coef = np.round(fdct(block) / q).astype(int)
    zz = [int(coef.flat[ZZ[k]]) for k in range(64)]
    t, code = _mag(zz[0] - pred[0])
    pred[0] = zz[0]
    bw.write(t, DC_BITS)       # DC symbol = category (code == symbol)
    bw.write(code, t)
    run = 0
    last_nz = max((k for k in range(1, 64) if zz[k]), default=0)
    for k in range(1, 64):
        if k > last_nz:
            bw.write(0x00, AC_BITS)  # EOB
            break
        if zz[k] == 0:
            run += 1
            continue
        while run > 15:
            bw.write(0xF0, AC_BITS)  # ZRL
            run -= 16
        t, code = _mag(zz[k])
        bw.write((run << 4) | t, AC_BITS)
        bw.write(code, t)
        run = 0
    else:
        pass  # block ended exactly at k=63 with a nonzero — no EOB needed


def _plane_blocks(plane: np.ndarray):
    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    return padded, ph // 8, pw // 8


def encode_jpeg(img: np.ndarray, q: int = 2, subsample: bool = False,
                restart: int = 0) -> bytes:
    """img: uint8 (h, w) grayscale or (h, w, 3) RGB → baseline JFIF
    bytes. subsample=True uses 4:2:0 (2x2 Y blocks per MCU, averaged
    chroma)."""
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if gray:
        planes = [img.astype(np.float64) - 128.0]
        samp = [(1, 1)]
    else:
        f = img.astype(np.float64)
        y = 0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]
        cb = -0.168736 * f[:, :, 0] - 0.331264 * f[:, :, 1] \
            + 0.5 * f[:, :, 2]
        cr = 0.5 * f[:, :, 0] - 0.418688 * f[:, :, 1] \
            - 0.081312 * f[:, :, 2]
        if subsample:
            ph, pw = -(-h // 2) * 2, -(-w // 2) * 2
            cbp = np.pad(cb, ((0, ph - h), (0, pw - w)), mode="edge")
            crp = np.pad(cr, ((0, ph - h), (0, pw - w)), mode="edge")
            cb = cbp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            cr = crp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y - 128.0, cb, cr]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    padded = []
    for p, (sh, sv) in zip(planes, samp):
        tw, th = mcux * sh * 8, mcuy * sv * 8
        pp = np.pad(
            p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), mode="edge"
        )
        padded.append(pp)

    out = bytearray(b"\xff\xd8")
    qtbl = bytes([q] * 64)
    out += b"\xff\xdb" + struct.pack(">H", 2 + 1 + 64) + b"\x00" + qtbl
    nc = 1 if gray else 3
    sof = bytearray(struct.pack(">BHHB", 8, h, w, nc))
    for ci in range(nc):
        sh, sv = samp[ci]
        sof += bytes([ci + 1, (sh << 4) | sv, 0])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    # DHT: DC table (class 0, id 0): 12 symbols at DC_BITS
    dc_counts = [0] * 16
    dc_counts[DC_BITS - 1] = 12
    dht = bytes([0x00] + dc_counts) + bytes(range(12))
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    # AC table (class 1, id 0): symbols 0..254 at AC_BITS, code == symbol
    # (DHT counts are single bytes, so 256 is unrepresentable; 0xFF =
    # run-15/size-15 is never produced by a real encoder)
    ac_counts = [0] * 16
    ac_counts[AC_BITS - 1] = 255
    dht = bytes([0x10] + ac_counts) + bytes(range(255))
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    if restart:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart)
    sos = bytearray([nc])
    for ci in range(nc):
        sos += bytes([ci + 1, 0x00])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    bw = BitWriter()
    preds = [[0] for _ in range(nc)]
    mcu = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and mcu and mcu % restart == 0:
                bw.pad()
                out += bw.out
                bw = BitWriter()
                out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                preds = [[0] for _ in range(nc)]
            for ci in range(nc):
                sh, sv = samp[ci]
                for v in range(sv):
                    for hh in range(sh):
                        y0 = (my * sv + v) * 8
                        x0 = (mx * sh + hh) * 8
                        _encode_block(
                            bw, padded[ci][y0:y0 + 8, x0:x0 + 8],
                            q, preds[ci],
                        )
            mcu += 1
    bw.pad()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


# ------------------------------------------------------------------ tests


def _smooth(h, w, seed=0, chans=None):
    rng = np.random.default_rng(seed)
    shape = (h, w) if chans is None else (h, w, chans)
    img = rng.uniform(0, 255, size=shape)
    # low-pass: box blur twice so quantization error stays small
    for axis in (0, 1):
        img = (np.roll(img, 1, axis) + img + np.roll(img, -1, axis)) / 3
        img = (np.roll(img, 1, axis) + img + np.roll(img, -1, axis)) / 3
    return np.clip(img, 0, 255).astype(np.uint8)


def test_uniform_gray_is_near_exact():
    img = np.full((16, 24), 128, dtype=np.uint8)
    got = decode_jpeg_pixels(encode_jpeg(img, q=2))
    assert got.shape == (16, 24, 1)
    assert np.abs(got[:, :, 0].astype(int) - 128).max() <= 1


def test_gray_gradient_roundtrip():
    x = np.linspace(0, 255, 40)
    img = np.tile(x, (24, 1)).astype(np.uint8)
    got = decode_jpeg_pixels(encode_jpeg(img, q=2))[:, :, 0]
    assert got.shape == (24, 40)
    assert np.abs(got.astype(int) - img.astype(int)).max() <= 6


def test_gray_smooth_random_roundtrip_odd_dims():
    img = _smooth(37, 51, seed=1)  # non-multiple-of-8 dims exercise crop
    got = decode_jpeg_pixels(encode_jpeg(img, q=2))[:, :, 0]
    assert got.shape == img.shape
    err = np.abs(got.astype(int) - img.astype(int))
    assert err.mean() < 2 and err.max() <= 10


def test_rgb_444_roundtrip():
    img = _smooth(32, 32, seed=2, chans=3)
    got = decode_jpeg_pixels(encode_jpeg(img, q=2))
    assert got.shape == (32, 32, 3)
    err = np.abs(got.astype(int) - img.astype(int))
    assert err.mean() < 3 and err.max() <= 16


def test_rgb_420_subsampled_roundtrip():
    img = _smooth(48, 40, seed=3, chans=3)
    got = decode_jpeg_pixels(encode_jpeg(img, q=2, subsample=True))
    assert got.shape == (48, 40, 3)
    # chroma is 2x2-averaged then nearest-upsampled: allow more error
    err = np.abs(got.astype(int) - img.astype(int))
    assert err.mean() < 6 and err.max() <= 48


def test_restart_markers_match_unrestarted():
    img = _smooth(32, 48, seed=4)
    a = decode_jpeg_pixels(encode_jpeg(img, q=2))
    b = decode_jpeg_pixels(encode_jpeg(img, q=2, restart=2))
    assert np.array_equal(a, b)


def test_mislabeled_progressive_fails_typed():
    # a sequential stream relabeled SOF2 carries an Ss=0/Se=63 scan,
    # which is illegal in progressive mode — must fail typed, not
    # decode garbage
    from bayard_spark.functions.jpeg import MediaDecodeUnavailableJpeg

    img = _smooth(16, 16, seed=5)
    buf = bytearray(encode_jpeg(img, q=2))
    i = buf.find(b"\xff\xc0")
    buf[i + 1] = 0xC2  # claim progressive
    with pytest.raises(MediaDecodeUnavailableJpeg):
        decode_jpeg_pixels(bytes(buf))


def test_arithmetic_coding_gated():
    from bayard_spark.functions.jpeg import MediaDecodeUnavailableJpeg

    img = _smooth(16, 16, seed=5)
    buf = bytearray(encode_jpeg(img, q=2))
    i = buf.find(b"\xff\xc0")
    buf[i + 1] = 0xC9  # SOF9: arithmetic sequential
    with pytest.raises(MediaDecodeUnavailableJpeg):
        decode_jpeg_pixels(bytes(buf))


def test_image_features_real_decode_jpeg_spark(spark):
    from bayard_spark.functions.multimodal import image_features

    img = _smooth(24, 24, seed=6, chans=3)
    rows = [(1, bytearray(encode_jpeg(img, q=2)))]
    df = spark.createDataFrame(rows, "asset_id long, media binary")
    got = image_features(df, real_decode=True).collect()
    assert len(got) == 1 and len(got[0]["feature"]) == 64
    # histogram mass sums to ~1 (real pixels, not a hash vector)
    assert abs(sum(got[0]["feature"][:32]) - 1.0) < 1e-3


def test_bmp_24bit_roundtrip():
    """BMP decode via an independent encoder (bottom-up BGR rows with
    4-byte stride padding, built with struct here)."""
    from bayard_spark.functions.multimodal import decode_bmp_pixels

    img = _smooth(13, 21, seed=7, chans=3)  # odd width → stride padding
    h, w = img.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        row = img[y, :, ::-1].tobytes()  # RGB→BGR
        rows += row + b"\x00" * (stride - len(row))
    header = b"BM" + struct.pack("<IHHI", 54 + len(rows), 0, 0, 54)
    header += struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                          len(rows), 2835, 2835, 0, 0)
    got = decode_bmp_pixels(bytes(header + rows))
    assert np.array_equal(got, img)


# ------------------------------------------------ GIF (independent encoder)


def _lzw_encode(indices, min_code):
    """Independent GIF-LZW encoder: dict-building, LSB-first variable
    width, CLEAR at start, END at finish."""
    clear, end = 1 << min_code, (1 << min_code) + 1
    out = bytearray()
    acc = 0
    nbits = 0
    width = min_code + 1

    def emit(code):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    emit(clear)
    s = b""
    for px in indices:
        c = bytes([px])
        if s + c in table:
            s += c
            continue
        emit(table[s])
        if next_code < 4096:
            table[s + c] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        s = c
    if s:
        emit(table[s])
    emit(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(img_idx, palette, interlace=False):
    """palette-index image (h, w) + palette (n, 3) -> GIF89a bytes."""
    h, w = img_idx.shape
    n = len(palette)
    depth = max(2, (n - 1).bit_length())
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | (depth - 1), 0, 0])
    pal = bytearray()
    for r, g, b in palette:
        pal += bytes([r, g, b])
    pal += b"\x00" * ((3 << depth) - len(pal))
    out += pal
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h)
    out += bytes([0x40 if interlace else 0x00])
    rows = img_idx
    if interlace:
        order = (list(range(0, h, 8)) + list(range(4, h, 8))
                 + list(range(2, h, 4)) + list(range(1, h, 2)))
        rows = img_idx[order]
    min_code = depth
    out += bytes([min_code])
    lzw = _lzw_encode(rows.ravel().tolist(), min_code)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i:i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


def test_gif_roundtrip():
    from bayard_spark.functions.multimodal import decode_gif_pixels

    rng = np.random.default_rng(8)
    palette = rng.integers(0, 256, size=(8, 3)).astype(np.uint8)
    idx = rng.integers(0, 8, size=(23, 31)).astype(np.uint8)
    got = decode_gif_pixels(encode_gif(idx, palette))
    assert got.shape == (23, 31, 3)
    assert np.array_equal(got, palette[idx])


def test_gif_interlaced_roundtrip():
    from bayard_spark.functions.multimodal import decode_gif_pixels

    rng = np.random.default_rng(9)
    palette = rng.integers(0, 256, size=(16, 3)).astype(np.uint8)
    idx = rng.integers(0, 16, size=(19, 13)).astype(np.uint8)
    got = decode_gif_pixels(encode_gif(idx, palette, interlace=True))
    assert np.array_equal(got, palette[idx])


def test_gif_large_image_dictionary_growth():
    """Enough pixels to push LZW past several width growths."""
    from bayard_spark.functions.multimodal import decode_gif_pixels

    rng = np.random.default_rng(10)
    palette = rng.integers(0, 256, size=(64, 3)).astype(np.uint8)
    idx = rng.integers(0, 64, size=(64, 64)).astype(np.uint8)
    got = decode_gif_pixels(encode_gif(idx, palette))
    assert np.array_equal(got, palette[idx])


@pytest.mark.parametrize("h,w,q,sub", [
    (8, 8, 1, False), (16, 24, 8, False), (33, 17, 4, False),
    (40, 56, 2, True), (17, 9, 8, True),
])
def test_jpeg_roundtrip_sweep(h, w, q, sub):
    """Parameter sweep over dims (incl. non-multiples of 8 and of the
    4:2:0 MCU), quantizer strength, and subsampling."""
    img = _smooth(h, w, seed=h * 100 + w, chans=3)
    got = decode_jpeg_pixels(encode_jpeg(img, q=q, subsample=sub))
    assert got.shape == (h, w, 3)
    err = np.abs(got.astype(int) - img.astype(int))
    # error scales with quantizer; chroma subsampling adds its own
    bound = 8 * q + (40 if sub else 0)
    assert err.max() <= bound, (err.max(), bound)
    assert err.mean() < 2 * q + (6 if sub else 0)


def test_cmyk_component_count_gated():
    from bayard_spark.functions.jpeg import MediaDecodeUnavailableJpeg

    img = _smooth(16, 16, seed=11, chans=3)
    buf = bytearray(encode_jpeg(img, q=2))
    i = buf.find(b"\xff\xc0")
    # SOF0 body: len(2) prec(1) h(2) w(2) nc(1) — claim 4 components
    buf[i + 9] = 4
    with pytest.raises(MediaDecodeUnavailableJpeg):
        decode_jpeg_pixels(bytes(buf))


def test_fill_bytes_before_rst_markers():
    """T.81 B.1.1.2: markers may be preceded by 0xFF fill bytes; the
    scan-boundary detector and the restart destuffer must treat FF FF
    as fill, not end-of-scan."""
    img = _smooth(32, 48, seed=12)
    plain = encode_jpeg(img, q=2, restart=2)
    # inject a fill byte before every RST marker
    stuffed = bytearray()
    j = 0
    while j < len(plain):
        if (plain[j] == 0xFF and j + 1 < len(plain)
                and 0xD0 <= plain[j + 1] <= 0xD7):
            stuffed += b"\xff"
        stuffed.append(plain[j])
        j += 1
    got_plain = decode_jpeg_pixels(plain)
    got_stuffed = decode_jpeg_pixels(bytes(stuffed))
    assert np.array_equal(got_plain, got_stuffed)


def test_missing_restart_segment_gated():
    from bayard_spark.functions.jpeg import MediaDecodeUnavailableJpeg

    img = _smooth(32, 48, seed=13)
    buf = encode_jpeg(img, q=2, restart=1)
    # truncate right after the first RST marker: later restart switches
    # must fail typed, not with a bare StopIteration
    i = buf.find(b"\xff\xd0")
    with pytest.raises(MediaDecodeUnavailableJpeg):
        decode_jpeg_pixels(buf[: i + 2] + b"\xff\xd9")


def test_gif_background_fill_and_oversize_gate():
    from bayard_spark.functions.multimodal import (
        MediaDecodeUnavailable,
        decode_gif_pixels,
    )

    rng = np.random.default_rng(14)
    palette = rng.integers(0, 256, size=(8, 3)).astype(np.uint8)
    idx = rng.integers(0, 8, size=(4, 4)).astype(np.uint8)
    gif = bytearray(encode_gif(idx, palette))
    # enlarge the logical screen to 8x8 and set background index 5: the
    # uncovered area must fill with palette[5], not palette[0]
    gif[6:8] = struct.pack("<H", 8)
    gif[8:10] = struct.pack("<H", 8)
    gif[11] = 5
    got = decode_gif_pixels(bytes(gif))
    assert got.shape == (8, 8, 3)
    assert np.array_equal(got[:4, :4], palette[idx])
    assert np.array_equal(got[6, 6], palette[5])
    # a frame exceeding the screen fails typed
    bad = bytearray(encode_gif(idx, palette))
    bad[6:8] = struct.pack("<H", 2)  # screen narrower than the frame
    with pytest.raises(MediaDecodeUnavailable):
        decode_gif_pixels(bytes(bad))


# ------------------------------------------- round-6 ADVICE regression tests


def test_gif_background_uses_global_palette_not_local():
    """GIF89a: the background color index is defined against the GLOBAL
    color table. A frame with a LOCAL palette that doesn't cover the
    screen must fill the uncovered area from the GCT, not the local
    palette."""
    from bayard_spark.functions.multimodal import decode_gif_pixels

    rng = np.random.default_rng(15)
    gct = rng.integers(0, 256, size=(8, 3)).astype(np.uint8)
    lct = rng.integers(0, 256, size=(8, 3)).astype(np.uint8)
    idx = rng.integers(0, 8, size=(4, 4)).astype(np.uint8)
    # build: 8x8 screen with GCT, bg index 5, one 4x4 frame with a LOCAL
    # palette at origin
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", 8, 8)
    out += bytes([0x80 | 2, 5, 0])  # GCT present, depth 3, bg=5
    for r, g, b in gct:
        out += bytes([r, g, b])
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, 4, 4)
    out += bytes([0x80 | 2])  # local palette, depth 3
    for r, g, b in lct:
        out += bytes([r, g, b])
    min_code = 3
    out += bytes([min_code])
    lzw = _lzw_encode(idx.ravel().tolist(), min_code)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i:i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    got = decode_gif_pixels(bytes(out))
    assert np.array_equal(got[:4, :4], lct[idx])     # frame: local palette
    assert np.array_equal(got[6, 6], gct[5])         # background: GLOBAL


def test_bmp_out_of_range_palette_index_gated():
    from bayard_spark.functions.multimodal import (
        MediaDecodeUnavailable,
        decode_bmp_pixels,
    )

    # 2x2 8-bit BMP with a 4-entry palette but a pixel index of 9
    w = h = 2
    stride = (w + 3) & ~3
    pal = bytes(16)  # 4 BGRA entries
    pix_off = 54 + len(pal)
    rows = bytearray()
    for _ in range(h):
        rows += bytes([0, 9]) + b"\x00" * (stride - 2)
    header = b"BM" + struct.pack("<IHHI", pix_off + len(rows), 0, 0, pix_off)
    header += struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0,
                          len(rows), 2835, 2835, 4, 0)
    with pytest.raises(MediaDecodeUnavailable):
        decode_bmp_pixels(bytes(header + pal + rows))


def test_bmp_nonpositive_dims_gated():
    from bayard_spark.functions.multimodal import (
        MediaDecodeUnavailable,
        decode_bmp_pixels,
    )

    header = b"BM" + struct.pack("<IHHI", 54, 0, 0, 54)
    header += struct.pack("<IiiHHIIiiII", 40, -3, 2, 1, 24, 0,
                          0, 2835, 2835, 0, 0)
    with pytest.raises(MediaDecodeUnavailable):
        decode_bmp_pixels(bytes(header))


def test_jpeg_missing_quant_table_typed():
    from bayard_spark.functions.jpeg import MediaDecodeUnavailableJpeg

    data = bytearray(encode_jpeg(_smooth(8, 8), q=2))
    m = bytes(data).find(b"\xff\xc0")
    assert data[m + 12] == 0  # comp 0 tq byte
    data[m + 12] = 3  # reference a table that was never defined
    with pytest.raises(MediaDecodeUnavailableJpeg):
        decode_jpeg_pixels(bytes(data))


def test_jpeg_unknown_scan_component_typed():
    from bayard_spark.functions.jpeg import MediaDecodeUnavailableJpeg

    data = bytearray(encode_jpeg(_smooth(8, 8), q=2))
    m = bytes(data).find(b"\xff\xda")
    assert data[m + 5] == 1  # first scan-component id
    data[m + 5] = 9
    with pytest.raises(MediaDecodeUnavailableJpeg):
        decode_jpeg_pixels(bytes(data))


def test_jpeg_truncated_dqt_typed():
    from bayard_spark.functions.jpeg import MediaDecodeUnavailableJpeg

    data = b"\xff\xd8" + b"\xff\xdb" + struct.pack(">H", 2 + 1 + 10) \
        + b"\x00" + bytes(10) + b"\xff\xd9"
    with pytest.raises(MediaDecodeUnavailableJpeg):
        decode_jpeg_pixels(data)


def test_jpeg_truncated_dht_typed():
    from bayard_spark.functions.jpeg import MediaDecodeUnavailableJpeg

    # DHT claims 12 symbols but the body ends after 3
    counts = [0] * 16
    counts[3] = 12
    body = bytes([0x00] + counts) + bytes(3)
    data = b"\xff\xd8" + b"\xff\xc4" + struct.pack(">H", 2 + len(body)) \
        + body + b"\xff\xd9"
    with pytest.raises(MediaDecodeUnavailableJpeg):
        decode_jpeg_pixels(data)


# ------------------------------------------- independent progressive encoder


def _comp_coeffs(img, q, subsample):
    """Quantized zigzag-order coefficient arrays per component, padded to
    the MCU grid — the shared front half of a progressive encoder."""
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if gray:
        planes = [img.astype(np.float64) - 128.0]
        samp = [(1, 1)]
    else:
        f = img.astype(np.float64)
        y = 0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]
        cb = -0.168736 * f[:, :, 0] - 0.331264 * f[:, :, 1] \
            + 0.5 * f[:, :, 2]
        cr = 0.5 * f[:, :, 0] - 0.418688 * f[:, :, 1] \
            - 0.081312 * f[:, :, 2]
        if subsample:
            ph, pw = -(-h // 2) * 2, -(-w // 2) * 2
            cbp = np.pad(cb, ((0, ph - h), (0, pw - w)), mode="edge")
            crp = np.pad(cr, ((0, ph - h), (0, pw - w)), mode="edge")
            cb = cbp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            cr = crp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y - 128.0, cb, cr]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    coefs = []
    for p, (sh, sv) in zip(planes, samp):
        tw, th = mcux * sh * 8, mcuy * sv * 8
        pp = np.pad(
            p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), mode="edge"
        )
        nby, nbx = th // 8, tw // 8
        cz = np.zeros((nby, nbx, 64), dtype=np.int64)
        for by in range(nby):
            for bx in range(nbx):
                c8 = np.round(
                    fdct(pp[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]) / q
                ).astype(int)
                cz[by, bx] = [int(c8.flat[ZZ[k]]) for k in range(64)]
        coefs.append(cz)
    return samp, coefs, hmax, vmax, mcux, mcuy


def encode_jpeg_progressive(img, q=2, subsample=False, restart=0):
    """Progressive (SOF2) encoder, written independently of the decoder:
    interleaved DC first (Al=1) + DC refine, per-component spectral
    selection (bands 1-5 and 6-63 at Al=1), then AC successive-
    approximation refinement (Ah=1, Al=0) with EOB-run buffering."""
    gray = img.ndim == 2
    h, w = img.shape[:2]
    nc = 1 if gray else 3
    samp, coefs, hmax, vmax, mcux, mcuy = _comp_coeffs(img, q, subsample)

    out = bytearray(b"\xff\xd8")
    qtbl = bytes([q] * 64)
    out += b"\xff\xdb" + struct.pack(">H", 2 + 1 + 64) + b"\x00" + qtbl
    sof = bytearray(struct.pack(">BHHB", 8, h, w, nc))
    for ci in range(nc):
        sh, sv = samp[ci]
        sof += bytes([ci + 1, (sh << 4) | sv, 0])
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof
    dc_counts = [0] * 16
    dc_counts[DC_BITS - 1] = 12
    dht = bytes([0x00] + dc_counts) + bytes(range(12))
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    ac_counts = [0] * 16
    ac_counts[AC_BITS - 1] = 255
    dht = bytes([0x10] + ac_counts) + bytes(range(255))
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    if restart:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart)

    def sos(comp_ids, ss, se, ah, al):
        body = bytearray([len(comp_ids)])
        for cid in comp_ids:
            body += bytes([cid, 0x00])
        body += bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + struct.pack(">H", 2 + len(body)) + bytes(body)

    rstn = [0]

    def emit_rst(bw):
        bw.pad()
        out.extend(bw.out)
        out.extend(bytes([0xFF, 0xD0 + rstn[0]]))
        rstn[0] = (rstn[0] + 1) % 8
        return BitWriter()

    # ---- scan 1: interleaved DC first, Al=1
    al = 1
    out += sos(list(range(1, nc + 1)), 0, 0, 0, al)
    bw = BitWriter()
    preds = [0] * nc
    unit = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and unit and unit % restart == 0:
                bw = emit_rst(bw)
                preds = [0] * nc
            for ci in range(nc):
                sh, sv = samp[ci]
                for v in range(sv):
                    for hh in range(sh):
                        d = int(coefs[ci][my * sv + v, mx * sh + hh, 0]) >> al
                        t, code = _mag(d - preds[ci])
                        preds[ci] = d
                        bw.write(t, DC_BITS)
                        bw.write(code, t)
            unit += 1
    bw.pad()
    out += bw.out

    # ---- scan 2: interleaved DC refine, Al=0
    out += sos(list(range(1, nc + 1)), 0, 0, 1, 0)
    bw = BitWriter()
    unit = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and unit and unit % restart == 0:
                bw = emit_rst(bw)
            for ci in range(nc):
                sh, sv = samp[ci]
                for v in range(sv):
                    for hh in range(sh):
                        bw.write(
                            int(coefs[ci][my * sv + v, mx * sh + hh, 0]) & 1,
                            1,
                        )
            unit += 1
    bw.pad()
    out += bw.out

    def comp_grid(ci):
        sh, sv = samp[ci]
        cw = -(-(w * sh) // hmax)
        ch = -(-(h * sv) // vmax)
        return -(-ch // 8), -(-cw // 8)

    # ---- AC first scans: spectral selection at Al=1, per component
    for ss, se in ((1, 5), (6, 63)):
        for ci in range(nc):
            out += sos([ci + 1], ss, se, 0, 1)
            bw = BitWriter()
            nby, nbx = comp_grid(ci)
            state = {"eob": 0}

            def flush_eob():
                if state["eob"]:
                    nb = state["eob"].bit_length() - 1
                    bw.write(nb << 4, AC_BITS)
                    if nb:
                        bw.write(state["eob"] - (1 << nb), nb)
                    state["eob"] = 0

            unit = 0
            for by in range(nby):
                for bx in range(nbx):
                    if restart and unit and unit % restart == 0:
                        flush_eob()
                        bw = emit_rst(bw)
                    unit += 1
                    band = [int(t) for t in coefs[ci][by, bx, ss:se + 1]]
                    vals = [
                        (abs(t) >> 1) * (1 if t >= 0 else -1) for t in band
                    ]
                    nz = [i for i, v in enumerate(vals) if v]
                    if not nz:
                        state["eob"] += 1
                        if state["eob"] == 0x7FFF:
                            flush_eob()
                        continue
                    flush_eob()
                    r = 0
                    for i in range(nz[-1] + 1):
                        if vals[i] == 0:
                            r += 1
                            continue
                        while r > 15:
                            bw.write(0xF0, AC_BITS)
                            r -= 16
                        t, code = _mag(vals[i])
                        bw.write((r << 4) | t, AC_BITS)
                        bw.write(code, t)
                        r = 0
                    if nz[-1] < se - ss:
                        state["eob"] += 1
            flush_eob()
            bw.pad()
            out += bw.out

    # ---- AC refinement scans: Ss=1..63, Ah=1, Al=0, per component
    for ci in range(nc):
        ss, se = 1, 63
        out += sos([ci + 1], ss, se, 1, 0)
        bw = BitWriter()
        nby, nbx = comp_grid(ci)
        state = {"eob": 0, "defer": []}

        def flush_eob_r():
            if state["eob"]:
                nb = state["eob"].bit_length() - 1
                bw.write(nb << 4, AC_BITS)
                if nb:
                    bw.write(state["eob"] - (1 << nb), nb)
                for b in state["defer"]:
                    bw.write(b, 1)
                state["defer"] = []
                state["eob"] = 0

        unit = 0
        for by in range(nby):
            for bx in range(nbx):
                if restart and unit and unit % restart == 0:
                    flush_eob_r()
                    bw = emit_rst(bw)
                unit += 1
                band = [int(t) for t in coefs[ci][by, bx, ss:se + 1]]
                a = [abs(t) for t in band]  # Al=0: magnitude as-is
                newly = [i for i, m in enumerate(a) if m == 1]
                lastnz = newly[-1] if newly else -1
                r = 0
                pend = []
                for i in range(lastnz + 1):
                    if a[i] == 0:
                        r += 1
                        continue
                    # any nonzero flushes pending ZRLs eagerly so the
                    # decoder's correction bits stay in stream order
                    while r > 15:
                        flush_eob_r()
                        bw.write(0xF0, AC_BITS)
                        for b in pend:
                            bw.write(b, 1)
                        pend = []
                        r -= 16
                    if a[i] > 1:  # already significant: correction bit
                        pend.append(a[i] & 1)
                        continue
                    flush_eob_r()
                    bw.write((r << 4) | 1, AC_BITS)
                    bw.write(1 if band[i] > 0 else 0, 1)
                    for b in pend:
                        bw.write(b, 1)
                    pend = []
                    r = 0
                if lastnz < se - ss:
                    state["eob"] += 1
                    state["defer"] += [
                        a[i] & 1 for i in range(lastnz + 1, se - ss + 1)
                        if a[i] > 1
                    ]
                    if state["eob"] == 0x7FFF:
                        flush_eob_r()
        flush_eob_r()
        bw.pad()
        out += bw.out

    out += b"\xff\xd9"
    return bytes(out)


def test_progressive_gray_roundtrip():
    img = _smooth(24, 17, seed=5)
    seq = decode_jpeg_pixels(encode_jpeg(img, q=2))
    prog = decode_jpeg_pixels(encode_jpeg_progressive(img, q=2))
    assert prog.shape == seq.shape == (24, 17, 1)
    # identical quantized coefficients → bit-identical pixels
    assert np.array_equal(prog, seq)
    assert np.max(np.abs(prog[:, :, 0].astype(int) - img.astype(int))) <= 24


def test_progressive_rgb_444_roundtrip():
    img = _smooth(16, 21, seed=6, chans=3)
    seq = decode_jpeg_pixels(encode_jpeg(img, q=2))
    prog = decode_jpeg_pixels(encode_jpeg_progressive(img, q=2))
    assert np.array_equal(prog, seq)


def test_progressive_rgb_420_roundtrip():
    # subsampled chroma: the non-interleaved AC scans walk the chroma
    # component's OWN block grid, smaller than the MCU grid
    img = _smooth(33, 26, seed=7, chans=3)
    seq = decode_jpeg_pixels(encode_jpeg(img, q=2, subsample=True))
    prog = decode_jpeg_pixels(
        encode_jpeg_progressive(img, q=2, subsample=True)
    )
    assert np.array_equal(prog, seq)


def test_progressive_restart_markers():
    img = _smooth(40, 33, seed=8, chans=3)
    base = decode_jpeg_pixels(encode_jpeg_progressive(img, q=2))
    rst = decode_jpeg_pixels(encode_jpeg_progressive(img, q=2, restart=3))
    assert np.array_equal(base, rst)


def test_progressive_sharp_image_roundtrip():
    # high-frequency content exercises ZRL paths and long EOB runs
    rng = np.random.default_rng(11)
    img = (rng.uniform(0, 255, size=(24, 24, 3))).astype(np.uint8)
    seq = decode_jpeg_pixels(encode_jpeg(img, q=3))
    prog = decode_jpeg_pixels(encode_jpeg_progressive(img, q=3))
    assert np.array_equal(prog, seq)
