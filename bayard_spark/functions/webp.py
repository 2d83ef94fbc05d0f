"""WebP LOSSLESS (VP8L) pixel decode — dependency-free, from the public
bitstream spec (datatracker.ietf.org/doc/html/draft-zern-webp /
developers.google.com/speed/webp/docs/webp_lossless_bitstream_specification).

Implements the full VP8L decode path:
- RIFF walk (bare VP8L chunk, or VP8X extended container holding one);
- LSB-first bit reader;
- canonical Huffman codes: simple (1-2 symbol) and normal
  (code-length-code with 16/17/18 repeats, optional max_symbol cut);
- meta-Huffman entropy image (per-block Huffman group selection);
- LZ77 over ARGB with the 120-entry 2D distance map + color cache
  (0x1e35a7bd hash);
- all four transforms, inverted in reverse order: predictor (14 modes,
  per-block modes from a subresolution image), cross-color (signed
  3.5 fixed-point deltas), subtract-green, color-indexing (palette
  with pixel bundling at <=16 entries).

Lossy VP8 raises MediaDecodeUnavailableWebp — that codec (boolean
arithmetic coder, intra prediction, loop filter) is honestly gated, as
is animation (ANMF).

Like the JPEG/PNG decoders, this is PER-IMAGE Python inside mapInPandas
(the repo's accepted granularity for media decode); the Huffman hot
loop uses a peek-table (single dict probe per symbol), not a bit-walk.

Validated by inverting an INDEPENDENT encoder written in its test
(tests/test_webp_decode.py): the encoder builds real canonical Huffman
codes from pixel statistics and emits literal streams, LZ77 back-
references, color-cache hits, and forward transform chains; the decoder
must reproduce the exact pixels. Malformed containers raise typed
errors, never silent garbage.

Reference parity: bayard treats stored bytes as opaque; this decoder
feeds image_features(real_decode=True) in functions/multimodal.py.
"""

from __future__ import annotations

import struct

import numpy as np


class MediaDecodeUnavailableWebp(NotImplementedError):
    """Typed gate: WebP features needing a real external codec (lossy
    VP8, animation) or malformed/truncated streams."""


# --------------------------------------------------------------- reader


class _Bits:
    """LSB-first bit reader over bytes."""

    __slots__ = ("d", "pos", "n")

    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0  # bit position
        self.n = len(data) * 8

    def read(self, nbits: int) -> int:
        if nbits == 0:
            return 0
        if self.pos + nbits > self.n:
            raise MediaDecodeUnavailableWebp("VP8L stream truncated")
        out = 0
        p = self.pos
        d = self.d
        for i in range(nbits):
            out |= ((d[(p + i) >> 3] >> ((p + i) & 7)) & 1) << i
        self.pos = p + nbits
        return out

    def peek16(self) -> int:
        """Peek up to 16 bits (zero-padded past the end)."""
        p = self.pos
        byte = p >> 3
        chunk = self.d[byte : byte + 4]
        v = int.from_bytes(chunk.ljust(4, b"\0"), "little")
        return (v >> (p & 7)) & 0xFFFF


# -------------------------------------------------------------- huffman

_CODE_LENGTH_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10,
                      11, 12, 13, 14, 15)
_MAX_CODE_LEN = 15


class _Huff:
    """Canonical Huffman decoder with a 16-bit peek table.

    Codes are canonical DEFLATE-style (assigned in (length, symbol)
    order); VP8L streams them MSB-first, so the peek table stores the
    bit-reversed code in the low bits."""

    __slots__ = ("table", "single")

    def __init__(self, lengths: list[int]):
        self.single: int | None = None
        nz = [(ln, s) for s, ln in enumerate(lengths) if ln > 0]
        if not nz:
            raise MediaDecodeUnavailableWebp("VP8L empty huffman code")
        if len(nz) == 1:
            self.single = nz[0][1]
            self.table = {}
            return
        if max(ln for ln, _ in nz) > _MAX_CODE_LEN:
            raise MediaDecodeUnavailableWebp("VP8L code length > 15")
        # kraft check
        if sum(1 << (_MAX_CODE_LEN - ln) for ln, _ in nz) != (
            1 << _MAX_CODE_LEN
        ):
            raise MediaDecodeUnavailableWebp(
                "VP8L over/under-subscribed huffman code"
            )
        nz.sort()
        table = [None] * (1 << 16)
        code = 0
        prev_len = nz[0][0]
        for ln, sym in nz:
            code <<= ln - prev_len
            prev_len = ln
            # bit-reverse the code to match LSB-first reading
            rev = 0
            c = code
            for _ in range(ln):
                rev = (rev << 1) | (c & 1)
                c >>= 1
            # fill all 16-bit entries whose low bits equal rev
            entry = (sym, ln)
            step = 1 << ln
            for hi in range(rev, 1 << 16, step):
                table[hi] = entry
            code += 1
        self.table = table

    def read(self, br: _Bits) -> int:
        if self.single is not None:
            return self.single
        entry = self.table[br.peek16()]
        if entry is None:
            raise MediaDecodeUnavailableWebp("VP8L invalid huffman code")
        sym, ln = entry
        if br.pos + ln > br.n:
            raise MediaDecodeUnavailableWebp("VP8L stream truncated")
        br.pos += ln
        return sym


def _read_code(br: _Bits, alphabet_size: int) -> _Huff:
    if br.read(1):  # simple code
        num_symbols = br.read(1) + 1
        first_8bit = br.read(1)
        s0 = br.read(8 if first_8bit else 1)
        lengths = [0] * alphabet_size
        if s0 >= alphabet_size:
            raise MediaDecodeUnavailableWebp("VP8L simple-code symbol range")
        if num_symbols == 2:
            s1 = br.read(8)
            if s1 >= alphabet_size:
                raise MediaDecodeUnavailableWebp(
                    "VP8L simple-code symbol range"
                )
            # simple codes assign bit 0 to the FIRST-read symbol (read
            # order, not canonical symbol order)
            h = _Huff.__new__(_Huff)
            h.single = None
            table = [None] * (1 << 16)
            for hi in range(0, 1 << 16, 2):
                table[hi] = (s0, 1)
                table[hi + 1] = (s1, 1)
            h.table = table
            return h
        lengths[s0] = 1  # single-symbol: _Huff reads zero bits
        return _Huff(lengths)
    # normal: code-length code
    num_codes = 4 + br.read(4)
    cl_lengths = [0] * 19
    for i in range(num_codes):
        cl_lengths[_CODE_LENGTH_ORDER[i]] = br.read(3)
    cl_huff = _Huff(cl_lengths)
    if br.read(1):  # use max_symbol
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev = 8
    i = 0
    while i < alphabet_size:
        if max_symbol <= 0:
            break
        max_symbol -= 1
        s = cl_huff.read(br)
        if s < 16:
            lengths[i] = s
            i += 1
            if s:
                prev = s
        elif s == 16:
            rep = 3 + br.read(2)
            for _ in range(rep):
                if i < alphabet_size:
                    lengths[i] = prev
                    i += 1
        elif s == 17:
            i += 3 + br.read(3)
        else:
            i += 11 + br.read(7)
    return _Huff(lengths)


# ------------------------------------------------------------ lz77 maps

_DIST_MAP = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
]


def _prefix_value(br: _Bits, code: int) -> int:
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


# ------------------------------------------------------- image decoding


def _div_round_up(a: int, shift: int) -> int:
    return (a + (1 << shift) - 1) >> shift


def _decode_image(br: _Bits, w: int, h: int, is_level0: bool):
    """Decode one VP8L spatially-coded image → (pixels uint32[h*w],
    transforms list) — transforms only read at level 0."""
    transforms = []
    if is_level0:
        seen = set()
        while br.read(1):
            ttype = br.read(2)
            if ttype in seen:
                raise MediaDecodeUnavailableWebp(
                    "VP8L duplicate transform"
                )
            seen.add(ttype)
            transforms.append(_read_transform(br, ttype, w, h))
            if ttype == 3:  # color indexing shrinks the coded width
                pal = transforms[-1][1]
                if len(pal) <= 2:
                    w = _div_round_up(w, 3)
                elif len(pal) <= 4:
                    w = _div_round_up(w, 2)
                elif len(pal) <= 16:
                    w = _div_round_up(w, 1)
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise MediaDecodeUnavailableWebp("VP8L cache bits out of range")
    cache_size = (1 << cache_bits) if cache_bits else 0

    meta = None
    meta_bits = 0
    num_groups = 1
    if is_level0 and br.read(1):  # meta huffman
        meta_bits = br.read(3) + 2
        mw, mh = _div_round_up(w, meta_bits), _div_round_up(h, meta_bits)
        meta_px, _ = _decode_image(br, mw, mh, False)
        meta = [((p >> 8) & 0xFFFF) for p in meta_px]
        num_groups = max(meta) + 1
    groups = []
    alphabet0 = 256 + 24 + cache_size
    for _ in range(num_groups):
        groups.append((
            _read_code(br, alphabet0),
            _read_code(br, 256),
            _read_code(br, 256),
            _read_code(br, 256),
            _read_code(br, 40),
        ))

    npx = w * h
    pixels = [0] * npx
    cache = [0] * cache_size
    pos = 0
    g = groups[0]
    mw = _div_round_up(w, meta_bits) if meta else 0
    while pos < npx:
        if meta is not None:
            x, y = pos % w, pos // w
            g = groups[meta[(y >> meta_bits) * mw + (x >> meta_bits)]]
        s = g[0].read(br)
        if s < 256:
            red = g[1].read(br)
            blue = g[2].read(br)
            alpha = g[3].read(br)
            px = (alpha << 24) | (red << 16) | (s << 8) | blue
            pixels[pos] = px
            pos += 1
            if cache_size:
                cache[(0x1E35A7BD * px & 0xFFFFFFFF) >> (32 - cache_bits)] = px
        elif s < 280:
            length = _prefix_value(br, s - 256)
            dcode = g[4].read(br)
            dist = _prefix_value(br, dcode)
            if dist <= 120:
                dx, dy = _DIST_MAP[dist - 1]
                dist = dy * w + dx
                if dist < 1:
                    dist = 1
            else:
                dist -= 120
            if dist > pos or pos + length > npx:
                raise MediaDecodeUnavailableWebp("VP8L backref out of range")
            for _ in range(length):
                px = pixels[pos - dist]
                pixels[pos] = px
                pos += 1
                if cache_size:
                    cache[
                        (0x1E35A7BD * px & 0xFFFFFFFF) >> (32 - cache_bits)
                    ] = px
        else:
            idx = s - 280
            if idx >= cache_size:
                raise MediaDecodeUnavailableWebp("VP8L cache index range")
            pixels[pos] = cache[idx]
            pos += 1
    return pixels, transforms


def _read_transform(br: _Bits, ttype: int, w: int, h: int):
    if ttype == 2:  # subtract green: no data
        return (2, None)
    if ttype in (0, 1):  # predictor / cross-color: subimage of modes
        size_bits = br.read(3) + 2
        sw, sh = _div_round_up(w, size_bits), _div_round_up(h, size_bits)
        px, _ = _decode_image(br, sw, sh, False)
        return (ttype, (size_bits, sw, px))
    # ttype == 3: color indexing
    n = br.read(8) + 1
    pal_px, _ = _decode_image(br, n, 1, False)
    # palette entries are component-wise delta-coded
    pal = []
    prev = 0
    for p in pal_px:
        cur = 0
        for shift in (0, 8, 16, 24):
            comp = ((p >> shift) + (prev >> shift)) & 0xFF
            cur |= comp << shift
        pal.append(cur)
        prev = cur
    return (3, pal)


# ----------------------------------------------------------- transforms


def _split(a: np.ndarray):
    return (a >> 24) & 0xFF, (a >> 16) & 0xFF, (a >> 8) & 0xFF, a & 0xFF


def _inv_subtract_green(a: np.ndarray) -> np.ndarray:
    al, r, g, b = _split(a)
    r = (r + g) & 0xFF
    b = (b + g) & 0xFF
    return (al << 24) | (r << 16) | (g << 8) | b


def _avg2(a: int, b: int) -> int:
    # per-channel average without carry across channels
    return (((a ^ b) & 0xFEFEFEFE) >> 1) + (a & b)


def _clamp_add_sub_full(l: int, t: int, tl: int) -> int:
    out = 0
    for shift in (0, 8, 16, 24):
        v = ((l >> shift) & 0xFF) + ((t >> shift) & 0xFF) - (
            (tl >> shift) & 0xFF
        )
        out |= max(0, min(255, v)) << shift
    return out


def _clamp_add_sub_half(l: int, t: int, tl: int) -> int:
    out = 0
    for shift in (0, 8, 16, 24):
        a = (((l >> shift) & 0xFF) + ((t >> shift) & 0xFF)) // 2
        v = a + (a - ((tl >> shift) & 0xFF)) // 2
        out |= max(0, min(255, v)) << shift
    return out


def _select(l: int, t: int, tl: int) -> int:
    p_l = p_t = 0
    for shift in (0, 8, 16, 24):
        pred = ((l >> shift) & 0xFF) + ((t >> shift) & 0xFF) - (
            (tl >> shift) & 0xFF
        )
        p_l += abs(pred - ((l >> shift) & 0xFF))
        p_t += abs(pred - ((t >> shift) & 0xFF))
    return l if p_l <= p_t else t


def _inv_predictor(pixels: list[int], w: int, h: int, data) -> list[int]:
    size_bits, sw, modes = data
    out = pixels  # in place, scan order
    for y in range(h):
        for x in range(w):
            i = y * w + x
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = out[i - 1]
            elif x == 0:
                pred = out[i - w]
            else:
                mode = (modes[(y >> size_bits) * sw + (x >> size_bits)]
                        >> 8) & 0xFF
                left = out[i - 1]
                top = out[i - w]
                tl = out[i - w - 1]
                tr = out[i - w + 1] if x + 1 < w else out[i - w]
                if mode == 0:
                    pred = 0xFF000000
                elif mode == 1:
                    pred = left
                elif mode == 2:
                    pred = top
                elif mode == 3:
                    pred = tr
                elif mode == 4:
                    pred = tl
                elif mode == 5:
                    pred = _avg2(_avg2(left, tr), top)
                elif mode == 6:
                    pred = _avg2(left, tl)
                elif mode == 7:
                    pred = _avg2(left, top)
                elif mode == 8:
                    pred = _avg2(tl, top)
                elif mode == 9:
                    pred = _avg2(top, tr)
                elif mode == 10:
                    pred = _avg2(_avg2(left, tl), _avg2(top, tr))
                elif mode == 11:
                    pred = _select(left, top, tl)
                elif mode == 12:
                    pred = _clamp_add_sub_full(left, top, tl)
                elif mode == 13:
                    pred = _clamp_add_sub_half(left, top, tl)
                else:
                    raise MediaDecodeUnavailableWebp(
                        f"VP8L predictor mode {mode}"
                    )
            v = out[i]
            out[i] = (
                ((((v >> 24) + (pred >> 24)) & 0xFF) << 24)
                | ((((v >> 16) + (pred >> 16)) & 0xFF) << 16)
                | ((((v >> 8) + (pred >> 8)) & 0xFF) << 8)
                | ((v + pred) & 0xFF)
            )
    return out


def _ct_delta(t: int, c: int) -> int:
    # signed 3.5 fixed point: (int8(t) * int8(c)) >> 5
    ts = t - 256 if t >= 128 else t
    cs = c - 256 if c >= 128 else c
    return (ts * cs) >> 5


def _inv_color_transform(pixels: list[int], w: int, h: int, data):
    size_bits, sw, cts = data
    for y in range(h):
        for x in range(w):
            i = y * w + x
            ct = cts[(y >> size_bits) * sw + (x >> size_bits)]
            g2r = ct & 0xFF
            g2b = (ct >> 8) & 0xFF
            r2b = (ct >> 16) & 0xFF
            px = pixels[i]
            g = (px >> 8) & 0xFF
            r = (px >> 16) & 0xFF
            b = px & 0xFF
            r = (r + _ct_delta(g2r, g)) & 0xFF
            b = (b + _ct_delta(g2b, g)) & 0xFF
            b = (b + _ct_delta(r2b, r)) & 0xFF
            pixels[i] = (px & 0xFF00FF00) | (r << 16) | b
    return pixels


def _inv_color_index(pixels: list[int], w: int, h: int, pal) -> list[int]:
    n = len(pal)
    if n <= 2:
        width_bits = 3
    elif n <= 4:
        width_bits = 2
    elif n <= 16:
        width_bits = 1
    else:
        width_bits = 0
    if width_bits == 0:
        out = []
        for p in pixels:
            idx = (p >> 8) & 0xFF
            out.append(pal[idx] if idx < n else 0)
        return out
    packed_w = _div_round_up(w, width_bits)
    bits_per = 8 >> width_bits
    mask = (1 << bits_per) - 1
    out = [0] * (w * h)
    for y in range(h):
        for x in range(w):
            p = pixels[y * packed_w + (x >> width_bits)]
            idx = ((p >> 8) >> (
                (x & ((1 << width_bits) - 1)) * bits_per
            )) & mask
            out[y * w + x] = pal[idx] if idx < n else 0
    return out


# ---------------------------------------------------------------- entry


def decode_vp8l_pixels(payload: bytes) -> np.ndarray:
    """VP8L chunk payload → (h, w, 4) uint8 RGBA."""
    if len(payload) < 5 or payload[0] != 0x2F:
        raise MediaDecodeUnavailableWebp("bad VP8L signature")
    br = _Bits(payload[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        raise MediaDecodeUnavailableWebp("VP8L version != 0")
    pixels, transforms = _decode_image(br, w, h, True)
    # inverse transforms in reverse order of appearance
    for ttype, data in reversed(transforms):
        if ttype == 3:
            pixels = _inv_color_index(pixels, w, h, data)
        elif ttype == 2:
            arr = np.array(pixels, dtype=np.uint32)
            pixels = list(_inv_subtract_green(arr))
        elif ttype == 1:
            pixels = _inv_color_transform(pixels, w, h, data)
        elif ttype == 0:
            pixels = _inv_predictor(pixels, w, h, data)
    arr = np.array(pixels, dtype=np.uint32).reshape(h, w)
    rgba = np.empty((h, w, 4), dtype=np.uint8)
    rgba[:, :, 0] = (arr >> 16) & 0xFF
    rgba[:, :, 1] = (arr >> 8) & 0xFF
    rgba[:, :, 2] = arr & 0xFF
    rgba[:, :, 3] = (arr >> 24) & 0xFF
    return rgba


def decode_webp_pixels(data: bytes) -> np.ndarray:
    """RIFF/WEBP container → (h, w, 4) uint8 RGBA for lossless files.

    Walks the chunk list (bare VP8L, or VP8X extended container wrapping
    a VP8L). Lossy VP8 and animated (ANMF) files raise the typed gate."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise MediaDecodeUnavailableWebp("not a WebP container")
    off = 12
    saw = []
    while off + 8 <= len(data):
        tag = data[off : off + 4]
        (size,) = struct.unpack("<I", data[off + 4 : off + 8])
        body = data[off + 8 : off + 8 + size]
        if len(body) < size:
            raise MediaDecodeUnavailableWebp("WebP chunk truncated")
        if tag == b"VP8L":
            return decode_vp8l_pixels(body)
        if tag == b"VP8 ":
            raise MediaDecodeUnavailableWebp(
                "lossy VP8 needs a real codec (honest gate)"
            )
        if tag == b"ANMF" or tag == b"ANIM":
            raise MediaDecodeUnavailableWebp("animated WebP unsupported")
        saw.append(tag)
        off += 8 + size + (size & 1)
    raise MediaDecodeUnavailableWebp(
        f"no decodable image chunk in WebP (saw {saw})"
    )
