"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

Image METADATA decode is real: pure-Python container-header parsers for
PNG / JPEG / GIF / WebP / BMP (no external libs needed — dimensions and
format come from the first bytes of each container). PNG PIXEL decode is
real too (decode_png_pixels: stdlib zlib inflate + per-scanline unfilter,
all five filter types, gray/RGB/palette/alpha color types), so
image_features(real_decode=True) derives vectors from actual pixels for
PNG. Rounds 5-6 make JPEG pixel decode real too (functions/jpeg.py:
baseline AND progressive SOF2 — Huffman entropy decode → dequant →
numpy IDCT → chroma upsample → YCbCr→RGB, with spectral-selection +
successive-approximation scan accumulation for progressive), plus BMP
(uncompressed 24/32-bit + palette) and GIF first-frame (real LZW with
variable code widths and interlace).
AUDIO decode is real for WAV/PCM (decode_wav: RIFF chunk walk,
int 8/16/24/32-bit and IEEE-float samples via numpy views) and — round
6 — FLAC (functions/flac.py: full lossless decode, no spec tables
needed because FLAC streams carry their own coding parameters);
audio_features derives rms/peak/zero-crossings/spectrum from actual
samples of either. mp3 gets REAL frame-HEADER metadata
(mp3_metadata: version/layer/bitrate/rate from the public ISO tables,
Xing/VBRI frame counts, duration estimate; audio_metadata is the
header-only pass that never touches sample bytes), while mp3 SAMPLE
decode stays gated — Layer III needs the spec's 34 Huffman tables.
VIDEO is real for the two containers decodable without codec libraries
(round 6): AVI/MJPEG — every frame is a complete JPEG, parsed by
functions/video.py and decoded by functions/jpeg.py — and animated GIF
(decode_gif_frames: full compositing semantics — per-frame disposal
methods, transparency, delays). video_metadata / sample_video_frames /
video_frame_features ride those; frame sampling prunes BEFORE entropy
decode. Arithmetic-coded JPEG, lossy WebP (VP8), mp3/ogg sample
decode and inter-frame video codecs (H.264/VP9/AV1) remain
behind clearly-marked hooks (`MediaDecodeUnavailable`) because they
genuinely need external libraries (Pillow/torchaudio/pyav) that do not
ship in this environment — batch shapes don't change when swapped in.

Design rules for 100 TB of media:
- media bytes travel ONCE: metadata extraction and feature extraction happen
  in the same mapInPandas pass (no second scan of the binary column)
- decoded features are fixed-size float arrays → columnar, joinable with the
  embedding similarity ops in functions/similarity.py
- frame sampling emits (asset_id, frame_no) rows BEFORE decode so the
  expensive work is row-pruned by the sampling predicate
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

IMAGE_META_SCHEMA = (
    "asset_id long, n_bytes int, content_hash string, format string, "
    "width int, height int"
)
FEATURE_SCHEMA = "asset_id long, feature array<float>"
FRAME_SCHEMA = "asset_id long, frame_no int, frame_bytes binary"


class MediaDecodeUnavailable(NotImplementedError):
    """Raised when a real decoder is required but none is plugged in."""


def _typed_malformed(fmt: str):
    """Typed-error boundary for untrusted container bytes: any low-level
    parse explosion (short buffer, bad offset, corrupt zlib stream)
    surfaces as MediaDecodeUnavailable, never as an untyped task failure
    (the r5-ADVICE bug class; pinned by tests/test_media_fuzz.py)."""
    import functools
    import struct as _struct
    import zlib as _zlib

    def deco(fn):
        @functools.wraps(fn)
        def wrapped(*args, **kwargs):
            try:
                return fn(*args, **kwargs)
            except (
                _struct.error,
                ValueError,
                IndexError,
                KeyError,
                _zlib.error,
                EOFError,
            ) as ex:
                raise MediaDecodeUnavailable(
                    f"malformed {fmt} container: {type(ex).__name__}: {ex}"
                ) from ex

        return wrapped

    return deco


def _jpeg_dims(data: bytes) -> tuple[int, int]:
    """Walk JPEG markers to the first SOFn frame header (ITU T.81 §B.2.2):
    payload is [precision u8, height u16be, width u16be, ...]."""
    i, n = 2, len(data)
    while i + 4 <= n:
        if data[i] != 0xFF:
            i += 1
            continue
        marker = data[i + 1]
        if marker == 0xFF:  # fill byte
            i += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2  # standalone markers carry no length
            continue
        seglen = int.from_bytes(data[i + 2 : i + 4], "big")
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if i + 9 <= n:
                h = int.from_bytes(data[i + 5 : i + 7], "big")
                w = int.from_bytes(data[i + 7 : i + 9], "big")
                return w, h
            return 0, 0
        if marker == 0xDA:  # start of scan — no frame header found
            break
        i += 2 + seglen
    return 0, 0


def decode_image_header(data: bytes) -> tuple[str, int, int]:
    """(format, width, height) from container headers — pure Python, no
    deps. Unknown containers report ("unknown", 0, 0); pixel decode stays
    behind MediaDecodeUnavailable hooks."""
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        if len(data) >= 24 and data[12:16] == b"IHDR":
            w = int.from_bytes(data[16:20], "big")
            h = int.from_bytes(data[20:24], "big")
            return "png", w, h
        return "png", 0, 0
    if data[:2] == b"\xff\xd8":
        w, h = _jpeg_dims(data)
        return "jpeg", w, h
    if data[:6] in (b"GIF87a", b"GIF89a"):
        if len(data) >= 10:
            return (
                "gif",
                int.from_bytes(data[6:8], "little"),
                int.from_bytes(data[8:10], "little"),
            )
        return "gif", 0, 0
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        chunk = data[12:16]
        if chunk == b"VP8 " and len(data) >= 30:  # lossy: 14-bit dims
            w = int.from_bytes(data[26:28], "little") & 0x3FFF
            h = int.from_bytes(data[28:30], "little") & 0x3FFF
            return "webp", w, h
        if chunk == b"VP8L" and len(data) >= 25 and data[20] == 0x2F:
            b0, b1, b2, b3 = data[21], data[22], data[23], data[24]
            w = 1 + (((b1 & 0x3F) << 8) | b0)
            h = 1 + (((b3 & 0x0F) << 10) | (b2 << 2) | (b1 >> 6))
            return "webp", w, h
        if chunk == b"VP8X" and len(data) >= 30:  # 24-bit minus-one dims
            w = 1 + int.from_bytes(data[24:27], "little")
            h = 1 + int.from_bytes(data[27:30], "little")
            return "webp", w, h
        return "webp", 0, 0
    if data[:2] == b"BM" and len(data) >= 26:
        w = int.from_bytes(data[18:22], "little", signed=True)
        h = int.from_bytes(data[22:26], "little", signed=True)
        return "bmp", abs(w), abs(h)
    return "unknown", 0, 0


def image_metadata(
    df: DataFrame, bytes_col: str = "media", id_col: str = "asset_id"
) -> DataFrame:
    """One pass over the binary column → typed metadata."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [decode_image_header(b or b"") for b in pdf[bytes_col]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col],
                    "n_bytes": [len(b or b"") for b in pdf[bytes_col]],
                    "content_hash": [
                        hashlib.md5(b or b"").hexdigest() for b in pdf[bytes_col]
                    ],
                    "format": [m[0] for m in metas],
                    "width": [m[1] for m in metas],
                    "height": [m[2] for m in metas],
                }
            )

    return df.select(id_col, bytes_col).mapInPandas(run, IMAGE_META_SCHEMA)


_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


@_typed_malformed("PNG")
def decode_png_pixels(data: bytes) -> np.ndarray:
    """REAL dep-free PNG pixel decode (RFC 2083): IDAT zlib inflate +
    per-scanline unfilter → uint8 array of shape (height, width, channels).

    Supports bit depth 8 in every color type (gray / RGB / palette /
    gray+alpha / RGBA, palette expanded via PLTE). Interlaced (Adam7) and
    non-8-bit depths raise MediaDecodeUnavailable — honestly gated, not
    silently wrong. The per-SCANLINE Python loop is the accepted decode
    granularity (row ops are numpy); Sub/Paeth are sequential along a row
    by definition, so those two filters walk bytes within the row.
    """
    import struct
    import zlib

    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise MediaDecodeUnavailable("not a PNG container")
    pos, n = 8, len(data)
    ihdr = None
    idat = bytearray()
    plte = None
    while pos + 8 <= n:
        (clen,), ctype = struct.unpack(">I", data[pos:pos + 4]), \
            data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + clen]
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IEND":
            break
        pos += 12 + clen  # len + type + body + crc
    if ihdr is None or not idat:
        raise MediaDecodeUnavailable("PNG missing IHDR/IDAT")
    width, height, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or interlace != 0 or color not in _PNG_CHANNELS:
        raise MediaDecodeUnavailable(
            f"PNG depth={depth} color={color} interlace={interlace} "
            "needs a full decoder (only 8-bit non-interlaced supported)"
        )
    ch = _PNG_CHANNELS[color]
    raw = zlib.decompress(bytes(idat))
    stride = width * ch
    if len(raw) < height * (stride + 1):
        raise MediaDecodeUnavailable("PNG IDAT truncated")
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(height):
        row_start = y * (stride + 1)
        ftype = raw[row_start]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=row_start + 1
        ).astype(np.int32)
        if ftype == 0:  # None
            cur = line
        elif ftype == 1:  # Sub — sequential along the row
            cur = line.copy()
            for i in range(ch, stride):
                cur[i] = (cur[i] + cur[i - ch]) & 0xFF
        elif ftype == 2:  # Up — vectorized
            cur = (line + prev) & 0xFF
        elif ftype == 3:  # Average — sequential (depends on left neighbor)
            cur = line.copy()
            for i in range(stride):
                left = cur[i - ch] if i >= ch else 0
                cur[i] = (cur[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth — sequential
            cur = line.copy()
            for i in range(stride):
                a = cur[i - ch] if i >= ch else 0
                b = prev[i]
                c = prev[i - ch] if i >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (
                    b if pb <= pc else c
                )
                cur[i] = (cur[i] + pred) & 0xFF
        else:
            raise MediaDecodeUnavailable(f"PNG filter {ftype} invalid")
        out[y] = cur.astype(np.uint8)
        prev = cur
    px = out.reshape(height, width, ch)
    if color == 3:  # palette-indexed → RGB
        if plte is None:
            raise MediaDecodeUnavailable("palette PNG without PLTE")
        px = plte[px[:, :, 0]]
    return px


def decode_bmp_pixels(data: bytes) -> np.ndarray:
    """REAL dep-free BMP pixel decode: uncompressed BI_RGB at 24/32-bit
    (BGR[A] rows, 4-byte aligned, bottom-up or top-down) and 8-bit
    paletted. RLE/bitfield compression raises MediaDecodeUnavailable."""
    import struct

    if data[:2] != b"BM" or len(data) < 54:
        raise MediaDecodeUnavailable("not a BMP container")
    (pix_off,) = struct.unpack("<I", data[10:14])
    (hdr_size,) = struct.unpack("<I", data[14:18])
    if hdr_size < 40:
        # BITMAPCOREHEADER (12 bytes): 2-byte dims, 3-byte palette —
        # different layout entirely; parsing it as BITMAPINFOHEADER
        # would read garbage dims
        raise MediaDecodeUnavailable(
            f"BMP header size {hdr_size} (core/OS2) unsupported"
        )
    w, h = struct.unpack("<ii", data[18:26])
    bits, comp = struct.unpack("<HI", data[28:34])
    if comp != 0:
        raise MediaDecodeUnavailable(f"BMP compression {comp} unsupported")
    top_down = h < 0
    h = abs(h)
    if w <= 0 or h == 0:
        # a corrupt header's non-positive dims would otherwise surface
        # as untyped numpy reshape errors
        raise MediaDecodeUnavailable(f"BMP invalid dimensions {w}x{h}")
    stride = (w * bits // 8 + 3) & ~3
    body = data[pix_off:pix_off + stride * h]
    if len(body) < stride * h:
        raise MediaDecodeUnavailable("BMP pixel array truncated")
    rows = np.frombuffer(body, dtype=np.uint8).reshape(h, stride)
    if bits == 24:
        px = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR→RGB
    elif bits == 32:
        px = rows[:, : w * 4].reshape(h, w, 4)[:, :, [2, 1, 0]]
    elif bits == 8:
        pal_off = 14 + hdr_size
        n_entries = max(0, (pix_off - pal_off)) // 4  # BGRA, 4 B each
        if n_entries == 0:
            raise MediaDecodeUnavailable("8-bit BMP without a palette")
        pal = np.frombuffer(
            data, dtype=np.uint8, count=n_entries * 4, offset=pal_off
        ).reshape(-1, 4)[:, [2, 1, 0]]  # BGRA entries → RGB
        idx = rows[:, :w]
        if idx.size and idx.max() >= n_entries:
            # fail typed instead of silently clamping out-of-range
            # palette indices (module rule: never silent garbage)
            raise MediaDecodeUnavailable(
                "BMP palette index beyond palette size"
            )
        px = pal[idx]
    else:
        raise MediaDecodeUnavailable(f"BMP bit depth {bits} unsupported")
    if not top_down:
        px = px[::-1]
    return np.ascontiguousarray(px)


@_typed_malformed("GIF")
def decode_gif_frames(
    data: bytes, max_frames: int | None = None
) -> tuple[list[np.ndarray], list[int]]:
    """REAL dep-free GIF decode, ALL frames (GIF87a/89a): LZW with variable
    code width and dictionary resets, local/global palettes, interlace
    deinterleave, and — round 6 — full ANIMATION compositing semantics:

    - Graphic Control Extension (0xF9): per-frame delay, transparency
      index (transparent pixels leave the canvas untouched), disposal
      method 0/1 (leave), 2 (restore rect to background), 3 (restore rect
      to the pre-frame canvas).
    - Each emitted frame is the full logical-screen composite, RGB uint8
      (screen_h, screen_w, 3), matching what a viewer shows at that step.

    Returns (frames, delays_cs); max_frames bounds the LZW work — frames
    past the bound are never decompressed (prune-before-decode)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise MediaDecodeUnavailable("not a GIF container")
    sw = int.from_bytes(data[6:8], "little")
    sh = int.from_bytes(data[8:10], "little")
    flags = data[10]
    bg_index = data[11]  # background color fills uncovered screen area
    pos = 13
    gct = None
    if flags & 0x80:
        size = 2 << (flags & 0x07)
        gct = np.frombuffer(
            data, dtype=np.uint8, count=size * 3, offset=pos
        ).reshape(-1, 3)
        pos += size * 3
    # background color index is defined against the GLOBAL color table
    # (GIF89a spec §18), NOT a frame's local palette; black when absent
    if gct is not None and bg_index < len(gct):
        bg_rgb = gct[bg_index]
    else:
        bg_rgb = np.zeros(3, dtype=np.uint8)
    canvas = np.empty((sh, sw, 3), dtype=np.uint8)
    canvas[:, :] = bg_rgb
    frames: list[np.ndarray] = []
    delays: list[int] = []
    disposal, transp_idx, delay = 0, None, 0
    while pos < len(data):
        b = data[pos]
        if b == 0x21:  # extension: label + sub-blocks
            label = data[pos + 1] if pos + 1 < len(data) else 0
            pos += 2
            if label == 0xF9 and pos < len(data) and data[pos] >= 4:
                gflags = data[pos + 1]
                delay = int.from_bytes(data[pos + 2 : pos + 4], "little")
                transp_idx = data[pos + 4] if gflags & 0x01 else None
                disposal = (gflags >> 2) & 0x07
            while pos < len(data) and data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif b == 0x2C:  # image descriptor
            ix = int.from_bytes(data[pos + 1:pos + 3], "little")
            iy = int.from_bytes(data[pos + 3:pos + 5], "little")
            iw = int.from_bytes(data[pos + 5:pos + 7], "little")
            ih = int.from_bytes(data[pos + 7:pos + 9], "little")
            iflags = data[pos + 9]
            pos += 10
            if ix + iw > sw or iy + ih > sh:
                raise MediaDecodeUnavailable(
                    "GIF frame exceeds logical screen"
                )
            pal = gct
            if iflags & 0x80:
                size = 2 << (iflags & 0x07)
                pal = np.frombuffer(
                    data, dtype=np.uint8, count=size * 3, offset=pos
                ).reshape(-1, 3)
                pos += size * 3
            if pal is None:
                raise MediaDecodeUnavailable("GIF image without palette")
            min_code = data[pos]
            pos += 1
            lzw = bytearray()
            while pos < len(data) and data[pos] != 0:
                n = data[pos]
                lzw += data[pos + 1:pos + 1 + n]
                pos += 1 + n
            pos += 1  # block terminator
            idx = _lzw_decode(bytes(lzw), min_code, iw * ih)
            grid = np.zeros((ih, iw), dtype=np.int64)
            flat = np.asarray(idx[: iw * ih], dtype=np.int64)
            if len(flat) < iw * ih:
                flat = np.pad(flat, (0, iw * ih - len(flat)))
            rows = flat.reshape(ih, iw)
            if iflags & 0x40:  # interlaced: 4-pass row order
                order = (
                    list(range(0, ih, 8)) + list(range(4, ih, 8))
                    + list(range(2, ih, 4)) + list(range(1, ih, 2))
                )
                grid[order] = rows
            else:
                grid = rows
            opaque = (
                grid != transp_idx if transp_idx is not None
                else np.ones_like(grid, dtype=bool)
            )
            if grid.size and opaque.any() and grid[opaque].max() >= len(pal):
                raise MediaDecodeUnavailable(
                    "GIF pixel index beyond palette"
                )
            region = canvas[iy:iy + ih, ix:ix + iw]
            saved = region.copy() if disposal == 3 else None
            if transp_idx is None:
                region[:] = pal[np.minimum(grid, len(pal) - 1)]
            else:
                rgb = pal[np.minimum(grid, len(pal) - 1)]
                region[opaque] = rgb[opaque]
            frames.append(canvas.copy())
            delays.append(delay)
            if disposal == 2:
                canvas[iy:iy + ih, ix:ix + iw] = bg_rgb
            elif disposal == 3 and saved is not None:
                canvas[iy:iy + ih, ix:ix + iw] = saved
            disposal, transp_idx, delay = 0, None, 0
            if max_frames is not None and len(frames) >= max_frames:
                return frames, delays
        elif b == 0x3B:  # trailer
            break
        else:
            pos += 1
    if not frames:
        raise MediaDecodeUnavailable("GIF contains no image data")
    return frames, delays


def decode_gif_pixels(data: bytes) -> np.ndarray:
    """First composited frame of decode_gif_frames — kept as the
    single-image entry point decode_image_pixels dispatches to."""
    return decode_gif_frames(data, max_frames=1)[0][0]


@_typed_malformed("GIF")
def gif_frame_info(data: bytes) -> tuple[int, list[int]]:
    """(n_frames, per-frame delays in centiseconds) from the GIF block
    STRUCTURE alone — sub-block walk, zero LZW decompression, so the
    metadata pass never pays entropy-decode cost (travel-once rule)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise MediaDecodeUnavailable("not a GIF container")
    pos = 13
    if data[10] & 0x80:
        pos += (2 << (data[10] & 0x07)) * 3
    n, delays, delay = 0, [], 0
    while pos < len(data):
        b = data[pos]
        if b == 0x21:
            label = data[pos + 1] if pos + 1 < len(data) else 0
            pos += 2
            if label == 0xF9 and pos < len(data) and data[pos] >= 4:
                delay = int.from_bytes(data[pos + 2 : pos + 4], "little")
            while pos < len(data) and data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif b == 0x2C:
            iflags = data[pos + 9]
            pos += 10
            if iflags & 0x80:
                pos += (2 << (iflags & 0x07)) * 3
            pos += 1  # LZW min code size
            while pos < len(data) and data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
            n += 1
            delays.append(delay)
            delay = 0
        elif b == 0x3B:
            break
        else:
            pos += 1
    return n, delays


def _lzw_decode(buf: bytes, min_code: int, limit: int) -> list[int]:
    """GIF-flavor LZW: LSB-first variable-width codes, CLEAR resets the
    dictionary, widths grow at 2^width up to 12 bits."""
    clear = 1 << min_code
    end = clear + 1
    table: list[bytes] = []

    def reset():
        nonlocal table, width, next_code
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        width = min_code + 1
        next_code = end + 1

    width = min_code + 1
    next_code = end + 1
    reset()
    out: list[int] = []
    acc = 0
    nbits = 0
    prev: bytes | None = None
    for byte in buf:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                reset()
                prev = None
                continue
            if code == end:
                return out
            if code < len(table) and (code < clear or table[code]):
                entry = table[code]
            elif code == next_code and prev is not None:
                entry = prev + prev[:1]
            else:
                raise MediaDecodeUnavailable("corrupt GIF LZW stream")
            out.extend(entry)
            if prev is not None and next_code < 4096:
                table.append(prev + entry[:1])
                next_code += 1
                if next_code == (1 << width) and width < 12:
                    width += 1
            prev = entry
            if len(out) >= limit:
                return out
    return out


def decode_image_pixels(data: bytes) -> np.ndarray:
    """Container-dispatching REAL pixel decode: PNG via decode_png_pixels,
    baseline + progressive JPEG via functions/jpeg.decode_jpeg_pixels
    (rounds 5-6 — marker
    walk, Huffman entropy decode, dequant, numpy IDCT, chroma upsample,
    YCbCr→RGB), BMP via decode_bmp_pixels, GIF first-frame via
    decode_gif_pixels (real LZW). WebP raises MediaDecodeUnavailable
    (VP8 needs a real codec)."""
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return decode_png_pixels(data)
    if data[:2] == b"\xff\xd8":
        from bayard_spark.functions.jpeg import decode_jpeg_pixels

        try:
            return decode_jpeg_pixels(data)
        except NotImplementedError as e:
            raise MediaDecodeUnavailable(str(e)) from e
    if data[:2] == b"BM":
        return decode_bmp_pixels(data)
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return decode_gif_pixels(data)
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        from bayard_spark.functions.webp import decode_webp_pixels

        try:
            return decode_webp_pixels(data)
        except NotImplementedError as e:
            raise MediaDecodeUnavailable(str(e)) from e
    raise MediaDecodeUnavailable(
        "no dep-free pixel decoder for this container (PNG, baseline+"
        "progressive JPEG, BMP, GIF and lossless WebP supported; lossy "
        "VP8 pixels need a real codec)"
    )


def png_pixel_features(px: np.ndarray, dim: int = 64) -> np.ndarray:
    """Deterministic pixel-derived feature vector: per-channel means/stds,
    a luminance histogram, and coarse 4x4 spatial means — all computed
    from REAL decoded pixels (the model-embedding hook stays separate)."""
    h, w, c = px.shape
    f = np.asarray(px, dtype=np.float64)
    lum = f.mean(axis=2)
    hist, _ = np.histogram(lum, bins=32, range=(0, 256))
    hist = hist / max(h * w, 1)
    ys = np.linspace(0, h, 5, dtype=int)
    xs = np.linspace(0, w, 5, dtype=int)
    cells = [
        lum[ys[i]:ys[i + 1], xs[j]:xs[j + 1]].mean()
        if ys[i] < ys[i + 1] and xs[j] < xs[j + 1] else 0.0
        for i in range(4) for j in range(4)
    ]
    stats = []
    for k in range(min(c, 4)):
        stats += [f[:, :, k].mean() / 255.0, f[:, :, k].std() / 255.0]
    v = np.concatenate([hist, np.array(cells) / 255.0, np.array(stats)])
    if len(v) < dim:
        v = np.pad(v, (0, dim - len(v)))
    return v[:dim].astype(np.float32)


def image_features(
    df: DataFrame,
    bytes_col: str = "media",
    id_col: str = "asset_id",
    dim: int = 64,
    real_decode: bool = False,
) -> DataFrame:
    """Feature-extract each image → float vector.

    real_decode=True runs the REAL dep-free pixel decoders — PNG (zlib
    inflate + unfilter), baseline/progressive JPEG (functions/jpeg.py),
    BMP, GIF first-frame, and lossless WebP (functions/webp.py: full
    VP8L, round 6) — and derives the vector from actual pixels; other
    containers raise MediaDecodeUnavailable. The default stub path
    keeps the hash-derived vector so the downstream ANN / dedup
    pipeline is exercisable on arbitrary bytes.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for b in pdf[bytes_col]:
                b = b or b""
                if real_decode:
                    feats.append(
                        png_pixel_features(decode_image_pixels(b), dim).tolist()
                    )
                    continue
                seed = np.frombuffer(
                    hashlib.sha256(b).digest(), dtype=np.uint8
                ).astype(np.float64)
                reps = int(np.ceil(dim / len(seed)))
                v = np.tile(seed, reps)[:dim]
                v = (v - v.mean()) / (v.std() + 1e-9)
                feats.append(v.astype(np.float32).tolist())
            yield pd.DataFrame({"asset_id": pdf[id_col], "feature": feats})

    return df.select(id_col, bytes_col).mapInPandas(run, FEATURE_SCHEMA)


AUDIO_FEATURE_SCHEMA = (
    "asset_id long, sample_rate int, n_channels int, n_samples long, "
    "duration_s double, feature array<float>"
)


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """REAL dep-free WAV/PCM decode (RIFF WAVE): chunk walk → fmt + data,
    samples as float64 in [-1, 1], shape (n_frames, n_channels).

    Supports integer PCM (format 1) at 8/16/24/32 bit and IEEE float
    (format 3) at 32/64 bit — everything numpy can view directly; the
    per-sample work is one frombuffer + scale, no Python loop. Compressed
    WAV (ADPCM/mu-law/extensible) and non-WAV containers (mp3/ogg/flac)
    raise MediaDecodeUnavailable — those genuinely need codec libraries.
    """
    import struct

    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise MediaDecodeUnavailable("not a RIFF/WAVE container")
    pos, n = 12, len(data)
    fmt = None
    body = None
    while pos + 8 <= n:
        cid = data[pos:pos + 4]
        (clen,) = struct.unpack("<I", data[pos + 4:pos + 8])
        chunk = data[pos + 8:pos + 8 + clen]
        if cid == b"fmt ":
            if len(chunk) < 16:
                raise MediaDecodeUnavailable("WAV fmt chunk truncated")
            fmt = struct.unpack("<HHIIHH", chunk[:16])
        elif cid == b"data":
            body = chunk
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or body is None:
        raise MediaDecodeUnavailable("WAV missing fmt/data chunk")
    audio_fmt, channels, rate, _byterate, _align, bits = fmt
    if channels < 1:
        raise MediaDecodeUnavailable("WAV declares zero channels")
    # a truncated data chunk (declared length past EOF) yields a body
    # that isn't sample-aligned — decode the aligned prefix rather than
    # dying with an untyped numpy buffer-size error
    if bits in (8, 16, 24, 32, 64):
        bps = bits // 8
        body = body[: len(body) - len(body) % bps]
    if audio_fmt == 1:  # integer PCM
        if bits == 8:  # unsigned
            raw = np.frombuffer(body, dtype=np.uint8).astype(np.float64)
            samples = (raw - 128.0) / 128.0
        elif bits == 16:
            raw = np.frombuffer(body, dtype="<i2").astype(np.float64)
            samples = raw / 32768.0
        elif bits == 24:  # 3-byte little-endian, sign-extended via i4 view
            b3 = np.frombuffer(body, dtype=np.uint8)
            b3 = b3[: len(b3) - len(b3) % 3].reshape(-1, 3)
            padded = np.zeros((len(b3), 4), dtype=np.uint8)
            padded[:, 1:] = b3  # value << 8 keeps the sign bit in place
            raw = padded.view("<i4").ravel().astype(np.float64) / 256.0
            samples = raw / 8388608.0
        elif bits == 32:
            raw = np.frombuffer(body, dtype="<i4").astype(np.float64)
            samples = raw / 2147483648.0
        else:
            raise MediaDecodeUnavailable(f"PCM bit depth {bits} unsupported")
    elif audio_fmt == 3:  # IEEE float
        if bits == 32:
            samples = np.frombuffer(body, dtype="<f4").astype(np.float64)
        elif bits == 64:
            samples = np.frombuffer(body, dtype="<f8").astype(np.float64)
        else:
            raise MediaDecodeUnavailable(f"float bit depth {bits} invalid")
    else:
        raise MediaDecodeUnavailable(
            f"WAV format {audio_fmt} (compressed/extensible) needs a codec"
        )
    frames = len(samples) // channels
    return samples[: frames * channels].reshape(frames, channels), int(rate)


def wav_info(data: bytes) -> tuple[int, int, int, int, int]:
    """Header-only WAV parse → (rate, channels, bits, n_frames, byterate).
    The metadata pass must not touch sample bytes (gif_frame_info rule)."""
    import struct

    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise MediaDecodeUnavailable("not a RIFF/WAVE container")
    pos, n = 12, len(data)
    fmt, dlen = None, None
    while pos + 8 <= n:
        cid = data[pos : pos + 4]
        (clen,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        if cid == b"fmt ":
            chunk = data[pos + 8 : pos + 8 + clen]
            if len(chunk) < 16:
                raise MediaDecodeUnavailable("WAV fmt chunk truncated")
            fmt = struct.unpack("<HHIIHH", chunk[:16])
        elif cid == b"data":
            dlen = min(clen, n - pos - 8)  # truncated data: actual bytes
        pos += 8 + clen + (clen & 1)
    if fmt is None or dlen is None:
        raise MediaDecodeUnavailable("WAV missing fmt/data chunk")
    _, channels, rate, byterate, _, bits = fmt
    if channels < 1 or bits < 1:
        raise MediaDecodeUnavailable("WAV invalid fmt header")
    n_frames = dlen // (channels * max(bits // 8, 1))
    return int(rate), int(channels), int(bits), int(n_frames), int(byterate)


# MPEG audio frame-header tables (public, ISO/IEC 11172-3 / 13818-3).
_MP3_BITRATE = {
    (1, 1): [32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    (1, 2): [32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    (1, 3): [32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
    (2, 1): [32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
    (2, 2): [8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    (2, 3): [8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
}
_MP3_RATES = {"1": [44100, 48000, 32000], "2": [22050, 24000, 16000],
              "2.5": [11025, 12000, 8000]}


def _mp3_header(hdr: int):
    """Validate + decode a 32-bit MPEG audio frame header. Returns None for
    a non-frame bit pattern (caller resyncs), raises for free-format."""
    if (hdr >> 21) & 0x7FF != 0x7FF:
        return None
    vbits = (hdr >> 19) & 3
    version = {0: "2.5", 2: "2", 3: "1"}.get(vbits)
    layer = {1: 3, 2: 2, 3: 1}.get((hdr >> 17) & 3)
    br_idx = (hdr >> 12) & 15
    sr_idx = (hdr >> 10) & 3
    # br_idx 0 is free-format: frame length is undeterminable from the
    # header, so it can never be CONFIRMED by the consecutive-sync rule —
    # treat as non-frame and let the caller's typed no-sync error surface.
    if version is None or layer is None or br_idx in (0, 15) or sr_idx == 3:
        return None
    vgroup = 1 if version == "1" else 2
    bitrate = _MP3_BITRATE[(vgroup, layer)][br_idx - 1]
    rate = _MP3_RATES[version][sr_idx]
    padding = (hdr >> 9) & 1
    channels = 1 if (hdr >> 6) & 3 == 3 else 2
    if layer == 1:
        spf = 384
        flen = (12 * bitrate * 1000 // rate + padding) * 4
    else:
        spf = 1152 if (layer == 2 or version == "1") else 576
        flen = (spf // 8) * bitrate * 1000 // rate + padding
    return version, layer, bitrate, rate, channels, spf, flen


def mp3_metadata(data: bytes) -> dict:
    """mp3 FRAME-HEADER metadata (version/layer/rate/channels/bitrate,
    Xing/Info VBR frame count, duration estimate) — real header parsing
    from the public ISO tables. Full mp3 sample decode stays honestly
    gated (MediaDecodeUnavailable): Layer III needs the spec's 34 Huffman
    code tables, which this container cannot carry in from the spec."""
    import struct

    pos = 0
    if data[:3] == b"ID3" and len(data) >= 10:
        size = 0
        for b in data[6:10]:  # syncsafe
            size = (size << 7) | (b & 0x7F)
        pos = 10 + size
    end = len(data)
    if end >= 128 and data[-128:-125] == b"TAG":
        end -= 128  # ID3v1 trailer
    found = None
    scan = pos
    while scan + 4 <= end:
        hdr = struct.unpack(">I", data[scan : scan + 4])[0]
        h = _mp3_header(hdr)
        if h is not None:
            flen = h[6]
            nxt = scan + flen
            # require a consecutive frame (or exact EOF) to reject false syncs
            if nxt == end or (
                nxt + 4 <= end
                and _mp3_header(struct.unpack(">I", data[nxt : nxt + 4])[0])
                is not None
            ):
                found = (scan, h)
                break
        scan += 1
    if found is None:
        raise MediaDecodeUnavailable("no MPEG audio frame sync found")
    start, (version, layer, bitrate, rate, channels, spf, flen) = found

    n_frames = None
    vbr = False
    if layer == 3:
        side = (17 if channels == 1 else 32) if version == "1" else (
            9 if channels == 1 else 17
        )
        tag_at = start + 4 + side
        tag = data[tag_at : tag_at + 4]
        if tag in (b"Xing", b"Info"):
            vbr = tag == b"Xing"
            (flags,) = struct.unpack(">I", data[tag_at + 4 : tag_at + 8])
            if flags & 1:
                (n_frames,) = struct.unpack(
                    ">I", data[tag_at + 8 : tag_at + 12]
                )
        elif data[start + 4 + 32 : start + 4 + 36] == b"VBRI":
            vbr = True
            (n_frames,) = struct.unpack(
                ">I", data[start + 4 + 32 + 14 : start + 4 + 32 + 18]
            )
    if n_frames is not None:
        duration = n_frames * spf / rate
    else:
        n_frames = max((end - start) // flen, 1)
        duration = (end - start) * 8 / (bitrate * 1000)
    return {
        "container": "mp3",
        "version": version,
        "layer": layer,
        "sample_rate": rate,
        "n_channels": channels,
        "bitrate_kbps": bitrate,
        "vbr": vbr,
        "n_frames": int(n_frames),
        "samples_per_frame": spf,
        "duration_s": float(duration),
    }


def ogg_metadata(data: bytes) -> dict:
    """Ogg container metadata via a REAL page walk (RFC 3533): BOS page →
    Vorbis/Opus identification header (channels, rate), last page granule
    position → duration. Page payload bytes are SKIPPED by the segment
    table, so the pass reads ~27 bytes per page even for hour-long files.
    Sample decode stays gated — Vorbis/Opus need full codebook machinery."""
    import struct

    if data[:4] != b"OggS":
        raise MediaDecodeUnavailable("not an Ogg container")
    pos, n = 0, len(data)
    codec = None
    rate = channels = None
    bitrate_kbps = None
    pre_skip = 0
    last_granule = None
    while pos + 27 <= n:
        if data[pos : pos + 4] != b"OggS":
            raise MediaDecodeUnavailable("Ogg page sync lost")
        (granule,) = struct.unpack("<q", data[pos + 6 : pos + 14])
        nseg = data[pos + 26]
        seg_table = data[pos + 27 : pos + 27 + nseg]
        if len(seg_table) < nseg:
            raise MediaDecodeUnavailable("Ogg segment table truncated")
        paylen = sum(seg_table)
        payload_at = pos + 27 + nseg
        if payload_at + paylen > n:
            raise MediaDecodeUnavailable("Ogg page payload truncated")
        if codec is None:
            head = data[payload_at : payload_at + 30]
            if head[:7] == b"\x01vorbis":
                codec = "vorbis"
                channels = head[11]
                (rate,) = struct.unpack("<I", head[12:16])
                (nominal,) = struct.unpack("<i", head[20:24])
                if nominal > 0:
                    bitrate_kbps = nominal // 1000
            elif head[:8] == b"OpusHead":
                codec = "opus"
                channels = head[9]
                (pre_skip,) = struct.unpack("<H", head[10:12])
                (rate,) = struct.unpack("<I", head[12:16])  # input rate
            else:
                raise MediaDecodeUnavailable(
                    "Ogg codec unsupported (vorbis/opus metadata available)"
                )
        if granule >= 0:
            last_granule = granule
        pos = payload_at + paylen
    if codec is None or last_granule is None:
        raise MediaDecodeUnavailable("Ogg stream has no data pages")
    if codec == "vorbis":
        duration = last_granule / rate if rate else 0.0
    else:  # opus granules always tick at 48 kHz
        duration = max(last_granule - pre_skip, 0) / 48000.0
    return {
        "container": "ogg",
        "codec": codec,
        "sample_rate": int(rate or 0),
        "n_channels": int(channels or 0),
        "bitrate_kbps": bitrate_kbps,
        "duration_s": float(duration),
    }


def decode_audio(data: bytes) -> tuple[np.ndarray, int]:
    """Sniff-and-decode audio bytes: RIFF/WAVE → decode_wav, fLaC →
    decode_flac (REAL lossless decode, functions/flac.py). mp3/ogg raise
    MediaDecodeUnavailable — their sample decode genuinely needs spec
    tables / codec libraries this container can't carry."""
    if data[:4] == b"RIFF":
        return decode_wav(data)
    if data[:4] == b"fLaC":
        from bayard_spark.functions.flac import decode_flac

        return decode_flac(data)
    raise MediaDecodeUnavailable(
        "unsupported audio container (WAV and FLAC decode are available; "
        "mp3/ogg need codec tables/libraries)"
    )


AUDIO_META_SCHEMA = (
    "asset_id long, container string, sample_rate int, n_channels int, "
    "bits int, n_samples long, duration_s double, bitrate_kbps int, "
    "vbr boolean"
)


def audio_metadata(
    df: DataFrame, bytes_col: str = "media", id_col: str = "asset_id"
) -> DataFrame:
    """Metadata-ONLY audio pass: WAV fmt/data headers, FLAC STREAMINFO,
    mp3 frame headers (+Xing/VBRI) — NO sample decode anywhere, so the
    cost per asset is a few header bytes even for hour-long files (the
    gif_frame_info discipline applied to audio)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from bayard_spark.functions.flac import flac_stream_info

        for pdf in batches:
            rows = []
            for aid, b in zip(pdf[id_col], pdf[bytes_col]):
                b = b or b""
                if b[:4] == b"RIFF":
                    rate, ch, bits, n_frames, byterate = wav_info(b)
                    rows.append(
                        (aid, "wav", rate, ch, bits, n_frames,
                         n_frames / rate if rate else 0.0,
                         byterate * 8 // 1000, False)
                    )
                elif b[:4] == b"fLaC":
                    rate, ch, bits, total, _ = flac_stream_info(b)
                    rows.append(
                        (aid, "flac", rate, ch, bits, total,
                         total / rate if rate else 0.0, None, None)
                    )
                elif b[:4] == b"OggS":
                    m = ogg_metadata(b)
                    rows.append(
                        (aid, "ogg:" + m["codec"], m["sample_rate"],
                         m["n_channels"], None, None, m["duration_s"],
                         m["bitrate_kbps"], None)
                    )
                else:
                    m = mp3_metadata(b)  # raises typed if not mp3 either
                    rows.append(
                        (aid, "mp3", m["sample_rate"], m["n_channels"],
                         None, m["n_frames"] * m["samples_per_frame"],
                         m["duration_s"], m["bitrate_kbps"], m["vbr"])
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "container", "sample_rate", "n_channels",
                    "bits", "n_samples", "duration_s", "bitrate_kbps", "vbr",
                ],
            )

    return df.select(id_col, bytes_col).mapInPandas(run, AUDIO_META_SCHEMA)


def wav_audio_features(
    samples: np.ndarray, rate: int, dim: int = 64
) -> np.ndarray:
    """Deterministic features from REAL decoded samples: rms / peak /
    zero-crossing rate plus a 32-bin log-magnitude spectrum of the first
    ~1 s (numpy rfft) — the classic cheap audio-quality signals a
    corpus-cleaning pipeline filters on (silence, clipping, tones)."""
    mono = samples.mean(axis=1) if samples.ndim == 2 else samples
    n = len(mono)
    rms = float(np.sqrt(np.mean(mono**2))) if n else 0.0
    peak = float(np.max(np.abs(mono))) if n else 0.0
    zcr = (
        float(np.mean(np.abs(np.diff(np.signbit(mono).astype(np.int8)))))
        if n > 1
        else 0.0
    )
    window = mono[: min(n, max(rate, 1))]
    if len(window):
        mag = np.abs(np.fft.rfft(window))
        bins = np.array_split(mag, 32)
        spec = np.array([np.log1p(b.mean()) if len(b) else 0.0 for b in bins])
        top = spec.max()
        if top > 0:
            spec = spec / top
    else:
        spec = np.zeros(32)
    v = np.concatenate([[rms, peak, zcr], spec])
    if len(v) < dim:
        v = np.pad(v, (0, dim - len(v)))
    return v[:dim].astype(np.float32)


def audio_features(
    df: DataFrame,
    bytes_col: str = "media",
    id_col: str = "asset_id",
    dim: int = 64,
) -> DataFrame:
    """One mapInPandas pass over the binary column → typed audio metadata
    + fixed-size feature vector from REAL decoded samples — WAV/PCM or
    FLAC (functions/flac.py), sniffed by magic (the same travel-once rule
    as image_metadata: bytes are read in a single pass). mp3/ogg/unknown
    bytes raise MediaDecodeUnavailable — gate upstream on a container
    sniff (or use audio_metadata, which reads mp3 headers) if the column
    is mixed-format."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, rates, chans, counts, durs, feats = [], [], [], [], [], []
            for aid, b in zip(pdf[id_col], pdf[bytes_col]):
                samples, rate = decode_audio(b or b"")
                ids.append(aid)
                rates.append(rate)
                chans.append(samples.shape[1])
                counts.append(samples.shape[0])
                durs.append(samples.shape[0] / rate if rate else 0.0)
                feats.append(wav_audio_features(samples, rate, dim).tolist())
            yield pd.DataFrame(
                {
                    "asset_id": ids,
                    "sample_rate": rates,
                    "n_channels": chans,
                    "n_samples": counts,
                    "duration_s": durs,
                    "feature": feats,
                }
            )

    return df.select(id_col, bytes_col).mapInPandas(run, AUDIO_FEATURE_SCHEMA)


def _container_frames(b: bytes, every_n: int, max_frames: int):
    """Sampled (frame_no, frame_bytes) for ONE asset — REAL for the
    containers we can parse, stub chunking otherwise.

    - RIFF/AVI with an MJPEG video stream: frames are the actual '##dc'
      JPEG chunks (functions/video.py); extraction is byte slicing, so
      skipped frames cost nothing and the JPEG entropy decode only ever
      happens downstream on sampled frames.
    - Animated GIF: raises typed — GIF frames are palette deltas over a
      shared canvas, so standalone decodable 'frame_bytes' don't exist;
      GIF goes through video_frame_features directly (pixels, not bytes).
    - Anything else: the documented stub (fixed 1 KiB chunks) keeps the
      plumbing shape testable; a real H.264/VP9 path needs pyav.
    """
    if b[:4] == b"RIFF" and b[8:12] == b"AVI ":
        from bayard_spark.functions.video import parse_avi

        meta = parse_avi(b)
        taken = 0
        for fno, start, size in meta["frames"][::every_n]:
            if taken >= max_frames:
                break
            yield fno, b[start : start + size]
            taken += 1
        return
    if b[:6] in (b"GIF87a", b"GIF89a"):
        # GIF frames are palette deltas over a shared canvas — there is no
        # standalone byte range a consumer could decode, so emitting
        # chunks would be silent garbage; pixels go through
        # video_frame_features instead
        raise MediaDecodeUnavailable(
            "GIF frames are not byte-addressable; use "
            "video_frame_features for sampled GIF frame pixels"
        )
    n_frames = max(len(b) // 1024, 0)
    taken = 0
    for fno in range(0, n_frames, every_n):
        if taken >= max_frames:
            break
        yield fno, b[fno * 1024 : (fno + 1) * 1024]
        taken += 1


def sample_video_frames(
    df: DataFrame,
    bytes_col: str = "media",
    id_col: str = "asset_id",
    every_n: int = 10,
    max_frames: int = 8,
) -> DataFrame:
    """Frame sampling: emits (asset_id, frame_no, frame_bytes).

    REAL for AVI/MJPEG containers (each emitted frame_bytes is a complete
    decodable JPEG — see functions/video.py); fixed-1 KiB stub chunks for
    unrecognized bytes (the pre-round-6 plumbing shape, kept so mixed
    columns don't fail row-wise). Sampling applies before decode so
    skipped frames cost nothing."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nos, frames = [], [], []
            for aid, b in zip(pdf[id_col], pdf[bytes_col]):
                for fno, fb in _container_frames(
                    b or b"", every_n, max_frames
                ):
                    ids.append(aid)
                    nos.append(fno)
                    frames.append(fb)
            yield pd.DataFrame(
                {"asset_id": ids, "frame_no": nos, "frame_bytes": frames}
            )

    return df.select(id_col, bytes_col).mapInPandas(run, FRAME_SCHEMA)


VIDEO_META_SCHEMA = (
    "asset_id long, n_bytes int, container string, codec string, "
    "width int, height int, fps double, n_frames int"
)


def video_metadata(
    df: DataFrame, bytes_col: str = "media", id_col: str = "asset_id"
) -> DataFrame:
    """One mapInPandas pass over the binary column → typed video metadata
    from REAL container parsing (AVI main/stream headers; animated GIF
    logical screen + frame count). Unrecognized containers raise
    MediaDecodeUnavailable — gate upstream on a sniff for mixed columns."""
    from bayard_spark.functions.video import parse_avi

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "asset_id", "n_bytes", "container", "codec",
                "width", "height", "fps", "n_frames",
            )}
            for aid, b in zip(pdf[id_col], pdf[bytes_col]):
                b = b or b""
                if b[:4] == b"RIFF" and b[8:12] == b"AVI ":
                    m = parse_avi(b)
                    vals = ("avi", m["codec"], m["width"], m["height"],
                            m["fps"], m["n_frames"])
                elif b[:6] in (b"GIF87a", b"GIF89a"):
                    nf, delays = gif_frame_info(b)
                    total_cs = sum(delays)
                    fps = nf * 100.0 / total_cs if total_cs else 0.0
                    vals = ("gif", "GIF-LZW",
                            int.from_bytes(b[6:8], "little"),
                            int.from_bytes(b[8:10], "little"),
                            fps, nf)
                else:
                    raise MediaDecodeUnavailable(
                        "no dep-free video metadata parser for this "
                        "container (AVI and animated GIF supported)"
                    )
                for k, v in zip(
                    ("container", "codec", "width", "height",
                     "fps", "n_frames"), vals,
                ):
                    out[k].append(v)
                out["asset_id"].append(aid)
                out["n_bytes"].append(len(b))
            yield pd.DataFrame(out)

    return df.select(id_col, bytes_col).mapInPandas(run, VIDEO_META_SCHEMA)


VIDEO_FEATURE_SCHEMA = "asset_id long, frame_no int, feature array<float>"


def video_frame_features(
    df: DataFrame,
    bytes_col: str = "media",
    id_col: str = "asset_id",
    every_n: int = 10,
    max_frames: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Sampled-frame feature vectors from REAL decoded pixels, one
    mapInPandas pass: AVI/MJPEG frames through the from-spec JPEG decoder,
    animated-GIF frames through the LZW compositor — then the same
    deterministic pixel features as image_features(real_decode=True).
    Sampling prunes BEFORE entropy decode: unsampled AVI frames are never
    Huffman-decoded, unsampled trailing GIF frames never LZW-decoded."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nos, feats = [], [], []
            for aid, b in zip(pdf[id_col], pdf[bytes_col]):
                b = b or b""
                if b[:6] in (b"GIF87a", b"GIF89a"):
                    # GIF frames composite cumulatively, so decode the
                    # prefix up to the last sampled index once
                    frames, _ = decode_gif_frames(
                        b, max_frames=(max_frames - 1) * every_n + 1
                    )
                    pix = [
                        (fno, frames[fno])
                        for fno in range(0, len(frames), every_n)
                    ][:max_frames]
                else:
                    pix = [
                        (fno, decode_image_pixels(fb))
                        for fno, fb in _container_frames(
                            b, every_n, max_frames
                        )
                    ]
                for fno, px in pix:
                    ids.append(aid)
                    nos.append(fno)
                    feats.append(png_pixel_features(px, dim).tolist())
            yield pd.DataFrame(
                {"asset_id": ids, "frame_no": nos, "feature": feats}
            )

    return df.select(id_col, bytes_col).mapInPandas(
        run, VIDEO_FEATURE_SCHEMA
    )
