"""REAL dep-free baseline JPEG pixel decode (ITU T.81, no external libs).

Scope — honest and gated, like the PNG decoder in multimodal.py:

- Baseline/extended sequential DCT (SOF0/SOF1) with Huffman entropy
  coding: marker walk → per-MCU Huffman decode (DC diff + AC run-length)
  → dequantize → dezigzag → numpy matrix IDCT → plane assembly with
  chroma upsampling (any Hi/Vi sampling, incl. 4:2:0 / 4:2:2) →
  YCbCr→RGB (JFIF full-range coefficients). Restart markers (DRI/RSTn)
  reset the bitstream and DC predictors per spec.
- Progressive (SOF2), arithmetic coding (SOF9+), 12-bit precision and
  lossless modes raise MediaDecodeUnavailable — a pipeline must fail
  loudly on them, not emit garbage pixels.

The per-BLOCK Python loop is the accepted decode granularity (the same
rule as the posting-block codec): Huffman bit decoding is inherently
sequential, while dequant/IDCT/assembly/color are numpy. Reference
parity target: byte-exact block reconstruction against the spec's
example tables, validated in tests/test_jpeg_decode.py by inverting an
independently written forward encoder (Annex K tables, direct-sum FDCT).
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag order: index k in the stream → (row, col) in the 8x8 block
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# IDCT basis M[u, x] = c(u)/2 * cos((2x+1) u pi / 16); spatial = M.T @ F @ M
_IDCT_M = np.zeros((8, 8))
for _u in range(8):
    _c = (1 / np.sqrt(2)) if _u == 0 else 1.0
    for _x in range(8):
        _IDCT_M[_u, _x] = (_c / 2) * np.cos((2 * _x + 1) * _u * np.pi / 16)


class _Huff:
    """Canonical Huffman table: (length, code) → symbol."""

    def __init__(self, counts: list[int], symbols: bytes):
        self.lut: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                self.lut[(length, code)] = symbols[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over a stuffing-stripped entropy segment."""

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.buf):
            return 0  # spec: pad with 1s at end; 0 is equally safe here
        b = (self.buf[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table: _Huff) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.lut.get((length, code))
            if sym is not None:
                return sym
        raise MediaDecodeUnavailableJpeg("invalid Huffman code in scan")


def _extend(v: int, t: int) -> int:
    """RECEIVE/EXTEND (T.81 F.2.2.1): t-bit magnitude → signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


class MediaDecodeUnavailableJpeg(NotImplementedError):
    """Local alias so this module has no import cycle with multimodal;
    multimodal re-raises as MediaDecodeUnavailable."""


def decode_jpeg_pixels(data: bytes) -> np.ndarray:
    """JPEG bytes → uint8 array (height, width, channels); channels is 1
    for grayscale, 3 (RGB) otherwise.

    Typed-failure contract: ANY malformed container (truncated segment
    bodies, dangling table ids, corrupt lengths) raises
    MediaDecodeUnavailableJpeg — never a bare KeyError/ValueError/
    IndexError/struct.error escaping into Spark task frames."""
    try:
        return _decode_jpeg(data)
    except MediaDecodeUnavailableJpeg:
        raise
    except (KeyError, ValueError, IndexError, struct.error) as e:
        raise MediaDecodeUnavailableJpeg(
            f"malformed JPEG stream: {type(e).__name__}: {e}"
        ) from e


def _decode_jpeg(data: bytes) -> np.ndarray:
    if data[:2] != b"\xff\xd8":
        raise MediaDecodeUnavailableJpeg("not a JPEG container")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _Huff] = {}
    frame = None
    restart = 0
    i, n = 2, len(data)
    scan = None
    scan_comps = None
    while i + 4 <= n:
        if data[i] != 0xFF:
            i += 1
            continue
        marker = data[i + 1]
        if marker in (0xFF, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2 if marker != 0xFF else 1
            continue
        if marker == 0xD9:  # EOI
            break
        seglen = struct.unpack(">H", data[i + 2:i + 4])[0]
        body = data[i + 4:i + 2 + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0x0F
                p += 1
                if len(body) - p < (64 if pq == 0 else 128):
                    raise MediaDecodeUnavailableJpeg("truncated DQT body")
                if pq == 0:
                    tbl = np.frombuffer(
                        body, dtype=np.uint8, count=64, offset=p
                    ).astype(np.int32)
                    p += 64
                else:
                    tbl = np.frombuffer(
                        body, dtype=">u2", count=64, offset=p
                    ).astype(np.int32)
                    p += 128
                qt[tq] = tbl
        elif marker in (0xC0, 0xC1):  # baseline / extended sequential
            prec = body[0]
            if prec != 8:
                raise MediaDecodeUnavailableJpeg(
                    f"{prec}-bit precision unsupported"
                )
            h = struct.unpack(">H", body[1:3])[0]
            w = struct.unpack(">H", body[3:5])[0]
            nc = body[5]
            if nc not in (1, 3):
                # 4-component Adobe CMYK/YCCK would decode as silently
                # wrong YCbCr; the contract is 1 (gray) or 3 (RGB)
                raise MediaDecodeUnavailableJpeg(
                    f"{nc}-component JPEG (CMYK/YCCK) unsupported"
                )
            comps = []
            for c in range(nc):
                cid = body[6 + 3 * c]
                hv = body[7 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                     "tq": body[8 + 3 * c]}
                )
            frame = {"w": w, "h": h, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise MediaDecodeUnavailableJpeg(
                f"SOF{marker - 0xC0} (progressive/arithmetic/lossless) "
                "needs a full codec"
            )
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0x0F
                counts = list(body[p + 1:p + 17])
                nsym = sum(counts)
                if len(counts) < 16 or len(body) < p + 17 + nsym:
                    raise MediaDecodeUnavailableJpeg("truncated DHT body")
                syms = body[p + 17:p + 17 + nsym]
                huff[(tc, th)] = _Huff(counts, syms)
                p += 17 + nsym
        elif marker == 0xDD:  # DRI
            restart = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            if scan is not None:
                # multi-scan sequential (one SOS per component subset):
                # decoding only the first scan would emit silently-wrong
                # planes — refuse instead
                raise MediaDecodeUnavailableJpeg(
                    "multi-scan sequential JPEG unsupported"
                )
            ns = body[0]
            scan_comps = []
            for c in range(ns):
                cs = body[1 + 2 * c]
                tda = body[2 + 2 * c]
                scan_comps.append(
                    {"cs": cs, "td": tda >> 4, "ta": tda & 0x0F}
                )
            scan_start = i + 2 + seglen
            # entropy segment runs to the next non-RST marker; a 0xFF
            # followed by another 0xFF is a spec-legal fill byte before
            # a marker (T.81 B.1.1.2), not end-of-scan
            j = scan_start
            while j + 1 < n:
                if data[j] == 0xFF:
                    nxt = data[j + 1]
                    if nxt == 0xFF:
                        j += 1
                        continue
                    if nxt != 0x00 and not (0xD0 <= nxt <= 0xD7):
                        break
                j += 1
            scan = data[scan_start:j]
            i = j
            continue
        i += 2 + seglen
    if frame is None or scan is None or scan_comps is None:
        raise MediaDecodeUnavailableJpeg("JPEG missing SOF/SOS")
    return _decode_scan(frame, scan, scan_comps, qt, huff, restart)


def _decode_scan(frame, scan, scan_comps, qt, huff, restart):
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    if len(scan_comps) != len(comps):
        raise MediaDecodeUnavailableJpeg(
            "non-interleaved scan (subset of frame components) unsupported"
        )
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    by_id = {c["id"]: c for c in comps}
    order = []
    for sc in scan_comps:
        c = by_id.get(sc["cs"])
        if c is None:
            raise MediaDecodeUnavailableJpeg(
                f"SOS references unknown component id {sc['cs']}"
            )
        if c["tq"] not in qt:
            raise MediaDecodeUnavailableJpeg(
                f"missing quantization table {c['tq']}"
            )
        order.append(
            {"c": c, "dc": huff.get((0, sc["td"])),
             "ac": huff.get((1, sc["ta"])), "q": qt[c["tq"]]}
        )
        if order[-1]["dc"] is None or order[-1]["ac"] is None:
            raise MediaDecodeUnavailableJpeg("missing Huffman table")
    planes = {
        c["id"]: np.zeros(
            (mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64
        )
        for c in comps
    }
    # split on restart markers; each segment restarts bit alignment and
    # DC predictors (T.81 F.2.1.3.1)
    segments = []
    if restart:
        seg, j = bytearray(), 0
        while j < len(scan):
            if scan[j] == 0xFF and j + 1 < len(scan):
                nxt = scan[j + 1]
                if nxt == 0x00:
                    seg.append(0xFF)
                    j += 2
                    continue
                if nxt == 0xFF:  # fill byte before a marker — drop it
                    j += 1
                    continue
                if 0xD0 <= nxt <= 0xD7:
                    segments.append(bytes(seg))
                    seg = bytearray()
                    j += 2
                    continue
            seg.append(scan[j])
            j += 1
        segments.append(bytes(seg))
    else:
        segments = [scan.replace(b"\xff\x00", b"\xff")]
    seg_iter = iter(segments)
    reader = _BitReader(next(seg_iter))
    pred = {c["id"]: 0 for c in comps}
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and mcu_count and mcu_count % restart == 0:
                try:
                    reader = _BitReader(next(seg_iter))
                except StopIteration:
                    # fewer RST segments than DRI implies (truncated or
                    # corrupt stream) — fail typed, never let a bare
                    # StopIteration escape into generator frames
                    raise MediaDecodeUnavailableJpeg(
                        "restart marker missing (truncated scan)"
                    ) from None
                pred = {c["id"]: 0 for c in comps}
            for entry in order:
                c, q = entry["c"], entry["q"]
                for v in range(c["v"]):
                    for hh in range(c["h"]):
                        blk = _decode_block(
                            reader, entry["dc"], entry["ac"], q,
                            pred, c["id"],
                        )
                        y0 = (my * c["v"] + v) * 8
                        x0 = (mx * c["h"] + hh) * 8
                        planes[c["id"]][y0:y0 + 8, x0:x0 + 8] = blk
            mcu_count += 1
    # upsample to full resolution and crop; only integer ratios are
    # supported (3:2-style fractional sampling is spec-legal but rare —
    # fail typed rather than emit wrong-size planes)
    full = []
    for c in comps:
        if vmax % c["v"] or hmax % c["h"]:
            raise MediaDecodeUnavailableJpeg(
                f"non-integer sampling ratio {vmax}/{c['v']}x"
                f"{hmax}/{c['h']} unsupported"
            )
        p = planes[c["id"]]
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0),
                      hmax // c["h"], axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        out = np.clip(full[0] + 128.0, 0, 255)
        return out.astype(np.uint8)[:, :, None]
    y = full[0] + 128.0
    cb = full[1]
    cr = full[2]
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(rgb, 0, 255).astype(np.uint8)


def _decode_block(reader, dct, act, q, pred, cid):
    coef = np.zeros(64, dtype=np.int64)
    t = reader.decode_symbol(dct)
    diff = _extend(reader.read_bits(t), t)
    pred[cid] += diff
    coef[0] = pred[cid]
    k = 1
    while k < 64:
        rs = reader.decode_symbol(act)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL: 16 zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise MediaDecodeUnavailableJpeg("AC run past block end")
        coef[k] = _extend(reader.read_bits(s), s)
        k += 1
    dq = (coef * q).astype(np.float64)
    block = np.zeros(64)
    block[ZIGZAG] = dq
    f = block.reshape(8, 8)
    return _IDCT_M.T @ f @ _IDCT_M
