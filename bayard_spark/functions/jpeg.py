"""REAL dep-free baseline JPEG pixel decode (ITU T.81, no external libs).

Scope — honest and gated, like the PNG decoder in multimodal.py:

- Baseline/extended sequential DCT (SOF0/SOF1) with Huffman entropy
  coding: marker walk → per-MCU Huffman decode (DC diff + AC run-length)
  → dequantize → dezigzag → numpy matrix IDCT → plane assembly with
  chroma upsampling (any Hi/Vi sampling, incl. 4:2:0 / 4:2:2) →
  YCbCr→RGB (JFIF full-range coefficients). Restart markers (DRI/RSTn)
  reset the bitstream and DC predictors per spec.
- Progressive DCT (SOF2, round 6): scans accumulate into per-component
  coefficient planes — DC first/refine with point transform, AC first
  with EOB-run symbols, AC successive-approximation refinement with
  correction bits (T.81 G.1.2 / G.2) — then one vectorized
  dequant + IDCT + assembly finish.
- Arithmetic coding (SOF9+), 12-bit precision and lossless modes raise
  MediaDecodeUnavailable — a pipeline must fail loudly on them, not
  emit garbage pixels.

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
    prog_scans: list[dict] = []
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
        elif marker in (0xC0, 0xC1, 0xC2):  # sequential / progressive
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
            frame = {"w": w, "h": h, "comps": comps,
                     "progressive": marker == 0xC2}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise MediaDecodeUnavailableJpeg(
                f"SOF{marker - 0xC0} (arithmetic/lossless/hierarchical) "
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
            progressive = frame is not None and frame.get("progressive")
            if scan is not None and not progressive:
                # multi-scan sequential (one SOS per component subset):
                # decoding only the first scan would emit silently-wrong
                # planes — refuse instead
                raise MediaDecodeUnavailableJpeg(
                    "multi-scan sequential JPEG unsupported"
                )
            ns = body[0]
            sc_list = []
            for c in range(ns):
                cs = body[1 + 2 * c]
                tda = body[2 + 2 * c]
                sc_list.append(
                    {"cs": cs, "td": tda >> 4, "ta": tda & 0x0F}
                )
            ss = body[1 + 2 * ns]
            se = body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
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
            if progressive:
                # tables are commonly redefined between scans: snapshot
                # the Huffman state and restart interval in effect now
                prog_scans.append({
                    "comps": sc_list, "ss": ss, "se": se,
                    "ah": ahal >> 4, "al": ahal & 0x0F,
                    "data": data[scan_start:j], "restart": restart,
                    "huff": dict(huff),
                })
            else:
                scan = data[scan_start:j]
                scan_comps = sc_list
            i = j
            continue
        i += 2 + seglen
    if frame is not None and frame.get("progressive"):
        if not prog_scans:
            raise MediaDecodeUnavailableJpeg("progressive JPEG missing SOS")
        return _decode_progressive(frame, prog_scans, qt)
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
    seg_iter = iter(_split_restarts(scan, restart))
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
    return _assemble(frame, planes, hmax, vmax)


def _split_restarts(scan: bytes, restart: int) -> list[bytes]:
    """Split an entropy segment on RSTn markers (T.81 F.2.1.3.1); each
    returned segment restarts bit alignment. Stuffing bytes (FF 00) and
    fill bytes (FF FF) are stripped."""
    if not restart:
        return [scan.replace(b"\xff\x00", b"\xff")]
    segments = []
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
    return segments


def _assemble(frame, planes, hmax, vmax):
    """Per-component float planes (128-centered luma convention) →
    uint8 (h, w, channels). Upsample to full resolution and crop; only
    integer ratios are supported (3:2-style fractional sampling is
    spec-legal but rare — fail typed rather than emit wrong-size
    planes)."""
    w, h, comps = frame["w"], frame["h"], frame["comps"]
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


# ------------------------------------------------------ progressive (SOF2)


def _decode_progressive(frame, scans, qt):
    """Progressive DCT decode (T.81 G.2): every scan deposits bits into
    per-component coefficient planes (zigzag/stream order, int32); the
    pixel reconstruction happens once at the end, vectorized."""
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    coef = {
        c["id"]: np.zeros((mcuy * c["v"], mcux * c["h"], 64),
                          dtype=np.int32)
        for c in comps
    }
    for srec in scans:
        _decode_prog_scan(frame, coef, srec, mcux, mcuy, hmax, vmax)
    planes = {}
    for c in comps:
        if c["tq"] not in qt:
            raise MediaDecodeUnavailableJpeg(
                f"missing quantization table {c['tq']}"
            )
        planes[c["id"]] = _coef_to_plane(coef[c["id"]], qt[c["tq"]])
    return _assemble(frame, planes, hmax, vmax)


def _coef_to_plane(cz, q):
    """(nby, nbx, 64) zigzag-order coefficients → float plane, all
    blocks dequantized / dezigzagged / IDCTed in one shot."""
    nby, nbx = cz.shape[:2]
    dq = cz.astype(np.float64) * q[None, None, :].astype(np.float64)
    blocks = np.zeros((nby, nbx, 64))
    blocks[:, :, ZIGZAG] = dq
    f = blocks.reshape(nby, nbx, 8, 8)
    # spatial[x, y] = sum_{u,v} M[u, x] F[u, v] M[v, y]
    sp = np.einsum("ux,ijuv,vy->ijxy", _IDCT_M, f, _IDCT_M)
    return sp.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)


def _decode_prog_scan(frame, coef, srec, mcux, mcuy, hmax, vmax):
    w, h = frame["w"], frame["h"]
    ss, se = srec["ss"], srec["se"]
    ah, al = srec["ah"], srec["al"]
    huff = srec["huff"]
    restart = srec["restart"]
    by_id = {c["id"]: c for c in frame["comps"]}
    order = []
    for sc in srec["comps"]:
        c = by_id.get(sc["cs"])
        if c is None:
            raise MediaDecodeUnavailableJpeg(
                f"SOS references unknown component id {sc['cs']}"
            )
        dct = huff.get((0, sc["td"]))
        act = huff.get((1, sc["ta"]))
        if ss == 0 and ah == 0 and dct is None:
            raise MediaDecodeUnavailableJpeg("missing DC Huffman table")
        if ss > 0 and act is None:
            raise MediaDecodeUnavailableJpeg("missing AC Huffman table")
        order.append({"c": c, "dc": dct, "ac": act})
    if ss == 0 and se != 0:
        raise MediaDecodeUnavailableJpeg(
            "progressive scan mixing DC and AC bands is illegal"
        )
    if ss > 0 and len(order) != 1:
        raise MediaDecodeUnavailableJpeg(
            "interleaved progressive AC scan is illegal"
        )
    if ss > se or se > 63:
        raise MediaDecodeUnavailableJpeg("invalid spectral band")
    seg_iter = iter(_split_restarts(srec["data"], restart))
    reader = _BitReader(next(seg_iter))
    pred = {c["id"]: 0 for c in frame["comps"]}
    eobrun = 0
    unit = 0

    def _maybe_restart(reader, pred, eobrun):
        try:
            r = _BitReader(next(seg_iter))
        except StopIteration:
            raise MediaDecodeUnavailableJpeg(
                "restart marker missing (truncated scan)"
            ) from None
        for k in pred:
            pred[k] = 0
        return r, 0

    if len(order) > 1:  # interleaved — DC scans only (guard above)
        for my in range(mcuy):
            for mx in range(mcux):
                if restart and unit and unit % restart == 0:
                    reader, eobrun = _maybe_restart(reader, pred, eobrun)
                for entry in order:
                    c = entry["c"]
                    for v in range(c["v"]):
                        for hh in range(c["h"]):
                            blk = coef[c["id"]][my * c["v"] + v,
                                                mx * c["h"] + hh]
                            _prog_dc(reader, entry["dc"], blk,
                                     pred, c["id"], ah, al)
                unit += 1
    else:
        # non-interleaved: iterate the component's OWN block grid
        # (ceil of its sample dims — not padded to MCU multiples)
        entry = order[0]
        c = entry["c"]
        cw = -(-(w * c["h"]) // hmax)
        ch = -(-(h * c["v"]) // vmax)
        nbx = -(-cw // 8)
        nby = -(-ch // 8)
        cid = c["id"]
        carr = coef[cid]
        for by in range(nby):
            for bx in range(nbx):
                if restart and unit and unit % restart == 0:
                    reader, eobrun = _maybe_restart(reader, pred, eobrun)
                blk = carr[by, bx]
                if ss == 0:
                    _prog_dc(reader, entry["dc"], blk, pred, cid, ah, al)
                elif ah == 0:
                    eobrun = _prog_ac_first(
                        reader, entry["ac"], blk, ss, se, al, eobrun
                    )
                else:
                    eobrun = _prog_ac_refine(
                        reader, entry["ac"], blk, ss, se, al, eobrun
                    )
                unit += 1


def _prog_dc(reader, dct, blk, pred, cid, ah, al):
    if ah == 0:  # first DC scan: Huffman diff of the point-transformed DC
        t = reader.decode_symbol(dct)
        pred[cid] += _extend(reader.read_bits(t), t)
        blk[0] = pred[cid] << al
    else:  # refinement: one correction bit (works on two's complement)
        if reader.read_bit():
            blk[0] |= 1 << al


def _prog_ac_first(reader, act, blk, ss, se, al, eobrun):
    """First AC scan of a band (Ah=0): run-length + EOB-run symbols;
    decoded magnitudes land shifted left by Al (T.81 G.1.2.2)."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = reader.decode_symbol(act)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += reader.read_bits(r)
            break
        k += r
        if k > se:
            raise MediaDecodeUnavailableJpeg("AC run past band end")
        blk[k] = _extend(reader.read_bits(s), s) << al
        k += 1
    return eobrun


def _prog_ac_refine(reader, act, blk, ss, se, al, eobrun):
    """AC successive-approximation refinement (Ah=Al+1, T.81 G.1.2.3):
    already-nonzero coefficients receive correction bits; newly
    significant ones arrive as ±1<<Al; EOB runs defer correction bits
    for whole blocks."""
    p1 = 1 << al
    m1 = -1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = reader.decode_symbol(act)
            r, s = rs >> 4, rs & 0x0F
            newval = 0
            if s == 0:
                if r != 15:
                    eobrun = (1 << r)
                    if r:
                        eobrun += reader.read_bits(r)
                    break
                # r == 15 (ZRL): skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise MediaDecodeUnavailableJpeg(
                        "invalid AC refinement symbol"
                    )
                newval = p1 if reader.read_bit() else m1
            # advance over r zero-history coefficients, reading
            # correction bits for nonzero-history ones along the way
            while k <= se:
                if blk[k]:
                    if reader.read_bit() and not (blk[k] & p1):
                        blk[k] += p1 if blk[k] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if s:
                if k > se:
                    raise MediaDecodeUnavailableJpeg(
                        "AC refinement run past band end"
                    )
                blk[k] = newval
            k += 1
    if eobrun > 0:
        # this block belongs to the EOB run: only correction bits for
        # the remaining nonzero-history coefficients
        while k <= se:
            if blk[k]:
                if reader.read_bit() and not (blk[k] & p1):
                    blk[k] += p1 if blk[k] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun
