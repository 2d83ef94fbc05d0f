"""REAL dep-free FLAC audio decode (the free-lossless-audio-codec spec,
https://xiph.org/flac/format.html — no external libs, no baked-in tables:
unlike mp3/vorbis, every code FLAC needs is carried by the stream itself,
which is what makes an honest from-spec decoder feasible here).

Scope — real and gated, same contract as the JPEG/WebP decoders:

- STREAMINFO metadata walk, frame sync + header (block size / sample rate
  / channel assignment / sample size codes, UTF-8-coded frame number,
  CRC-8 header check), subframe types CONSTANT / VERBATIM / FIXED(0-4) /
  LPC(1-32), wasted-bits, Rice/Rice2 partitioned residuals including the
  escape (raw-bits) encoding, stereo decorrelation (left/side,
  right/side, mid/side), CRC-16 frame check.
- FIXED reconstruction is fully vectorized (order-k inverse finite
  difference = k chained np.cumsum passes seeded from the warmup's
  difference pyramid). Rice decoding walks a precomputed one-positions
  index (amortized linear in the bit count). The only per-sample Python
  loop is general LPC — an order-k IIR is inherently recursive; the loop
  is per-BLOCK (<= 65535 samples), the accepted decode granularity.
- Anything malformed (bad magic, sync loss, reserved codes, CRC
  mismatch, truncated stream) raises MediaDecodeUnavailableFlac — a
  pipeline must fail loudly, never emit garbage samples.

Validated in tests/test_flac_decode.py by inverting an INDEPENDENT
forward encoder written in the test (its own bit packer, its own CRC
tables, its own Rice/LPC/fixed-predictor forward filters).

Reference parity: the reference engine (bayard) stores documents only —
audio columns are a training-data-pipeline extension (SURVEY.md §6);
decode correctness is defined by the public FLAC spec, not by reference
behavior.
"""

from __future__ import annotations

import struct

import numpy as np


class MediaDecodeUnavailableFlac(NotImplementedError):
    """Typed failure for malformed/unsupported FLAC streams."""


def _crc8(buf: bytes) -> int:
    # CRC-8, polynomial x^8 + x^2 + x^1 + 1 (0x07), init 0 — per spec.
    crc = 0
    for b in buf:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(buf: bytes) -> int:
    # CRC-16, polynomial x^16 + x^15 + x^2 + 1 (0x8005), init 0 — per spec.
    crc = 0
    for b in buf:
        crc ^= b << 8
        for _ in range(8):
            crc = (
                ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
            )
    return crc


class _Bits:
    """MSB-first bit reader over a byte region; one-positions are indexed
    once so unary runs resolve by searchsorted, not bit-at-a-time scans."""

    def __init__(self, buf: bytes):
        self.bits = np.unpackbits(np.frombuffer(buf, dtype=np.uint8))
        self.ones = np.flatnonzero(self.bits)
        self.pos = 0
        self.n = len(self.bits)
        # powers for fast fixed-width reads (MSB first)
        self._pow = 1 << np.arange(63, -1, -1, dtype=np.int64)

    def u(self, nbits: int) -> int:
        if self.pos + nbits > self.n:
            raise MediaDecodeUnavailableFlac("FLAC bitstream truncated")
        sl = self.bits[self.pos : self.pos + nbits].astype(np.int64)
        self.pos += nbits
        return int(sl @ self._pow[64 - nbits :])

    def s(self, nbits: int) -> int:
        v = self.u(nbits)
        return v - (1 << nbits) if v & (1 << (nbits - 1)) else v

    def unary(self) -> int:
        idx = int(np.searchsorted(self.ones, self.pos))
        if idx >= len(self.ones):
            raise MediaDecodeUnavailableFlac("FLAC unary run past EOF")
        term = int(self.ones[idx])
        q = term - self.pos
        self.pos = term + 1
        return q

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


# block size code -> samples (None = read 8/16-bit value at header end)
_BS_FIXED = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608}
_SR_FIXED = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}
_SS_BITS = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _utf8_coded(bits: _Bits) -> int:
    """FLAC's UTF-8-style variable-length frame/sample number (up to 56 bits)."""
    b0 = bits.u(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    mask = 0x40
    while b0 & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 1 or nbytes > 6:
        raise MediaDecodeUnavailableFlac("FLAC invalid UTF-8-coded number")
    val = b0 & (mask - 1)
    for _ in range(nbytes):
        c = bits.u(8)
        if c & 0xC0 != 0x80:
            raise MediaDecodeUnavailableFlac("FLAC invalid UTF-8 continuation")
        val = (val << 6) | (c & 0x3F)
    return val


def _fixed_restore(warmup: np.ndarray, res: np.ndarray, order: int) -> np.ndarray:
    """Invert the order-k fixed predictor: the residual is the k-th finite
    difference, so reconstruction is k chained cumsums, each seeded by the
    warmup's (j-th difference) value at position order-1. Fully vectorized."""
    if order == 0:
        return res.copy()
    cur = res.astype(np.int64)
    for j in range(order - 1, -1, -1):
        start = int(np.diff(warmup, j)[-1]) if j else int(warmup[-1])
        cur = np.cumsum(cur) + start
    return np.concatenate([warmup, cur])


def _lpc_restore(
    warmup: np.ndarray, res: np.ndarray, coefs: np.ndarray, shift: int
) -> np.ndarray:
    """Invert quantized-LPC: s[i] = res + (sum c_j * s[i-1-j]) >> shift.
    Inherently recursive — per-sample loop, bounded by the block size."""
    o = len(coefs)
    n = o + len(res)
    out = np.empty(n, dtype=np.int64)
    out[:o] = warmup
    rc = coefs[::-1].copy()  # so out[i-o:i] @ rc walks s[i-1] first coef
    for i in range(o, n):
        out[i] = res[i - o] + ((out[i - o : i] @ rc) >> shift)
    return out


def _read_residual(bits: _Bits, block_size: int, order: int) -> np.ndarray:
    method = bits.u(2)
    if method > 1:
        raise MediaDecodeUnavailableFlac(f"FLAC residual method {method} reserved")
    pbits, escape = (4, 15) if method == 0 else (5, 31)
    porder = bits.u(4)
    nparts = 1 << porder
    if block_size % nparts or (block_size >> porder) <= order and porder:
        # first partition must still hold at least `order` fewer samples
        if (block_size >> porder) < order:
            raise MediaDecodeUnavailableFlac("FLAC partition smaller than order")
    out = np.empty(block_size - order, dtype=np.int64)
    w = 0
    for p in range(nparts):
        count = (block_size >> porder) - (order if p == 0 else 0)
        if count < 0:
            raise MediaDecodeUnavailableFlac("FLAC partition smaller than order")
        param = bits.u(pbits)
        if param == escape:
            raw = bits.u(5)
            for i in range(count):
                out[w + i] = bits.s(raw) if raw else 0
        else:
            ones, pos = bits.ones, bits.pos
            optr = int(np.searchsorted(ones, pos))
            bbits = bits.bits
            for i in range(count):
                if optr >= len(ones):
                    raise MediaDecodeUnavailableFlac("FLAC rice run past EOF")
                term = int(ones[optr])
                q = term - pos
                pos = term + 1
                if param:
                    if pos + param > bits.n:
                        raise MediaDecodeUnavailableFlac("FLAC rice truncated")
                    r = int(
                        bbits[pos : pos + param].astype(np.int64)
                        @ bits._pow[64 - param :]
                    )
                    pos += param
                    # remainder bits may contain ones: advance the pointer
                    optr = int(np.searchsorted(ones, pos))
                else:
                    r = 0
                    optr += 1
                v = (q << param) | r
                out[w + i] = (v >> 1) ^ -(v & 1)
            bits.pos = pos
        w += count
    return out


def _read_subframe(bits: _Bits, block_size: int, bps: int) -> np.ndarray:
    if bits.u(1):
        raise MediaDecodeUnavailableFlac("FLAC subframe padding bit set")
    stype = bits.u(6)
    wasted = 0
    if bits.u(1):
        wasted = bits.unary() + 1
    eff = bps - wasted
    if eff <= 0:
        raise MediaDecodeUnavailableFlac("FLAC wasted bits exceed sample size")
    if stype == 0:  # CONSTANT
        out = np.full(block_size, bits.s(eff), dtype=np.int64)
    elif stype == 1:  # VERBATIM
        out = np.array([bits.s(eff) for _ in range(block_size)], dtype=np.int64)
    elif 8 <= stype <= 12:  # FIXED order 0-4
        order = stype - 8
        if order > block_size:
            raise MediaDecodeUnavailableFlac("FLAC order exceeds block size")
        warm = np.array([bits.s(eff) for _ in range(order)], dtype=np.int64)
        res = _read_residual(bits, block_size, order)
        out = _fixed_restore(warm, res, order)
    elif stype >= 32:  # LPC order 1-32
        order = (stype & 31) + 1
        if order > block_size:
            raise MediaDecodeUnavailableFlac("FLAC order exceeds block size")
        warm = np.array([bits.s(eff) for _ in range(order)], dtype=np.int64)
        prec = bits.u(4)
        if prec == 15:
            raise MediaDecodeUnavailableFlac("FLAC LPC precision 15 invalid")
        prec += 1
        shift = bits.s(5)
        if shift < 0:
            raise MediaDecodeUnavailableFlac("FLAC negative LPC shift")
        coefs = np.array([bits.s(prec) for _ in range(order)], dtype=np.int64)
        res = _read_residual(bits, block_size, order)
        out = _lpc_restore(warm, res, coefs, shift)
    else:
        raise MediaDecodeUnavailableFlac(f"FLAC subframe type {stype} reserved")
    return out << wasted if wasted else out


def flac_stream_info(data: bytes) -> tuple[int, int, int, int, int]:
    """Parse ONLY the metadata blocks → (sample_rate, channels, bits,
    total_samples, frames_byte_offset). The metadata pass of a pipeline
    must not entropy-decode audio (same rule as gif_frame_info)."""
    if len(data) < 42 or data[:4] != b"fLaC":
        raise MediaDecodeUnavailableFlac("not a FLAC container")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(data):
            raise MediaDecodeUnavailableFlac("FLAC metadata truncated")
        hdr = data[pos]
        (blen,) = struct.unpack(">I", b"\x00" + data[pos + 1 : pos + 4])
        body = data[pos + 4 : pos + 4 + blen]
        if len(body) < blen:
            raise MediaDecodeUnavailableFlac("FLAC metadata block truncated")
        if hdr & 0x7F == 0:  # STREAMINFO
            if blen < 34:
                raise MediaDecodeUnavailableFlac("FLAC STREAMINFO too short")
            sb = _Bits(body[:18])
            sb.u(16), sb.u(16), sb.u(24), sb.u(24)
            rate = sb.u(20)
            channels = sb.u(3) + 1
            bps = sb.u(5) + 1
            total = sb.u(36)
            info = (rate, channels, bps, total)
        pos += 4 + blen
        if hdr & 0x80:
            break
    if info is None:
        raise MediaDecodeUnavailableFlac("FLAC missing STREAMINFO")
    return (*info, pos)


def decode_flac(data: bytes) -> tuple[np.ndarray, int]:
    """Decode a FLAC stream → (samples float64 in [-1, 1] shaped
    (n_frames, n_channels), sample_rate). Raises
    MediaDecodeUnavailableFlac on anything malformed or reserved."""
    si_rate, si_channels, si_bps, total, pos = flac_stream_info(data)
    if si_rate == 0:
        raise MediaDecodeUnavailableFlac("FLAC sample rate 0")

    frames_region = data[pos:]
    bits = _Bits(frames_region)
    chunks: list[np.ndarray] = []
    got = 0
    while True:
        bits.align()
        if bits.pos + 32 > bits.n:
            break  # clean EOF between frames
        if total and got >= total:
            break
        frame_start_byte = bits.pos >> 3
        if bits.u(14) != 0x3FFE:
            raise MediaDecodeUnavailableFlac("FLAC frame sync lost")
        if bits.u(1):
            raise MediaDecodeUnavailableFlac("FLAC reserved header bit set")
        bits.u(1)  # blocking strategy
        bs_code = bits.u(4)
        sr_code = bits.u(4)
        ch_code = bits.u(4)
        ss_code = bits.u(3)
        if bits.u(1):
            raise MediaDecodeUnavailableFlac("FLAC reserved header bit set")
        _utf8_coded(bits)
        if bs_code == 0:
            raise MediaDecodeUnavailableFlac("FLAC block size code 0 reserved")
        elif bs_code in _BS_FIXED:
            block_size = _BS_FIXED[bs_code]
        elif bs_code == 6:
            block_size = bits.u(8) + 1
        elif bs_code == 7:
            block_size = bits.u(16) + 1
        else:  # 8-15
            block_size = 256 << (bs_code - 8)
        if sr_code == 0:
            rate = si_rate
        elif sr_code in _SR_FIXED:
            rate = _SR_FIXED[sr_code]
        elif sr_code == 12:
            rate = bits.u(8) * 1000
        elif sr_code == 13:
            rate = bits.u(16)
        elif sr_code == 14:
            rate = bits.u(16) * 10
        else:
            raise MediaDecodeUnavailableFlac("FLAC sample rate code invalid")
        if ss_code == 0:
            bps = si_bps
        elif ss_code in _SS_BITS:
            bps = _SS_BITS[ss_code]
        else:
            raise MediaDecodeUnavailableFlac("FLAC sample size code reserved")
        if ch_code <= 7:
            nch, mode = ch_code + 1, "indep"
        elif ch_code == 8:
            nch, mode = 2, "left_side"
        elif ch_code == 9:
            nch, mode = 2, "right_side"
        elif ch_code == 10:
            nch, mode = 2, "mid_side"
        else:
            raise MediaDecodeUnavailableFlac("FLAC channel assignment reserved")
        if nch != si_channels:
            raise MediaDecodeUnavailableFlac("FLAC frame/stream channel mismatch")
        hdr_end_byte = bits.pos >> 3
        want_crc8 = bits.u(8)
        have_crc8 = _crc8(frames_region[frame_start_byte:hdr_end_byte])
        if want_crc8 != have_crc8:
            raise MediaDecodeUnavailableFlac("FLAC header CRC-8 mismatch")

        subframes = []
        for ci in range(nch):
            ch_bps = bps
            if (mode == "left_side" and ci == 1) or (
                mode == "right_side" and ci == 0
            ) or (mode == "mid_side" and ci == 1):
                ch_bps += 1  # the side channel carries one extra bit
            subframes.append(_read_subframe(bits, block_size, ch_bps))
        bits.align()
        body_end_byte = bits.pos >> 3
        want_crc16 = bits.u(16)
        have_crc16 = _crc16(frames_region[frame_start_byte:body_end_byte])
        if want_crc16 != have_crc16:
            raise MediaDecodeUnavailableFlac("FLAC frame CRC-16 mismatch")

        if mode == "indep":
            frame = np.stack(subframes, axis=1)
        elif mode == "left_side":
            left, side = subframes
            frame = np.stack([left, left - side], axis=1)
        elif mode == "right_side":
            side, right = subframes
            frame = np.stack([right + side, right], axis=1)
        else:  # mid_side
            mid, side = subframes
            mm = (mid << 1) | (side & 1)
            frame = np.stack([(mm + side) >> 1, (mm - side) >> 1], axis=1)
        chunks.append(frame)
        got += block_size

    if not chunks:
        raise MediaDecodeUnavailableFlac("FLAC stream contains no frames")
    out = np.concatenate(chunks, axis=0)
    if total:
        out = out[:total]
    return out.astype(np.float64) / float(1 << (si_bps - 1)), int(si_rate)
