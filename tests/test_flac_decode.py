"""FLAC decoder validation against an INDEPENDENT forward encoder.

Same bar as test_jpeg_decode/test_webp_decode: the encoder below is written
from the public spec with its own machinery — table-driven CRCs (the decoder
uses bitwise loops), its own MSB-first bit packer, forward fixed/LPC filters
via np.diff / explicit dot products — so a roundtrip match is two separate
spec implementations agreeing, not one implementation inverted twice.
"""

import numpy as np
import pytest

from bayard_spark.functions.flac import (
    MediaDecodeUnavailableFlac,
    decode_flac,
)


# --------------------------------------------------------- independent enc


def _crc8_table():
    t = []
    for b in range(256):
        c = b
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
        t.append(c)
    return t


def _crc16_table():
    t = []
    for b in range(256):
        c = b << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 else (c << 1) & 0xFFFF
        t.append(c)
    return t


CRC8_T = _crc8_table()
CRC16_T = _crc16_table()


def crc8(buf: bytes) -> int:
    c = 0
    for b in buf:
        c = CRC8_T[c ^ b]
    return c


def crc16(buf: bytes) -> int:
    c = 0
    for b in buf:
        c = ((c << 8) & 0xFFFF) ^ CRC16_T[((c >> 8) ^ b) & 0xFF]
    return c


class BW:
    """MSB-first bit writer."""

    def __init__(self):
        self.out = bytearray()
        self.cur = 0
        self.nb = 0

    def w(self, val: int, nbits: int):
        for i in range(nbits - 1, -1, -1):
            self.cur = (self.cur << 1) | ((val >> i) & 1)
            self.nb += 1
            if self.nb == 8:
                self.out.append(self.cur)
                self.cur = 0
                self.nb = 0

    def s(self, val: int, nbits: int):
        self.w(val & ((1 << nbits) - 1), nbits)

    def unary(self, q: int):
        for _ in range(q):
            self.w(0, 1)
        self.w(1, 1)

    def align(self):
        while self.nb:
            self.w(0, 1)

    def bytes(self) -> bytes:
        assert self.nb == 0
        return bytes(self.out)


def utf8_num(bw: BW, v: int):
    if v < 0x80:
        bw.w(v, 8)
        return
    # count continuation bytes needed
    for nbytes, lead, cap in (
        (1, 0xC0, 1 << 11), (2, 0xE0, 1 << 16), (3, 0xF0, 1 << 21),
        (4, 0xF8, 1 << 26), (5, 0xFC, 1 << 31),
    ):
        if v < cap:
            bw.w(lead | (v >> (6 * nbytes)), 8)
            for j in range(nbytes - 1, -1, -1):
                bw.w(0x80 | ((v >> (6 * j)) & 0x3F), 8)
            return
    raise AssertionError("frame number too large")


def zigzag(v: int) -> int:
    return (v << 1) if v >= 0 else ((-v << 1) - 1)


def write_residual(bw: BW, res, param: int, porder: int = 0, order: int = 0,
                   block_size: int = 0, escape_raw: int | None = None):
    bw.w(0, 2)  # rice method 0 (4-bit params)
    bw.w(porder, 4)
    nparts = 1 << porder
    pos = 0
    for p in range(nparts):
        count = (block_size >> porder) - (order if p == 0 else 0)
        part = res[pos : pos + count]
        pos += count
        if escape_raw is not None:
            bw.w(15, 4)
            bw.w(escape_raw, 5)
            for v in part:
                bw.s(int(v), escape_raw)
        else:
            bw.w(param, 4)
            for v in part:
                u = zigzag(int(v))
                bw.unary(u >> param)
                if param:
                    bw.w(u & ((1 << param) - 1), param)
    assert pos == len(res)


def write_subframe(bw: BW, sig, bps: int, kind: str, *, rice_param=3,
                   porder=0, lpc_coefs=None, lpc_shift=0, wasted=0,
                   escape_raw=None):
    n = len(sig)
    sig = np.asarray(sig, dtype=np.int64)
    bw.w(0, 1)
    eff = bps - wasted
    enc = sig >> wasted if wasted else sig
    if kind == "constant":
        bw.w(0, 6)
        _wasted_flag(bw, wasted)
        bw.s(int(enc[0]), eff)
    elif kind == "verbatim":
        bw.w(1, 6)
        _wasted_flag(bw, wasted)
        for v in enc:
            bw.s(int(v), eff)
    elif kind.startswith("fixed"):
        order = int(kind[-1])
        bw.w(8 + order, 6)
        _wasted_flag(bw, wasted)
        for v in enc[:order]:
            bw.s(int(v), eff)
        res = np.diff(enc, order) if order else enc.copy()
        write_residual(bw, res, rice_param, _clamp_porder(porder, n, order),
                       order, n, escape_raw=escape_raw)
    elif kind == "lpc":
        coefs = np.asarray(lpc_coefs, dtype=np.int64)
        order = len(coefs)
        bw.w(32 + order - 1, 6)
        _wasted_flag(bw, wasted)
        for v in enc[:order]:
            bw.s(int(v), eff)
        prec = 12
        bw.w(prec - 1, 4)
        bw.s(lpc_shift, 5)
        for c in coefs:
            bw.s(int(c), prec)
        res = np.empty(n - order, dtype=np.int64)
        for i in range(order, n):
            pred = int(enc[i - order : i][::-1] @ coefs) >> lpc_shift
            res[i - order] = int(enc[i]) - pred
        write_residual(bw, res, rice_param, _clamp_porder(porder, n, order),
                       order, n, escape_raw=escape_raw)
    else:
        raise AssertionError(kind)


def _clamp_porder(porder: int, block_size: int, order: int) -> int:
    # mirror real encoders: 2^porder must divide the block and each
    # partition must hold more samples than the predictor order
    while porder and (block_size % (1 << porder)
                      or (block_size >> porder) <= order):
        porder -= 1
    return porder


def _wasted_flag(bw: BW, wasted: int):
    if wasted:
        bw.w(1, 1)
        bw.unary(wasted - 1)
    else:
        bw.w(0, 1)


def encode_flac(channels, rate, bps, block_size, kinds="fixed2",
                mode="indep", **kw) -> bytes:
    """channels: int array (n, ch). kinds: one strategy name or list per
    frame. mode: indep | left_side | right_side | mid_side."""
    chans = np.asarray(channels, dtype=np.int64)
    if chans.ndim == 1:
        chans = chans[:, None]
    n, nch = chans.shape
    out = bytearray(b"fLaC")
    # STREAMINFO (type 0, last)
    si = BW()
    si.w(block_size, 16)
    si.w(block_size, 16)
    si.w(0, 24)
    si.w(0, 24)
    si.w(rate, 20)
    si.w(nch - 1, 3)
    si.w(bps - 1, 5)
    si.w(n, 36)
    si.align()
    body = si.bytes() + b"\x00" * 16  # md5 unset
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body

    frames = [(i, min(block_size, n - i)) for i in range(0, n, block_size)]
    for fi, (start, bs) in enumerate(frames):
        bw = BW()
        bw.w(0x3FFE, 14)
        bw.w(0, 1)
        bw.w(0, 1)  # fixed blocksize stream
        bw.w(7, 4)  # 16-bit blocksize at end of header
        bw.w(0, 4)  # sample rate from STREAMINFO
        if mode == "indep":
            bw.w(nch - 1, 4)
        else:
            bw.w({"left_side": 8, "right_side": 9, "mid_side": 10}[mode], 4)
        bw.w({8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}[bps], 3)
        bw.w(0, 1)
        utf8_num(bw, fi)
        bw.w(bs - 1, 16)
        hdr = bw.bytes()
        bw.w(crc8(hdr), 8)

        blk = chans[start : start + bs]
        if mode == "indep":
            subs = [(blk[:, c], bps) for c in range(nch)]
        else:
            left = blk[:, 0]
            right = blk[:, 1]
            side = left - right
            if mode == "left_side":
                subs = [(left, bps), (side, bps + 1)]
            elif mode == "right_side":
                subs = [(side, bps + 1), (right, bps)]
            else:
                subs = [((left + right) >> 1, bps), (side, bps + 1)]
        kind = kinds if isinstance(kinds, str) else kinds[fi]
        for sig, ch_bps in subs:
            write_subframe(bw, sig, ch_bps, kind, **kw)
        bw.align()
        whole = bw.bytes()
        bw.w(crc16(whole), 16)
        out += bw.bytes()
    return bytes(out)


# ------------------------------------------------------------------ tests


def _sig(n, bps, seed, ch=1):
    rng = np.random.default_rng(seed)
    t = np.arange(n * ch, dtype=np.float64).reshape(n, ch)
    amp = (1 << (bps - 2)) - 1
    x = amp * np.sin(t / 23.0) + rng.integers(-40, 40, size=(n, ch))
    return np.clip(np.round(x), -(1 << (bps - 1)), (1 << (bps - 1)) - 1).astype(
        np.int64
    )


def _roundtrip(samples, rate, bps, block, **kw):
    data = encode_flac(samples, rate, bps, block, **kw)
    got, got_rate = decode_flac(data)
    assert got_rate == rate
    want = np.asarray(samples, dtype=np.float64)
    if want.ndim == 1:
        want = want[:, None]
    np.testing.assert_array_equal(got * (1 << (bps - 1)), want)
    return data


class TestFlacRoundtrip:
    def test_fixed_orders_mono(self):
        s = _sig(700, 16, 1)
        for order in range(5):
            _roundtrip(s, 44100, 16, 256, kinds=f"fixed{order}")

    def test_verbatim_and_constant(self):
        _roundtrip(_sig(300, 16, 2), 48000, 16, 128, kinds="verbatim")
        _roundtrip(np.full((500, 1), -1234), 32000, 16, 192, kinds="constant")

    def test_lpc_path(self):
        s = _sig(600, 16, 3)
        _roundtrip(s, 44100, 16, 200, kinds="lpc",
                   lpc_coefs=[1536, -512], lpc_shift=10)

    def test_lpc_high_order(self):
        s = _sig(400, 16, 4)
        coefs = [700, -300, 150, -75, 40, -20, 10, -5]
        _roundtrip(s, 22050, 16, 100, kinds="lpc",
                   lpc_coefs=coefs, lpc_shift=9, rice_param=6)

    def test_rice_partitions_and_params(self):
        s = _sig(512, 16, 5)
        for porder in (0, 1, 2, 3):
            _roundtrip(s, 44100, 16, 256, kinds="fixed1",
                       porder=porder, rice_param=4)

    def test_escape_partition(self):
        s = _sig(256, 16, 6)
        _roundtrip(s, 44100, 16, 256, kinds="fixed0", escape_raw=17)

    def test_wasted_bits(self):
        s = _sig(300, 16, 7) & ~np.int64(7)  # 3 low zero bits everywhere
        _roundtrip(s, 44100, 16, 150, kinds="fixed2", wasted=3)

    def test_stereo_modes(self):
        s = _sig(500, 16, 8, ch=2)
        for mode in ("indep", "left_side", "right_side", "mid_side"):
            _roundtrip(s, 44100, 16, 250, kinds="fixed2", mode=mode)

    def test_mid_side_odd_sums(self):
        # mid/side drops the sum's LSB into the side channel — exercise
        # odd L+R explicitly
        s = np.array([[3, 2], [5, -2], [-7, 4], [1, 0], [0, 1], [9, 9]],
                     dtype=np.int64)
        _roundtrip(s, 8000, 16, 6, kinds="verbatim", mode="mid_side")

    def test_bit_depths(self):
        for bps in (8, 12, 16, 20, 24):
            _roundtrip(_sig(220, bps, 9), 16000, bps, 110, kinds="fixed1")

    def test_short_last_block(self):
        s = _sig(1000, 16, 10)  # 256-blocks + a 232 tail frame
        _roundtrip(s, 44100, 16, 256, kinds="fixed2")

    def test_multichannel(self):
        s = _sig(240, 16, 11, ch=4)
        _roundtrip(s, 48000, 16, 120, kinds="fixed1")


class TestFlacMalformed:
    def test_bad_magic(self):
        with pytest.raises(MediaDecodeUnavailableFlac):
            decode_flac(b"fLaX" + b"\x00" * 64)

    def test_truncated(self):
        data = encode_flac(_sig(300, 16, 12), 44100, 16, 150)
        with pytest.raises(MediaDecodeUnavailableFlac):
            decode_flac(data[: len(data) - 7])

    def test_header_crc_mismatch(self):
        data = bytearray(encode_flac(_sig(300, 16, 13), 44100, 16, 300))
        # STREAMINFO is 4 + 4 + 34 + 16 bytes; frame starts right after.
        frame_at = 4 + 4 + 34 + 16
        data[frame_at + 2] ^= 0x10  # flip a header bit
        with pytest.raises(MediaDecodeUnavailableFlac):
            decode_flac(bytes(data))

    def test_body_crc_mismatch(self):
        data = bytearray(encode_flac(_sig(300, 16, 14), 44100, 16, 300))
        data[-10] ^= 0x04  # flip a residual bit in the last frame
        with pytest.raises(MediaDecodeUnavailableFlac):
            decode_flac(bytes(data))

    def test_not_flac_containers(self):
        for junk in (b"", b"RIFF1234WAVE", b"\xff\xfb\x90\x00" * 30):
            with pytest.raises(MediaDecodeUnavailableFlac):
                decode_flac(junk)


from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


class TestFlacFuzz:
    """Property-based roundtrips: arbitrary sample shapes, bit depths,
    block sizes, predictors and partition orders through encoder→decoder."""

    @settings(max_examples=15, deadline=None)
    @given(
        n=st.integers(64, 900),
        bps=st.sampled_from([8, 12, 16, 20, 24]),
        block=st.sampled_from([64, 128, 192, 256]),
        kind=st.sampled_from(
            ["fixed0", "fixed1", "fixed2", "fixed3", "fixed4", "verbatim"]
        ),
        porder=st.integers(0, 2),
        param=st.integers(0, 10),
        seed=st.integers(0, 2**31 - 1),
        stereo=st.booleans(),
        mode=st.sampled_from(["indep", "left_side", "right_side", "mid_side"]),
    )
    def test_fuzz_roundtrip(self, n, bps, block, kind, porder, param, seed,
                            stereo, mode):
        # keep the last block no smaller than the highest fixed order
        n -= n % 8
        ch = 2 if stereo else 1
        if not stereo:
            mode = "indep"
        s = _sig(n, bps, seed, ch=ch)
        _roundtrip(s, 44100, bps, block, kinds=kind, porder=porder,
                   rice_param=param)
        if stereo:
            _roundtrip(s, 44100, bps, block, kinds=kind, porder=porder,
                       rice_param=param, mode=mode)

    @settings(max_examples=10, deadline=None)
    @given(
        seed=st.integers(0, 2**31 - 1),
        order=st.integers(1, 12),
        shift=st.integers(0, 14),
    )
    def test_fuzz_lpc(self, seed, order, shift):
        rng = np.random.default_rng(seed)
        coefs = rng.integers(-(1 << 11), 1 << 11, size=order)
        if not coefs.any():
            coefs[0] = 1
        s = _sig(400, 16, seed)
        _roundtrip(s, 44100, 16, 200, kinds="lpc",
                   lpc_coefs=coefs.tolist(), lpc_shift=shift, rice_param=8)
