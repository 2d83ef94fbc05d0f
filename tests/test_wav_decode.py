"""Real WAV/PCM decode (functions/multimodal.decode_wav) — validated by
inverting an independent forward ENCODER written here with struct/numpy
(the same strategy as test_png_decode.py: the test builds the container
byte-by-byte from the RIFF spec, so a decoder bug cannot cancel out).
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from bayard_spark.functions.multimodal import (
    MediaDecodeUnavailable,
    decode_wav,
    wav_audio_features,
)


def encode_wav(samples: np.ndarray, rate: int, bits: int = 16,
               audio_fmt: int = 1, extra_chunk: bytes = b"") -> bytes:
    """Independent forward encoder: float samples in [-1,1], shape
    (frames, channels) → RIFF/WAVE bytes."""
    if samples.ndim == 1:
        samples = samples[:, None]
    frames, channels = samples.shape
    if audio_fmt == 1:
        if bits == 8:
            body = (np.clip(samples, -1, 1) * 127 + 128).astype(np.uint8)
            body = body.tobytes()
        elif bits == 16:
            body = (np.clip(samples, -1, 1) * 32767).astype("<i2").tobytes()
        elif bits == 24:
            i32 = (np.clip(samples, -1, 1) * 8388607).astype("<i4")
            b4 = i32.view(np.uint8).reshape(-1, 4)
            body = b4[:, :3].tobytes()  # little-endian: drop the high byte
        elif bits == 32:
            body = (
                np.clip(samples, -1, 1) * 2147483647
            ).astype("<i4").tobytes()
        else:
            raise ValueError(bits)
    else:  # IEEE float
        dt = "<f4" if bits == 32 else "<f8"
        body = samples.astype(dt).tobytes()
    block_align = channels * bits // 8
    fmt = struct.pack(
        "<HHIIHH", audio_fmt, channels, rate, rate * block_align,
        block_align, bits,
    )
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += extra_chunk
    chunks += b"data" + struct.pack("<I", len(body)) + body
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def sine(freq: float, rate: int, secs: float, amp: float = 0.5):
    t = np.arange(int(rate * secs)) / rate
    return amp * np.sin(2 * np.pi * freq * t)


@pytest.mark.parametrize("bits,tol", [(8, 1e-2), (16, 1e-4), (24, 1e-6),
                                      (32, 1e-9)])
def test_pcm_roundtrip_mono(bits, tol):
    rate = 8000
    sig = sine(440, rate, 0.25)
    got, got_rate = decode_wav(encode_wav(sig, rate, bits=bits))
    assert got_rate == rate
    assert got.shape == (len(sig), 1)
    assert np.abs(got[:, 0] - sig).max() < tol + 1 / (1 << (bits - 1))


def test_float32_and_float64_roundtrip():
    rate = 16000
    sig = sine(1000, rate, 0.1, amp=0.9)
    for bits in (32, 64):
        got, r = decode_wav(encode_wav(sig, rate, bits=bits, audio_fmt=3))
        assert r == rate
        assert np.abs(got[:, 0] - sig).max() < 1e-6


def test_stereo_channel_separation():
    rate = 8000
    left = sine(440, rate, 0.1)
    right = sine(880, rate, 0.1)
    st = np.stack([left, right], axis=1)
    got, _ = decode_wav(encode_wav(st, rate, bits=16))
    assert got.shape == (len(left), 2)
    assert np.abs(got[:, 0] - left).max() < 1e-3
    assert np.abs(got[:, 1] - right).max() < 1e-3


def test_unknown_chunks_are_skipped():
    rate = 8000
    sig = sine(440, rate, 0.05)
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOX" + b"\x00"  # odd + pad
    got, r = decode_wav(encode_wav(sig, rate, bits=16, extra_chunk=extra))
    assert r == rate and len(got) == len(sig)


def test_features_from_real_samples():
    rate = 8000
    amp = 0.5
    sig = sine(500, rate, 1.0, amp=amp)
    v = wav_audio_features(sig[:, None], rate)
    rms, peak, zcr = float(v[0]), float(v[1]), float(v[2])
    assert abs(rms - amp / np.sqrt(2)) < 1e-3  # sine rms = A/sqrt(2)
    assert abs(peak - amp) < 1e-3
    # 500 Hz sine crosses zero 1000x/s -> zcr ~ 1000/8000
    assert abs(zcr - 2 * 500 / rate) < 0.01
    # dominant spectral bin: 500 Hz lands in the array_split chunk that
    # contains rfft bin 500 (4001 bins over 0..4000 Hz, uneven 32-split)
    splits = np.array_split(np.arange(4001), 32)
    want_bin = next(i for i, idx in enumerate(splits) if 500 in idx)
    spec = np.asarray(v[3:35])
    assert spec.argmax() == want_bin
    # silence scores zero everywhere
    z = wav_audio_features(np.zeros((rate, 1)), rate)
    assert float(z[0]) == 0.0 and float(z[1]) == 0.0


def test_honest_gates():
    with pytest.raises(MediaDecodeUnavailable):
        decode_wav(b"ID3\x03\x00mp3-ish bytes")
    with pytest.raises(MediaDecodeUnavailable):
        decode_wav(b"")
    # ADPCM (format 2) must refuse, not produce garbage
    rate = 8000
    sig = sine(440, rate, 0.05)
    adpcm = encode_wav(sig, rate, bits=16).replace(
        struct.pack("<HH", 1, 1), struct.pack("<HH", 2, 1), 1
    )
    with pytest.raises(MediaDecodeUnavailable):
        decode_wav(adpcm)


def test_audio_features_spark_end_to_end(spark):
    from bayard_spark.functions.multimodal import audio_features

    rate = 8000
    rows = [
        (1, bytearray(encode_wav(sine(440, rate, 0.5), rate, bits=16))),
        (2, bytearray(encode_wav(
            np.stack([sine(440, rate, 0.25), sine(880, rate, 0.25)], axis=1),
            rate, bits=16))),
    ]
    df = spark.createDataFrame(rows, "asset_id long, media binary")
    got = {r["asset_id"]: r for r in audio_features(df).collect()}
    assert got[1]["sample_rate"] == rate
    assert got[1]["n_channels"] == 1
    assert got[1]["n_samples"] == rate // 2
    assert abs(got[1]["duration_s"] - 0.5) < 1e-9
    assert got[2]["n_channels"] == 2
    assert abs(got[2]["duration_s"] - 0.25) < 1e-9
    assert abs(got[1]["feature"][0] - 0.5 / np.sqrt(2)) < 1e-3
    assert len(got[1]["feature"]) == 64


def test_truncated_data_chunk_decodes_aligned_prefix():
    rate = 8000
    sig = sine(440, rate, 0.1)
    buf = encode_wav(sig, rate, bits=16)
    # chop one byte off the end: the declared data length now exceeds
    # the bytes present and the body is sample-misaligned
    got, r = decode_wav(buf[:-1])
    assert r == rate and len(got) == len(sig) - 1


def test_truncated_fmt_chunk_gated():
    import struct as _s

    bad = (b"RIFF" + _s.pack("<I", 20) + b"WAVE"
           + b"fmt " + _s.pack("<I", 8) + b"\x01\x00\x01\x00data")
    with pytest.raises(MediaDecodeUnavailable):
        decode_wav(bad)
