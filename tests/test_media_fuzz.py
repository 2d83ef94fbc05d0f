"""Typed-error fuzz contract for every media decoder entry point.

The repo rule (hardened r5, ADVICE-class bugs): malformed media bytes
NEVER escape as untyped exceptions — a decoder either returns a result
or raises MediaDecodeUnavailable (a NotImplementedError subtype shared
by all format modules).  Pure garbage, valid-magic-then-garbage, and
bit-flipped REAL containers all go through every entry point.
"""

import gzip
import struct
import zlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from bayard_spark.functions.multimodal import (
    decode_audio,
    decode_gif_frames,
    decode_image_header,
    decode_image_pixels,
    decode_wav,
    gif_frame_info,
    mp3_metadata,
    ogg_metadata,
)

DecErr = NotImplementedError  # every MediaDecodeUnavailable* subclasses it


def _entry_points():
    from bayard_spark.functions.flac import decode_flac
    from bayard_spark.functions.video import parse_avi

    eps = [
        decode_image_pixels,
        decode_image_header,
        decode_wav,
        decode_audio,
        decode_flac,
        mp3_metadata,
        gif_frame_info,
        lambda b: decode_gif_frames(b),
        ogg_metadata,
        parse_avi,
    ]
    return eps


MAGICS = [
    b"\x89PNG\r\n\x1a\n",
    b"\xff\xd8\xff\xe0",
    b"BM",
    b"GIF89a",
    b"RIFF\x00\x00\x00\x00WEBP",
    b"RIFF\x00\x00\x00\x00WAVE",
    b"RIFF\x00\x00\x00\x00AVI ",
    b"fLaC",
    b"OggS",
    b"\xff\xfb\x90\x00",  # mp3 frame sync
    b"ID3\x03\x00\x00\x00\x00\x00\x00",
]


def _assert_typed(fn, data):
    try:
        fn(data)
    except DecErr:
        pass  # MediaDecodeUnavailable* — the typed contract
    # returning a result for garbage that happens to parse is fine;
    # any OTHER exception type propagates and fails the test


@settings(max_examples=120, deadline=None)
@given(st.binary(max_size=300))
def test_garbage_is_typed_everywhere(data):
    for fn in _entry_points():
        _assert_typed(fn, data)


@settings(max_examples=120, deadline=None)
@given(st.sampled_from(MAGICS), st.binary(max_size=200))
def test_magic_plus_garbage_is_typed(magic, tail):
    for fn in _entry_points():
        _assert_typed(fn, magic + tail)


def _real_containers():
    """Small REAL containers built with independent stdlib tooling."""
    out = []
    # PNG (1 row, 2 px RGBA) via zlib like test_png_decode's encoder
    raw = b"\x00" + bytes(range(8))
    ihdr = struct.pack(">IIBBBBB", 2, 1, 8, 6, 0, 0, 0)

    def chunk(tag, body):
        c = struct.pack(">I", len(body)) + tag + body
        return c + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)

    out.append(
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    # WAV: 4 samples, 16-bit mono
    pcm = struct.pack("<4h", 0, 1000, -1000, 32000)
    out.append(
        b"RIFF"
        + struct.pack("<I", 36 + len(pcm))
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
        + b"data"
        + struct.pack("<I", len(pcm))
        + pcm
    )
    # GIF: 2x1, 2-color, one frame of LZW-coded indices via the
    # independent encoder in test_video_decode if present; else skip
    return out


@settings(max_examples=200, deadline=None)
@given(
    st.integers(min_value=0, max_value=2**31),
    st.integers(min_value=0, max_value=255),
    st.integers(min_value=0, max_value=1),
)
def test_bitflipped_real_containers_are_typed(pos, val, which):
    containers = _real_containers()
    data = containers[which % len(containers)]
    pos = pos % len(data)
    mutated = data[:pos] + bytes([val]) + data[pos + 1 :]
    for fn in _entry_points():
        _assert_typed(fn, mutated)


def test_truncations_of_real_containers_are_typed():
    for data in _real_containers():
        for cut in range(0, len(data)):
            for fn in _entry_points():
                _assert_typed(fn, data[:cut])


def test_gzip_wrapped_noise_is_typed():
    # containers sometimes arrive double-wrapped/corrupted in WARC bodies
    noise = gzip.compress(b"not an image at all")
    for fn in _entry_points():
        _assert_typed(fn, noise)
