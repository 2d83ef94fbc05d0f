"""AVI/MJPEG + animated-GIF video decode, validated the house way: every
decoder inverts an INDEPENDENT encoder written in this test (the AVI muxer
and the animated-GIF encoder below share no code with functions/video.py /
functions/multimodal.py), plus typed-failure checks for malformed
containers."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from test_jpeg_decode import _smooth, encode_jpeg


# ---------------------------------------------------------------- muxers


def mux_avi(
    frames: list[bytes],
    width: int,
    height: int,
    fps: int = 10,
    codec: bytes = b"MJPG",
    stream_idx: int = 0,
) -> bytes:
    """Independent minimal AVI muxer: RIFF('AVI ') > LIST(hdrl){avih,
    LIST(strl){strh,strf}} + LIST(movi){##dc...} — written from the public
    RIFF/AVI spec, no code shared with the parser under test."""

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    def lst(list_type: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", list_type + body)

    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps,  # us per frame
        0, 0, 0,
        len(frames),  # total frames
        0, 1, 0,
        width, height,
        0, 0, 0, 0,
    )
    strh = (
        b"vids" + codec
        + struct.pack("<IHHIIIIIIII4H",
                      0, 0, 0, 0,  # flags, priority, language, initial
                      1, fps,  # scale, rate
                      0, len(frames), 0, 0xFFFFFFFF, 0,  # start, length,
                      # suggested buffer, quality, samplesize
                      0, 0, width, height)  # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, codec, width * height * 3, 0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh)
                                   + chunk(b"strf", strf)),
    )
    cid = b"%02ddc" % stream_idx
    movi = lst(b"movi", b"".join(chunk(cid, f) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _lzw_encode(indices, min_code):
    """Independent GIF-LZW encoder (same algorithm as test_jpeg_decode's,
    restated here so this file stays self-contained for GIF)."""
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


def mux_animated_gif(
    screen: tuple[int, int],
    palette: np.ndarray,
    frames: list[dict],
    bg_index: int = 0,
) -> bytes:
    """Independent animated-GIF89a encoder. Each frame dict:
    {idx: (h,w) palette indices, x, y, disposal, transparent (opt),
    delay_cs (opt)}."""
    sw, sh = screen
    n = len(palette)
    depth = max(2, (n - 1).bit_length())
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", sw, sh)
    out += bytes([0x80 | (depth - 1), bg_index, 0])
    pal = bytearray()
    for r, g, b in palette:
        pal += bytes([r, g, b])
    pal += b"\x00" * ((3 << depth) - len(pal))
    out += pal
    for f in frames:
        idx = f["idx"]
        h, w = idx.shape
        transparent = f.get("transparent")
        gflags = (f.get("disposal", 0) << 2) | (
            0x01 if transparent is not None else 0
        )
        out += b"\x21\xf9\x04" + bytes([gflags])
        out += struct.pack("<H", f.get("delay_cs", 0))
        out += bytes([transparent if transparent is not None else 0, 0])
        out += b"\x2c" + struct.pack(
            "<HHHH", f.get("x", 0), f.get("y", 0), w, h
        ) + b"\x00"
        out += bytes([depth])
        lzw = _lzw_encode(idx.ravel().tolist(), depth)
        for i in range(0, len(lzw), 255):
            part = lzw[i:i + 255]
            out += bytes([len(part)]) + part
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


# ------------------------------------------------------------ AVI parse


def _mjpeg_fixture(n_frames=5, h=24, w=32, fps=8):
    frames = [
        encode_jpeg(_smooth(h, w, seed=k, chans=3), q=2) for k in range(n_frames)
    ]
    return mux_avi(frames, w, h, fps=fps), frames


def test_avi_parse_metadata_and_frames():
    from bayard_spark.functions.video import parse_avi

    data, frames = _mjpeg_fixture(n_frames=5, h=24, w=32, fps=8)
    m = parse_avi(data)
    assert (m["width"], m["height"]) == (32, 24)
    assert m["fps"] == pytest.approx(8.0)
    assert m["n_frames"] == 5 and m["codec"] == "MJPG"
    assert len(m["frames"]) == 5
    for (fno, start, size), want in zip(m["frames"], frames):
        assert data[start:start + size] == want


def test_avi_frame_pixels_match_direct_jpeg_decode():
    from bayard_spark.functions.jpeg import decode_jpeg_pixels
    from bayard_spark.functions.video import avi_frame_pixels, parse_avi

    data, frames = _mjpeg_fixture(n_frames=3)
    m = parse_avi(data)
    for rng, fbytes in zip(m["frames"], frames):
        assert np.array_equal(
            avi_frame_pixels(data, rng), decode_jpeg_pixels(fbytes)
        )


def test_avi_nonzero_stream_index():
    from bayard_spark.functions.video import parse_avi

    frames = [encode_jpeg(_smooth(16, 16, seed=1, chans=3))]
    data = mux_avi(frames, 16, 16, stream_idx=0)
    assert len(parse_avi(data)["frames"]) == 1
    # frames tagged for stream 1 while vids is stream 0: not ours
    data2 = mux_avi(frames, 16, 16, stream_idx=1)
    assert parse_avi(data2)["frames"] == []


def test_avi_malformed_containers_fail_typed():
    from bayard_spark.functions.video import (
        MediaDecodeUnavailableVideo,
        parse_avi,
    )

    data, _ = _mjpeg_fixture(n_frames=2)
    with pytest.raises(MediaDecodeUnavailableVideo):
        parse_avi(b"RIFF\x04\x00\x00\x00WAVE")  # not AVI
    with pytest.raises(MediaDecodeUnavailableVideo):
        parse_avi(data[:60])  # truncated inside headers
    h264 = mux_avi([b"\xff\xd8fake"], 8, 8, codec=b"H264")
    with pytest.raises(MediaDecodeUnavailableVideo):
        parse_avi(h264)  # honest codec gate
    bad_frame = mux_avi([b"notjpeg"], 8, 8)
    with pytest.raises(MediaDecodeUnavailableVideo):
        parse_avi(bad_frame)  # dc chunk without SOI


# ----------------------------------------------------- GIF animation


def test_gif_animation_compositing_all_disposals():
    from bayard_spark.functions.multimodal import decode_gif_frames

    palette = np.array(
        [[10, 10, 10], [200, 0, 0], [0, 200, 0], [0, 0, 200]],
        dtype=np.uint8,
    )
    # frame 0: full screen of color 1, disposal 1 (leave)
    f0 = np.ones((8, 8), dtype=np.uint8)
    # frame 1: 4x4 patch of color 2 at (2,2), disposal 3 (restore prev)
    f1 = np.full((4, 4), 2, dtype=np.uint8)
    # frame 2: 2x2 patch of color 3 at (0,0), disposal 2 (restore bg)
    f2 = np.full((2, 2), 3, dtype=np.uint8)
    # frame 3: 2x2 patch with a transparent pixel over the canvas
    f3 = np.array([[3, 0], [0, 3]], dtype=np.uint8)
    data = mux_animated_gif(
        (8, 8), palette,
        [
            {"idx": f0, "disposal": 1, "delay_cs": 5},
            {"idx": f1, "x": 2, "y": 2, "disposal": 3, "delay_cs": 10},
            {"idx": f2, "disposal": 2},
            {"idx": f3, "x": 4, "y": 4, "transparent": 0},
        ],
    )
    frames, delays = decode_gif_frames(data)
    assert len(frames) == 4 and delays == [5, 10, 0, 0]
    c1 = np.tile(palette[1], (8, 8, 1))
    assert np.array_equal(frames[0], c1)
    want1 = c1.copy()
    want1[2:6, 2:6] = palette[2]
    assert np.array_equal(frames[1], want1)
    # disposal 3 restored frame 1's patch, then frame 2 drew at (0,0)
    want2 = c1.copy()
    want2[0:2, 0:2] = palette[3]
    assert np.array_equal(frames[2], want2)
    # disposal 2 restored frame 2's rect to BACKGROUND (palette[0]),
    # then frame 3 drew its opaque diagonal at (4,4)
    want3 = c1.copy()
    want3[0:2, 0:2] = palette[0]
    want3[4, 4] = palette[3]
    want3[5, 5] = palette[3]
    assert np.array_equal(frames[3], want3)


def test_gif_first_frame_entry_point_unchanged():
    from bayard_spark.functions.multimodal import (
        decode_gif_frames,
        decode_gif_pixels,
    )

    rng = np.random.default_rng(21)
    palette = rng.integers(0, 256, size=(8, 3)).astype(np.uint8)
    idx = rng.integers(0, 8, size=(9, 11)).astype(np.uint8)
    data = mux_animated_gif((11, 9), palette, [{"idx": idx}])
    assert np.array_equal(decode_gif_pixels(data), palette[idx])
    frames, _ = decode_gif_frames(data, max_frames=1)
    assert np.array_equal(frames[0], palette[idx])


def test_gif_max_frames_bounds_lzw_work():
    from bayard_spark.functions.multimodal import decode_gif_frames

    palette = np.array([[0, 0, 0], [255, 255, 255], [1, 2, 3], [4, 5, 6]],
                       dtype=np.uint8)
    fr = {"idx": np.ones((4, 4), dtype=np.uint8)}
    data = mux_animated_gif((4, 4), palette, [fr] * 6)
    frames, _ = decode_gif_frames(data, max_frames=2)
    assert len(frames) == 2


# ------------------------------------------------- Spark-side plumbing


def test_sample_video_frames_real_avi_spark(spark):
    from bayard_spark.functions import multimodal

    data, frames = _mjpeg_fixture(n_frames=7)
    df = spark.createDataFrame(
        [(1, data), (2, bytes(1024 * 30))], "asset_id long, media binary"
    )
    rows = multimodal.sample_video_frames(
        df, every_n=2, max_frames=3
    ).collect()
    avi = sorted(
        (r["frame_no"], bytes(r["frame_bytes"]))
        for r in rows if r["asset_id"] == 1
    )
    assert [fno for fno, _ in avi] == [0, 2, 4]
    assert [fb for _, fb in avi] == [frames[0], frames[2], frames[4]]
    # unrecognized bytes keep the stub chunk shape
    stub = [r for r in rows if r["asset_id"] == 2]
    assert len(stub) == 3 and all(len(r["frame_bytes"]) == 1024 for r in stub)


def test_video_metadata_and_features_spark(spark):
    from bayard_spark.functions import multimodal

    data, _ = _mjpeg_fixture(n_frames=4, h=24, w=32, fps=5)
    palette = np.array([[0, 0, 0], [255, 0, 0], [9, 9, 9], [7, 7, 7]],
                       dtype=np.uint8)
    gif = mux_animated_gif(
        (6, 6), palette,
        [{"idx": np.ones((6, 6), dtype=np.uint8), "delay_cs": 4}] * 3,
    )
    df = spark.createDataFrame(
        [(1, data), (2, gif)], "asset_id long, media binary"
    )
    meta = {r["asset_id"]: r for r in multimodal.video_metadata(df).collect()}
    assert meta[1]["container"] == "avi" and meta[1]["codec"] == "MJPG"
    assert (meta[1]["width"], meta[1]["height"]) == (32, 24)
    assert meta[1]["fps"] == pytest.approx(5.0)
    assert meta[1]["n_frames"] == 4
    assert meta[2]["container"] == "gif" and meta[2]["n_frames"] == 3
    assert meta[2]["fps"] == pytest.approx(3 * 100.0 / 12)

    feats = multimodal.video_frame_features(
        df, every_n=2, max_frames=2, dim=16
    ).collect()
    by_asset = {}
    for r in feats:
        by_asset.setdefault(r["asset_id"], []).append(r["frame_no"])
        assert len(r["feature"]) == 16
    assert sorted(by_asset[1]) == [0, 2]
    assert sorted(by_asset[2]) == [0, 2]
