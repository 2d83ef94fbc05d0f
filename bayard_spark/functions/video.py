"""AVI/MJPEG video container parsing — real, dependency-free.

The reference treats media as opaque stored bytes (bayard indexes text
fields only; docs/schema.md has no media type), so video support here is a
training-data-pipeline extension per the build brief: binary column in,
typed metadata + sampled frames out. Motion-JPEG inside an AVI (RIFF)
container is the one mainstream video format that is decodable without
external codec libraries, because every frame is a complete baseline/
progressive JPEG — which `functions/jpeg.py` already decodes from spec.
Other codecs (H.264/VP9/AV1…) stay honestly gated behind
`MediaDecodeUnavailable`: they genuinely need libav-class decoders.

Layout parsed (public AVI RIFF spec, msdn AVIMAINHEADER/AVISTREAMHEADER):

    RIFF <size> 'AVI '
      LIST 'hdrl'
        'avih' MainAVIHeader   (us/frame, total frames, width, height)
        LIST 'strl'            (one per stream)
          'strh' fccType='vids' fccHandler, scale, rate, length
          'strf' BITMAPINFOHEADER (compression fourcc)
      LIST 'movi'
        '##dc'/'##db' <frame bytes>   (## = stream index, word-aligned)
      'idx1' (optional index — not required; we walk movi directly)

Frame EXTRACTION is pure byte slicing (no decode): sampling predicates
apply before any JPEG work, so skipped frames cost nothing — the same
travel-once / prune-before-decode rule as the rest of multimodal.py.
"""

from __future__ import annotations

import struct

import numpy as np


class MediaDecodeUnavailableVideo(NotImplementedError):
    """Typed gate for video containers/codecs this module cannot decode."""


def _u32(data: bytes, off: int) -> int:
    if off + 4 > len(data):
        raise MediaDecodeUnavailableVideo("AVI truncated inside a header")
    return struct.unpack_from("<I", data, off)[0]


def _chunks(data: bytes, start: int, end: int):
    """Iterate RIFF chunks (fourcc, body_start, body_size) in [start, end);
    chunk bodies are word-aligned. Truncation raises typed."""
    pos = start
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        size = _u32(data, pos + 4)
        body = pos + 8
        if body + size > end:
            raise MediaDecodeUnavailableVideo(
                f"AVI chunk {fourcc!r} overruns its parent"
            )
        yield fourcc, body, size
        pos = body + size + (size & 1)


def parse_avi(data: bytes) -> dict:
    """Parse an AVI container → metadata + MJPEG frame byte ranges.

    Returns {"width", "height", "fps", "n_frames", "codec",
    "frames": list[(frame_no, start, size)]} where the ranges slice the
    ORIGINAL buffer (no copies until a frame is actually sampled).
    Raises MediaDecodeUnavailableVideo (typed, never silent garbage) for
    non-AVI bytes, truncated structures, missing video stream, or a
    non-MJPEG codec.
    """
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise MediaDecodeUnavailableVideo("not an AVI (RIFF) container")
    riff_end = min(len(data), 8 + _u32(data, 4))

    width = height = 0
    us_per_frame = 0
    total_frames = 0
    fps = 0.0
    codec = ""
    vids_stream_idx: int | None = None
    movi: tuple[int, int] | None = None

    stream_no = 0
    for fourcc, body, size in _chunks(data, 12, riff_end):
        if fourcc != b"LIST":
            continue
        list_type = data[body : body + 4]
        if list_type == b"hdrl":
            for f2, b2, s2 in _chunks(data, body + 4, body + size):
                if f2 == b"avih":
                    if s2 < 40:
                        raise MediaDecodeUnavailableVideo(
                            "AVI main header too short"
                        )
                    us_per_frame = _u32(data, b2)
                    total_frames = _u32(data, b2 + 16)
                    width = _u32(data, b2 + 32)
                    height = _u32(data, b2 + 36)
                elif f2 == b"LIST" and data[b2 : b2 + 4] == b"strl":
                    is_vids = False
                    for f3, b3, s3 in _chunks(data, b2 + 4, b2 + s2):
                        if f3 == b"strh":
                            if s3 < 32:
                                raise MediaDecodeUnavailableVideo(
                                    "AVI stream header too short"
                                )
                            is_vids = data[b3 : b3 + 4] == b"vids"
                            if is_vids and vids_stream_idx is None:
                                vids_stream_idx = stream_no
                                codec = (
                                    data[b3 + 4 : b3 + 8]
                                    .decode("ascii", "replace")
                                    .strip("\x00 ")
                                    .upper()
                                )
                                scale = _u32(data, b3 + 20)
                                rate = _u32(data, b3 + 24)
                                if scale:
                                    fps = rate / scale
                        elif f3 == b"strf" and is_vids and s3 >= 16:
                            comp = data[b3 + 16 : b3 + 20]
                            if comp.strip(b"\x00"):
                                codec = comp.decode(
                                    "ascii", "replace"
                                ).strip("\x00 ").upper()
                    stream_no += 1
        elif list_type == b"movi":
            movi = (body + 4, body + size)

    if vids_stream_idx is None:
        raise MediaDecodeUnavailableVideo("AVI has no video ('vids') stream")
    if movi is None:
        raise MediaDecodeUnavailableVideo("AVI has no movi list")
    if codec not in ("MJPG", "MJPEG", "DMB1"):
        raise MediaDecodeUnavailableVideo(
            f"AVI codec {codec or '(none)'} unsupported - only MJPEG "
            "decodes without external codec libraries"
        )
    if not fps and us_per_frame:
        fps = 1e6 / us_per_frame

    prefix = b"%02d" % vids_stream_idx
    frames: list[tuple[int, int, int]] = []
    for fourcc, body, size in _chunks(data, movi[0], movi[1]):
        if fourcc[:2] == prefix and fourcc[2:4] in (b"dc", b"db"):
            if size >= 2 and data[body : body + 2] != b"\xff\xd8":
                raise MediaDecodeUnavailableVideo(
                    f"MJPEG frame {len(frames)} does not start with a "
                    "JPEG SOI marker"
                )
            frames.append((len(frames), body, size))

    return {
        "width": int(width),
        "height": int(height),
        "fps": float(fps),
        "n_frames": int(total_frames) or len(frames),
        "codec": codec,
        "frames": frames,
    }


def avi_frame_pixels(data: bytes, frame_range: tuple[int, int, int]) -> np.ndarray:
    """Decode ONE sampled MJPEG frame to RGB pixels via the from-spec JPEG
    decoder (functions/jpeg.py). Kept separate from parse_avi so sampling
    prunes before any entropy decode happens."""
    from bayard_spark.functions.jpeg import decode_jpeg_pixels

    _, start, size = frame_range
    return decode_jpeg_pixels(data[start : start + size])
