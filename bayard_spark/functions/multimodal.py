"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

Image METADATA decode is real: pure-Python container-header parsers for
PNG / JPEG / GIF / WebP / BMP (no external libs needed — dimensions and
format come from the first bytes of each container). Pixel decode and
model-based FEATURE extraction remain stubbed behind clearly-marked hooks
(`MediaDecodeUnavailable`) because no image/audio libraries ship in this
environment; swap in Pillow/torchaudio/pyav — batch shapes don't change.

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


def image_features(
    df: DataFrame,
    bytes_col: str = "media",
    id_col: str = "asset_id",
    dim: int = 64,
    real_decode: bool = False,
) -> DataFrame:
    """Feature-extract each image → float vector.

    STUB path: a deterministic hash-derived vector (so the downstream ANN /
    dedup pipeline is fully exercisable end-to-end). real_decode=True raises
    MediaDecodeUnavailable until a model hook is plugged in.
    """
    if real_decode:
        raise MediaDecodeUnavailable(
            "plug a real encoder into image_features(real_decode=True)"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for b in pdf[bytes_col]:
                b = b or b""
                seed = np.frombuffer(
                    hashlib.sha256(b).digest(), dtype=np.uint8
                ).astype(np.float64)
                reps = int(np.ceil(dim / len(seed)))
                v = np.tile(seed, reps)[:dim]
                v = (v - v.mean()) / (v.std() + 1e-9)
                feats.append(v.astype(np.float32).tolist())
            yield pd.DataFrame({"asset_id": pdf[id_col], "feature": feats})

    return df.select(id_col, bytes_col).mapInPandas(run, FEATURE_SCHEMA)


def sample_video_frames(
    df: DataFrame,
    bytes_col: str = "media",
    id_col: str = "asset_id",
    every_n: int = 10,
    max_frames: int = 8,
) -> DataFrame:
    """Frame sampling plumbing: emits (asset_id, frame_no, frame_bytes).

    STUB decoder treats the binary as fixed-size 1 KiB 'frames'; a real
    implementation seeks keyframes via pyav. Sampling predicate applies
    before 'decode' so skipped frames cost nothing.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nos, frames = [], [], []
            for aid, b in zip(pdf[id_col], pdf[bytes_col]):
                b = b or b""
                n_frames = max(len(b) // 1024, 0)
                taken = 0
                for fno in range(0, n_frames, every_n):
                    if taken >= max_frames:
                        break
                    ids.append(aid)
                    nos.append(fno)
                    frames.append(b[fno * 1024 : (fno + 1) * 1024])
                    taken += 1
            yield pd.DataFrame(
                {"asset_id": ids, "frame_no": nos, "frame_bytes": frames}
            )

    return df.select(id_col, bytes_col).mapInPandas(run, FRAME_SCHEMA)
