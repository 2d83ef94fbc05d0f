"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

The Spark-side plumbing (schemas, batch shapes, partition discipline, UDF
signatures) is real and tested; the actual media DECODING is stubbed behind
clearly-marked hooks because no image/audio libraries ship in this
environment. Swap `_decode_image_stub` etc. for Pillow/torchaudio/pyav
decoders — batch shapes don't change.

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


def _decode_image_stub(data: bytes) -> tuple[str, int, int]:
    """STUB: derive deterministic fake (format, width, height) from the
    bytes. A real implementation parses the container (PNG IHDR / JPEG SOF).
    Recognizes magic numbers so the metadata is honest where cheap."""
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        if len(data) >= 24:
            w = int.from_bytes(data[16:20], "big")
            h = int.from_bytes(data[20:24], "big")
            return "png", w, h
        return "png", 0, 0
    if data[:2] == b"\xff\xd8":
        return "jpeg", 0, 0
    h = hashlib.md5(data).digest()
    return "unknown", 1 + h[0] % 64, 1 + h[1] % 64


def image_metadata(
    df: DataFrame, bytes_col: str = "media", id_col: str = "asset_id"
) -> DataFrame:
    """One pass over the binary column → typed metadata."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [_decode_image_stub(b or b"") for b in pdf[bytes_col]]
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
