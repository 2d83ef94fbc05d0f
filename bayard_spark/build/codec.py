"""Delta + varint block codec for posting lists — numpy-vectorized.

Postings for a (field, term) are stored as fixed-size blocks (128 docs, the
same block size tantivy uses for its bitpacked postings) with per-block
metadata materialized as PLAIN COLUMNS of the postings table:

    n_docs, first_doc_id, last_doc_id, max_tf, min_len

so that block-max WAND pruning and doc-range skipping happen as ordinary
Catalyst filters on the parquet scan (min/max page stats + predicate
pushdown) BEFORE any Python decode touches the block bytes. The payload
columns are:

    doc_bytes : varint(delta(doc_ids))          (deltas of sorted doc ids)
    tf_bytes  : varint(tf per doc)
    pos_bytes : varint(delta(positions)) per doc, concatenated in doc order
                (tf_i values give the per-doc position counts; empty when the
                field records freq only)

Encode/decode are whole-array numpy kernels (no per-value Python loops):
encode loops over the ≤10 varint byte slots, decode reconstructs values with
a segmented shift-or. Round-trip is exact for uint64 < 2^63.

This is an original layout informed by public IR practice (tantivy's 128-doc
blocks + skip info; Lucene's block-max metadata); no reference code reused.
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128
_MAX_VARINT_BYTES = 10


def varint_lengths(values: np.ndarray) -> np.ndarray:
    """Per-value LEB128 byte length (number of 7-bit groups), vectorized."""
    v = np.asarray(values, dtype=np.uint64)
    nbytes = np.ones(v.shape, dtype=np.int64)
    for k in range(1, _MAX_VARINT_BYTES):
        mask = v >= (np.uint64(1) << np.uint64(7 * k))
        if not mask.any():
            break
        nbytes += mask.astype(np.int64)
    return nbytes


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode a uint64 array, vectorized."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    nbytes = varint_lengths(v)
    total = int(nbytes.sum())
    out = np.zeros(total, dtype=np.uint8)
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    for k in range(_MAX_VARINT_BYTES):
        sel = nbytes > k
        if not sel.any():
            break
        chunk = ((v[sel] >> np.uint64(7 * k)) & np.uint64(0x7F)).astype(np.uint8)
        cont = (nbytes[sel] > k + 1).astype(np.uint8) << 7
        out[starts[sel] + k] = chunk | cont
    return out.tobytes()


def varint_decode(buf: bytes | bytearray | memoryview) -> np.ndarray:
    """Decode LEB128 bytes → uint64 array, vectorized."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_end = (b & 0x80) == 0
    n_vals = int(is_end.sum())
    # group id of each byte = count of ends before it
    group = np.zeros(b.size, dtype=np.int64)
    group[1:] = np.cumsum(is_end[:-1])
    # position within group
    group_starts = np.zeros(n_vals, dtype=np.int64)
    ends_idx = np.flatnonzero(is_end)
    group_starts[1:] = ends_idx[:-1] + 1
    pos_in_group = np.arange(b.size, dtype=np.int64) - group_starts[group]
    vals = np.zeros(n_vals, dtype=np.uint64)
    contrib = (b & np.uint8(0x7F)).astype(np.uint64) << (
        np.uint64(7) * pos_in_group.astype(np.uint64)
    )
    np.add.at(vals, group, contrib)
    return vals


def varint_decode_many(
    buf, chunk_offsets: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Decode N concatenated varint streams in ONE vectorized pass.

    `buf` holds the streams back to back; `chunk_offsets` (int64, N+1) are
    the byte offsets delimiting them. Returns `(values, value_offsets)`
    where `value_offsets` (N+1) slices `values` per stream.

    This is the batch form of `varint_decode`: one numpy kernel decodes an
    entire Arrow batch of posting blocks instead of one Python call per
    block (the per-call overhead dominated hot-term decode — ~32 µs/call ×
    3 streams × df/128 blocks). Values never span chunk boundaries (each
    chunk is a complete stream), so the per-stream value counts fall out of
    a searchsorted over the value-end byte positions.
    """
    b = np.frombuffer(buf, dtype=np.uint8)
    offs = np.asarray(chunk_offsets, dtype=np.int64)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64), np.zeros(offs.size, dtype=np.int64)
    is_end = (b & 0x80) == 0
    if is_end.all():
        # every value fits in 7 bits (the common case for doc-id deltas and
        # tfs): bytes ARE the values, offsets carry over unchanged
        return b.astype(np.uint64), offs.copy()
    ends_idx = np.flatnonzero(is_end)
    n_vals = ends_idx.size
    group = np.zeros(b.size, dtype=np.int64)
    group[1:] = np.cumsum(is_end[:-1])
    group_starts = np.zeros(n_vals, dtype=np.int64)
    group_starts[1:] = ends_idx[:-1] + 1
    pos_in_group = np.arange(b.size, dtype=np.int64) - group_starts[group]
    contrib = (b & np.uint8(0x7F)).astype(np.uint64) << (
        np.uint64(7) * pos_in_group.astype(np.uint64)
    )
    # per-value sum of contributions: group ids are ascending, so this is a
    # contiguous segmented reduce — np.add.reduceat, not the scattered (and
    # ~10x slower) np.add.at of the single-stream decoder
    vals = np.add.reduceat(contrib, group_starts)
    value_offsets = np.searchsorted(ends_idx, offs, side="left")
    return vals, value_offsets


def delta_decode_segments(
    deltas: np.ndarray, value_offsets: np.ndarray
) -> np.ndarray:
    """Segmented delta-decode: cumsum within each `value_offsets` slice,
    where the FIRST value of each segment is absolute (delta_encode keeps
    v[0]). One global cumsum, then each segment subtracts the running total
    at its start; uint64 wraparound cancels exactly in the subtraction, so
    the result is exact whenever the true values fit in uint64."""
    d = np.asarray(deltas, dtype=np.uint64)
    offs = np.asarray(value_offsets, dtype=np.int64)
    c = np.cumsum(d, dtype=np.uint64)
    starts = offs[:-1]
    base = np.where(starts > 0, c[np.maximum(starts - 1, 0)], np.uint64(0))
    with np.errstate(over="ignore"):
        return c - np.repeat(base, np.diff(offs))


def delta_encode(sorted_vals: np.ndarray) -> np.ndarray:
    v = np.asarray(sorted_vals, dtype=np.uint64)
    if v.size == 0:
        return v
    out = np.empty_like(v)
    out[0] = v[0]
    with np.errstate(over="ignore"):
        out[1:] = v[1:] - v[:-1]
    return out


def delta_decode(deltas: np.ndarray) -> np.ndarray:
    d = np.asarray(deltas, dtype=np.uint64)
    return np.cumsum(d, dtype=np.uint64)


def split_pos_bytes(pos_bytes: bytes, tfs: np.ndarray) -> list[bytes]:
    """Slice a block's concatenated position stream back into per-doc byte
    runs (doc k holds tfs[k] varint values)."""
    b = np.frombuffer(pos_bytes, dtype=np.uint8)
    is_end = (b & 0x80) == 0
    value_end_bytes = np.flatnonzero(is_end) + 1  # exclusive byte offset
    offs = np.zeros(len(tfs) + 1, dtype=np.int64)
    np.cumsum(np.asarray(tfs, dtype=np.int64), out=offs[1:])
    out = []
    prev = 0
    for k in range(len(tfs)):
        end = int(value_end_bytes[offs[k + 1] - 1]) if offs[k + 1] > 0 else 0
        out.append(pos_bytes[prev:end])
        prev = end
    return out


def encode_block(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    positions: np.ndarray | None = None,
    pos_doc_offsets: np.ndarray | None = None,
) -> tuple[bytes, bytes, bytes]:
    """Encode ONE block (≤ BLOCK_SIZE docs, doc_ids sorted ascending).

    positions/pos_doc_offsets: flattened positions for the block's docs and
    the per-doc start offsets into it (len = n_docs + 1). Positions are
    delta-encoded within each doc.
    """
    doc_ids = np.asarray(doc_ids, dtype=np.uint64)
    tfs = np.asarray(tfs, dtype=np.uint64)
    doc_bytes = varint_encode(delta_encode(doc_ids))
    tf_bytes = varint_encode(tfs)
    if positions is None or len(positions) == 0:
        return doc_bytes, tf_bytes, b""
    positions = np.asarray(positions, dtype=np.uint64)
    offs = np.asarray(pos_doc_offsets, dtype=np.int64)
    # per-doc delta: subtract previous position, reset at doc starts
    deltas = positions.copy()
    with np.errstate(over="ignore"):
        deltas[1:] = positions[1:] - positions[:-1]
    starts = offs[:-1]
    starts = starts[starts < positions.size]
    deltas[starts] = positions[starts]
    return doc_bytes, tf_bytes, varint_encode(deltas)


def decode_block(
    doc_bytes: bytes,
    tf_bytes: bytes,
    pos_bytes: bytes | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray | None, np.ndarray | None]:
    """Decode one block → (doc_ids, tfs, positions|None, pos_doc_offsets|None)."""
    doc_ids = delta_decode(varint_decode(doc_bytes))
    tfs = varint_decode(tf_bytes)
    if not pos_bytes:
        return doc_ids, tfs, None, None
    deltas = varint_decode(pos_bytes)
    offs = np.zeros(tfs.size + 1, dtype=np.int64)
    np.cumsum(tfs.astype(np.int64), out=offs[1:])
    # segmented cumsum: global cumsum, then subtract the running total at
    # each doc's start so every doc restarts from its own absolute first pos
    c = np.cumsum(deltas, dtype=np.uint64)
    starts = offs[:-1]
    doc_base = np.where(starts > 0, c[np.maximum(starts - 1, 0)], np.uint64(0))
    with np.errstate(over="ignore"):
        positions = c - np.repeat(doc_base, np.diff(offs))
    return doc_ids, tfs, positions, offs
