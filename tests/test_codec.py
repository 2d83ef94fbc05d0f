"""Posting block codec: exact round-trips + property-based checks."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from bayard_spark.build.codec import (
    decode_block,
    delta_decode,
    delta_encode,
    encode_block,
    split_pos_bytes,
    varint_decode,
    varint_encode,
    varint_lengths,
)


class TestVarint:
    def test_edge_values(self):
        vals = np.array(
            [0, 1, 127, 128, 16383, 16384, 2**32, 2**62, 2**63 - 1],
            dtype=np.uint64,
        )
        assert np.array_equal(varint_decode(varint_encode(vals)), vals)

    def test_empty(self):
        assert varint_encode(np.empty(0, dtype=np.uint64)) == b""
        assert varint_decode(b"").size == 0

    def test_lengths_match_encoding(self):
        vals = np.array([0, 127, 128, 16384, 2**62], dtype=np.uint64)
        lens = varint_lengths(vals)
        assert lens.tolist() == [1, 1, 2, 3, 9]
        assert int(lens.sum()) == len(varint_encode(vals))

    @settings(max_examples=50, deadline=None)
    @given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=500))
    def test_roundtrip_property(self, xs):
        vals = np.array(xs, dtype=np.uint64)
        assert np.array_equal(varint_decode(varint_encode(vals)), vals)

    def test_single_byte_wire_format(self):
        # LEB128: 300 = 0b100101100 → 0xAC 0x02
        assert varint_encode(np.array([300], dtype=np.uint64)) == b"\xac\x02"


class TestDelta:
    @settings(max_examples=50, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=0, max_value=2**40), min_size=1, max_size=300
        )
    )
    def test_roundtrip_sorted(self, xs):
        vals = np.array(sorted(xs), dtype=np.uint64)
        assert np.array_equal(delta_decode(delta_encode(vals)), vals)


class TestBlock:
    def test_roundtrip_with_positions(self):
        rng = np.random.RandomState(3)
        n = 128
        # sorted unique ids spread over ~10^12 without materializing the range
        doc_ids = np.cumsum(
            rng.randint(1, 2**33, size=n).astype(np.uint64)
        )
        tfs = rng.randint(1, 8, n).astype(np.uint64)
        offs = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(tfs, out=offs[1:])
        positions = np.concatenate(
            [np.sort(rng.choice(5000, int(t), replace=False)) for t in tfs]
        ).astype(np.uint64)
        db, tb, pb = encode_block(doc_ids, tfs, positions, offs)
        d2, t2, p2, o2 = decode_block(db, tb, pb)
        assert np.array_equal(d2, doc_ids)
        assert np.array_equal(t2, tfs)
        assert np.array_equal(p2, positions)
        assert np.array_equal(o2, offs)

    def test_split_pos_bytes_framing(self):
        # per-doc byte runs of the concatenated stream decode independently
        tfs = np.array([2, 1, 3], dtype=np.uint64)
        doc_ids = np.array([10, 20, 30], dtype=np.uint64)
        positions = np.array([5, 9, 1000, 7, 8, 2000], dtype=np.uint64)
        offs = np.array([0, 2, 3, 6], dtype=np.int64)
        _, _, pb = encode_block(doc_ids, tfs, positions, offs)
        runs = split_pos_bytes(pb, tfs)
        assert b"".join(runs) == pb
        assert np.array_equal(
            np.cumsum(varint_decode(runs[0]), dtype=np.uint64),
            np.array([5, 9], dtype=np.uint64),
        )
        assert np.array_equal(
            np.cumsum(varint_decode(runs[2]), dtype=np.uint64),
            np.array([7, 8, 2000], dtype=np.uint64),
        )

    def test_partial_block_and_single_doc(self):
        d = np.array([42], dtype=np.uint64)
        t = np.array([3], dtype=np.uint64)
        db, tb, pb = encode_block(d, t)
        d2, t2, p2, _ = decode_block(db, tb, pb)
        assert d2.tolist() == [42] and t2.tolist() == [3] and p2 is None

    def test_compression_ratio_dense_ids(self):
        # dense sequential ids → 1 byte/doc-delta
        d = np.arange(1000, 1128, dtype=np.uint64)
        t = np.ones(128, dtype=np.uint64)
        db, tb, _ = encode_block(d, t)
        assert len(db) <= 130  # first abs value + 127 one-byte deltas
        assert len(tb) == 128


class TestBatchedDecode:
    """varint_decode_many / delta_decode_segments — the whole-Arrow-batch
    decode kernels the engine's fast path rides (engine.py _decode)."""

    @staticmethod
    def _concat(streams):
        import numpy as _np

        from bayard_spark.build.codec import varint_encode

        bufs = [varint_encode(_np.asarray(s, dtype=_np.uint64)) for s in streams]
        offs = _np.zeros(len(bufs) + 1, dtype=_np.int64)
        offs[1:] = _np.cumsum([len(b) for b in bufs])
        return b"".join(bufs), offs

    def test_matches_per_stream_decode(self):
        from bayard_spark.build.codec import varint_decode_many

        rng = np.random.default_rng(7)
        streams = [
            rng.integers(0, 2**bits, size=int(n)).astype(np.uint64)
            for bits, n in [(7, 128), (14, 100), (32, 64), (62, 9), (7, 0)]
        ]
        buf, offs = self._concat(streams)
        vals, voffs = varint_decode_many(buf, offs)
        assert voffs.tolist() == np.cumsum(
            [0] + [len(s) for s in streams]
        ).tolist()
        for k, s in enumerate(streams):
            assert np.array_equal(vals[voffs[k] : voffs[k + 1]], s)

    def test_all_single_byte_fast_path(self):
        from bayard_spark.build.codec import varint_decode_many

        streams = [[1, 5, 127], [], [0, 0, 3]]
        buf, offs = self._concat(streams)
        vals, voffs = varint_decode_many(buf, offs)
        assert vals.tolist() == [1, 5, 127, 0, 0, 3]
        assert voffs.tolist() == [0, 3, 3, 6]

    def test_empty_buffer(self):
        from bayard_spark.build.codec import varint_decode_many

        vals, voffs = varint_decode_many(b"", np.zeros(4, dtype=np.int64))
        assert vals.size == 0 and voffs.tolist() == [0, 0, 0, 0]

    def test_segmented_delta_matches_blockwise(self):
        from bayard_spark.build.codec import (
            delta_decode_segments,
            varint_decode_many,
        )

        rng = np.random.default_rng(11)
        blocks = []
        base = 0
        for _ in range(40):
            n = int(rng.integers(1, 129))
            ids = base + np.cumsum(rng.integers(1, 1000, size=n)).astype(
                np.uint64
            )
            base = int(ids[-1]) + int(rng.integers(1, 10_000))
            blocks.append(ids)
        buf, offs = self._concat([delta_encode(b) for b in blocks])
        deltas, voffs = varint_decode_many(buf, offs)
        got = delta_decode_segments(deltas, voffs)
        want = np.concatenate(
            [delta_decode(delta_encode(b)) for b in blocks]
        )
        assert np.array_equal(got, want)

    @settings(max_examples=30, deadline=None)
    @given(
        st.lists(
            st.lists(
                st.integers(min_value=0, max_value=2**63 - 1), max_size=60
            ),
            max_size=12,
        )
    )
    def test_property_concat_roundtrip(self, streams):
        from bayard_spark.build.codec import varint_decode_many

        buf, offs = self._concat(streams)
        vals, voffs = varint_decode_many(buf, offs)
        for k, s in enumerate(streams):
            assert vals[voffs[k] : voffs[k + 1]].tolist() == s
