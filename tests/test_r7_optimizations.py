"""Focused tests for round-7 optimization internals.

Each test pins an equivalence an optimization relies on:
- _runs_from_ints packed-key sort == the old lexsort on row-major input,
  and the fallback fires on non-row-major input;
- gopher_rules row-local stats == the old explode/groupBy semantics on
  crafted edge docs (dup lines, blank lines, NULL/empty text, symbols
  adjacent to newlines);
- paragraph_dedup hash-proxy counts == exact string counts (planted
  boilerplate), and the dup_count fast path matches the measuring path;
- linear_text_score append=True rows == the (doc_id-keyed) base form;
- WARC bounded decompress handles a high-inflation member and the
  record-size cap yields a typed parse_error row.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
from pyspark.sql import functions as F


def _rows_of(batch):
    if batch is None:
        return []
    d = batch.to_pydict()
    return list(
        zip(d["doc_id"], d["field"], d["term"], d["tf"], d["doc_len"],
            d["pos_bytes"])
    )


class TestRunsPackedSort:
    def _mk(self, rng, n_rows=50, n_codes=30, max_tok=40):
        idx, codes, pos = [], [], []
        for r in range(n_rows):
            k = int(rng.integers(0, max_tok))
            idx.extend([r] * k)
            codes.extend(rng.integers(0, n_codes, k).tolist())
            pos.extend(range(k))
        return (
            np.array(idx, dtype=np.int64),
            np.array(codes, dtype=np.int32),
            np.array(pos, dtype=np.int64),
        )

    def test_matches_lexsort_on_row_major(self, monkeypatch):
        from bayard_spark.build import indexer

        rng = np.random.default_rng(3)
        for _ in range(5):
            idx, codes, pos = self._mk(rng)
            dictionary = pa.array([f"t{i}" for i in range(30)])
            doc_ids = np.arange(100, 150, dtype=np.int64)
            dl = np.bincount(idx, minlength=50).astype(np.int32)
            got = indexer._runs_from_ints(
                idx, codes, pos, dictionary, dl, doc_ids, "text", True
            )
            # force the general path by shadowing argsort's precondition:
            # recompute with an explicit lexsort on the same inputs
            order = np.lexsort((pos, codes, idx))
            packed = np.argsort(
                idx * (np.int64(codes.max()) + 1) + codes, kind="stable"
            )
            assert np.array_equal(order, packed)
            want = indexer._runs_from_ints(
                idx[order], codes[order], pos[order],
                dictionary, dl, doc_ids, "text", True,
            )
            # already-sorted input goes through either path identically
            assert _rows_of(got) == _rows_of(want)

    def test_fallback_on_unordered_input(self):
        from bayard_spark.build import indexer

        # pos DESCENDING within a row: the row-major check must fail and
        # the lexsort fallback must still sort positions ascending
        idx = np.array([0, 0, 0], dtype=np.int64)
        codes = np.array([5, 5, 5], dtype=np.int32)
        pos = np.array([2, 1, 0], dtype=np.int64)
        dictionary = pa.array([f"t{i}" for i in range(6)])
        doc_ids = np.array([7], dtype=np.int64)
        dl = np.array([3], dtype=np.int32)
        got = indexer._runs_from_ints(
            idx, codes, pos, dictionary, dl, doc_ids, "text", True
        )
        rows = _rows_of(got)
        assert len(rows) == 1 and rows[0][3] == 3  # tf aggregated
        # delta+varint of sorted positions 0,1,1? -> absolute first = 0
        from bayard_spark.build.codec import varint_decode

        deltas = varint_decode(rows[0][5])
        assert deltas.tolist() == [0, 1, 1]


class TestGopherRowLocal:
    @pytest.fixture(scope="class")
    def docs(self, spark):
        rows = [
            (1, "the be to of and that have with " + "alpha beta " * 30),
            (2, "dup line\ndup line\nunique line\n\n  \nthe be to of"),
            (3, None),
            (4, ""),
            (5, "   "),
            (6, "..\n.juxtaposed dots\n# one hash ...\nthe be"),
            (7, "- bullet one\n* bullet two\nends with ...\nthe be have"),
            (8, "\n\n\n"),
            (9, "UPPER case The BE to\nUPPER case The BE to"),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_edge_semantics(self, docs):
        from bayard_spark.functions.textstats import gopher_rules

        out = {
            r["doc_id"]: r.asDict()
            for r in gopher_rules(docs).collect()
        }
        assert set(out) == {1, 2, 3, 4, 5, 6, 7, 8, 9}
        # NULL / empty / whitespace / blank-only docs: all zeros, fail
        for d in (3, 4, 5, 8):
            assert out[d]["n_words"] == 0
            assert out[d]["n_lines"] == 0
            assert out[d]["mean_word_len"] == 0.0
            assert out[d]["gopher_pass"] is False
        # dup-line accounting: doc 2 has lines [dup, dup, unique, the-be...]
        assert out[2]["n_lines"] == 4
        assert round(out[2]["dup_line_frac"], 6) == round(1 / 4, 6)
        # ".." on one line and "." starting the next must NOT count as a
        # '...' symbol match (the whole-text count cannot cross '\n')
        assert out[6]["symbol_word_ratio"] == round(
            2 / out[6]["n_words"], 6
        )  # '#' and the literal '...' only
        # bullets / ellipsis per-line anchors
        assert out[7]["bullet_line_ratio"] == round(2 / 4, 6)
        assert out[7]["ellipsis_line_ratio"] == round(1 / 4, 6)
        # duplicate lines count words per instance
        assert out[9]["n_words"] == 10
        assert out[9]["dup_line_frac"] == 0.5

    def test_append_matches_base(self, docs):
        from bayard_spark.functions.textstats import gopher_rules

        base = gopher_rules(docs).orderBy("doc_id").collect()
        app = (
            gopher_rules(docs, append=True)
            .select(*[c for c in gopher_rules(docs).columns])
            .orderBy("doc_id")
            .collect()
        )
        assert [r.asDict() for r in base] == [r.asDict() for r in app]


class TestParaDedupHashProxy:
    def test_planted_boilerplate(self, spark):
        from bayard_spark.functions.dedup import paragraph_dedup

        rows = [
            (1, "keep one\nBOILER\nkeep two"),
            (2, "BOILER\nonly here"),
            (3, "solo text"),
            (4, None),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {
            r["doc_id"]: r
            for r in paragraph_dedup(df, sep="\n").collect()
        }
        assert out[1]["text_clean"] == "keep one\nkeep two"
        assert out[1]["n_removed"] == 1
        assert out[2]["text_clean"] == "only here"
        assert out[3]["text_clean"] == "solo text"
        assert 4 not in out  # NULL text emits no row (unchanged contract)

    def test_dup_count_fast_path_identical(self, spark):
        from bayard_spark.functions.dedup import paragraph_dedup

        rows = [(i, f"common\nuniq {i}") for i in range(20)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        a = sorted(
            (r["doc_id"], r["text_clean"], r["n_removed"])
            for r in paragraph_dedup(df, sep="\n").collect()
        )
        b = sorted(
            (r["doc_id"], r["text_clean"], r["n_removed"])
            for r in paragraph_dedup(df, sep="\n", dup_count=1).collect()
        )
        assert a == b
        assert all(t == f"uniq {d}" for d, t, _ in a)


class TestLinearScoreAppend:
    def test_append_matches_base(self, spark):
        from bayard_spark.functions.textstats import linear_text_score

        docs = spark.createDataFrame(
            [(1, "good fine text"), (2, None), (3, "bad awful")],
            "doc_id long, text string",
        )
        w = spark.createDataFrame(
            [(i, (i % 7 - 3) * 0.1) for i in range(64)],
            "bucket long, weight double",
        )
        base = {
            r["doc_id"]: (r["n_feats"], r["score"])
            for r in linear_text_score(docs, w, num_buckets=64).collect()
        }
        app = {
            r["doc_id"]: (r["n_feats"], r["score"], r["text"])
            for r in linear_text_score(
                docs, w, num_buckets=64, append=True
            ).collect()
        }
        assert set(base) == set(app)
        for d in base:
            assert base[d] == app[d][:2]
        assert app[3][2] == "bad awful"  # input columns preserved


class TestWarcBounds:
    def test_bounded_decompress_high_inflation(self):
        import gzip

        from bayard_spark.sources.warc import parse_warc_file

        body = b"A" * (8 << 20)  # 8 MiB of one byte: ~1000x inflation
        rec = (
            b"WARC/1.0\r\n"
            b"WARC-Type: resource\r\n"
            b"WARC-Record-ID: <urn:x:1>\r\n"
            + f"Content-Length: {len(body)}\r\n\r\n".encode()
            + body
            + b"\r\n\r\n"
        )
        rows = parse_warc_file(gzip.compress(rec), "t.warc.gz")
        assert len(rows) == 1 and rows[0]["parse_error"] is None
        assert rows[0]["payload"] == body

    def test_record_size_cap(self):
        from bayard_spark.sources import warc

        rec = (
            b"WARC/1.0\r\n"
            b"WARC-Type: resource\r\n"
            + f"Content-Length: {warc.MAX_RECORD_BYTES + 1}\r\n\r\n".encode()
        )
        rows = warc.parse_warc_file(rec, "big.warc")
        assert len(rows) == 1
        assert rows[0]["parse_error"] is not None
        assert "cap" in rows[0]["parse_error"]


class TestEncodeGroupZeroCopy:
    """encode_group_table (zero-copy per-block payload columns, r7) must
    stay byte-identical to encode_group_frame, the independent pandas
    encoder the incremental segment writer uses."""

    def test_identical_blocks(self):
        import pandas as pd

        from bayard_spark.build.indexer import (
            encode_group_frame,
            encode_group_table,
        )
        from bayard_spark.build.codec import varint_encode

        rng = np.random.default_rng(11)
        rows = []
        for fld in ("text", "url"):
            for t in range(6):
                term = f"term{t}"
                salts = [0, 1] if t == 0 else [0]
                for salt in salts:
                    docs = np.sort(
                        rng.choice(100_000, size=300, replace=False)
                    )
                    for d in docs:
                        pos = np.sort(
                            rng.choice(50, size=3, replace=False)
                        ).astype(np.uint64)
                        deltas = pos.copy()
                        deltas[1:] -= pos[:-1]
                        rows.append(
                            (
                                int(d), fld, term,
                                3, int(rng.integers(1, 200)),
                                bytes(varint_encode(deltas)),
                                7, salt,
                            )
                        )
        cols = ["doc_id", "field", "term", "tf", "doc_len", "pos_bytes",
                "bucket", "salt"]
        pdf = pd.DataFrame(rows, columns=cols)
        want = encode_group_frame(pdf.copy(), block_size=128)
        got = (
            encode_group_table(
                pa.Table.from_pandas(pdf, preserve_index=False),
                block_size=128,
            )
            .to_pandas()
        )
        key = ["field", "term", "salt", "block_id"]
        want = want.sort_values(key, ignore_index=True)
        got = got.sort_values(key, ignore_index=True)
        assert list(want.columns) == list(got.columns)
        for c in want.columns:
            a, b = want[c].tolist(), got[c].tolist()
            assert a == b, f"column {c} diverges"
