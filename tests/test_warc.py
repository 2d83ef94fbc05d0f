"""WARC parser vs an INDEPENDENT muxer written here.

The muxer below builds WARC bytes by hand (its own header formatting, its
own gzip framing via the stdlib gzip module) — the parser under test
shares no code with it.
"""

import gzip

import pytest

from bayard_spark.sources.warc import (
    WarcParseError,
    parse_warc_file,
    response_pages,
    warc_records,
    wet_text,
)

# ---------------------------------------------------------------------------
# independent muxer
# ---------------------------------------------------------------------------


def mux(headers: dict, payload: bytes) -> bytes:
    lines = ["WARC/1.0"]
    lines += [f"{k}: {v}" for k, v in headers.items()]
    lines += [f"Content-Length: {len(payload)}"]
    return ("\r\n".join(lines)).encode("latin-1") + b"\r\n\r\n" + payload + b"\r\n\r\n"


def http_response(body: bytes, ctype: str = "text/html", status: int = 200) -> bytes:
    return (
        f"HTTP/1.1 {status} OK\r\nContent-Type: {ctype}\r\n\r\n".encode()
        + body
    )


def sample_records() -> list[bytes]:
    r1 = mux(
        {"WARC-Type": "warcinfo", "WARC-Record-ID": "<urn:uuid:1>"},
        b"software: test\r\n",
    )
    r2 = mux(
        {
            "WARC-Type": "response",
            "WARC-Record-ID": "<urn:uuid:2>",
            "WARC-Target-URI": "https://example.com/a",
            "WARC-Date": "2024-03-05T12:34:56Z",
            "Content-Type": "application/http; msgtype=response",
        },
        http_response(b"<html>hello</html>"),
    )
    r3 = mux(
        {
            "WARC-Type": "conversion",
            "WARC-Record-ID": "<urn:uuid:3>",
            "WARC-Target-URI": "https://example.com/a",
            "WARC-Date": "2024-03-05T12:34:57Z",
            "Content-Type": "text/plain",
        },
        "hello extracted café".encode("utf-8"),
    )
    return [r1, r2, r3]


# ---------------------------------------------------------------------------
# unit
# ---------------------------------------------------------------------------


class TestParse:
    def test_plain_multi_record(self):
        raw = b"".join(sample_records())
        recs = parse_warc_file(raw, "f.warc")
        assert [r["warc_type"] for r in recs] == [
            "warcinfo",
            "response",
            "conversion",
        ]
        assert [r["record_seq"] for r in recs] == [0, 1, 2]
        assert all(r["parse_error"] is None for r in recs)
        resp = recs[1]
        assert resp["target_uri"] == "https://example.com/a"
        assert resp["http_status"] == 200
        assert resp["http_content_type"] == "text/html"
        assert resp["body"] == b"<html>hello</html>"
        assert resp["payload"].startswith(b"HTTP/1.1 200")
        assert resp["content_length"] == len(http_response(b"<html>hello</html>"))
        assert resp["warc_date"].isoformat() == "2024-03-05T12:34:56+00:00"
        conv = recs[2]
        assert conv["http_status"] is None
        assert conv["body"] is None  # body only for split HTTP responses
        assert conv["payload"].decode("utf-8") == "hello extracted café"

    def test_per_record_gzip_members(self):
        raw = b"".join(gzip.compress(r) for r in sample_records())
        recs = parse_warc_file(raw, "f.warc.gz")
        assert len(recs) == 3 and all(r["parse_error"] is None for r in recs)
        assert recs[1]["body"] == b"<html>hello</html>"

    def test_whole_file_single_member_gzip(self):
        raw = gzip.compress(b"".join(sample_records()))
        recs = parse_warc_file(raw, "f.warc.gz")
        assert len(recs) == 3 and recs[2]["warc_type"] == "conversion"

    def test_payload_containing_warc_magic(self):
        inner = b"WARC/1.0\r\nWARC-Type: fake\r\n\r\n decoy"
        r = mux({"WARC-Type": "resource"}, inner)
        recs = parse_warc_file(r + b"".join(sample_records()), "f")
        assert len(recs) == 4
        assert recs[0]["payload"] == inner  # length-driven, not scan-driven

    def test_truncated_payload_keeps_prefix(self):
        rs = sample_records()
        raw = rs[0] + rs[1][: len(rs[1]) - 30]
        recs = parse_warc_file(raw, "f")
        assert recs[0]["warc_type"] == "warcinfo"
        assert recs[-1]["parse_error"] is not None
        assert "truncated" in recs[-1]["parse_error"]
        with pytest.raises(WarcParseError):
            parse_warc_file(raw, "f", strict=True)

    def test_missing_content_length(self):
        bad = b"WARC/1.0\r\nWARC-Type: resource\r\n\r\npayload"
        recs = parse_warc_file(bad, "f")
        assert len(recs) == 1 and "Content-Length" in recs[0]["parse_error"]
        with pytest.raises(WarcParseError):
            parse_warc_file(bad, "f", strict=True)

    def test_not_warc_at_all(self):
        recs = parse_warc_file(b"<html>not a warc</html>", "f")
        assert len(recs) == 1 and "version line" in recs[0]["parse_error"]

    def test_corrupt_second_gzip_member_keeps_first(self):
        rs = sample_records()
        good = gzip.compress(rs[0])
        bad = gzip.compress(rs[1])
        corrupted = bad[:10] + b"\x00\x00\x00\x00" + bad[14:]
        recs = parse_warc_file(good + corrupted, "f")
        assert recs[0]["warc_type"] == "warcinfo"
        assert recs[0]["parse_error"] is None
        assert any(
            r["parse_error"] and "gzip" in r["parse_error"] for r in recs
        )
        with pytest.raises(WarcParseError):
            parse_warc_file(good + corrupted, "f", strict=True)

    def test_empty_payload_record(self):
        r = mux({"WARC-Type": "resource"}, b"")
        recs = parse_warc_file(r, "f")
        assert recs[0]["content_length"] == 0 and recs[0]["payload"] == b""


# ---------------------------------------------------------------------------
# Spark end-to-end
# ---------------------------------------------------------------------------


class TestSpark:
    @pytest.fixture(scope="class")
    def files_df(self, spark):
        rows = [
            ("mem://a.warc", b"".join(sample_records())),
            ("mem://b.warc.gz", b"".join(gzip.compress(r) for r in sample_records())),
            ("mem://bad.warc", b"garbage"),
        ]
        return spark.createDataFrame(rows, "path string, content binary")

    def test_records_end_to_end(self, spark, files_df):
        recs = warc_records(files_df).orderBy("path", "record_seq").collect()
        by_path = {}
        for r in recs:
            by_path.setdefault(r.path, []).append(r)
        assert len(by_path["mem://a.warc"]) == 3
        assert len(by_path["mem://b.warc.gz"]) == 3
        assert by_path["mem://bad.warc"][0].parse_error is not None
        resp = by_path["mem://a.warc"][1]
        assert resp.http_status == 200
        assert bytes(resp.body) == b"<html>hello</html>"
        # timestamp survives Arrow as the right absolute instant
        import calendar

        want = calendar.timegm((2024, 3, 5, 12, 34, 56))
        got = (
            warc_records(files_df)
            .where("record_seq = 1 AND path = 'mem://a.warc'")
            .selectExpr("cast(warc_date as long) AS e")
            .collect()[0]
            .e
        )
        assert got == want

    def test_wet_and_response_shapes(self, spark, files_df):
        recs = warc_records(files_df)
        wet = wet_text(recs).collect()
        assert len(wet) == 2  # one conversion per good file
        assert all(w.text == "hello extracted café" for w in wet)
        pages = response_pages(recs).collect()
        assert len(pages) == 2
        assert all(bytes(p.html) == b"<html>hello</html>" for p in pages)

    def test_non_200_filtered(self, spark):
        r = mux(
            {
                "WARC-Type": "response",
                "WARC-Target-URI": "https://example.com/404",
                "WARC-Date": "2024-03-05T00:00:00Z",
                "Content-Type": "application/http; msgtype=response",
            },
            http_response(b"gone", status=404),
        )
        df = spark.createDataFrame(
            [("mem://c.warc", r)], "path string, content binary"
        )
        recs = warc_records(df)
        assert recs.collect()[0].http_status == 404
        assert response_pages(recs).count() == 0


class TestIncremental:
    """The streaming core: chunked input, compaction, batched output."""

    def test_chunked_equals_whole(self):
        import bayard_spark.sources.warc as W

        raw = b"".join(sample_records()) * 20
        gz = gzip.compress(raw)
        for blob in (raw, gz):
            whole = parse_warc_file(blob, "f")
            for chunk in (1, 7, 64, 1000):
                chunks = [blob[i : i + chunk] for i in range(0, len(blob), chunk)]
                assert list(W.iter_warc_records(chunks, "f")) == whole

    def test_compaction_preserves_results_and_offsets(self, monkeypatch):
        import bayard_spark.sources.warc as W

        monkeypatch.setattr(W, "_COMPACT_AT", 64)  # force compaction often
        raw = b"".join(sample_records()) * 10
        recs = list(W.iter_warc_records([raw], "f"))
        assert recs == parse_warc_file(raw, "f")
        assert [r["record_seq"] for r in recs] == list(range(30))
        # an error after heavy compaction still reports the GLOBAL offset
        bad = raw + b"garbage-tail"
        recs = list(W.iter_warc_records([bad], "f"))
        assert f"at byte {len(raw)}" in recs[-1]["parse_error"]

    def test_batched_arrow_output(self, spark):
        rows = [("mem://big.warc", b"".join(sample_records()) * 40)]
        df = spark.createDataFrame(rows, "path string, content binary")
        out = warc_records(df, batch_rows=7)
        assert out.count() == 120
        assert [r.record_seq for r in out.orderBy("record_seq").collect()] == list(
            range(120)
        )

    def test_per_record_gzip_members_chunked(self):
        import bayard_spark.sources.warc as W

        blob = b"".join(gzip.compress(r) for r in sample_records() * 5)
        chunks = [blob[i : i + 13] for i in range(0, len(blob), 13)]
        recs = list(W.iter_warc_records(chunks, "f"))
        assert len(recs) == 15
        assert all(r["parse_error"] is None for r in recs)


class TestHeaderCap:
    def test_oversized_header_is_chunking_independent(self):
        import bayard_spark.sources.warc as W

        # a 70KB header exceeds MAX_HEADER: malformed regardless of how
        # the bytes arrive (whole buffer vs 4KB chunks must agree)
        big_hdr = (
            b"WARC/1.0\r\nWARC-Type: resource\r\nX-Pad: "
            + b"a" * 70_000
            + b"\r\nContent-Length: 2\r\n\r\nhi\r\n\r\n"
        )
        whole = parse_warc_file(big_hdr, "f")
        chunked = list(
            W.iter_warc_records(
                [big_hdr[i : i + 4096] for i in range(0, len(big_hdr), 4096)],
                "f",
            )
        )
        assert whole == chunked
        assert len(whole) == 1 and "header" in whole[0]["parse_error"]

    def test_large_but_legal_header_parses_either_way(self):
        import bayard_spark.sources.warc as W

        hdr = (
            b"WARC/1.0\r\nWARC-Type: resource\r\nX-Pad: "
            + b"a" * 10_000
            + b"\r\nContent-Length: 2\r\n\r\nhi\r\n\r\n"
        )
        whole = parse_warc_file(hdr, "f")
        chunked = list(
            W.iter_warc_records(
                [hdr[i : i + 100] for i in range(0, len(hdr), 100)], "f"
            )
        )
        assert whole == chunked
        assert whole[0]["parse_error"] is None
        assert whole[0]["payload"] == b"hi"
